"""Pallas TPU megakernel: one full path-tracer bounce in a single kernel.

For statically-simple scenes (all-matte Lambertian materials, all lights
diffuse-area over triangle ranges, triangles only, no env/alpha/SSS/media
/textures — exactly the shape of the headline Cornell benchmark) the whole
bounce body of models/integrators/path.py runs inside one kernel:

    closest-hit sweep -> hit record -> emitted-light MIS add -> NEE light
    sample -> in-kernel shadow any-hit sweep -> cosine BSDF sample ->
    Russian roulette

The wavefront state (o, d, beta, L, alive, prev_pdf) round-trips HBM once
per bounce; everything else lives in registers/VMEM.  The general JAX path
spends ~40ms/bounce of XLA elementwise passes + one-hot gathers on the
same work at 4M lanes; in-kernel it is ~1k extra VPU ops on top of the
intersection sweeps.

Math mirrors the general path EXACTLY (same formulas, same guards) so the
two implementations agree to float tolerance; parity is tested in
tests/test_pallas.py on the CPU interpreter and cross-checked on-chip by
the golden-image tests.  Reference call stack: integrators/path.rs:59-281
+ core/integrator.rs:359-570 (uniform_sample_one_light / estimate_direct).

Eligibility is decided HOST-SIDE on the concrete scene (mega_cfg below)
and threaded through render_batch as a static arg — Scene values are
tracers under jit, so the decision cannot live inside the integrator.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene import arrays as sa
from ..utils import vecmath as vm
from .pallas_intersect import (
    BIG,
    LANE,
    SUB,
    TILE,
    UNROLL,
    _GAMMA7,
    _ray_constants,
    _watertight_tri,
    _watertight_tri_any,
    interpret_enabled,
)

PI = np.float32(np.pi)
INV_PI = np.float32(1.0 / np.pi)

MEGA_MAX_TRIS = 2048
MEGA_MAX_LIGHTS = 8
MEGA_MAX_LIGHT_TRIS = 16


class MegaCfg(NamedTuple):
    """Hashable static megakernel config (host-derived from the scene)."""

    n_tri: int
    n_mats: int
    lights: tuple  # ((tri_start, tri_count), ...) per light
    a_cols: int  # alight_tri_cdf.shape[1]


_MEGA_CACHE: dict = {}


def mega_cfg(scene, accel=None, light_distrib=None) -> Optional[MegaCfg]:
    """Host-side eligibility: returns a MegaCfg when the megakernel can
    render this scene, else None.  Must be called on a CONCRETE scene
    (outside jit) — returns None for tracers.

    The decision reads device arrays back to host, so it is cached per
    built scene (keyed on the mat/light buffer identities, weakref-checked
    against id reuse) — repeated render calls pay no device->host sync."""
    if accel is not None or light_distrib is not None:
        return None
    key = (id(scene.tri_p0), id(scene.mat_attr), id(scene.light_attr))
    hit = _MEGA_CACHE.get(key)
    if hit is not None:
        refs, cfg = hit
        if all(r() is a for r, a in zip(refs, (scene.tri_p0, scene.mat_attr, scene.light_attr))):
            return cfg
    cfg = _mega_cfg_uncached(scene)
    try:
        import weakref

        refs = tuple(weakref.ref(a) for a in (scene.tri_p0, scene.mat_attr, scene.light_attr))
        if len(_MEGA_CACHE) > 64:
            _MEGA_CACHE.clear()
        _MEGA_CACHE[key] = (refs, cfg)
    except TypeError:
        pass  # tracers / non-weakrefable leaves: just don't cache
    return cfg


def _mega_cfg_uncached(scene) -> Optional[MegaCfg]:
    # any traced leaf means we're inside a transform (jit/grad) — the
    # values below are unreadable, so the general path must serve
    if any(
        isinstance(x, jax.core.Tracer)
        for x in (scene.tri_p0, scene.mat_attr, scene.light_attr)
    ):
        return None
    if (
        scene.n_spheres
        or scene.n_curve_segs
        or scene.has_env
        or scene.has_alpha
        or scene.has_subsurface
        or scene.has_hair
    ):
        return None
    if not (0 < scene.n_tris <= MEGA_MAX_TRIS):
        return None
    if not (0 < scene.n_lights <= MEGA_MAX_LIGHTS):
        return None
    if scene.tex_slot_mask != 0:
        return None
    if scene.mat_kind_mask != (1 << sa.MATTE):
        return None
    mat = np.asarray(scene.mat_attr)
    if (mat[:, sa.MA_PARAMS + sa.MP_SIGMA] != 0.0).any():
        return None  # oren-nayar lanes — general path only
    la = np.asarray(scene.light_attr)
    types = np.rint(la[:, sa.LA_TYPE]).astype(int)
    geom = np.rint(la[:, sa.LA_GEOM]).astype(int)
    if (types != sa.LIGHT_AREA).any() or (geom != sa.ALG_TRI_RANGE).any():
        return None
    starts = np.rint(la[:, sa.LA_TRI_START]).astype(int)
    ends = np.rint(la[:, sa.LA_TRI_END]).astype(int)
    counts = ends - starts
    if (counts <= 0).any() or counts.max() > MEGA_MAX_LIGHT_TRIS:
        return None
    return MegaCfg(
        n_tri=int(scene.n_tris),
        n_mats=int(scene.mat_attr.shape[0]),
        lights=tuple((int(s), int(c)) for s, c in zip(starts, counts)),
        a_cols=int(scene.alight_tri_cdf.shape[1]),
    )


# ---------------------------------------------------------------------------
# tile-tuple vector helpers (each component is a (SUB, LANE) array)
# ---------------------------------------------------------------------------

def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _scale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _where3(m, a, b):
    return (jnp.where(m, a[0], b[0]), jnp.where(m, a[1], b[1]), jnp.where(m, a[2], b[2]))


def _normalize(a, eps=1e-20):
    inv = 1.0 / jnp.sqrt(jnp.maximum(_dot(a, a), eps))
    return _scale(a, inv)


def _coordinate_system(v):
    """vm.coordinate_system first axis (geometry.rs branch on |x|>|y|)."""
    use_a = jnp.abs(v[0]) > jnp.abs(v[1])
    inv_a = 1.0 / jnp.sqrt(jnp.maximum(v[0] * v[0] + v[2] * v[2], 1e-20))
    inv_b = 1.0 / jnp.sqrt(jnp.maximum(v[1] * v[1] + v[2] * v[2], 1e-20))
    return (
        jnp.where(use_a, -v[2] * inv_a, 0.0),
        jnp.where(use_a, 0.0, v[2] * inv_b),
        jnp.where(use_a, v[0] * inv_a, -v[1] * inv_b),
    )


def _next_float_up(x):
    xi = jax.lax.bitcast_convert_type(x, jnp.int32)
    xi = jnp.where(x >= 0.0, xi + 1, xi - 1)
    out = jax.lax.bitcast_convert_type(xi, jnp.float32)
    out = jnp.where(x == 0.0, np.float32(1e-45), out)
    return jnp.where(jnp.isinf(x) & (x > 0), x, out)


def _next_float_down(x):
    xi = jax.lax.bitcast_convert_type(x, jnp.int32)
    xi = jnp.where(x > 0.0, xi - 1, xi + 1)
    out = jax.lax.bitcast_convert_type(xi, jnp.float32)
    out = jnp.where(x == 0.0, np.float32(-1e-45), out)
    return jnp.where(jnp.isinf(x) & (x < 0), x, out)


def _offset_ray_origin(p, p_err, n, w):
    """vm.offset_ray_origin (reference interaction.rs:62-95) on tiles."""
    d = jnp.abs(n[0]) * p_err[0] + jnp.abs(n[1]) * p_err[1] + jnp.abs(n[2]) * p_err[2]
    flip = _dot(w, n) < 0.0
    out = []
    for k in range(3):
        off = jnp.where(flip, -d * n[k], d * n[k])
        po = p[k] + off
        po = jnp.where(off > 0.0, _next_float_up(po), jnp.where(off < 0.0, _next_float_down(po), po))
        out.append(po)
    return tuple(out)


def _power_heuristic(f_pdf, g_pdf):
    """smp.power_heuristic with nf = ng = 1 (sampling.rs:229)."""
    f = f_pdf
    g = g_pdf
    denom = f * f + g * g
    return jnp.where(denom > 0.0, (f * f) / jnp.maximum(denom, 1e-30), 0.0)


def _concentric_disk(u0, u1):
    ox = 2.0 * u0 - 1.0
    oy = 2.0 * u1 - 1.0
    zero = (ox == 0.0) & (oy == 0.0)
    use_x = jnp.abs(ox) > jnp.abs(oy)
    r = jnp.where(use_x, ox, oy)
    safe_ox = jnp.where(ox == 0.0, 1.0, ox)
    safe_oy = jnp.where(oy == 0.0, 1.0, oy)
    theta = jnp.where(
        use_x, (PI / 4.0) * (oy / safe_ox), (PI / 2.0) - (PI / 4.0) * (ox / safe_oy)
    )
    dx = r * jnp.cos(theta)
    dy = r * jnp.sin(theta)
    return jnp.where(zero, 0.0, dx), jnp.where(zero, 0.0, dy)


# ---------------------------------------------------------------------------
# the bounce kernel
# ---------------------------------------------------------------------------

# tri_attr columns consumed for the hit record (everything the matte
# shading path needs; uv columns feed dpdu for the BSDF frame)
_REC_COLS = 28


def _closest_sweep(n_tri, tris, o, d, t_lim):
    rc = _ray_constants(o[0], o[1], o[2], d[0], d[1], d[2])

    def one(t, bt, bi, b0, b1):
        hit, tval, tb0, tb1 = _watertight_tri(
            rc,
            tris[t, 0], tris[t, 1], tris[t, 2],
            tris[t, 3], tris[t, 4], tris[t, 5],
            tris[t, 6], tris[t, 7], tris[t, 8],
            t_lim,
        )
        upd = hit & (tval < bt)
        return (
            jnp.where(upd, tval, bt),
            jnp.where(upd, t, bi),
            jnp.where(upd, tb0, b0),
            jnp.where(upd, tb1, b1),
        )

    bt = jnp.full(o[0].shape, BIG, jnp.float32)
    bi = jnp.full(o[0].shape, -1, jnp.int32)
    b0 = jnp.zeros(o[0].shape, jnp.float32)
    b1 = jnp.zeros(o[0].shape, jnp.float32)
    n_pad = -(-n_tri // UNROLL) * UNROLL
    if n_pad <= 64:
        for t in range(n_tri):
            bt, bi, b0, b1 = one(t, bt, bi, b0, b1)
    else:
        def body(i, state):
            bt, bi, b0, b1 = state
            for k in range(UNROLL):
                bt, bi, b0, b1 = one(i * UNROLL + k, bt, bi, b0, b1)
            return bt, bi, b0, b1

        bt, bi, b0, b1 = jax.lax.fori_loop(0, n_pad // UNROLL, body, (bt, bi, b0, b1))
    return bt, bi, b0, b1


def _any_sweep(n_tri, tris, o, d, t_lim):
    rc = _ray_constants(o[0], o[1], o[2], d[0], d[1], d[2])

    def one(t, occ):
        hit = _watertight_tri_any(
            rc,
            tris[t, 0], tris[t, 1], tris[t, 2],
            tris[t, 3], tris[t, 4], tris[t, 5],
            tris[t, 6], tris[t, 7], tris[t, 8],
            t_lim,
        )
        return occ | hit.astype(jnp.int32)

    occ = jnp.zeros(o[0].shape, jnp.int32)
    n_pad = -(-n_tri // UNROLL) * UNROLL
    if n_pad <= 64:
        for t in range(n_tri):
            occ = one(t, occ)
    else:
        def body(i, occ):
            for k in range(UNROLL):
                occ = one(i * UNROLL + k, occ)
            return occ

        occ = jax.lax.fori_loop(0, n_pad // UNROLL, body, occ)
    return occ != 0


def _fetch_record(n_tri, tris, bi, b0, b1):
    """Winning triangle's interaction record, in registers.  Mirrors
    scene_intersect._tri_interaction (reference triangle.rs:300-420)."""
    zero = jnp.zeros(bi.shape, jnp.float32)
    at = [zero] * _REC_COLS
    if n_tri <= 64:
        for t in range(n_tri):
            m = bi == t
            for c in range(_REC_COLS):
                at[c] = jnp.where(m, tris[t, c], at[c])
        at = tuple(at)
    else:
        def fetch(t, at):
            m = bi == t
            return tuple(jnp.where(m, tris[t, c], at[c]) for c in range(_REC_COLS))

        at = jax.lax.fori_loop(0, n_tri, fetch, tuple(at))

    p0, p1, p2 = at[0:3], at[3:6], at[6:9]
    n0, n1, n2 = at[9:12], at[12:15], at[15:18]
    uv0, uv1, uv2 = at[18:20], at[20:22], at[22:24]
    has_n_f, mat_f, light_f, rev_f = at[24], at[25], at[26], at[27]

    b2 = 1.0 - b0 - b1
    p = tuple(b0 * p0[k] + b1 * p1[k] + b2 * p2[k] for k in range(3))
    p_err = tuple(
        _GAMMA7 * (jnp.abs(b0 * p0[k]) + jnp.abs(b1 * p1[k]) + jnp.abs(b2 * p2[k]))
        for k in range(3)
    )
    e02 = _sub(p0, p2)
    e12 = _sub(p1, p2)
    ng = _normalize(_cross(e02, e12), 1e-30)
    ns = tuple(b0 * n0[k] + b1 * n1[k] + b2 * n2[k] for k in range(3))
    ns_len = jnp.sqrt(_dot(ns, ns))
    has_n = (has_n_f > 0.5) & (ns_len > 1e-8)
    inv_nsl = 1.0 / jnp.maximum(ns_len, 1e-8)
    ns = _where3(has_n, _scale(ns, inv_nsl), ng)
    rev = rev_f > 0.5
    ns = _where3(rev, _scale(ns, -1.0), ns)
    flip_ng = (has_n & (_dot(ng, ns) < 0.0)) | ((~has_n) & rev)
    ng = _where3(flip_ng, _scale(ng, -1.0), ng)
    # dpdu from the uv parameterization (triangle.rs:300-330)
    duv02 = (uv0[0] - uv2[0], uv0[1] - uv2[1])
    duv12 = (uv1[0] - uv2[0], uv1[1] - uv2[1])
    det_uv = duv02[0] * duv12[1] - duv02[1] * duv12[0]
    inv_det_uv = jnp.where(
        jnp.abs(det_uv) < 1e-12, 0.0, 1.0 / jnp.where(det_uv == 0.0, 1.0, det_uv)
    )
    dpdu = tuple((duv12[1] * e02[k] - duv02[1] * e12[k]) * inv_det_uv for k in range(3))
    degen = _dot(dpdu, dpdu) < 1e-16
    fb = _coordinate_system(ng)
    dpdu = _where3(degen, fb, dpdu)
    mat = (mat_f + 0.5).astype(jnp.int32)
    light = (light_f + jnp.where(light_f < 0.0, -0.5, 0.5)).astype(jnp.int32)
    return p, p_err, ng, ns, dpdu, mat, light


_INV_2_32 = np.float32(2.3283064365386963e-10)
_ONE_MINUS_EPS = np.float32(1.0 - np.finfo(np.float32).epsneg)


def _sobol_dims7(smats, row0: int, hi, lo, n_bits: int):
    """Seven Sobol' dimensions for one bounce, in-kernel (same bit-matrix
    math as ops/pallas_sobol._sobol_kernel; row0 is the STATIC matrix-row
    offset of this bounce's first dimension)."""
    vs = [jnp.zeros(lo.shape, jnp.uint32) for _ in range(7)]
    for i in range(min(n_bits, 32)):
        b = ((lo >> jnp.uint32(i)) & jnp.uint32(1)) > 0
        for k in range(7):
            vs[k] = vs[k] ^ jnp.where(b, smats[row0 + k, i], jnp.uint32(0))
    for i in range(max(n_bits - 32, 0)):
        b = ((hi >> jnp.uint32(i)) & jnp.uint32(1)) > 0
        for k in range(7):
            vs[k] = vs[k] ^ jnp.where(b, smats[row0 + k, 32 + i], jnp.uint32(0))
    outs = []
    for v in vs:
        vf = (v >> jnp.uint32(1)).astype(jnp.int32).astype(jnp.float32) * 2.0 + (
            v & jnp.uint32(1)
        ).astype(jnp.int32).astype(jnp.float32)
        outs.append(jnp.minimum(vf * _INV_2_32, _ONE_MINUS_EPS))
    return outs


def _bounce_kernel(
    cfg: MegaCfg, first_bounce: bool, rr_active: bool, emit_only: bool,
    rr_threshold: float, dim_row0: int, n_bits: int,
    # lane inputs
    ox, oy, oz, dx, dy, dz, bxr, bxg, bxb, lr, lg, lb, alive_i, ppdf,
    idx_hi, idx_lo,
    # tables
    tris, lattr, lsel, ltricdf, mattr, smats,
    # outputs
    ox_o, oy_o, oz_o, dx_o, dy_o, dz_o, bxr_o, bxg_o, bxb_o,
    lr_o, lg_o, lb_o, alive_o, ppdf_o,
):
    n_tri = cfg.n_tri
    L = len(cfg.lights)
    o = (ox[...], oy[...], oz[...])
    d = (dx[...], dy[...], dz[...])
    beta = (bxr[...], bxg[...], bxb[...])
    Lrad = [lr[...], lg[...], lb[...]]
    alive = alive_i[...] != 0
    prev_pdf = ppdf[...]

    # ---- closest hit + record ----
    t_inf = jnp.full(o[0].shape, BIG, jnp.float32)
    bt, bi, b0, b1 = _closest_sweep(n_tri, tris, o, d, t_inf)
    p, p_err, ng, ns, dpdu, mat, light = _fetch_record(n_tri, tris, bi, b0, b1)
    valid = bi >= 0
    wo = _normalize(d)
    wo = _scale(wo, -1.0)

    # ---- emitted light at the hit (path.rs:97-116 / add_emitted) ----
    hit = valid & alive
    hit_light = jnp.where(hit, light, -1)
    is_emitter = hit_light >= 0
    # per-light row selects (static loop; L is tiny)
    le0 = jnp.zeros_like(bt); le1 = jnp.zeros_like(bt); le2 = jnp.zeros_like(bt)
    area_h = jnp.zeros_like(bt)
    two_h = jnp.zeros_like(bt)
    selpdf_h = jnp.zeros_like(bt)
    for li in range(L):
        m = hit_light == li
        le0 = jnp.where(m, lattr[li, sa.LP_I + 0], le0)
        le1 = jnp.where(m, lattr[li, sa.LP_I + 1], le1)
        le2 = jnp.where(m, lattr[li, sa.LP_I + 2], le2)
        area_h = jnp.where(m, lattr[li, sa.LP_AREA], area_h)
        two_h = jnp.where(m, lattr[li, sa.LP_TWO_SIDED], two_h)
        selpdf_h = jnp.where(m, lsel[1, li], selpdf_h)
    emits = (two_h > 0.5) | (_dot(ns, wo) > 0.0)
    le_on = emits & is_emitter
    # pdf_li_area(o -> p) for MIS (lights.py pdf_li_area)
    to_hit = _sub(p, o)
    d2h = jnp.maximum(_dot(to_hit, to_hit), 1e-12)
    inv_dist_h = 1.0 / jnp.sqrt(d2h)
    cos_lh = jnp.abs(_dot(ns, to_hit)) * inv_dist_h
    area_pdf = d2h / jnp.maximum(cos_lh * jnp.maximum(area_h, 1e-12), 1e-12)
    area_pdf = jnp.where(cos_lh < 1e-7, 0.0, area_pdf)
    light_pdf = selpdf_h * area_pdf
    if first_bounce:
        w_bsdf = jnp.ones_like(bt)
    else:
        w_bsdf = _power_heuristic(prev_pdf, light_pdf)
    gain = jnp.where(le_on, w_bsdf, 0.0)
    Lrad[0] = Lrad[0] + beta[0] * le0 * gain
    Lrad[1] = Lrad[1] + beta[1] * le1 * gain
    Lrad[2] = Lrad[2] + beta[2] * le2 * gain

    alive = alive & valid

    if emit_only:
        ox_o[...], oy_o[...], oz_o[...] = o
        dx_o[...], dy_o[...], dz_o[...] = d
        bxr_o[...], bxg_o[...], bxb_o[...] = beta
        lr_o[...], lg_o[...], lb_o[...] = Lrad
        alive_o[...] = alive.astype(jnp.int32)
        ppdf_o[...] = prev_pdf
        return

    # ---- BSDF frame (path._shading_frame_du: ss along dpdu) ----
    ss = _sub(dpdu, _scale(ns, _dot(ns, dpdu)))
    degen = _dot(ss, ss) < 1e-14
    ss_fb = _coordinate_system(ns)
    ss = _where3(degen, ss_fb, _normalize(_where3(degen, ss_fb, ss)))
    ts = _cross(ns, ss)
    wo_l = (_dot(wo, ss), _dot(wo, ts), _dot(wo, ns))

    # ---- material: matte lambertian (make_bsdf MATTE branch) ----
    kd0 = jnp.zeros_like(bt); kd1 = jnp.zeros_like(bt); kd2 = jnp.zeros_like(bt)
    for mi in range(cfg.n_mats):
        m = mat == mi
        kd0 = jnp.where(m, mattr[mi, sa.MA_PARAMS + sa.MP_KD + 0], kd0)
        kd1 = jnp.where(m, mattr[mi, sa.MA_PARAMS + sa.MP_KD + 1], kd1)
        kd2 = jnp.where(m, mattr[mi, sa.MA_PARAMS + sa.MP_KD + 2], kd2)
    kd = (kd0, kd1, kd2)
    kd_black = (kd0 == 0.0) & (kd1 == 0.0) & (kd2 == 0.0)  # kind0 = NONE

    # ---- sampler: this bounce's 7 Sobol dims, in-kernel ----
    dims = _sobol_dims7(smats, dim_row0, idx_hi[...], idx_lo[...], n_bits)

    # ---- NEE: select one light by the power distribution ----
    usel = dims[0]
    # find_interval over the (L+1) cdf (count form, sampling.py:149)
    idx = jnp.zeros(bt.shape, jnp.int32)
    for i in range(L + 1):
        idx = idx + (lsel[0, i] <= usel).astype(jnp.int32)
    li_idx = jnp.clip(idx - 1, 0, L - 1)
    sel_pdf = jnp.zeros_like(bt)
    for li in range(L):
        sel_pdf = jnp.where(li_idx == li, lsel[1, li], sel_pdf)

    # area-sample the chosen light's triangle range (lights._area_sample_tri)
    ul0 = dims[1]
    ul1 = dims[2]
    A = cfg.a_cols - 1
    off = jnp.zeros(bt.shape, jnp.int32)
    c0 = jnp.zeros_like(bt)
    c1 = jnp.zeros_like(bt)
    lp0 = [jnp.zeros_like(bt) for _ in range(3)]
    lp1 = [jnp.zeros_like(bt) for _ in range(3)]
    lp2 = [jnp.zeros_like(bt) for _ in range(3)]
    ln0 = [jnp.zeros_like(bt) for _ in range(3)]
    ln1 = [jnp.zeros_like(bt) for _ in range(3)]
    ln2 = [jnp.zeros_like(bt) for _ in range(3)]
    lhasn = jnp.zeros_like(bt)
    lrev = jnp.zeros_like(bt)
    larea = jnp.zeros_like(bt)
    ltwo = jnp.zeros_like(bt)
    lint0 = jnp.zeros_like(bt); lint1 = jnp.zeros_like(bt); lint2 = jnp.zeros_like(bt)
    for li, (start, count) in enumerate(cfg.lights):
        m_l = li_idx == li
        # bracket the per-light tri-area cdf (count form over A+1 entries)
        idx_t = jnp.zeros(bt.shape, jnp.int32)
        for j in range(cfg.a_cols):
            idx_t = idx_t + (ltricdf[li, j] <= ul0).astype(jnp.int32)
        o_t = jnp.clip(idx_t - 1, 0, cfg.a_cols - 2)
        cc0 = jnp.zeros_like(bt)
        cc1 = jnp.zeros_like(bt)
        for j in range(cfg.a_cols - 1):
            mj = o_t == j
            cc0 = jnp.where(mj, ltricdf[li, j], cc0)
            cc1 = jnp.where(mj, ltricdf[li, j + 1], cc1)
        off = jnp.where(m_l, o_t, off)
        c0 = jnp.where(m_l, cc0, c0)
        c1 = jnp.where(m_l, cc1, c1)
        larea = jnp.where(m_l, lattr[li, sa.LP_AREA], larea)
        ltwo = jnp.where(m_l, lattr[li, sa.LP_TWO_SIDED], ltwo)
        lint0 = jnp.where(m_l, lattr[li, sa.LP_I + 0], lint0)
        lint1 = jnp.where(m_l, lattr[li, sa.LP_I + 1], lint1)
        lint2 = jnp.where(m_l, lattr[li, sa.LP_I + 2], lint2)
        for j in range(count):
            mj = m_l & (off == j)
            row = start + j
            for k in range(3):
                lp0[k] = jnp.where(mj, tris[row, 0 + k], lp0[k])
                lp1[k] = jnp.where(mj, tris[row, 3 + k], lp1[k])
                lp2[k] = jnp.where(mj, tris[row, 6 + k], lp2[k])
                ln0[k] = jnp.where(mj, tris[row, 9 + k], ln0[k])
                ln1[k] = jnp.where(mj, tris[row, 12 + k], ln1[k])
                ln2[k] = jnp.where(mj, tris[row, 15 + k], ln2[k])
            lhasn = jnp.where(mj, tris[row, 24], lhasn)
            lrev = jnp.where(mj, tris[row, 27], lrev)
    u_remap = jnp.clip((ul0 - c0) / jnp.maximum(c1 - c0, 1e-12), 0.0, 1.0 - 1e-7)
    su0 = jnp.sqrt(u_remap)
    lb0 = 1.0 - su0
    lb1 = ul1 * su0
    lb2 = 1.0 - lb0 - lb1
    p_l = tuple(lb0 * lp0[k] + lb1 * lp1[k] + lb2 * lp2[k] for k in range(3))
    ng_l = _normalize(_cross(_sub(tuple(lp1), tuple(lp0)), _sub(tuple(lp2), tuple(lp0))), 1e-30)
    ns_l = tuple(lb0 * ln0[k] + lb1 * ln1[k] + lb2 * ln2[k] for k in range(3))
    ff_l = (lhasn > 0.5) & (_dot(ng_l, ns_l) < 0.0)
    ng_l = _where3(ff_l, _scale(ng_l, -1.0), ng_l)
    ng_l = _where3(lrev > 0.5, _scale(ng_l, -1.0), ng_l)
    to_a = _sub(p_l, p)
    d2a = jnp.maximum(_dot(to_a, to_a), 1e-12)
    inv_da = 1.0 / jnp.sqrt(d2a)
    wi_l3 = _scale(to_a, inv_da)  # world-space wi toward light
    cos_l = _dot(ng_l, _scale(wi_l3, -1.0))
    emits_l = (ltwo > 0.5) | (cos_l > 0.0)
    li_r = jnp.where(emits_l, lint0, 0.0)
    li_g = jnp.where(emits_l, lint1, 0.0)
    li_b = jnp.where(emits_l, lint2, 0.0)
    ls_pdf = d2a / jnp.maximum(jnp.abs(cos_l) * jnp.maximum(larea, 1e-12), 1e-12)
    ls_pdf = jnp.where(jnp.abs(cos_l) < 1e-7, 0.0, ls_pdf)

    # f and scattering pdf toward the light (matte lambert)
    wi_loc = (_dot(wi_l3, ss), _dot(wi_l3, ts), _dot(wi_l3, ns))
    reflect = _dot(wi_l3, ng) * _dot(wo, ng) > 0.0
    same_h = wi_loc[2] * wo_l[2] > 0.0
    f_on = reflect & same_h & ~kd_black
    abs_ci = jnp.abs(wi_loc[2])
    f_w = jnp.where(f_on, INV_PI * abs_ci, 0.0)  # f * |cos|, per-channel kd later
    scat_pdf = jnp.where(same_h & ~kd_black, abs_ci * INV_PI, 0.0)
    contrib_ok = (
        alive
        & ~kd_black
        & (ls_pdf > 0.0)
        & ((li_r > 0.0) | (li_g > 0.0) | (li_b > 0.0))
        & (f_w > 0.0)
    )

    # shadow ray + in-kernel any-hit (scene_intersect_p dense path)
    p_sh = _offset_ray_origin(p, p_err, ng, wi_l3)
    delta_sh = _sub(p_l, p_sh)
    dist_sh = jnp.sqrt(_dot(delta_sh, delta_sh))
    sh_d = _scale(delta_sh, 1.0 / jnp.maximum(dist_sh, 1e-12))
    occluded = _any_sweep(n_tri, tris, p_sh, sh_d, dist_sh * (1.0 - 1e-3))

    w_light = _power_heuristic(ls_pdf, scat_pdf)
    inv_pdf = w_light / jnp.maximum(ls_pdf * sel_pdf, 1e-12)
    add = contrib_ok & ~occluded
    nee_gain = jnp.where(add, f_w * inv_pdf, 0.0)
    Lrad[0] = Lrad[0] + beta[0] * kd0 * li_r * nee_gain
    Lrad[1] = Lrad[1] + beta[1] * kd1 * li_g * nee_gain
    Lrad[2] = Lrad[2] + beta[2] * kd2 * li_b * nee_gain

    # ---- BSDF sample: cosine hemisphere (bsdf_sample lambert path) ----
    dxs, dys = _concentric_disk(dims[3], dims[4])
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - dxs * dxs - dys * dys))
    sgn = jnp.where(jnp.where(wo_l[2] == 0.0, 1.0, wo_l[2]) > 0.0, 1.0, -1.0)
    wi_s = _normalize((dxs * sgn, dys * sgn, z * sgn))
    # pdf only when wo/wi share the shading hemisphere (_lobe_pdf)
    same_h_s = wi_s[2] * wo_l[2] > 0.0
    pdf_s = jnp.where(kd_black | ~same_h_s, 0.0, jnp.abs(wi_s[2]) * INV_PI)
    # f = kd/pi (same hemisphere by construction)
    ok = (pdf_s > 0.0) & ~kd_black
    wi_w = (
        wi_s[0] * ss[0] + wi_s[1] * ts[0] + wi_s[2] * ns[0],
        wi_s[0] * ss[1] + wi_s[1] * ts[1] + wi_s[2] * ns[1],
        wi_s[0] * ss[2] + wi_s[1] * ts[2] + wi_s[2] * ns[2],
    )
    cos_wi = jnp.abs(_dot(wi_w, ns))
    upd = alive & ok
    scale_b = jnp.where(upd, INV_PI * cos_wi / jnp.maximum(pdf_s, 1e-12), 1.0)
    kd_sel = _where3(upd, kd, (jnp.ones_like(bt),) * 3)
    beta = (beta[0] * kd_sel[0] * scale_b, beta[1] * kd_sel[1] * scale_b,
            beta[2] * kd_sel[2] * scale_b)
    alive = alive & ok
    prev_pdf = jnp.where(alive, pdf_s, prev_pdf)

    o_next = _offset_ray_origin(p, p_err, ng, wi_w)
    o = _where3(alive, o_next, o)
    d = _where3(alive, wi_w, d)

    # ---- Russian roulette after bounce 3 (path.rs:253-262) ----
    if rr_active:
        rr_max = jnp.maximum(jnp.maximum(beta[0], beta[1]), beta[2])
        q = jnp.maximum(0.05, 1.0 - rr_max)
        consider = (rr_max < rr_threshold) & alive
        kill = consider & (dims[6] < q)
        inv_keep = 1.0 / jnp.maximum(1.0 - q, 1e-6)
        keep_scale = jnp.where(consider & ~kill, inv_keep, 1.0)
        beta = (beta[0] * keep_scale, beta[1] * keep_scale, beta[2] * keep_scale)
        alive = alive & ~kill

    ox_o[...], oy_o[...], oz_o[...] = o
    dx_o[...], dy_o[...], dz_o[...] = d
    bxr_o[...], bxg_o[...], bxb_o[...] = beta
    lr_o[...], lg_o[...], lb_o[...] = Lrad
    alive_o[...] = alive.astype(jnp.int32)
    ppdf_o[...] = prev_pdf


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "first_bounce", "rr_active", "emit_only", "rr_threshold",
        "dim_row0", "n_bits", "interpret",
    ),
)
def _bounce_call(
    lanes, idx2, tris, lattr, lsel, ltricdf, mattr, smats,
    cfg: MegaCfg, first_bounce: bool, rr_active: bool, emit_only: bool,
    rr_threshold: float, dim_row0: int, n_bits: int, interpret: bool = False,
):
    rows = lanes[0].shape[0]
    spec = pl.BlockSpec((SUB, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    tbl = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM)
    f = jax.ShapeDtypeStruct((rows, LANE), jnp.float32)
    i32 = jax.ShapeDtypeStruct((rows, LANE), jnp.int32)
    outs = [f] * 12 + [i32, f]
    return pl.pallas_call(
        partial(
            _bounce_kernel, cfg, first_bounce, rr_active, emit_only,
            rr_threshold, dim_row0, n_bits,
        ),
        interpret=interpret,
        grid=(rows // SUB,),
        in_specs=[spec] * (14 + 2)
        + [tbl(tris), tbl(lattr), tbl(lsel), tbl(ltricdf), tbl(mattr), tbl(smats)],
        out_specs=[spec] * len(outs),
        out_shape=outs,
    )(*lanes, *idx2, tris, lattr, lsel, ltricdf, mattr, smats)


def mega_radiance(scene, cfg: MegaCfg, pcfg, idx_hi, idx_lo, dim0: int,
                  n_bits: int, ray_o, ray_d):
    """Full path-radiance estimate via the bounce megakernel.

    idx_hi/idx_lo: (N,) u32 Sobol' global sample index (SampleCtx
    global_index); dim0: first bounce dimension (path.DIM_CAMERA); n_bits:
    static index-width bound (32 when spp << 2*log2res fits u32).
    Returns (N, 3) L."""
    from .pallas_intersect import pack_tri_attr
    from . import lowdiscrepancy as ld
    from . import sampling as smp

    n = ray_o.shape[0]
    n_pad = -(-n // TILE) * TILE
    rows = n_pad // LANE

    def prep(v):
        return jnp.pad(v, (0, n_pad - n)).reshape(rows, LANE)

    def prep_i(v):
        return jnp.pad(v, (0, n_pad - n)).reshape(rows, LANE)

    zero = jnp.zeros(n, jnp.float32)
    one = jnp.ones(n, jnp.float32)
    lanes = [
        prep(ray_o[:, 0]), prep(ray_o[:, 1]), prep(ray_o[:, 2]),
        prep(ray_d[:, 0]), prep(ray_d[:, 1]), prep(ray_d[:, 2]),
        prep(one), prep(one), prep(one),          # beta
        prep(zero), prep(zero), prep(zero),       # L
        prep_i(jnp.ones(n, jnp.int32)),           # alive
        prep(one),                                # prev_pdf
    ]

    tris = pack_tri_attr(scene.tri_attr)
    lattr = scene.light_attr
    # light-selection power distribution (path._light_select_dist)
    dist = smp.make_distribution_1d(scene.light_power)
    Lc = scene.n_lights
    sel_pdf_vec = dist.func / jnp.maximum(dist.func_int * Lc, 1e-30)
    lsel = jnp.zeros((2, Lc + 1), jnp.float32)
    lsel = lsel.at[0].set(dist.cdf)
    lsel = lsel.at[1, :Lc].set(sel_pdf_vec)
    ltricdf = scene.alight_tri_cdf
    mattr = scene.mat_attr

    dpb = 7  # DIMS_PER_BOUNCE (no SSS by eligibility)
    # per-bounce Sobol' direction numbers, resident in VMEM (rows
    # dim0 .. dim0 + 7*max_depth of the global matrix table)
    smats = jax.lax.dynamic_slice_in_dim(
        ld.SOBOL_MATRICES_32, dim0, max(dpb * pcfg.max_depth, 1), axis=0
    )
    idx2 = [prep_i(jnp.asarray(idx_hi, jnp.uint32)),
            prep_i(jnp.asarray(idx_lo, jnp.uint32))]
    for bounce in range(pcfg.max_depth):
        outs = _bounce_call(
            lanes, idx2, tris, lattr, lsel, ltricdf, mattr, smats,
            cfg, bounce == 0, bounce > 2, False, float(pcfg.rr_threshold),
            bounce * dpb, n_bits, interpret_enabled(),
        )
        lanes = list(outs)
    # final emit-only pass (consumes no dims)
    outs = _bounce_call(
        lanes, idx2, tris, lattr, lsel, ltricdf, mattr, smats,
        cfg, pcfg.max_depth == 0, False, True, float(pcfg.rr_threshold),
        0, n_bits, interpret_enabled(),
    )
    lr, lg, lb = outs[9], outs[10], outs[11]
    return jnp.stack(
        [lr.reshape(-1)[:n], lg.reshape(-1)[:n], lb.reshape(-1)[:n]], axis=-1
    )
