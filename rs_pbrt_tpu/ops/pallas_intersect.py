"""Pallas TPU kernel: dense ray-triangle closest-hit sweep.

The XLA lowering of the (R,T) brute-force sweep (ops/intersect.py) splits
into multiple fusions with (R,T) intermediates round-tripping through HBM
(~22ms per bounce at 262k rays x 32 tris).  This kernel keeps the whole
watertight test in VMEM/registers: rays stream through the grid as (8,128)
tiles, triangle rows load once per grid step, and the running best hit is
carried in registers — HBM traffic is exactly rays-in + hits-out.

Same math as ops/intersect.intersect_tri (reference triangle.rs:134-449
watertight algorithm with conservative error bounds).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import vecmath as vm
from .intersect import TriHit

LANE = 128
SUB = 64
TILE = SUB * LANE  # rays per grid step
BIG = np.float32(3e38)

def interpret_enabled() -> bool:
    """CPU interpret mode so the kernels are unit-testable off-chip
    (tests/test_pallas.py scopes this env var via a fixture); real runs
    never set it.  Read at call time and threaded as a STATIC jit arg so
    flipping the env cannot alias a stale compiled executable."""
    return os.environ.get("RS_PBRT_PALLAS_INTERPRET", "") not in ("", "0")


def _ray_constants(ox, oy, oz, dx, dy, dz):
    """Per-ray shear-permutation as a 3x3 matrix + origin offset, computed
    ONCE per ray tile.  Equivalent to the reference's permute+shear
    (triangle.rs:154-222): rows are
      S_x = onehot(kx) + sx * onehot(kz)
      S_y = onehot(ky) + sy * onehot(kz)
      S_z = onehot(kz)            (z scaling by inv_dz applied separately)
    Shared vertices transform identically for a given ray, so adjacency
    watertightness is preserved."""
    adx, ady, adz = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)
    use_x = (adx >= ady) & (adx >= adz)
    use_y = (~use_x) & (ady >= adz)
    use_z = ~(use_x | use_y)
    zero = jnp.zeros_like(dx)
    one = jnp.ones_like(dx)
    # onehot rows for kz / kx / ky  (kx = kz+1 mod 3, ky = kx+1 mod 3)
    hz = (jnp.where(use_x, one, zero), jnp.where(use_y, one, zero), jnp.where(use_z, one, zero))
    hx = (hz[2], hz[0], hz[1])  # kz=0->kx=1? careful: kx=kz+1: onehot shifts
    hy = (hz[1], hz[2], hz[0])
    # kz=0 -> kx=1: hx = e1 when kz=0 -> hx components: (0,1,0) = shift of hz
    dzp = hz[0] * dx + hz[1] * dy + hz[2] * dz
    dxp = hx[0] * dx + hx[1] * dy + hx[2] * dz
    dyp = hy[0] * dx + hy[1] * dy + hy[2] * dz
    inv_dz = 1.0 / dzp
    sx = -dxp * inv_dz
    sy = -dyp * inv_dz
    # S rows (3 components each)
    Sx = (hx[0] + sx * hz[0], hx[1] + sx * hz[1], hx[2] + sx * hz[2])
    Sy = (hy[0] + sy * hz[0], hy[1] + sy * hz[1], hy[2] + sy * hz[2])
    Sz = hz
    cx = Sx[0] * ox + Sx[1] * oy + Sx[2] * oz
    cy = Sy[0] * ox + Sy[1] * oy + Sy[2] * oz
    cz = Sz[0] * ox + Sz[1] * oy + Sz[2] * oz
    return Sx, Sy, Sz, cx, cy, cz, inv_dz


def _watertight_tri(rc, p0x, p0y, p0z, p1x, p1y, p1z, p2x, p2y, p2z, t_lim):
    """One triangle (scalars) vs a ray tile, given precomputed ray
    constants.  All-FMA inner loop (no per-pair int selects / divides except
    the final inv_det)."""
    Sx, Sy, Sz, cx, cy, cz, inv_dz = rc

    def xform(px, py, pz):
        x = Sx[0] * px + Sx[1] * py + Sx[2] * pz - cx
        y = Sy[0] * px + Sy[1] * py + Sy[2] * pz - cy
        z = Sz[0] * px + Sz[1] * py + Sz[2] * pz - cz
        return x, y, z

    x0, y0, z0 = xform(p0x, p0y, p0z)
    x1, y1, z1 = xform(p1x, p1y, p1z)
    x2, y2, z2 = xform(p2x, p2y, p2z)

    e0 = x1 * y2 - y1 * x2
    e1 = x2 * y0 - y2 * x0
    e2 = x0 * y1 - y0 * x1
    neg = (e0 < 0) | (e1 < 0) | (e2 < 0)
    pos = (e0 > 0) | (e1 > 0) | (e2 > 0)
    det = e0 + e1 + e2

    z0s = inv_dz * z0
    z1s = inv_dz * z1
    z2s = inv_dz * z2
    t_scaled = e0 * z0s + e1 * z1s + e2 * z2s
    # boolean select via logic ops (Mosaic can't select between i1 vectors)
    neg_det = det < 0.0
    miss_range = (neg_det & ((t_scaled >= 0.0) | (t_scaled < t_lim * det))) | (
        (~neg_det) & ((t_scaled <= 0.0) | (t_scaled > t_lim * det))
    )
    inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
    b0 = e0 * inv_det
    b1 = e1 * inv_det
    t = t_scaled * inv_det

    max_zt = jnp.maximum(jnp.maximum(jnp.abs(z0s), jnp.abs(z1s)), jnp.abs(z2s))
    delta_z = vm.gamma(3.0) * max_zt
    max_xt = jnp.maximum(jnp.maximum(jnp.abs(x0), jnp.abs(x1)), jnp.abs(x2))
    max_yt = jnp.maximum(jnp.maximum(jnp.abs(y0), jnp.abs(y1)), jnp.abs(y2))
    delta_x = vm.gamma(5.0) * (max_xt + max_zt)
    delta_y = vm.gamma(5.0) * (max_yt + max_zt)
    delta_e = 2.0 * (vm.gamma(2.0) * max_xt * max_yt + delta_y * max_xt + delta_x * max_yt)
    max_e = jnp.maximum(jnp.maximum(jnp.abs(e0), jnp.abs(e1)), jnp.abs(e2))
    delta_t = (
        3.0 * (vm.gamma(3.0) * max_e * max_zt + delta_e * max_zt + delta_z * max_e)
        * jnp.abs(inv_det)
    )
    hit = ~((neg & pos) | (det == 0.0) | miss_range | (t <= delta_t))
    return hit, t, b0, b1


UNROLL = 8  # triangles per fori_loop iteration (ILP; no carried t_lim dep)


def _sweep_kernel(n_tri: int, ox, oy, oz, dx, dy, dz, tmax, tris, bt_o, bi_o, b0_o, b1_o):
    oxv, oyv, ozv = ox[...], oy[...], oz[...]
    dxv, dyv, dzv = dx[...], dy[...], dz[...]
    tmv = tmax[...]
    rc = _ray_constants(oxv, oyv, ozv, dxv, dyv, dzv)

    def one(t, bt, bi, b0, b1):
        hit, tval, tb0, tb1 = _watertight_tri(
            rc,
            tris[t, 0], tris[t, 1], tris[t, 2],
            tris[t, 3], tris[t, 4], tris[t, 5],
            tris[t, 6], tris[t, 7], tris[t, 8],
            tmv,
        )
        upd = hit & (tval < bt)
        return (
            jnp.where(upd, tval, bt),
            jnp.where(upd, t, bi),
            jnp.where(upd, tb0, b0),
            jnp.where(upd, tb1, b1),
        )

    init = (
        jnp.full(oxv.shape, BIG, jnp.float32),
        jnp.full(oxv.shape, -1, jnp.int32),
        jnp.zeros(oxv.shape, jnp.float32),
        jnp.zeros(oxv.shape, jnp.float32),
    )
    n_pad = -(-n_tri // UNROLL) * UNROLL

    if n_pad <= 64:
        # full static unroll: all addresses constant-folded
        bt, bi, b0, b1 = init
        for t in range(n_tri):
            bt, bi, b0, b1 = one(t, bt, bi, b0, b1)
    else:
        def body(i, state):
            bt, bi, b0, b1 = state
            base = i * UNROLL
            for k in range(UNROLL):
                bt, bi, b0, b1 = one(base + k, bt, bi, b0, b1)
            return bt, bi, b0, b1

        bt, bi, b0, b1 = jax.lax.fori_loop(0, n_pad // UNROLL, body, init)
    bt_o[...] = bt
    bi_o[...] = bi
    b0_o[...] = b0
    b1_o[...] = b1


@partial(jax.jit, static_argnames=("n_tri", "interpret"))
def _sweep(ox, oy, oz, dx, dy, dz, tmax, tris, n_tri: int, interpret: bool = False):
    rows = ox.shape[0]
    grid = (rows // SUB,)
    ray_spec = pl.BlockSpec((SUB, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((tris.shape[0], tris.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((SUB, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((rows, LANE), jnp.float32)
    shp_i = jax.ShapeDtypeStruct((rows, LANE), jnp.int32)
    return pl.pallas_call(
        partial(_sweep_kernel, n_tri),
        interpret=interpret,
        grid=grid,
        in_specs=[ray_spec] * 7 + [tri_spec],
        out_specs=[out_spec] * 4,
        out_shape=[shp, shp_i, shp, shp],
    )(ox, oy, oz, dx, dy, dz, tmax, tris)


def pack_tris(p0, p1, p2):
    """Host/trace-time packing of triangle SoA into the kernel table
    (rows padded to the unroll factor; zero rows give det==0 -> miss)."""
    t = p0.shape[0]
    t_pad = -(-t // UNROLL) * UNROLL
    tris = jnp.concatenate(
        [p0, p1, p2, jnp.zeros((t, 7), jnp.float32)], axis=1
    )  # (T, 16)
    return jnp.pad(tris, ((0, t_pad - t), (0, 0)))


def pallas_intersect_tris(o, d, t_max, p0, p1, p2, tris_packed=None):
    """Drop-in replacement for intersect.intersect_tris_brute on TPU."""
    r = o.shape[0]
    n_tri = p0.shape[0]
    r_pad = -(-r // TILE) * TILE
    rows = r_pad // LANE

    def prep(v):
        return jnp.pad(v, (0, r_pad - r)).reshape(rows, LANE)

    ox, oy, oz = prep(o[:, 0]), prep(o[:, 1]), prep(o[:, 2])
    dx, dy, dz = prep(d[:, 0]), prep(d[:, 1]), prep(d[:, 2])
    # padded lanes have degenerate dir (0,0,0): inv_dz = inf -> guaranteed miss
    tm = prep(jnp.asarray(t_max, jnp.float32))

    tris = tris_packed if tris_packed is not None else pack_tris(p0, p1, p2)
    bt, bi, b0, b1 = _sweep(ox, oy, oz, dx, dy, dz, tm, tris, n_tri, interpret_enabled())

    bt = bt.reshape(-1)[:r]
    bi = bi.reshape(-1)[:r]
    b0 = b0.reshape(-1)[:r]
    b1 = b1.reshape(-1)[:r]
    valid = bi >= 0
    return TriHit(valid, jnp.where(valid, bt, t_max), bi, b0, b1)


def _watertight_tri_any(rc, p0x, p0y, p0z, p1x, p1y, p1z, p2x, p2y, p2z, t_lim):
    """Occlusion-only variant of _watertight_tri: same edge/range tests but
    division-free (the t <= delta_t epsilon test is rescaled by |det|:
    t_scaled/det <= C|1/det|  <=>  t_scaled*sign(det) <= C), and no
    barycentrics.  ~30% fewer ops and no divide per ray-triangle pair."""
    Sx, Sy, Sz, cx, cy, cz, inv_dz = rc

    def xform(px, py, pz):
        x = Sx[0] * px + Sx[1] * py + Sx[2] * pz - cx
        y = Sy[0] * px + Sy[1] * py + Sy[2] * pz - cy
        z = Sz[0] * px + Sz[1] * py + Sz[2] * pz - cz
        return x, y, z

    x0, y0, z0 = xform(p0x, p0y, p0z)
    x1, y1, z1 = xform(p1x, p1y, p1z)
    x2, y2, z2 = xform(p2x, p2y, p2z)

    e0 = x1 * y2 - y1 * x2
    e1 = x2 * y0 - y2 * x0
    e2 = x0 * y1 - y0 * x1
    neg = (e0 < 0) | (e1 < 0) | (e2 < 0)
    pos = (e0 > 0) | (e1 > 0) | (e2 > 0)
    det = e0 + e1 + e2

    z0s = inv_dz * z0
    z1s = inv_dz * z1
    z2s = inv_dz * z2
    t_scaled = e0 * z0s + e1 * z1s + e2 * z2s
    neg_det = det < 0.0
    miss_range = (neg_det & ((t_scaled >= 0.0) | (t_scaled < t_lim * det))) | (
        (~neg_det) & ((t_scaled <= 0.0) | (t_scaled > t_lim * det))
    )

    max_zt = jnp.maximum(jnp.maximum(jnp.abs(z0s), jnp.abs(z1s)), jnp.abs(z2s))
    delta_z = vm.gamma(3.0) * max_zt
    max_xt = jnp.maximum(jnp.maximum(jnp.abs(x0), jnp.abs(x1)), jnp.abs(x2))
    max_yt = jnp.maximum(jnp.maximum(jnp.abs(y0), jnp.abs(y1)), jnp.abs(y2))
    delta_x = vm.gamma(5.0) * (max_xt + max_zt)
    delta_y = vm.gamma(5.0) * (max_yt + max_zt)
    delta_e = 2.0 * (vm.gamma(2.0) * max_xt * max_yt + delta_y * max_xt + delta_x * max_yt)
    max_e = jnp.maximum(jnp.maximum(jnp.abs(e0), jnp.abs(e1)), jnp.abs(e2))
    c_eps = 3.0 * (vm.gamma(3.0) * max_e * max_zt + delta_e * max_zt + delta_z * max_e)
    t_signed = jnp.where(neg_det, -t_scaled, t_scaled)
    return ~((neg & pos) | (det == 0.0) | miss_range | (t_signed <= c_eps))


def _any_kernel(n_tri: int, ox, oy, oz, dx, dy, dz, tmax, tris, hit_o):
    oxv, oyv, ozv = ox[...], oy[...], oz[...]
    dxv, dyv, dzv = dx[...], dy[...], dz[...]
    tmv = tmax[...]
    rc = _ray_constants(oxv, oyv, ozv, dxv, dyv, dzv)

    def one(t, occ):
        hit = _watertight_tri_any(
            rc,
            tris[t, 0], tris[t, 1], tris[t, 2],
            tris[t, 3], tris[t, 4], tris[t, 5],
            tris[t, 6], tris[t, 7], tris[t, 8],
            tmv,
        )
        # i32 carry: Mosaic can't thread i1 vectors through scf.for
        return occ | hit.astype(jnp.int32)

    occ = jnp.zeros(oxv.shape, jnp.int32)
    n_pad = -(-n_tri // UNROLL) * UNROLL
    if n_pad <= 64:
        for t in range(n_tri):
            occ = one(t, occ)
    else:
        def body(i, occ):
            base = i * UNROLL
            for k in range(UNROLL):
                occ = one(base + k, occ)
            return occ

        occ = jax.lax.fori_loop(0, n_pad // UNROLL, body, occ)
    hit_o[...] = occ


@partial(jax.jit, static_argnames=("n_tri", "interpret"))
def _sweep_any(ox, oy, oz, dx, dy, dz, tmax, tris, n_tri: int, interpret: bool = False):
    rows = ox.shape[0]
    grid = (rows // SUB,)
    ray_spec = pl.BlockSpec((SUB, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec(
        (tris.shape[0], tris.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec((SUB, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    shp_i = jax.ShapeDtypeStruct((rows, LANE), jnp.int32)
    return pl.pallas_call(
        partial(_any_kernel, n_tri),
        interpret=interpret,
        grid=grid,
        in_specs=[ray_spec] * 7 + [tri_spec],
        out_specs=[out_spec],
        out_shape=[shp_i],
    )(ox, oy, oz, dx, dy, dz, tmax, tris)[0]


def pallas_intersect_tris_p(o, d, t_max, p0, p1, p2, tris_packed=None):
    """Occlusion query (reference triangle.rs intersect_p :450): same
    watertight test, no hit record."""
    r = o.shape[0]
    n_tri = p0.shape[0]
    r_pad = -(-r // TILE) * TILE
    rows = r_pad // LANE

    def prep(v):
        return jnp.pad(v, (0, r_pad - r)).reshape(rows, LANE)

    ox, oy, oz = prep(o[:, 0]), prep(o[:, 1]), prep(o[:, 2])
    dx, dy, dz = prep(d[:, 0]), prep(d[:, 1]), prep(d[:, 2])
    tm = prep(jnp.asarray(t_max, jnp.float32))
    tris = tris_packed if tris_packed is not None else pack_tris(p0, p1, p2)
    occ = _sweep_any(ox, oy, oz, dx, dy, dz, tm, tris, n_tri, interpret_enabled())
    return occ.reshape(-1)[:r] != 0


# ---------------------------------------------------------------------------
# Fused sweep + hit-record kernel
# ---------------------------------------------------------------------------
# The two-step path (sweep kernel -> one-hot-gather record build in XLA)
# costs ~8ms/bounce of HBM traffic at 4M lanes: the (N,T) one-hot tensor and
# ~30 (N,3) elementwise intermediates round-trip through HBM.  Fusing the
# record build into the sweep keeps barycentrics and the winning triangle's
# attribute row in registers: HBM traffic drops to rays-in + records-out.
# Record math mirrors scene_intersect._tri_interaction exactly (reference
# triangle.rs:300-420 interaction construction).

_GAMMA7 = np.float32((7.0 * vm.MACHINE_EPSILON) / (1.0 - 7.0 * vm.MACHINE_EPSILON))

# tri_attr column indices the kernel consumes (scene/arrays.py TA_*):
# 0:9 p0 p1 p2, 9:18 n0 n1 n2, 18:24 uv0 uv1 uv2, 24 has_n, 25 mat,
# 26 light, 27 reverse
_N_REC_COLS = 28


def _full_kernel(n_tri: int, ox, oy, oz, dx, dy, dz, tmax, tris,
                 t_o, prim_o, px_o, py_o, pz_o, pex_o, pey_o, pez_o,
                 ngx_o, ngy_o, ngz_o, nsx_o, nsy_o, nsz_o,
                 u_o, v_o, dux_o, duy_o, duz_o, mat_o, light_o):
    oxv, oyv, ozv = ox[...], oy[...], oz[...]
    dxv, dyv, dzv = dx[...], dy[...], dz[...]
    tmv = tmax[...]
    rc = _ray_constants(oxv, oyv, ozv, dxv, dyv, dzv)

    def one(t, bt, bi, b0, b1):
        hit, tval, tb0, tb1 = _watertight_tri(
            rc,
            tris[t, 0], tris[t, 1], tris[t, 2],
            tris[t, 3], tris[t, 4], tris[t, 5],
            tris[t, 6], tris[t, 7], tris[t, 8],
            tmv,
        )
        upd = hit & (tval < bt)
        return (
            jnp.where(upd, tval, bt),
            jnp.where(upd, t, bi),
            jnp.where(upd, tb0, b0),
            jnp.where(upd, tb1, b1),
        )

    init = (
        jnp.full(oxv.shape, BIG, jnp.float32),
        jnp.full(oxv.shape, -1, jnp.int32),
        jnp.zeros(oxv.shape, jnp.float32),
        jnp.zeros(oxv.shape, jnp.float32),
    )
    n_pad = -(-n_tri // UNROLL) * UNROLL
    if n_pad <= 64:
        bt, bi, b0, b1 = init
        for t in range(n_tri):
            bt, bi, b0, b1 = one(t, bt, bi, b0, b1)
    else:
        def body(i, state):
            bt, bi, b0, b1 = state
            base = i * UNROLL
            for k in range(UNROLL):
                bt, bi, b0, b1 = one(base + k, bt, bi, b0, b1)
            return bt, bi, b0, b1

        bt, bi, b0, b1 = jax.lax.fori_loop(0, n_pad // UNROLL, body, init)

    # ---- fetch the winning triangle's attribute row (select-accumulate:
    # per-lane dynamic gathers don't vectorize on TPU; a masked sweep over
    # the (small) table does) ----
    zero = jnp.zeros(oxv.shape, jnp.float32)
    if n_tri <= 64:
        at = [zero] * _N_REC_COLS
        for t in range(n_tri):
            m = bi == t
            for c in range(_N_REC_COLS):
                at[c] = jnp.where(m, tris[t, c], at[c])
        at = tuple(at)
    else:
        def fetch(i, at):
            t = i  # one triangle per step (attr fetch is cheap vs the sweep)
            m = bi == t
            return tuple(
                jnp.where(m, tris[t, c], at[c]) for c in range(_N_REC_COLS)
            )

        at = jax.lax.fori_loop(0, n_tri, fetch, tuple([zero] * _N_REC_COLS))

    p0 = at[0:3]; p1 = at[3:6]; p2 = at[6:9]
    n0 = at[9:12]; n1 = at[12:15]; n2 = at[15:18]
    uv0 = at[18:20]; uv1 = at[20:22]; uv2 = at[22:24]
    has_n_f, mat_f, light_f, rev_f = at[24], at[25], at[26], at[27]

    b2 = 1.0 - b0 - b1
    p = tuple(b0 * p0[k] + b1 * p1[k] + b2 * p2[k] for k in range(3))
    p_err = tuple(
        _GAMMA7 * (jnp.abs(b0 * p0[k]) + jnp.abs(b1 * p1[k]) + jnp.abs(b2 * p2[k]))
        for k in range(3)
    )
    # geometric normal = normalize(cross(p0-p2, p1-p2))
    e02 = tuple(p0[k] - p2[k] for k in range(3))
    e12 = tuple(p1[k] - p2[k] for k in range(3))
    ngx = e02[1] * e12[2] - e02[2] * e12[1]
    ngy = e02[2] * e12[0] - e02[0] * e12[2]
    ngz = e02[0] * e12[1] - e02[1] * e12[0]
    ng_len = jnp.sqrt(jnp.maximum(ngx * ngx + ngy * ngy + ngz * ngz, 1e-30))
    ngx, ngy, ngz = ngx / ng_len, ngy / ng_len, ngz / ng_len
    # shading normal: interpolated vertex normals when present
    nsx = b0 * n0[0] + b1 * n1[0] + b2 * n2[0]
    nsy = b0 * n0[1] + b1 * n1[1] + b2 * n2[1]
    nsz = b0 * n0[2] + b1 * n1[2] + b2 * n2[2]
    ns_len = jnp.sqrt(nsx * nsx + nsy * nsy + nsz * nsz)
    has_n = (has_n_f > 0.5) & (ns_len > 1e-8)
    inv_nsl = 1.0 / jnp.maximum(ns_len, 1e-8)
    nsx = jnp.where(has_n, nsx * inv_nsl, ngx)
    nsy = jnp.where(has_n, nsy * inv_nsl, ngy)
    nsz = jnp.where(has_n, nsz * inv_nsl, ngz)
    rev = rev_f > 0.5
    nsx = jnp.where(rev, -nsx, nsx)
    nsy = jnp.where(rev, -nsy, nsy)
    nsz = jnp.where(rev, -nsz, nsz)
    # ng: face-forward to ns when vertex normals exist, else reverse flip
    ff = (ngx * nsx + ngy * nsy + ngz * nsz) < 0.0
    flip_ng = (has_n & ff) | ((~has_n) & rev)
    ngx = jnp.where(flip_ng, -ngx, ngx)
    ngy = jnp.where(flip_ng, -ngy, ngy)
    ngz = jnp.where(flip_ng, -ngz, ngz)
    # uv + dpdu from the uv parameterization (triangle.rs:300-330)
    u = b0 * uv0[0] + b1 * uv1[0] + b2 * uv2[0]
    v = b0 * uv0[1] + b1 * uv1[1] + b2 * uv2[1]
    duv02 = (uv0[0] - uv2[0], uv0[1] - uv2[1])
    duv12 = (uv1[0] - uv2[0], uv1[1] - uv2[1])
    det_uv = duv02[0] * duv12[1] - duv02[1] * duv12[0]
    inv_det_uv = jnp.where(
        jnp.abs(det_uv) < 1e-12, 0.0, 1.0 / jnp.where(det_uv == 0.0, 1.0, det_uv)
    )
    dux = (duv12[1] * e02[0] - duv02[1] * e12[0]) * inv_det_uv
    duy = (duv12[1] * e02[1] - duv02[1] * e12[1]) * inv_det_uv
    duz = (duv12[1] * e02[2] - duv02[1] * e12[2]) * inv_det_uv
    degen = dux * dux + duy * duy + duz * duz < 1e-16
    # coordinate_system(ng) fallback (geometry.rs branch on |x|>|y|)
    use_a = jnp.abs(ngx) > jnp.abs(ngy)
    inv_fa = 1.0 / jnp.sqrt(jnp.maximum(ngx * ngx + ngz * ngz, 1e-20))
    inv_fb = 1.0 / jnp.sqrt(jnp.maximum(ngy * ngy + ngz * ngz, 1e-20))
    fbx = jnp.where(use_a, -ngz * inv_fa, 0.0)
    fby = jnp.where(use_a, 0.0, ngz * inv_fb)
    fbz = jnp.where(use_a, ngx * inv_fa, -ngy * inv_fb)
    dux = jnp.where(degen, fbx, dux)
    duy = jnp.where(degen, fby, duy)
    duz = jnp.where(degen, fbz, duz)

    miss = bi < 0
    t_o[...] = jnp.where(miss, tmv, bt)
    prim_o[...] = bi
    px_o[...] = p[0]; py_o[...] = p[1]; pz_o[...] = p[2]
    pex_o[...] = p_err[0]; pey_o[...] = p_err[1]; pez_o[...] = p_err[2]
    ngx_o[...] = ngx; ngy_o[...] = ngy; ngz_o[...] = ngz
    nsx_o[...] = nsx; nsy_o[...] = nsy; nsz_o[...] = nsz
    u_o[...] = u; v_o[...] = v
    dux_o[...] = dux; duy_o[...] = duy; duz_o[...] = duz
    mat_o[...] = jnp.where(miss, 0, (mat_f + 0.5).astype(jnp.int32))
    light_o[...] = jnp.where(
        miss, -1, (light_f + jnp.where(light_f < 0.0, -0.5, 0.5)).astype(jnp.int32)
    )


@partial(jax.jit, static_argnames=("n_tri", "interpret"))
def _sweep_full(ox, oy, oz, dx, dy, dz, tmax, tris, n_tri: int, interpret: bool = False):
    rows = ox.shape[0]
    grid = (rows // SUB,)
    ray_spec = pl.BlockSpec((SUB, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec(
        (tris.shape[0], tris.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec((SUB, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    f = jax.ShapeDtypeStruct((rows, LANE), jnp.float32)
    i = jax.ShapeDtypeStruct((rows, LANE), jnp.int32)
    outs = [f, i] + [f] * 17 + [i, i]
    return pl.pallas_call(
        partial(_full_kernel, n_tri),
        interpret=interpret,
        grid=grid,
        in_specs=[ray_spec] * 7 + [tri_spec],
        out_specs=[out_spec] * len(outs),
        out_shape=outs,
    )(ox, oy, oz, dx, dy, dz, tmax, tris)


def pack_tri_attr(tri_attr):
    """Pad the scene's (T, 32) tri_attr table to the kernel row multiple.
    Padding rows are all-zero: degenerate triangles (det==0 for every ray)
    that can never win the sweep."""
    t = tri_attr.shape[0]
    t_pad = -(-t // UNROLL) * UNROLL
    return jnp.pad(jnp.asarray(tri_attr, jnp.float32), ((0, t_pad - t), (0, 0)))


def pallas_intersect_tris_full(o, d, t_max, tri_attr, n_tri: int):
    """Fused closest-hit + interaction record.  Returns a dict of flat
    (N,...) arrays matching scene_intersect._tri_interaction's outputs plus
    (valid, t, prim)."""
    r = o.shape[0]
    r_pad = -(-r // TILE) * TILE
    rows = r_pad // LANE

    def prep(vv):
        return jnp.pad(vv, (0, r_pad - r)).reshape(rows, LANE)

    ox, oy, oz = prep(o[:, 0]), prep(o[:, 1]), prep(o[:, 2])
    dx, dy, dz = prep(d[:, 0]), prep(d[:, 1]), prep(d[:, 2])
    tm = prep(jnp.asarray(t_max, jnp.float32))
    tris = pack_tri_attr(tri_attr)
    outs = _sweep_full(ox, oy, oz, dx, dy, dz, tm, tris, n_tri, interpret_enabled())
    flat = [x.reshape(-1)[:r] for x in outs]
    (t, prim, px, py, pz, pex, pey, pez, ngx, ngy, ngz, nsx, nsy, nsz,
     u, v, dux, duy, duz, mat, light) = flat
    pack3 = lambda a, b, c: jnp.stack([a, b, c], axis=-1)
    return dict(
        valid=prim >= 0,
        t=t,
        prim=prim,
        p=pack3(px, py, pz),
        p_err=pack3(pex, pey, pez),
        ng=pack3(ngx, ngy, ngz),
        ns=pack3(nsx, nsy, nsz),
        uv=jnp.stack([u, v], axis=-1),
        dpdu=pack3(dux, duy, duz),
        mat=mat,
        light=light,
    )
