"""Bidirectional path tracing, TPU-native.

Replacement for reference src/integrators/bdpt.rs (2474 LoC).  The
reference's Vec<Vertex> subpaths (bdpt.rs:950-976) become fixed-size SoA
vertex arrays (N, D, ...) per lane; the (s,t) strategy double loop
(bdpt.rs:993-1041) is a static python loop over masked lanes; t=1
strategies splat through Film.splat exactly like the reference's
film.add_splat (bdpt.rs:1038).

MIS uses the reference's remapped-pdf formulation (mis_weight
bdpt.rs:1505): walk the full path outward from the connection with
pdf_rev/pdf_fwd ratios, with the connection-endpoint pdf overrides computed
explicitly (the functional analogue of the reference's ScopedAssignment
temporaries).

Scope notes vs the reference: infinite-light (env) strategies are
implemented (escaped camera vertices, env light subpaths, env s=1 samples
— bdpt.rs:549-583 semantics with solid-angle densities at env vertices);
medium vertices are masked out; delta lights are handled (no s=0).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import bsdf as bx
from ...ops import sampling as smp
from ...ops import scene_intersect as si
from ...scene import arrays as sa
from .. import cameras as cam
from .. import lights as lt
from .. import samplers as smpl
from ...utils import vecmath as vm
from .path import _light_select_dist, _shading_frame, _shading_frame_du, _to_local, _to_world

VT_CAMERA = 0
VT_LIGHT = 1
VT_SURFACE = 2

# sentinel in Subpath.light for a camera-subpath vertex on the environment
# sphere (reference bdpt.rs: escaped rays become light vertices at infinity,
# random_walk :1237 + capture_infinite_lights).  Pdf convention follows the
# reference: densities AT an env vertex stay in SOLID-ANGLE measure
# (convert_density is skipped for vertices at infinity).
ENV_LIGHT = -2


class Subpath(NamedTuple):
    """SoA vertex storage; slot 0 is the endpoint (camera/light)."""

    p: jnp.ndarray  # (N, D, 3)
    ns: jnp.ndarray  # (N, D, 3)
    ng: jnp.ndarray  # (N, D, 3)
    wo: jnp.ndarray  # (N, D, 3) direction toward the PREVIOUS vertex
    beta: jnp.ndarray  # (N, D, 3)
    mat: jnp.ndarray  # (N, D)
    light: jnp.ndarray  # (N, D) area light id at the vertex (-1)
    pdf_fwd: jnp.ndarray  # (N, D) area-measure forward pdf
    pdf_rev: jnp.ndarray  # (N, D) area-measure reverse pdf
    delta: jnp.ndarray  # (N, D) bool: specular vertex
    vtype: jnp.ndarray  # (N, D)
    valid: jnp.ndarray  # (N, D)
    count: jnp.ndarray  # (N,) number of valid vertices


def _empty_subpath(n, depth):
    z3 = jnp.zeros((n, depth, 3), jnp.float32)
    z1 = jnp.zeros((n, depth), jnp.float32)
    zi = jnp.zeros((n, depth), jnp.int32)
    zb = jnp.zeros((n, depth), bool)
    return Subpath(z3, z3, z3, z3, z3, zi, zi - 1, z1, z1, zb, zi, zb, jnp.zeros(n, jnp.int32))


def _set(path: Subpath, slot: int, mask, **kw):
    """Write vertex fields at static slot for masked lanes."""
    upd = {}
    for k, v in kw.items():
        cur = getattr(path, k)
        m = mask[:, None] if cur.ndim == 3 else mask
        upd[k] = cur.at[:, slot].set(jnp.where(m, v, cur[:, slot]))
    return path._replace(**upd)


def _convert_density(pdf_solid, p_from, p_to, n_to):
    """Solid angle -> area measure (reference bdpt.rs convert_density)."""
    d = p_to - p_from
    d2 = jnp.maximum(vm.length_squared(d), 1e-12)
    w = d / jnp.sqrt(d2)[..., None]
    cos = jnp.abs(vm.dot(n_to, w))
    return pdf_solid * cos / d2


def _remap0(x):
    """reference bdpt.rs remap0: 0 -> 1 for the MIS ratio products."""
    return jnp.where(x > 0.0, x, 1.0)


def _walk(scene, cfg_s, ctx, o0, d0, beta0, pdf_dir0, max_verts, dim_base, accel,
          start: Subpath, mode_importance: bool, prev0_env=None):
    """Random walk filling slots 1.. of `start` (slot 0 pre-filled).

    reference bdpt.rs random_walk :1237.  In camera mode with an env map,
    escaped rays append an ENV_LIGHT vertex on the world sphere whose
    pdf_fwd stays in solid-angle measure.  prev0_env: mask that slot 0 is
    an env light origin (its pdf_rev write skips area conversion)."""
    path = start
    n = o0.shape[0]
    o, d = o0, d0
    beta = beta0
    pdf_fwd_solid = pdf_dir0
    alive = jnp.any(beta > 0, axis=-1) & (pdf_dir0 > 0)
    prev_p = path.p[:, 0]
    prev_ns = path.ns[:, 0]

    for slot in range(1, max_verts):
        it = si.scene_intersect(scene, o, d, jnp.full(n, vm.INFINITY), accel)
        hit = it.valid & alive
        pdf_area = _convert_density(pdf_fwd_solid, prev_p, it.p, it.ns)
        path = _set(
            path, slot, hit,
            p=it.p, ns=it.ns, ng=it.ng, wo=it.wo, beta=beta,
            mat=it.mat, light=it.light, pdf_fwd=pdf_area,
            vtype=jnp.full(n, VT_SURFACE, jnp.int32), valid=hit,
        )
        path = path._replace(count=path.count + hit.astype(jnp.int32))
        if scene.has_env and not mode_importance:
            # escaped camera ray -> env vertex (pdf_fwd unconverted)
            miss = alive & ~it.valid
            wr = 2.0 * jnp.maximum(scene.world_radius, 1.0)
            path = _set(
                path, slot, miss,
                p=o + d * wr, ns=-d, ng=-d, wo=-d, beta=beta,
                light=jnp.full(n, ENV_LIGHT, jnp.int32),
                pdf_fwd=pdf_fwd_solid,
                vtype=jnp.full(n, VT_LIGHT, jnp.int32), valid=miss,
            )
            path = path._replace(count=path.count + miss.astype(jnp.int32))
        alive = hit

        b = bx.make_bsdf_at(scene, it)
        ss, ts = _shading_frame_du(it.ns, it.dpdu)
        wo_l = _to_local(it.wo, ss, ts, it.ns)
        dim0 = dim_base + (slot - 1) * 3
        u2 = smpl.get_2d(cfg_s, ctx, dim0)
        uc = smpl.get_1d(cfg_s, ctx, dim0 + 2)
        bs = bx.bsdf_sample(b, wo_l, u2, uc)
        wi_w = _to_world(bs.wi, ss, ts, it.ns)
        cos_wi = vm.absdot(wi_w, it.ns)
        ok = (bs.pdf > 0.0) & jnp.any(bs.f > 0.0, axis=-1)
        # record specularity of this vertex
        path = _set(path, slot, hit, delta=bs.is_specular)

        # reverse pdf: probability of sampling wo given wi (symmetric for
        # our lobe set except specular); write to the PREVIOUS vertex
        wi_l = _to_local(wi_w, ss, ts, it.ns)
        pdf_rev_solid = bx.bsdf_pdf(b, wi_l, wo_l)
        prev_rev = _convert_density(pdf_rev_solid, it.p, prev_p, prev_ns)
        if slot == 1 and prev0_env is not None:
            # env light origin: densities at an env vertex stay solid-angle
            prev_rev = jnp.where(prev0_env, pdf_rev_solid, prev_rev)
        path = path._replace(
            pdf_rev=path.pdf_rev.at[:, slot - 1].set(
                jnp.where(hit, prev_rev, path.pdf_rev[:, slot - 1])
            )
        )

        beta = jnp.where(
            (alive & ok)[:, None],
            beta * bs.f * (cos_wi / jnp.maximum(bs.pdf, 1e-12))[:, None],
            beta,
        )
        alive = alive & ok
        pdf_fwd_solid = jnp.where(bs.is_specular, 1.0, bs.pdf)
        prev_p, prev_ns = it.p, it.ns
        o = jnp.where(alive[:, None], vm.offset_ray_origin(it.p, it.p_error, it.ng, wi_w), o)
        d = jnp.where(alive[:, None], wi_w, d)

    return path


def dim_bases(max_verts_cam, max_verts_light):
    """Non-overlapping PSS dimension streams (reference mlt.rs:28-64
    3-stream MLTSampler): camera walk, light walk, and per-strategy
    connection dims each get a disjoint range whatever the depth — deep
    paths no longer alias camera perturbations into light dims."""
    cam_base = 40
    light_base = cam_base + 3 * max_verts_cam + 2
    s1_base = light_base + 3 * max_verts_light + 6
    return cam_base, light_base, s1_base


def generate_camera_subpath(scene, camera, cfg_s, ctx, p_film, max_verts, accel,
                            dim_base=40):
    """reference bdpt.rs:1108."""
    n = p_film.shape[0]
    rays = cam.generate_rays(camera, p_film, smpl.get_2d(cfg_s, ctx, 3), smpl.get_1d(cfg_s, ctx, 2))
    path = _empty_subpath(n, max_verts)
    true_n = jnp.ones(n, bool)
    path = _set(
        path, 0, true_n,
        p=rays.o, ns=rays.d, ng=rays.d, beta=jnp.ones((n, 3), jnp.float32),
        pdf_fwd=jnp.ones(n, jnp.float32),
        vtype=jnp.full(n, VT_CAMERA, jnp.int32), valid=true_n,
    )
    path = path._replace(count=jnp.ones(n, jnp.int32))
    _, pdf_dir = cam.camera_pdf_we(camera, rays.o, rays.d)
    return _walk(
        scene, cfg_s, ctx, rays.o, rays.d, jnp.ones((n, 3), jnp.float32),
        pdf_dir, max_verts, dim_base, accel, path, mode_importance=False,
    )


def generate_light_subpath(scene, cfg_s, ctx, n, max_verts, light_dist, accel,
                           dim_base=60):
    """reference bdpt.rs:1161."""
    u_sel = smpl.get_1d(cfg_s, ctx, 20)
    li_idx, sel_pdf, _ = smp.sample_distribution_1d_discrete(light_dist, u_sel)
    ls = lt.sample_le(
        scene, li_idx, smpl.get_2d(cfg_s, ctx, 21), smpl.get_2d(cfg_s, ctx, 23)
    )
    from ...ops import gathers as gx

    la = gx.take_rows(scene.light_attr, li_idx)
    ltype = gx.coli(la, sa.LA_TYPE)
    is_delta_l = (ltype == sa.LIGHT_POINT) | (ltype == sa.LIGHT_SPOT) | (ltype == sa.LIGHT_DISTANT)

    path = _empty_subpath(n, max_verts)
    true_n = jnp.ones(n, bool)
    path = _set(
        path, 0, true_n,
        p=ls.o, ns=ls.n_light, ng=ls.n_light, beta=ls.le / jnp.maximum(sel_pdf * ls.pdf_pos, 1e-20)[:, None],
        light=li_idx, pdf_fwd=sel_pdf * ls.pdf_pos,
        vtype=jnp.full(n, VT_LIGHT, jnp.int32), valid=true_n,
        delta=is_delta_l,
    )
    path = path._replace(count=jnp.ones(n, jnp.int32))
    cos0 = jnp.abs(vm.dot(ls.n_light, ls.d))
    is_area = ltype == sa.LIGHT_AREA
    is_inf = ltype == sa.LIGHT_INFINITE
    beta0 = ls.le * jnp.where(is_area, cos0, 1.0)[:, None] / jnp.maximum(
        sel_pdf * ls.pdf_pos * ls.pdf_dir, 1e-20
    )[:, None]
    walked = _walk(
        scene, cfg_s, ctx, ls.o + ls.d * 1e-3, ls.d, beta0, ls.pdf_dir,
        max_verts, dim_base, accel, path, mode_importance=True,
        prev0_env=is_inf if scene.has_env else None,
    )
    if scene.has_env:
        # reference bdpt.rs "correct subpath sampling densities for infinite
        # area lights": l0.pdf_fwd = selection x directional density (SOLID
        # angle); l1.pdf_fwd = positional density x |cos at l1|
        fix0 = jnp.where(is_inf, sel_pdf * ls.pdf_dir, walked.pdf_fwd[:, 0])
        pf = walked.pdf_fwd.at[:, 0].set(fix0)
        if walked.pdf_fwd.shape[1] > 1:
            cos1 = jnp.abs(vm.dot(walked.ns[:, 1], ls.d))
            fix1 = jnp.where(
                is_inf & walked.valid[:, 1], ls.pdf_pos * cos1, pf[:, 1]
            )
            pf = pf.at[:, 1].set(fix1)
        walked = walked._replace(pdf_fwd=pf)
    return walked, li_idx, sel_pdf


def _vertex_f(scene, path: Subpath, slot: int, wi_world):
    """BSDF f at a surface vertex toward wi_world (reference Vertex::f)."""
    from ...ops import gathers as gx

    b = bx.make_bsdf_from_mat(scene, path.mat[:, slot])
    ns = path.ns[:, slot]
    ss, ts = _shading_frame(ns)
    wo_l = _to_local(path.wo[:, slot], ss, ts, ns)
    wi_l = _to_local(wi_world, ss, ts, ns)
    reflect = vm.dot(wi_world, path.ng[:, slot]) * vm.dot(path.wo[:, slot], path.ng[:, slot]) > 0
    f = bx.bsdf_f(b, wo_l, wi_l, reflect)
    pdf = bx.bsdf_pdf(b, wo_l, wi_l)
    pdf_rev = bx.bsdf_pdf(b, wi_l, wo_l)
    return f, pdf, pdf_rev


def _g_term(scene, p_a, n_a, p_b, n_b, accel):
    """Geometric term with visibility (reference bdpt.rs:1450)."""
    d = p_b - p_a
    d2 = jnp.maximum(vm.length_squared(d), 1e-12)
    w = d / jnp.sqrt(d2)[..., None]
    g = jnp.abs(vm.dot(n_a, w)) * jnp.abs(vm.dot(n_b, w)) / d2
    o = p_a + w * 1e-3
    dist = jnp.sqrt(d2)
    occ = si.scene_intersect_p(scene, o, w, dist * (1 - 2e-3), accel)
    return jnp.where(occ, 0.0, g), w


def _mis_weight(scene, cpath, lpath, s, t, overrides, l0_is_delta=None):
    """reference bdpt.rs mis_weight :1505 with explicit endpoint overrides.

    overrides: dict (side, slot, field) -> array for the sampled/endpoint
    vertices ('c'/'l', index, 'pdf_fwd'/'pdf_rev'/'delta') — the functional
    analogue of the reference's ScopedAssignment temporaries.
    l0_is_delta: (N,) bool for the light-path origin's is_delta_light test
    (reference :2190).
    """
    n = cpath.p.shape[0]
    if s + t == 2:
        return jnp.ones(n, jnp.float32)  # reference :1514

    def field(path, which, i, name):
        key = (which, i, name)
        if key in overrides:
            return overrides[key]
        return getattr(path, name)[:, i]

    sum_ri = jnp.zeros(n, jnp.float32)
    # camera-side hypothetical strategies (reference :2120-2149)
    ri = jnp.ones(n, jnp.float32)
    for i in range(t - 1, 0, -1):
        ri = ri * _remap0(field(cpath, "c", i, "pdf_rev")) / _remap0(
            field(cpath, "c", i, "pdf_fwd")
        )
        cv1_delta = field(cpath, "c", i, "delta")
        cv0_delta = (
            field(cpath, "c", i - 1, "delta") if i - 1 >= 1 else jnp.zeros(n, bool)
        )  # the camera vertex itself is never delta
        sum_ri = sum_ri + jnp.where(~cv1_delta & ~cv0_delta, ri, 0.0)

    # light-side hypothetical strategies (reference :2151-2196)
    ri = jnp.ones(n, jnp.float32)
    if l0_is_delta is None:
        l0_is_delta = jnp.zeros(n, bool)
    for i in range(s - 1, -1, -1):
        ri = ri * _remap0(field(lpath, "l", i, "pdf_rev")) / _remap0(
            field(lpath, "l", i, "pdf_fwd")
        )
        lv1_delta = field(lpath, "l", i, "delta")
        prev_delta = (
            field(lpath, "l", i - 1, "delta") if i > 0 else l0_is_delta
        )
        sum_ri = sum_ri + jnp.where(~lv1_delta & ~prev_delta, ri, 0.0)
    return 1.0 / (1.0 + sum_ri)


def _inf_light_density(scene, light_dist, w):
    """Selection-weighted env directional density (reference bdpt.rs
    infinite_light_density) — solid-angle measure; one env light max."""
    env_idx = jnp.argmax(scene.light_type == sa.LIGHT_INFINITE).astype(jnp.int32)
    sel = smp.distribution_1d_discrete_pdf(light_dist, env_idx)
    return sel * lt.pdf_li_env(scene, w)


def _light_origin_pdfs(scene, light_dist, light_idx, p_light, n_light, p_to):
    """(pdf of choosing+positioning the light vertex, directional pdf toward
    p_to converted to area at p_to) — used for MIS overrides."""
    sel_pdf = smp.distribution_1d_discrete_pdf(light_dist, jnp.maximum(light_idx, 0))
    from ...ops import gathers as gx

    la = gx.take_rows(scene.light_attr, jnp.maximum(light_idx, 0))
    area = jnp.maximum(la[:, sa.LP_AREA], 1e-12)
    pdf_pos = 1.0 / area
    d = p_to - p_light
    d2 = jnp.maximum(vm.length_squared(d), 1e-12)
    w = d / jnp.sqrt(d2)[..., None]
    cos_l = jnp.abs(vm.dot(n_light, w))
    pdf_dir_solid = cos_l * vm.INV_PI  # cosine-hemisphere emission
    return sel_pdf * pdf_pos, pdf_dir_solid


def radiance_and_splats(scene, camera, cfg: "PathCfg", cfg_s, ctx, p_film, accel=None):
    """Full BDPT estimate for a wavefront.  Returns (L (N,3),
    splat_raster (N*(smax),2), splat_L).  reference bdpt.rs:924-1048."""
    from .path import PathCfg  # noqa

    n = p_film.shape[0]
    t_max = cfg.max_depth + 2
    s_max = cfg.max_depth + 1
    light_dist = _light_select_dist(scene)

    cam_base, light_base, s1_base = dim_bases(t_max, s_max)
    cpath = generate_camera_subpath(
        scene, camera, cfg_s, ctx, p_film, t_max, accel, dim_base=cam_base
    )
    lpath, l0_idx, l0_sel = generate_light_subpath(
        scene, cfg_s, ctx, n, s_max, light_dist, accel, dim_base=light_base
    )

    L = jnp.zeros((n, 3), jnp.float32)
    splat_p = []
    splat_l = []

    for t in range(1, t_max + 1):
        for s in range(0, s_max + 1):
            depth = s + t - 2
            if depth < 0 or depth > cfg.max_depth:
                continue
            if t == 1 and s == 1:
                continue  # direct camera-light handled by t=2,s=0 + s=1
            if t == 1:
                # light subpath vertex s-1 connects to the camera -> splat
                ok = lpath.valid[:, s - 1] & (lpath.vtype[:, s - 1] == VT_SURFACE) & ~lpath.delta[:, s - 1]
                pv = lpath.p[:, s - 1]
                wi, we, pdf, p_raster, cam_p = cam.camera_sample_wi(camera, pv)
                f, pdf_c, pdf_rev_c = _vertex_f(scene, lpath, s - 1, wi)
                g, w = _g_term(scene, pv, lpath.ns[:, s - 1], cam_p, wi, accel)
                # G includes both cosines; camera "normal" cosine folded in We
                d2 = jnp.maximum(vm.length_squared(cam_p - pv), 1e-12)
                cos_v = jnp.abs(vm.dot(lpath.ns[:, s - 1], wi))
                occ = g == 0.0
                contrib = (
                    lpath.beta[:, s - 1]
                    * f
                    * (we * cos_v / jnp.maximum(pdf, 1e-12))[:, None]
                )
                contrib = jnp.where((ok & ~occ & (pdf > 0))[:, None], contrib, 0.0)
                # MIS: override camera endpoint rev pdfs
                ov = {}
                pdf_cam_pos, pdf_cam_dir = cam.camera_pdf_we(camera, cam_p, -wi)
                ov[("l", s - 1, "pdf_rev")] = _convert_density(pdf_cam_dir, cam_p, pv, lpath.ns[:, s - 1])
                if s >= 2:
                    ov[("l", s - 2, "pdf_rev")] = _convert_density(
                        pdf_rev_c, pv, lpath.p[:, s - 2], lpath.ns[:, s - 2]
                    )
                w_mis = _mis_weight(scene, cpath, lpath, s, 1, ov,
                                    l0_is_delta=lpath.delta[:, 0])
                splat_p.append(jnp.where(ok[:, None], p_raster, -10.0))
                splat_l.append(contrib * w_mis[:, None])
                continue

            cv = t - 1  # camera endpoint slot
            c_ok = cpath.valid[:, cv] & (cpath.vtype[:, cv] == VT_SURFACE)

            if s == 0:
                # camera path alone: endpoint must be emissive (bdpt.rs
                # connect t>=2, s==0)
                hl = cpath.light[:, cv]
                le = lt.area_light_emitted(
                    scene, jnp.maximum(hl, 0), cpath.ns[:, cv], cpath.wo[:, cv]
                )
                ok = c_ok & (hl >= 0)
                contrib = cpath.beta[:, cv] * le
                # MIS overrides: c_{t-1}.pdf_rev = light origin pdf;
                # c_{t-2}.pdf_rev = light directional pdf
                prev = cpath.p[:, cv - 1]
                pdf_orig, pdf_dir_solid = _light_origin_pdfs(
                    scene, light_dist, hl, cpath.p[:, cv], cpath.ns[:, cv], prev
                )
                ov = {("c", cv, "pdf_rev"): pdf_orig}
                if cv - 1 >= 0:
                    ov[("c", cv - 1, "pdf_rev")] = _convert_density(
                        pdf_dir_solid, cpath.p[:, cv], prev, cpath.ns[:, cv - 1]
                    )
                w_mis = _mis_weight(scene, cpath, lpath, 0, t, ov)
                L = L + jnp.where(ok[:, None], contrib * w_mis[:, None], 0.0)

                if scene.has_env:
                    # escaped camera path hits the env sphere (reference
                    # bdpt.rs: infinite-light s==0 strategy).  Densities at
                    # the env vertex stay solid-angle (matching its stored
                    # pdf_fwd); the vertex BEFORE it takes the env light's
                    # positional density 1/(pi r^2) x cos.
                    is_env = (
                        cpath.valid[:, cv]
                        & (cpath.vtype[:, cv] == VT_LIGHT)
                        & (cpath.light[:, cv] == ENV_LIGHT)
                    )
                    d_esc = -cpath.wo[:, cv]
                    le_env = lt.env_le(scene, d_esc)
                    contrib_e = cpath.beta[:, cv] * le_env
                    ov_e = {
                        ("c", cv, "pdf_rev"): _inf_light_density(
                            scene, light_dist, d_esc
                        )
                    }
                    if cv - 1 >= 1:
                        wr = jnp.maximum(scene.world_radius, 1e-6)
                        cos_prev = jnp.abs(vm.dot(cpath.ns[:, cv - 1], d_esc))
                        ov_e[("c", cv - 1, "pdf_rev")] = (
                            cos_prev / (vm.PI * wr * wr)
                        )
                    w_mis_e = _mis_weight(scene, cpath, lpath, 0, t, ov_e)
                    L = L + jnp.where(
                        is_env[:, None], contrib_e * w_mis_e[:, None], 0.0
                    )
                continue

            if s == 1:
                # NEE-style: fresh light sample toward camera vertex
                u_sel = smpl.get_1d(cfg_s, ctx, s1_base + 3 * t)
                u_l = smpl.get_2d(cfg_s, ctx, s1_base + 1 + 3 * t)
                li_idx, sel_pdf, _ = smp.sample_distribution_1d_discrete(light_dist, u_sel)
                ls = lt.sample_li(scene, li_idx, cpath.p[:, cv], u_l)
                f, pdf_c, pdf_rev_c = _vertex_f(scene, cpath, cv, ls.wi)
                cos_c = jnp.abs(vm.dot(cpath.ns[:, cv], ls.wi))
                o_sh = vm.offset_ray_origin(
                    cpath.p[:, cv], jnp.zeros_like(ls.wi) + 1e-4, cpath.ng[:, cv], ls.wi
                )
                dist = vm.length(ls.p_target - o_sh)
                occ = si.scene_intersect_p(
                    scene, o_sh, ls.wi, dist * (1 - 1e-3), accel
                )
                ok = c_ok & (ls.pdf > 0) & jnp.any(ls.li > 0, -1) & ~occ & ~cpath.delta[:, cv]
                contrib = (
                    cpath.beta[:, cv] * f * ls.li
                    * (cos_c / jnp.maximum(ls.pdf * sel_pdf, 1e-12))[:, None]
                )
                ov = {}
                pdf_orig, pdf_dir_solid = _light_origin_pdfs(
                    scene, light_dist, li_idx, ls.p_target, ls.n_light, cpath.p[:, cv]
                )
                # c_{t-1} rev: light emits toward it
                ov[("c", cv, "pdf_rev")] = _convert_density(
                    pdf_dir_solid, ls.p_target, cpath.p[:, cv], cpath.ns[:, cv]
                )
                if cv - 1 >= 0:
                    ov[("c", cv - 1, "pdf_rev")] = _convert_density(
                        pdf_rev_c, cpath.p[:, cv], cpath.p[:, cv - 1], cpath.ns[:, cv - 1]
                    )
                # SAMPLED light vertex replaces lpath slot 0 for this
                # strategy (reference :1533-1624 "update sampled vertex")
                ov[("l", 0, "pdf_fwd")] = pdf_orig
                ov[("l", 0, "pdf_rev")] = _convert_density(
                    pdf_c, cpath.p[:, cv], ls.p_target, ls.n_light
                )
                ov[("l", 0, "delta")] = ls.is_delta
                if scene.has_env:
                    # env sampled as the light: densities at the env vertex
                    # stay solid-angle; toward the camera vertex the env's
                    # positional density applies (bdpt.rs pdf_light for
                    # infinite lights)
                    from ...ops import gathers as gx

                    la_s1 = gx.take_rows(scene.light_attr, li_idx)
                    is_env_l = gx.coli(la_s1, sa.LA_TYPE) == sa.LIGHT_INFINITE
                    wr = jnp.maximum(scene.world_radius, 1e-6)
                    cos_cv = jnp.abs(vm.dot(cpath.ns[:, cv], ls.wi))
                    ov[("c", cv, "pdf_rev")] = jnp.where(
                        is_env_l,
                        cos_cv / (vm.PI * wr * wr),
                        ov[("c", cv, "pdf_rev")],
                    )
                    ov[("l", 0, "pdf_fwd")] = jnp.where(
                        is_env_l,
                        _inf_light_density(scene, light_dist, ls.wi),
                        ov[("l", 0, "pdf_fwd")],
                    )
                    ov[("l", 0, "pdf_rev")] = jnp.where(
                        is_env_l, pdf_c, ov[("l", 0, "pdf_rev")]
                    )
                w_mis = _mis_weight(scene, cpath, lpath, 1, t, ov,
                                    l0_is_delta=ls.is_delta)
                L = L + jnp.where(ok[:, None], contrib * w_mis[:, None], 0.0)
                continue

            # general s>=2, t>=2 connection
            lv = s - 1
            l_ok = lpath.valid[:, lv] & (lpath.vtype[:, lv] == VT_SURFACE)
            pc = cpath.p[:, cv]
            pl = lpath.p[:, lv]
            g, w = _g_term(scene, pc, cpath.ns[:, cv], pl, lpath.ns[:, lv], accel)
            f_c, pdf_c_fwd, pdf_c_rev = _vertex_f(scene, cpath, cv, w)
            f_l, pdf_l_fwd, pdf_l_rev = _vertex_f(scene, lpath, lv, -w)
            ok = c_ok & l_ok & ~cpath.delta[:, cv] & ~lpath.delta[:, lv] & (g > 0)
            contrib = cpath.beta[:, cv] * f_c * f_l * lpath.beta[:, lv] * g[:, None]
            ov = {
                ("c", cv, "pdf_rev"): _convert_density(pdf_l_fwd, pl, pc, cpath.ns[:, cv]),
                ("l", lv, "pdf_rev"): _convert_density(pdf_c_fwd, pc, pl, lpath.ns[:, lv]),
            }
            if cv - 1 >= 0:
                ov[("c", cv - 1, "pdf_rev")] = _convert_density(
                    pdf_c_rev, pc, cpath.p[:, cv - 1], cpath.ns[:, cv - 1]
                )
            if lv - 1 >= 0:
                ov[("l", lv - 1, "pdf_rev")] = _convert_density(
                    pdf_l_rev, pl, lpath.p[:, lv - 1], lpath.ns[:, lv - 1]
                )
            w_mis = _mis_weight(scene, cpath, lpath, s, t, ov,
                                l0_is_delta=lpath.delta[:, 0])
            L = L + jnp.where(ok[:, None], contrib * w_mis[:, None], 0.0)

    if splat_p:
        splat_p = jnp.concatenate(splat_p, axis=0)
        splat_l = jnp.concatenate(splat_l, axis=0)
    else:
        splat_p = jnp.full((1, 2), -10.0)
        splat_l = jnp.zeros((1, 3))
    return L, splat_p, splat_l


def render_bdpt(scene, camera, spp: int, max_depth: int = 5, sampler_cfg=None,
                accel=None, max_lanes: int = 1 << 18):
    """Full-frame BDPT render (reference BDPTIntegrator::render bdpt.rs:849).
    Splats are scaled by 1/spp at resolve (bdpt.rs:1071)."""
    from functools import partial

    from ...ops import film as filmmod
    from .path import PathCfg

    if sampler_cfg is None:
        sampler_cfg = smpl.make_sampler(smpl.RANDOM, spp, camera.resolution)
    w, h = camera.resolution
    n_pix = w * h
    xs, ys = np.meshgrid(np.arange(w, dtype=np.int32), np.arange(h, dtype=np.int32))
    pixels = np.stack([xs.ravel(), ys.ravel()], -1)
    film = filmmod.make_film((w, h))
    fcfg = filmmod.make_filter(filmmod.FILTER_BOX)
    pcfg = PathCfg(max_depth, 1.0)

    @partial(jax.jit, static_argnames=())
    def batch(scene, film, pix, snums):
        ctx = smpl.make_ctx(sampler_cfg, pix, snums)
        u_film = smpl.get_2d(sampler_cfg, ctx, 0)
        p_film = pix.astype(jnp.float32) + u_film
        L, sp, sl = radiance_and_splats(scene, camera, pcfg, sampler_cfg, ctx, p_film, accel)
        film = filmmod.add_samples(film, fcfg, p_film, L)
        return filmmod.add_splats(film, sp, sl)

    spp_per_batch = max(1, min(spp, max_lanes // n_pix))
    sample = 0
    while sample < spp:
        nb = min(spp_per_batch, spp - sample)
        pix = jnp.asarray(np.tile(pixels, (nb, 1)))
        snums = jnp.repeat(jnp.arange(sample, sample + nb, dtype=jnp.uint32), n_pix)
        film = batch(scene, film, pix, snums)
        sample += nb
    return filmmod.to_rgb(film, splat_scale=1.0 / spp)
