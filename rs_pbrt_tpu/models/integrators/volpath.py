"""Volumetric path integrator: path tracing + medium sampling per segment.

TPU-native replacement for reference src/integrators/volpath.rs:60-357.
Each bounce: closest surface hit -> homogeneous medium distance sample on
the segment -> either a medium interaction (HG phase scattering + NEE with
transmittance) or the surface path (same as path.py).  Per-lane current-
medium tracking replaces the reference's MediumInterface pointer chain
(interaction.rs spawn_ray medium selection).

Grid media (delta/ratio tracking, media/grid.rs) hook in here when the
density-grid tables land.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...ops import bsdf as bx
from ...ops import medium as med
from ...ops import sampling as smp
from ...ops import scene_intersect as si
from ...scene import arrays as sa
from .. import lights as lt
from .. import samplers as smpl
from ...utils import vecmath as vm
from .path import (
    DIM_CAMERA,
    PathCfg,
    _light_select_dist,
    _shading_frame, _shading_frame_du,
    _to_local,
    _to_world,
)

# dims per bounce: base path dims (7) + medium channel/dist/phase u (4)
DIMS_PER_BOUNCE = 11
SSS_EXTRA_DIMS = 8  # appended when the scene has subsurface materials
TRACK_STEPS = 16  # bounded delta/ratio tracking steps (grid media)


def _has_grid(scene):
    return scene.med_grid.shape[1] > 1 or scene.med_grid.shape[2] > 1 or scene.med_grid.shape[3] > 1


def _density_at(scene, mid, p):
    """Per-lane density: select among the K grids (K is small & static)."""
    dens = jnp.ones(p.shape[:-1], jnp.float32)
    for k in range(scene.med_grid.shape[0]):
        dk = med.grid_density(scene.med_grid[k], scene.med_w2m[k], p)
        dens = jnp.where(mid == k, dk, dens)
    return dens


def _delta_track(scene, mid, in_med, o, d, t_max, lane_key, bounce, seed):
    """Delta tracking distance sample (reference grid.rs:209-271)."""
    from ...utils import rng as rngmod

    from ...ops import gathers as gx

    sigma_t3 = scene.med_sigma_a[mid] + scene.med_sigma_s[mid]
    sigma_t = jnp.mean(sigma_t3, axis=-1)
    max_d = scene.med_max_density[mid]
    inv_max = 1.0 / jnp.maximum(sigma_t * max_d, 1e-12)
    t = jnp.zeros(o.shape[0], jnp.float32)
    sampled = jnp.zeros(o.shape[0], bool)
    done = ~in_med
    for i in range(TRACK_STEPS):
        u1 = rngmod.uniform_float(lane_key, bounce.astype(jnp.uint32), jnp.uint32(2 * i), jnp.uint32(seed))
        u2 = rngmod.uniform_float(lane_key, bounce.astype(jnp.uint32), jnp.uint32(2 * i + 1), jnp.uint32(seed))
        t_new = t - jnp.log(jnp.maximum(1.0 - u1, 1e-12)) * inv_max
        past = t_new >= t_max
        dens = _density_at(scene, mid, o + t_new[:, None] * d)
        real = u2 < dens / jnp.maximum(max_d, 1e-12)
        hit_now = ~done & ~past & real
        sampled = sampled | hit_now
        t = jnp.where(done | past, t, t_new)
        done = done | past | hit_now
    albedo = scene.med_sigma_s[mid] / jnp.maximum(sigma_t3, 1e-12)
    weight = jnp.where(sampled[:, None], albedo, 1.0)
    return med.MediumSample(sampled, jnp.minimum(t, t_max), weight)


def _ratio_track_tr(scene, mid, in_med, o, d, dist, lane_key, salt, seed):
    """Ratio tracking transmittance (reference grid.rs:155-208)."""
    from ...utils import rng as rngmod

    sigma_t = jnp.mean(scene.med_sigma_a[mid] + scene.med_sigma_s[mid], axis=-1)
    max_d = scene.med_max_density[mid]
    inv_max = 1.0 / jnp.maximum(sigma_t * max_d, 1e-12)
    t = jnp.zeros(o.shape[0], jnp.float32)
    tr_acc = jnp.ones(o.shape[0], jnp.float32)
    done = ~in_med
    for i in range(TRACK_STEPS):
        u1 = rngmod.uniform_float(lane_key, jnp.uint32(salt), jnp.uint32(7000 + i), jnp.uint32(seed))
        t_new = t - jnp.log(jnp.maximum(1.0 - u1, 1e-12)) * inv_max
        past = t_new >= dist
        dens = _density_at(scene, mid, o + t_new[:, None] * d)
        tr_acc = jnp.where(done | past, tr_acc, tr_acc * jnp.clip(1.0 - dens / jnp.maximum(max_d, 1e-12), 0.0, 1.0))
        t = t_new
        done = done | past
    return jnp.clip(tr_acc, 0.0, 1.0)


def _prim_media(scene: sa.Scene, it: si.Interaction):
    """(inside, outside) medium ids of the hit primitive."""
    n = it.p.shape[0]
    inside = jnp.full(n, -1, jnp.int32)
    outside = jnp.full(n, -1, jnp.int32)
    from ...ops import gathers as gx

    if scene.n_tris > 0:
        is_tri = it.valid & (it.prim >= 0) & (it.prim < scene.n_tris)
        tid = jnp.clip(it.prim, 0, scene.n_tris - 1)
        at = gx.take_rows(scene.tri_attr, tid)
        inside = jnp.where(is_tri, gx.coli(at, sa.TA_MED_IN), inside)
        outside = jnp.where(is_tri, gx.coli(at, sa.TA_MED_OUT), outside)
    if scene.n_spheres > 0:
        is_sph = it.valid & (it.prim >= scene.n_tris)
        sid = jnp.clip(it.prim - scene.n_tris, 0, scene.n_spheres - 1)
        sat = gx.take_rows(scene.sph_attr, sid)
        inside = jnp.where(is_sph, gx.coli(sat, sa.SP_MED_IN), inside)
        outside = jnp.where(is_sph, gx.coli(sat, sa.SP_MED_OUT), outside)
    return inside, outside


def _shadow_tr(scene, cur_med, p0, d, dist, accel):
    """Occlusion + transmittance for NEE (reference scene.rs:79
    intersect_tr simplified: opaque occluders block; the current medium
    attenuates along the full segment — homogeneous closed form or ratio
    tracking for grids)."""
    occluded = si.scene_intersect_p(scene, p0, d, dist * (1.0 - 1e-3), accel)
    in_med = cur_med >= 0
    mid = jnp.maximum(cur_med, 0)
    if _has_grid(scene):
        lane_key = jnp.arange(p0.shape[0], dtype=jnp.uint32)
        tr1 = _ratio_track_tr(scene, mid, in_med, p0, d, dist, lane_key, 0x5AD, 0x517)
        tr = tr1[..., None] * jnp.ones((1, 3), jnp.float32)
    else:
        sigma_t = scene.med_sigma_a[mid] + scene.med_sigma_s[mid]
        tr = jnp.where(
            in_med[..., None], med.homogeneous_tr(sigma_t, dist), 1.0
        )
    return occluded, tr


def radiance(
    scene: sa.Scene,
    cfg: PathCfg,
    sampler_cfg: smpl.SamplerCfg,
    ctx: smpl.SampleCtx,
    ray_o,
    ray_d,
    accel=None,
    diffs=None,
):
    """diffs: optional ops/differentials.RayDiffs for the camera rays —
    texture-footprint mip filtering at primary hits, like path.py (the
    reference threads differentials through every SamplerIntegrator,
    core/integrator.rs:139-141 + interaction.rs:388-470, so textured
    volpath scenes must mip-filter too, not alias)."""
    n = ray_o.shape[0]
    light_dist = _light_select_dist(scene) if scene.n_lights > 0 else None

    # one Sobol launch for all bounce dims (see path.py — launch setup
    # dominated the sampler cost)
    dims_per_bounce = DIMS_PER_BOUNCE + (
        SSS_EXTRA_DIMS if scene.has_subsurface else 0
    )
    total_dims = dims_per_bounce * (cfg.max_depth + 1)
    all_dims = (
        smpl.get_dims(sampler_cfg, ctx, DIM_CAMERA, total_dims)
        if total_dims <= 128
        else None
    )

    def body(bounce, state):
        (o, d, L, beta, alive, specular_bounce, prev_pdf, cur_med) = state
        it = si.scene_intersect(scene, o, d, jnp.full(n, vm.INFINITY), accel)
        if diffs is not None:
            from ...ops import differentials as rdiff

            tex_width = jnp.where(
                bounce == 0, rdiff.duv_width_at_hit(scene, it, diffs), 0.0
            )
        else:
            tex_width = None
        dim0 = DIM_CAMERA + bounce * dims_per_bounce
        if all_dims is not None:
            dims = jax.lax.dynamic_slice_in_dim(
                all_dims, bounce * dims_per_bounce, dims_per_bounce, axis=1
            )
        else:
            dims = smpl.get_dims(sampler_cfg, ctx, dim0, dims_per_bounce)
        def u1(k):
            return dims[:, k] if dims is not None else smpl.get_1d_dyn(sampler_cfg, ctx, dim0 + k)
        def u2d(k):
            return (dims[:, k : k + 2] if dims is not None
                    else smpl.get_2d_dyn(sampler_cfg, ctx, dim0 + k))

        # --- medium distance sampling on the segment (volpath.rs:96-105) ---
        in_med = alive & (cur_med >= 0)
        mid = jnp.maximum(cur_med, 0)
        seg_t = jnp.where(it.valid, it.t, 2.0 * scene.world_radius * 4.0)
        u_chan = u1(7)
        u_dist = u1(8)
        if _has_grid(scene):
            lane_key = jnp.arange(n, dtype=jnp.uint32)
            ms = _delta_track(scene, mid, in_med, o, d, seg_t, lane_key, bounce, 0x517)
        else:
            ms = med.homogeneous_sample(
                scene.med_sigma_a[mid], scene.med_sigma_s[mid], u_chan, u_dist, seg_t
            )
        med_scatter = in_med & ms.sampled
        beta = jnp.where(in_med[..., None], beta * ms.weight, beta)

        # --- emitted radiance (only when the segment reaches the surface) --
        hit = it.valid & alive & ~med_scatter
        if scene.n_lights > 0:
            hit_light = jnp.where(hit, it.light, -1)
            le = lt.area_light_emitted(scene, jnp.maximum(hit_light, 0), it.ns, it.wo)
            le = jnp.where((hit_light >= 0)[..., None], le, 0.0)
            sel_pdf = smp.distribution_1d_discrete_pdf(light_dist, jnp.maximum(hit_light, 0))
            area_pdf = lt.pdf_li_area(scene, jnp.maximum(hit_light, 0), o, it.p, it.ns)
            w_b = jnp.where(
                specular_bounce, 1.0, smp.power_heuristic(1.0, prev_pdf, 1.0, sel_pdf * area_pdf)
            )
            L = L + beta * le * w_b[..., None]
        if scene.has_env:
            esc = alive & ~it.valid & ~med_scatter
            le_env = lt.env_le(scene, d)
            env_sel = smp.distribution_1d_discrete_pdf(
                light_dist, jnp.argmax(scene.light_type == sa.LIGHT_INFINITE)
            )
            w_env = jnp.where(
                specular_bounce,
                1.0,
                smp.power_heuristic(1.0, prev_pdf, 1.0, env_sel * lt.pdf_li_env(scene, d)),
            )
            L = L + jnp.where(esc[..., None], beta * le_env * w_env[..., None], 0.0)

        alive = alive & (it.valid | med_scatter) & (bounce < cfg.max_depth)

        # medium interaction point
        p_med = o + ms.t[..., None] * d
        g = scene.med_g[mid]

        # --- NEE from medium or surface (volpath handle_media=true) ---
        if scene.n_lights > 0:
            u_sel = u1(0)
            u_light = u2d(1)
            li_idx, sel_pdf_n, _ = smp.sample_distribution_1d_discrete(light_dist, u_sel)
            ref_p = jnp.where(med_scatter[..., None], p_med, it.p)
            ls = lt.sample_li(scene, li_idx, ref_p, u_light)

            # scattering term: phase (medium) or BSDF*cos (surface)
            b = bx.make_bsdf_at(scene, it, width=tex_width)
            ss, ts = _shading_frame_du(it.ns, it.dpdu)
            wo_l = _to_local(it.wo, ss, ts, it.ns)
            wi_l = _to_local(ls.wi, ss, ts, it.ns)
            reflect = vm.dot(ls.wi, it.ng) * vm.dot(it.wo, it.ng) > 0.0
            f_surf = bx.bsdf_f(b, wo_l, wi_l, reflect) * bx.abs_cos_theta(wi_l)[..., None]
            pdf_surf = bx.bsdf_pdf(b, wo_l, wi_l)
            ph = med.phase_hg(vm.dot(-d, ls.wi), g)
            f_scat = jnp.where(med_scatter[..., None], ph[..., None], f_surf)
            pdf_scat = jnp.where(med_scatter, ph, pdf_surf)

            p_shadow = jnp.where(
                med_scatter[..., None],
                p_med,
                vm.offset_ray_origin(it.p, it.p_error, it.ng, ls.wi),
            )
            delta_sh = ls.p_target - p_shadow
            dist = vm.length(delta_sh)
            sh_d = delta_sh / jnp.maximum(dist, 1e-12)[..., None]
            occ, tr = _shadow_tr(scene, cur_med, p_shadow, sh_d, dist, accel)
            ok = (
                alive
                & (ls.pdf > 0.0)
                & jnp.any(ls.li > 0.0, axis=-1)
                & jnp.any(f_scat > 0.0, axis=-1)
            )
            w_l = jnp.where(ls.is_delta, 1.0, smp.power_heuristic(1.0, ls.pdf, 1.0, pdf_scat))
            ld = beta * f_scat * tr * ls.li * (
                w_l / jnp.maximum(ls.pdf * sel_pdf_n, 1e-12)
            )[..., None]
            L = L + jnp.where((ok & ~occ)[..., None], ld, 0.0)

        # --- continuation: phase sample or BSDF sample ---
        u_phase = u2d(9)
        wi_med, ph_pdf = med.hg_sample_phase(-d, u_phase, g)

        b = bx.make_bsdf_at(scene, it, width=tex_width)
        ss, ts = _shading_frame_du(it.ns, it.dpdu)
        wo_l = _to_local(it.wo, ss, ts, it.ns)
        u_bsdf = u2d(3)
        u_lobe = u1(5)
        bs = bx.bsdf_sample(b, wo_l, u_bsdf, u_lobe)
        wi_surf = _to_world(bs.wi, ss, ts, it.ns)
        cos_wi = vm.absdot(wi_surf, it.ns)
        ok_surf = (bs.pdf > 0.0) & jnp.any(bs.f > 0.0, axis=-1)
        beta_surf = beta * bs.f * (cos_wi / jnp.maximum(bs.pdf, 1e-12))[..., None]

        # medium scatter: beta unchanged (phase == its own pdf)
        new_d = jnp.where(med_scatter[..., None], wi_med, wi_surf)
        new_beta = jnp.where(med_scatter[..., None], beta, beta_surf)
        ok = jnp.where(med_scatter, True, ok_surf)
        new_o = jnp.where(
            med_scatter[..., None],
            p_med,
            vm.offset_ray_origin(it.p, it.p_error, it.ng, wi_surf),
        )
        beta = jnp.where((alive & ok)[..., None], new_beta, beta)
        o = jnp.where(alive[..., None], new_o, o)
        d = jnp.where(alive[..., None], new_d, d)
        alive = alive & ok
        specular_bounce = jnp.where(alive, jnp.where(med_scatter, False, bs.is_specular), specular_bounce)
        prev_pdf = jnp.where(
            alive, jnp.where(med_scatter, ph_pdf, jnp.where(bs.is_specular, 1.0, bs.pdf)), prev_pdf
        )

        # --- BSSRDF at transmissive surface bounces (reference
        # volpath.rs:191-249 hook; shared helper in path.py) ---
        if scene.has_subsurface:
            from .path import sss_transport

            (L, beta, o, d, alive, specular_bounce, prev_pdf) = sss_transport(
                scene, accel, it, bs, ss, ts, beta, L, alive, o, d,
                specular_bounce, prev_pdf, light_dist, u1, u2d, 11,
                eligible=~med_scatter,
            )

        # --- medium transitions at surface crossings ---
        # only surfaces with a REAL medium interface (inside != outside)
        # change the ray medium (reference medium.rs MediumInterface::
        # is_medium_transition; interaction.rs spawn_ray) — a plain surface
        # inside fog must not reset the ray to vacuum
        m_in, m_out = _prim_media(scene, it)
        crossed = alive & ~med_scatter & it.valid & (m_in != m_out)
        entering = vm.dot(new_d, it.ng) < 0.0
        new_med = jnp.where(entering, m_in, m_out)
        cur_med = jnp.where(crossed, new_med, cur_med)

        # --- RR after bounce 3 ---
        rr_active = bounce > 2
        rr_beta_max = jnp.max(beta, axis=-1)
        q = jnp.maximum(0.05, 1.0 - rr_beta_max)
        u_rr = u1(6)
        consider = rr_active & (rr_beta_max < cfg.rr_threshold) & alive
        kill = consider & (u_rr < q)
        beta = jnp.where(
            (consider & ~kill)[..., None], beta / jnp.maximum(1.0 - q, 1e-6)[..., None], beta
        )
        alive = alive & ~kill

        return o, d, L, beta, alive, specular_bounce, prev_pdf, cur_med

    zero3 = ray_o * 0.0
    zero1 = zero3[..., 0]
    true1 = zero1 == 0.0
    cam_med = (zero1.astype(jnp.int32)) + scene.camera_medium
    state = (
        ray_o, ray_d, zero3, zero3 + 1.0, true1, true1, zero1 + 1.0, cam_med
    )
    state = jax.lax.fori_loop(0, cfg.max_depth + 1, body, state)
    return state[2]
