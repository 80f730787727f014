"""Shared direct-lighting estimators + the simple integrators
(ao / whitted / directlighting).

TPU-native replacement for reference src/integrators/{ao,whitted,
directlighting}.rs + the shared estimators in src/core/integrator.rs:300-570
(uniform_sample_all_lights / uniform_sample_one_light / estimate_direct).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ...ops import bsdf as bx
from ...ops import sampling as smp
from ...ops import scene_intersect as si
from ...scene import arrays as sa
from .. import lights as lt
from .. import samplers as smpl
from ...utils import vecmath as vm
from .path import _light_select_dist, _shading_frame, _shading_frame_du, _to_local, _to_world

DIM_CAMERA = 5


def _direct_one_light(scene, light_idx, sel_pdf, it, b, ss, ts, u_light, u_scatter, accel, mis=True):
    """estimate_direct for a chosen light (reference integrator.rs:406).

    Light-sampling half only (callers pair it with BSDF-hit MIS when they
    trace continuation rays; whitted/directlighting don't need the BSDF
    half for delta-free scenes but we keep MIS weights for area lights).
    """
    wo_l = _to_local(it.wo, ss, ts, it.ns)
    ls = lt.sample_li(scene, light_idx, it.p, u_light)
    wi_l = _to_local(ls.wi, ss, ts, it.ns)
    reflect = vm.dot(ls.wi, it.ng) * vm.dot(it.wo, it.ng) > 0.0
    f = bx.bsdf_f(b, wo_l, wi_l, reflect) * bx.abs_cos_theta(wi_l)[..., None]
    scat_pdf = bx.bsdf_pdf(b, wo_l, wi_l)
    ok = (
        it.valid
        & (ls.pdf > 0.0)
        & jnp.any(ls.li > 0.0, axis=-1)
        & jnp.any(f > 0.0, axis=-1)
    )
    p_shadow = vm.offset_ray_origin(it.p, it.p_error, it.ng, ls.wi)
    delta_sh = ls.p_target - p_shadow
    dist = vm.length(delta_sh)
    sh_d = delta_sh / jnp.maximum(dist, 1e-12)[..., None]
    occluded = si.scene_intersect_p(scene, p_shadow, sh_d, dist * (1.0 - 1e-3), accel)
    if mis:
        w = jnp.where(ls.is_delta, 1.0, smp.power_heuristic(1.0, ls.pdf, 1.0, scat_pdf))
    else:
        w = jnp.ones_like(ls.pdf)
    ld = f * ls.li * (w / jnp.maximum(ls.pdf * sel_pdf, 1e-12))[..., None]
    return jnp.where((ok & ~occluded)[..., None], ld, 0.0)


def uniform_sample_all_lights(scene, cfg_s, ctx, it, b, ss, ts, dim0, accel):
    """One sample from EVERY light (reference integrator.rs:300)."""
    n = it.p.shape[0]
    L = jnp.zeros((n, 3), jnp.float32)
    one = jnp.ones(n, jnp.float32)
    for li in range(scene.n_lights):
        u_light = smpl.get_2d(cfg_s, ctx, dim0 + 2 * li)
        idx = jnp.full(n, li, jnp.int32)
        L = L + _direct_one_light(
            scene, idx, one, it, b, ss, ts, u_light,
            None, accel, mis=False,
        )
    return L


def uniform_sample_one_light(scene, cfg_s, ctx, it, b, ss, ts, dim0, accel, light_dist):
    """One light chosen by power (reference integrator.rs:359)."""
    u_sel = smpl.get_1d(cfg_s, ctx, dim0)
    u_light = smpl.get_2d(cfg_s, ctx, dim0 + 1)
    li_idx, sel_pdf, _ = smp.sample_distribution_1d_discrete(light_dist, u_sel)
    return _direct_one_light(
        scene, li_idx, sel_pdf, it, b, ss, ts, u_light, None, accel, mis=True
    )


# ---- AO integrator (reference src/integrators/ao.rs) ----

class AOCfg(NamedTuple):
    n_samples: int  # static
    cos_sample: bool  # static


def ao_radiance(scene, acfg: AOCfg, cfg_s, ctx, ray_o, ray_d, accel=None):
    it = si.scene_intersect(scene, ray_o, ray_d, jnp.full(ray_o.shape[0], vm.INFINITY), accel)
    n = ray_o.shape[0]
    # frame on TRUE geometry face-forwarded to the ray (reference ao.rs:71-74)
    nf = vm.face_forward(it.ng, -ray_d)
    ss, ts = _shading_frame(nf)
    acc = jnp.zeros(n, jnp.float32)
    for s in range(acfg.n_samples):
        u = smpl.get_2d(cfg_s, ctx, DIM_CAMERA + 2 * s)
        if acfg.cos_sample:
            wi_l = smp.cosine_sample_hemisphere(u)
            pdf = smp.cosine_hemisphere_pdf(jnp.abs(wi_l[..., 2]))
        else:
            wi_l = smp.uniform_sample_hemisphere(u)
            pdf = jnp.full(n, smp.UNIFORM_HEMISPHERE_PDF, jnp.float32)
        wi = _to_world(wi_l, ss, ts, nf)
        o = vm.offset_ray_origin(it.p, it.p_error, nf, wi)
        occ = si.scene_intersect_p(scene, o, wi, jnp.full(n, vm.INFINITY), accel)
        # contribution dot(wi,n)/pdf (NO 1/pi: matches reference ao.rs:94)
        contrib = jnp.where(
            (pdf > 0.0) & ~occ & it.valid,
            vm.dot(wi, nf) / jnp.maximum(pdf, 1e-9),
            0.0,
        )
        acc = acc + contrib
    acc = acc / acfg.n_samples
    return jnp.repeat(acc[..., None], 3, axis=-1)


# ---- Whitted (reference src/integrators/whitted.rs) ----

class WhittedCfg(NamedTuple):
    max_depth: int  # static


def whitted_radiance(scene, wcfg: WhittedCfg, cfg_s, ctx, ray_o, ray_d, accel=None,
                     diffs=None):
    """Whitted: direct from all lights (no MIS) + specular recursion
    (reference whitted.rs + integrator.rs:259-294 specular_reflect/transmit)."""
    n = ray_o.shape[0]
    zero3 = ray_o * 0.0
    L = zero3
    beta = zero3 + 1.0
    alive = zero3[..., 0] == 0.0
    o, d = ray_o, ray_d

    for depth in range(wcfg.max_depth):
        it = si.scene_intersect(scene, o, d, jnp.full(n, vm.INFINITY), accel)
        hit = it.valid & alive
        if scene.n_lights > 0:
            hl = jnp.where(hit, it.light, -1)
            le = lt.area_light_emitted(scene, jnp.maximum(hl, 0), it.ns, it.wo)
            L = L + jnp.where((hl >= 0)[..., None], beta * le, 0.0)
        if scene.has_env:
            esc = alive & ~it.valid
            L = L + jnp.where(esc[..., None], beta * lt.env_le(scene, d), 0.0)
        alive = alive & it.valid

        if diffs is not None and depth == 0:
            from ...ops import differentials as rdiff

            tex_width = rdiff.duv_width_at_hit(scene, it, diffs)
        else:
            tex_width = None
        b = bx.make_bsdf_at(scene, it, width=tex_width)
        ss, ts = _shading_frame_du(it.ns, it.dpdu)
        dim0 = DIM_CAMERA + depth * (2 * max(scene.n_lights, 1) + 3)
        if scene.n_lights > 0:
            ld = uniform_sample_all_lights(scene, cfg_s, ctx, it, b, ss, ts, dim0, accel)
            L = L + jnp.where(alive[..., None], beta * ld, 0.0)

        # specular continuation only
        wo_l = _to_local(it.wo, ss, ts, it.ns)
        u2 = smpl.get_2d(cfg_s, ctx, dim0 + 2 * max(scene.n_lights, 1))
        uc = smpl.get_1d(cfg_s, ctx, dim0 + 2 * max(scene.n_lights, 1) + 2)
        bs = bx.bsdf_sample(b, wo_l, u2, uc)
        cont = alive & bs.is_specular & (bs.pdf > 0.0) & jnp.any(bs.f > 0.0, axis=-1)
        wi_w = _to_world(bs.wi, ss, ts, it.ns)
        beta = jnp.where(
            cont[..., None],
            beta * bs.f * (vm.absdot(wi_w, it.ns) / jnp.maximum(bs.pdf, 1e-12))[..., None],
            beta,
        )
        o = jnp.where(cont[..., None], vm.offset_ray_origin(it.p, it.p_error, it.ng, wi_w), o)
        d = jnp.where(cont[..., None], wi_w, d)
        alive = cont
    return L


# ---- DirectLighting (reference src/integrators/directlighting.rs) ----

class DirectLightingCfg(NamedTuple):
    max_depth: int  # static
    sample_all: bool  # static (LightStrategy::UniformSampleAll)


def directlighting_radiance(scene, dcfg, cfg_s, ctx, ray_o, ray_d, accel=None,
                            diffs=None):
    n = ray_o.shape[0]
    zero3 = ray_o * 0.0
    L = zero3
    beta = zero3 + 1.0
    alive = zero3[..., 0] == 0.0
    o, d = ray_o, ray_d
    light_dist = _light_select_dist(scene) if scene.n_lights > 0 else None

    for depth in range(dcfg.max_depth):
        it = si.scene_intersect(scene, o, d, jnp.full(n, vm.INFINITY), accel)
        hit = it.valid & alive
        if scene.n_lights > 0:
            hl = jnp.where(hit, it.light, -1)
            le = lt.area_light_emitted(scene, jnp.maximum(hl, 0), it.ns, it.wo)
            L = L + jnp.where((hl >= 0)[..., None], beta * le, 0.0)
        if scene.has_env:
            esc = alive & ~it.valid
            L = L + jnp.where(esc[..., None], beta * lt.env_le(scene, d), 0.0)
        alive = alive & it.valid

        if diffs is not None and depth == 0:
            from ...ops import differentials as rdiff

            tex_width = rdiff.duv_width_at_hit(scene, it, diffs)
        else:
            tex_width = None
        b = bx.make_bsdf_at(scene, it, width=tex_width)
        ss, ts = _shading_frame_du(it.ns, it.dpdu)
        dim0 = DIM_CAMERA + depth * (2 * max(scene.n_lights, 1) + 3)
        if scene.n_lights > 0:
            if dcfg.sample_all:
                ld = uniform_sample_all_lights(scene, cfg_s, ctx, it, b, ss, ts, dim0, accel)
            else:
                ld = uniform_sample_one_light(
                    scene, cfg_s, ctx, it, b, ss, ts, dim0, accel, light_dist
                )
            L = L + jnp.where(alive[..., None], beta * ld, 0.0)

        wo_l = _to_local(it.wo, ss, ts, it.ns)
        u2 = smpl.get_2d(cfg_s, ctx, dim0 + 2 * max(scene.n_lights, 1))
        uc = smpl.get_1d(cfg_s, ctx, dim0 + 2 * max(scene.n_lights, 1) + 2)
        bs = bx.bsdf_sample(b, wo_l, u2, uc)
        cont = alive & bs.is_specular & (bs.pdf > 0.0) & jnp.any(bs.f > 0.0, axis=-1)
        wi_w = _to_world(bs.wi, ss, ts, it.ns)
        beta = jnp.where(
            cont[..., None],
            beta * bs.f * (vm.absdot(wi_w, it.ns) / jnp.maximum(bs.pdf, 1e-12))[..., None],
            beta,
        )
        o = jnp.where(cont[..., None], vm.offset_ray_origin(it.p, it.p_error, it.ng, wi_w), o)
        d = jnp.where(cont[..., None], wi_w, d)
        alive = cont
    return L
