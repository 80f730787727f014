"""Wavefront path integrator with NEE + MIS and Russian roulette.

TPU-native replacement for reference src/integrators/path.rs:59-281 +
src/core/integrator.rs:300-570 (uniform_sample_one_light/estimate_direct).
The reference's per-ray iterative loop maps to a ``lax.fori_loop`` over
bounces for a whole wavefront of (pixel, sample) lanes — one compiled
bounce body regardless of max_depth; terminated lanes are masked rather
than compacted (compaction is a planned optimization).

Estimator: single BSDF sample per bounce reused for both MIS-against-NEE
and path extension (the wavefront/pbrt-v4 formulation — 2 ray casts per
bounce instead of the reference's 3; identical expectation, the
power-heuristic weights pair NEE light samples with BSDF-sampled emissive
hits).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import bsdf as bx
from ...ops import bvh as bvhmod
from ...ops import sampling as smp
from ...ops import scene_intersect as si
from ...scene import arrays as sa
from ...models import lights as lt
from ...models import samplers as smpl
from ...utils import vecmath as vm

# per-bounce sampler-dimension layout (after camera dims 0-4):
#   +0 light select, +1,2 light u, +3,4 bsdf u, +5 bsdf lobe choice, +6 rr
DIMS_PER_BOUNCE = 7
DIM_CAMERA = 5


class PathCfg(NamedTuple):
    max_depth: int  # static (reference default 5, api.rs:248)
    rr_threshold: float  # static (reference path.rs:254 after bounce 3)


def _shading_frame(ns):
    return vm.coordinate_system(ns)


def _to_local(v, ss, ts, ns):
    return jnp.stack([vm.dot(v, ss), vm.dot(v, ts), vm.dot(v, ns)], axis=-1)


def _to_world(v, ss, ts, ns):
    return v[..., 0:1] * ss + v[..., 1:2] * ts + v[..., 2:3] * ns


def _light_select_dist(scene: sa.Scene):
    return smp.make_distribution_1d(scene.light_power)


def radiance(
    scene: sa.Scene,
    cfg: PathCfg,
    sampler_cfg: smpl.SamplerCfg,
    ctx: smpl.SampleCtx,
    ray_o,
    ray_d,
    accel: Optional[bvhmod.LBVH] = None,
):
    """Estimate L for a wavefront of camera rays.  Returns (N,3)."""
    n = ray_o.shape[0]
    light_dist = _light_select_dist(scene) if scene.n_lights > 0 else None

    def body(bounce, state):
        o, d, L, beta, alive, specular_bounce, prev_bsdf_pdf, eta_scale = state
        it = si.scene_intersect(scene, o, d, jnp.full(n, vm.INFINITY), accel)
        hit = it.valid & alive

        # --- emitted radiance at hit (reference path.rs:97-116) ---
        if scene.n_lights > 0:
            hit_light = jnp.where(hit, it.light, -1)
            is_emitter = hit_light >= 0
            le = lt.area_light_emitted(scene, jnp.maximum(hit_light, 0), it.ns, it.wo)
            le = jnp.where(is_emitter[..., None], le, 0.0)
            sel_pdf = smp.distribution_1d_discrete_pdf(
                light_dist, jnp.maximum(hit_light, 0)
            )
            area_pdf = lt.pdf_li_area(scene, jnp.maximum(hit_light, 0), o, it.p, it.ns)
            light_pdf = sel_pdf * area_pdf
            w_bsdf = jnp.where(
                specular_bounce,
                1.0,
                smp.power_heuristic(1.0, prev_bsdf_pdf, 1.0, light_pdf),
            )
            # detached-sampling AD: MIS weights are sampling artifacts
            w_bsdf = jax.lax.stop_gradient(w_bsdf)
            L = L + beta * le * w_bsdf[..., None]

        # --- escaped rays: env light (reference path.rs:102-115) ---
        if scene.has_env:
            esc = alive & ~it.valid
            le_env = lt.env_le(scene, d)
            env_sel = smp.distribution_1d_discrete_pdf(
                light_dist, jnp.argmax(scene.light_type == sa.LIGHT_INFINITE)
            )
            env_pdf = env_sel * lt.pdf_li_env(scene, d)
            w_env = jnp.where(
                specular_bounce, 1.0, smp.power_heuristic(1.0, prev_bsdf_pdf, 1.0, env_pdf)
            )
            L = L + jnp.where(esc[..., None], beta * le_env * w_env[..., None], 0.0)

        alive = alive & it.valid & (bounce < cfg.max_depth)
        dim0 = DIM_CAMERA + bounce * DIMS_PER_BOUNCE
        dims = smpl.get_dims(sampler_cfg, ctx, dim0, DIMS_PER_BOUNCE)
        def u1(k):
            return dims[:, k] if dims is not None else smpl.get_1d_dyn(sampler_cfg, ctx, dim0 + k)
        def u2d(k):
            return (dims[:, k : k + 2] if dims is not None
                    else smpl.get_2d_dyn(sampler_cfg, ctx, dim0 + k))

        # --- build BSDF at hit ---
        b = bx.make_bsdf_at(scene, it)
        ss, ts = _shading_frame(it.ns)
        wo_l = _to_local(it.wo, ss, ts, it.ns)
        non_spec = lambda k: (k != bx.LOBE_NONE) & (k != bx.LOBE_SPEC_REFL) & (
            k != bx.LOBE_FRESNEL_SPEC
        )
        has_nonspecular = non_spec(b.kind0) | non_spec(b.kind1)

        # --- NEE: sample one light (reference integrator.rs:359-570) ---
        if scene.n_lights > 0:
            u_select = u1(0)
            u_light = u2d(1)
            li_idx, sel_pdf_n, _ = smp.sample_distribution_1d_discrete(light_dist, u_select)
            ls = lt.sample_li(scene, li_idx, it.p, u_light)
            wi_l = _to_local(ls.wi, ss, ts, it.ns)
            reflect = vm.dot(ls.wi, it.ng) * vm.dot(it.wo, it.ng) > 0.0
            f = bx.bsdf_f(b, wo_l, wi_l, reflect) * bx.abs_cos_theta(wi_l)[..., None]
            scat_pdf = bx.bsdf_pdf(b, wo_l, wi_l)
            contrib_ok = (
                alive
                & has_nonspecular
                & (ls.pdf > 0.0)
                & jnp.any(ls.li > 0.0, axis=-1)
                & jnp.any(f > 0.0, axis=-1)
            )
            p_shadow = vm.offset_ray_origin(it.p, it.p_error, it.ng, ls.wi)
            delta_sh = ls.p_target - p_shadow
            dist = vm.length(delta_sh)
            sh_d = delta_sh / jnp.maximum(dist, 1e-12)[..., None]
            occluded = si.scene_intersect_p(
                scene, p_shadow, sh_d, dist * (1.0 - 1e-3), accel
            )
            w_light = jnp.where(
                ls.is_delta, 1.0, smp.power_heuristic(1.0, ls.pdf, 1.0, scat_pdf)
            )
            # detached sampling: weight and pdfs are constants under AD;
            # gradient flows through f and li only (the standard detached
            # estimator - gradients are unbiased for fixed sample sets)
            inv_pdf = jax.lax.stop_gradient(
                w_light / jnp.maximum(ls.pdf * sel_pdf_n, 1e-12)
            )
            ld = beta * f * ls.li * inv_pdf[..., None]
            L = L + jnp.where((contrib_ok & ~occluded)[..., None], ld, 0.0)

        # --- BSDF sample for extension + MIS (reference path.rs:147-190) ---
        u_bsdf = u2d(3)
        u_lobe = u1(5)
        bs = bx.bsdf_sample(b, wo_l, u_bsdf, u_lobe)
        # detach the sampled direction and its pdf (direction is a sampling
        # decision; f stays differentiable w.r.t. material params)
        wi_w = jax.lax.stop_gradient(_to_world(bs.wi, ss, ts, it.ns))
        cos_wi = jax.lax.stop_gradient(vm.absdot(wi_w, it.ns))
        ok = (bs.pdf > 0.0) & jnp.any(bs.f > 0.0, axis=-1)
        beta_next = beta * bs.f * (
            cos_wi / jnp.maximum(jax.lax.stop_gradient(bs.pdf), 1e-12)
        )[..., None]
        beta = jnp.where((alive & ok)[..., None], beta_next, beta)
        alive = alive & ok
        specular_bounce = jnp.where(alive, bs.is_specular, specular_bounce)
        prev_bsdf_pdf = jnp.where(alive, jnp.where(bs.is_specular, 1.0, bs.pdf), prev_bsdf_pdf)
        # track refraction radiance scaling for RR (reference path.rs:174-187)
        etas = jnp.where(bs.is_transmission, b.eta * b.eta, jnp.ones_like(b.eta))
        eta_scale = eta_scale * jnp.where(
            bs.is_transmission & (bx.cos_theta(wo_l) > 0),
            1.0 / jnp.maximum(etas, 1e-6),
            etas,
        )

        o = jnp.where(
            alive[..., None], vm.offset_ray_origin(it.p, it.p_error, it.ng, wi_w), o
        )
        d = jnp.where(alive[..., None], wi_w, d)

        # --- Russian roulette after bounce 3 (reference path.rs:253-262) ---
        rr_active = bounce > 2
        rr_beta_max = jax.lax.stop_gradient(jnp.max(beta * eta_scale[..., None], axis=-1))
        q = jnp.maximum(0.05, 1.0 - rr_beta_max)
        u_rr = u1(6)
        consider = rr_active & (rr_beta_max < cfg.rr_threshold) & alive
        kill = consider & (u_rr < q)
        beta = jnp.where(
            (consider & ~kill)[..., None], beta / jnp.maximum(1.0 - q, 1e-6)[..., None], beta
        )
        alive = alive & ~kill

        return o, d, L, beta, alive, specular_bounce, prev_bsdf_pdf, eta_scale

    # derive the initial carry from ray_o so every leaf inherits ray_o's
    # device-varying axes (required for fori_loop under shard_map)
    zero3 = ray_o * 0.0
    zero1 = zero3[..., 0]
    true1 = zero1 == 0.0
    state = (
        ray_o,
        ray_d,
        zero3,
        zero3 + 1.0,
        true1,
        true1,
        zero1 + 1.0,
        zero1 + 1.0,
    )
    state = jax.lax.fori_loop(0, cfg.max_depth + 1, body, state)
    return state[2]
