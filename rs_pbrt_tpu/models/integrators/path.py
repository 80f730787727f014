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
# scenes with subsurface materials append 8 more per bounce:
#   +7 probe axis/channel/pick, +8,9 probe r/phi, +10 sss light select,
#   +11,12 sss light u, +13,14 sss continuation dir
DIMS_PER_BOUNCE = 7
SSS_EXTRA_DIMS = 8
DIM_CAMERA = 5

# probe-chain length: the reference walks an unbounded intersection chain
# (bssrdf.rs:213-246); 4 covers entry+exit of a closed object plus two
# internal sheets
SSS_PROBE_HITS = 4


class PathCfg(NamedTuple):
    max_depth: int  # static (reference default 5, api.rs:248)
    rr_threshold: float  # static (reference path.rs:254 after bounce 3)


def _shading_frame(ns):
    return vm.coordinate_system(ns)


def _shading_frame_du(ns, dpdu):
    """BSDF frame with x-axis along the surface u-tangent (reference
    reflection.rs Bsdf::new: ss = normalize(shading.dpdu)), orthogonalized
    against ns; arbitrary frame when dpdu is degenerate.  The tangent
    orientation matters for anisotropic lobes and is the fiber axis for
    the hair BSDF."""
    ss = dpdu - ns * vm.dot(ns, dpdu)[..., None]
    degen = vm.length_squared(ss) < 1e-14
    ss_fb, _ = vm.coordinate_system(ns)
    ss = jnp.where(degen[..., None], ss_fb, vm.normalize(jnp.where(degen[..., None], ss_fb, ss)))
    ts = vm.cross(ns, ss)
    return ss, ts


def _to_local(v, ss, ts, ns):
    return jnp.stack([vm.dot(v, ss), vm.dot(v, ts), vm.dot(v, ns)], axis=-1)


def _to_world(v, ss, ts, ns):
    return v[..., 0:1] * ss + v[..., 1:2] * ts + v[..., 2:3] * ns


def _light_select_dist(scene: sa.Scene):
    return smp.make_distribution_1d(scene.light_power)




def sss_transport(
    scene, accel, it, bs, ss, ts, beta, L, alive, o, d,
    specular_bounce, prev_bsdf_pdf, light_dist, u1, u2d, sss_dim0,
    eligible=None,
):
    """BSSRDF subsurface transport after a transmissive surface bounce
    (reference path.rs:191-249; shared by path and volpath).  uX(k) index
    RELATIVE offsets: probe u1 at sss_dim0, probe u2 at sss_dim0+1,2, NEE
    select/light at sss_dim0+3..5, continuation at sss_dim0+6,7.
    Returns (L, beta, o, d, alive, specular_bounce, prev_bsdf_pdf)."""
    from ...ops import bssrdf as bss
    from ...ops import gathers as gx
    from ...ops import scene_intersect as si

    n = o.shape[0]

    ma_row = gx.take_rows(scene.mat_attr, it.mat)
    bss_id = jnp.round(ma_row[..., sa.MA_PARAMS + sa.MP_BSSRDF]).astype(jnp.int32)
    do_sss = alive & (bss_id >= 0) & bs.is_transmission
    if eligible is not None:
        do_sss = do_sss & eligible
    bid = jnp.maximum(bss_id, 0)
    B = scene.bss_profile.shape[0]
    K = scene.bss_profile.shape[-1]
    flat = lambda a: gx.take_rows(a.reshape(B, -1), bid)
    prof = flat(scene.bss_profile).reshape(n, 3, K)
    cdfs = flat(scene.bss_cdf).reshape(n, 3, K)
    rho_eff = flat(scene.bss_rho_eff)
    sigma_t = flat(scene.bss_sigma_t)
    eta_b = flat(scene.bss_eta[:, None])[:, 0]

    # axis / channel / chain-pick decisions (bssrdf.rs:150-179)
    u1s = u1(sss_dim0)
    u2s = u2d(sss_dim0 + 1)
    ax_tan = u1s < 0.5
    ax_bi = (u1s >= 0.5) & (u1s < 0.75)
    u1r = jnp.where(ax_tan, u1s * 2.0, jnp.where(ax_bi, (u1s - 0.5) * 4.0, (u1s - 0.75) * 4.0))
    nsv = it.ns
    pick3 = lambda a, b_, c: jnp.where(ax_tan[..., None], a, jnp.where(ax_bi[..., None], b_, c))
    vx = pick3(ss, ts, nsv)
    vy = pick3(ts, nsv, ss)
    vz = pick3(nsv, ss, ts)
    ch = jnp.clip((u1r * 3.0).astype(jnp.int32), 0, 2)
    u1r = u1r * 3.0 - ch.astype(jnp.float32)
    takec = lambda a: jnp.take_along_axis(a, ch[..., None], axis=1)[:, 0]
    prof_ch = jnp.take_along_axis(prof, ch[..., None, None], axis=1)[:, 0]
    cdf_ch = jnp.take_along_axis(cdfs, ch[..., None, None], axis=1)[:, 0]
    sig_ch = takec(sigma_t)
    r_s = bss.sample_sr_channel(prof_ch, cdf_ch, sig_ch, u2s[..., 0])
    r_max = bss.sample_sr_channel(
        prof_ch, cdf_ch, sig_ch, jnp.full_like(u1r, 0.999)
    )
    probe_ok = (r_s >= 0.0) & (r_s < r_max)
    half_l = jnp.sqrt(jnp.maximum(r_max * r_max - r_s * r_s, 0.0))
    phi_s = 2.0 * jnp.pi * u2s[..., 1]
    base = (
        it.p
        + r_s[..., None] * (vx * jnp.cos(phi_s)[..., None] + vy * jnp.sin(phi_s)[..., None])
        - vz * half_l[..., None]
    )
    total_l = 2.0 * half_l

    # probe chain (bssrdf.rs:209-246): unrolled fixed-length walk
    # collecting hits on the SAME material
    cur_o = base
    remaining = total_l
    cand_valid, cand_p, cand_ns, cand_ng, cand_perr = [], [], [], [], []
    for _ in range(SSS_PROBE_HITS):
        pit = si.scene_intersect(scene, cur_o, vz, jnp.maximum(remaining, 0.0), accel)
        good = pit.valid & (remaining > 1e-6) & probe_ok & do_sss
        same = good & (pit.mat == it.mat)
        cand_valid.append(same)
        cand_p.append(pit.p)
        cand_ns.append(pit.ns)
        cand_ng.append(pit.ng)
        cand_perr.append(pit.p_error)
        adv = jnp.where(good, pit.t + 1e-4, remaining)
        cur_o = cur_o + vz * adv[..., None]
        remaining = remaining - adv
    cvalid = jnp.stack(cand_valid, 1)  # (n, K)
    n_found = jnp.sum(cvalid.astype(jnp.int32), axis=1)
    sel = jnp.clip(
        (u1r * n_found.astype(jnp.float32)).astype(jnp.int32), 0, jnp.maximum(n_found - 1, 0)
    )
    rank = jnp.cumsum(cvalid.astype(jnp.int32), axis=1) - 1
    pick_mask = cvalid & (rank == sel[:, None])  # one-hot over probes
    pickf = lambda xs: sum(
        jnp.where(pick_mask[:, k : k + 1], xs[k], 0.0) for k in range(SSS_PROBE_HITS)
    )
    pi_p = pickf(cand_p)
    pi_ns = pickf(cand_ns)
    pi_ng = pickf(cand_ng)
    pi_perr = pickf(cand_perr)
    found = do_sss & probe_ok & (n_found > 0)

    # Sp + pdf_sp (bssrdf.rs:102-138, 295-340)
    r_hit = vm.length(pi_p - it.p)
    sp = bss.sr_eval(prof, sigma_t, r_hit)
    dvec = it.p - pi_p
    d_local = jnp.stack(
        [vm.dot(ss, dvec), vm.dot(ts, dvec), vm.dot(nsv, dvec)], axis=-1
    )
    n_local = jnp.stack(
        [vm.dot(ss, pi_ns), vm.dot(ts, pi_ns), vm.dot(nsv, pi_ns)], axis=-1
    )
    r_proj = jnp.stack(
        [
            jnp.sqrt(d_local[..., 1] ** 2 + d_local[..., 2] ** 2),
            jnp.sqrt(d_local[..., 2] ** 2 + d_local[..., 0] ** 2),
            jnp.sqrt(d_local[..., 0] ** 2 + d_local[..., 1] ** 2),
        ],
        axis=-1,
    )
    axis_prob = jnp.asarray([0.25, 0.25, 0.5], jnp.float32)
    pdf_sp = jnp.zeros_like(r_hit)
    for axis in range(3):
        for c in range(3):
            pdf_sp = pdf_sp + (
                bss.pdf_sr_channel(
                    prof[:, c], rho_eff[:, c], sigma_t[:, c], r_proj[..., axis]
                )
                * jnp.abs(n_local[..., axis]) * (1.0 / 3.0) * axis_prob[axis]
            )
    pdf_sp = pdf_sp / jnp.maximum(n_found.astype(jnp.float32), 1.0)
    ok_sss = found & (pdf_sp > 0.0) & jnp.any(sp > 0.0, axis=-1)
    beta_sss = beta * sp / jax.lax.stop_gradient(jnp.maximum(pdf_sp, 1e-12))[..., None]

    # adapter BxDF at the exit point (SeparableBssrdfAdapter,
    # bssrdf.rs:489-514): f = Sw(wi)*eta^2, cosine-sampled
    ss_pi, ts_pi = _shading_frame(pi_ns)
    if scene.n_lights > 0:
        u_sel2 = u1(sss_dim0 + 3)
        u_li2 = u2d(sss_dim0 + 4)
        li2, selp2, _ = smp.sample_distribution_1d_discrete(light_dist, u_sel2)
        ls2 = lt.sample_li(scene, li2, pi_p, u_li2)
        wi2_l = _to_local(ls2.wi, ss_pi, ts_pi, pi_ns)
        f2 = bss.sw_factor(eta_b, wi2_l[..., 2]) * (eta_b * eta_b)
        cos2 = jnp.abs(wi2_l[..., 2])
        pdf_cos2 = cos2 * (1.0 / jnp.pi)
        p_sh2 = vm.offset_ray_origin(pi_p, pi_perr, pi_ng, ls2.wi)
        dsh2 = ls2.p_target - p_sh2
        dist2_ = vm.length(dsh2)
        occ2 = si.scene_intersect_p(
            scene, p_sh2, dsh2 / jnp.maximum(dist2_, 1e-12)[..., None],
            dist2_ * (1.0 - 1e-3), accel,
        )
        w_l2 = jnp.where(
            ls2.is_delta, 1.0, smp.power_heuristic(1.0, ls2.pdf, 1.0, pdf_cos2)
        )
        contrib2 = (
            beta_sss
            * (f2 * cos2)[..., None]
            * ls2.li
            * (
                jax.lax.stop_gradient(w_l2 / jnp.maximum(selp2, 1e-12))
                / jnp.maximum(ls2.pdf, 1e-12)
            )[..., None]
        )
        good2 = ok_sss & ~occ2 & (ls2.pdf > 0.0) & (wi2_l[..., 2] > 0.0)
        L = L + jnp.where(good2[..., None], contrib2, 0.0)

    # continuation: cosine hemisphere about the exit normal
    u_cont = u2d(sss_dim0 + 6)
    wi_c_l = bx.cosine_sample_hemisphere(u_cont)
    wi_c = _to_world(wi_c_l, ss_pi, ts_pi, pi_ns)
    cos_c = jnp.maximum(wi_c_l[..., 2], 0.0)
    pdf_c = cos_c * (1.0 / jnp.pi)
    f_c = bss.sw_factor(eta_b, wi_c_l[..., 2]) * (eta_b * eta_b)
    # beta *= f*|cos|/pdf = f*pi (cosine pdf cancels the cosine)
    beta_sss = beta_sss * (f_c * jnp.pi)[..., None]
    ok_sss = ok_sss & (pdf_c > 0.0)

    # commit SSS lanes: replace ray/beta/MIS state; failed SSS dies
    beta = jnp.where(ok_sss[..., None], beta_sss, beta)
    o = jnp.where(
        ok_sss[..., None],
        vm.offset_ray_origin(pi_p, pi_perr, pi_ng, wi_c),
        o,
    )
    d = jnp.where(ok_sss[..., None], wi_c, d)
    specular_bounce = jnp.where(do_sss, False, specular_bounce)
    prev_bsdf_pdf = jnp.where(do_sss, pdf_c, prev_bsdf_pdf)
    alive = alive & (~do_sss | ok_sss)

    return L, beta, o, d, alive, specular_bounce, prev_bsdf_pdf


def _add_emitted(scene, dist_at, it, o, d, L, beta, alive, specular_bounce,
                 prev_bsdf_pdf):
    """Emitted radiance at a hit + env radiance for escaped rays
    (reference path.rs:97-116).  Shared by the bounce body, the final
    emit-only pass, and the regeneration loop (regen.py)."""
    hit = it.valid & alive
    if scene.n_lights > 0:
        hit_light = jnp.where(hit, it.light, -1)
        is_emitter = hit_light >= 0
        le = lt.area_light_emitted(scene, jnp.maximum(hit_light, 0), it.ns, it.wo)
        le = jnp.where(is_emitter[..., None], le, 0.0)
        sel_pdf = smp.distribution_1d_discrete_pdf(
            dist_at(o), jnp.maximum(hit_light, 0)
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
    if scene.has_env:
        esc = alive & ~it.valid
        le_env = lt.env_le(scene, d)
        env_sel = smp.distribution_1d_discrete_pdf(
            dist_at(o), jnp.argmax(scene.light_type == sa.LIGHT_INFINITE)
        )
        env_pdf = env_sel * lt.pdf_li_env(scene, d)
        w_env = jnp.where(
            specular_bounce, 1.0, smp.power_heuristic(1.0, prev_bsdf_pdf, 1.0, env_pdf)
        )
        L = L + jnp.where(esc[..., None], beta * le_env * w_env[..., None], 0.0)
    return L


def _shade_and_extend(scene, cfg, accel, time, dist_at, light_dist, diffs,
                      dims, bounce, it, state, u1=None, u2d=None):
    """One vertex's shading work: BSDF build, NEE with MIS, BSDF-sampled
    extension, BSSRDF transport, Russian roulette (reference
    path.rs:117-262 + integrator.rs:359-570).

    bounce may be a traced SCALAR (the fixed-depth fori_loop) or a
    PER-LANE vector (the regeneration loop, where each lane sits at its
    own depth) — every use broadcasts.  dims: (N, dims_per_bounce) slice
    of the hoisted Sobol table for this vertex, or None with u1/u2d
    callables for dynamic samplers."""
    o, d, L, beta, alive, specular_bounce, prev_bsdf_pdf, eta_scale = state
    if dims is not None:
        def u1(k):  # noqa: F811
            return dims[:, k]

        def u2d(k):  # noqa: F811
            return dims[:, k : k + 2]

    # --- build BSDF at hit ---
    if diffs is not None:
        from ...ops import differentials as rdiff

        tex_width = jnp.where(
            bounce == 0, rdiff.duv_width_at_hit(scene, it, diffs), 0.0
        )
    else:
        tex_width = None
    b = bx.make_bsdf_at(scene, it, width=tex_width)
    ss, ts = _shading_frame_du(it.ns, it.dpdu)
    ns_sh, ss, ts = bx.apply_bump(scene, it, ss, ts)
    it = it._replace(ns=ns_sh)
    wo_l = _to_local(it.wo, ss, ts, it.ns)
    has_nonspecular = bx.has_nonspecular(b)

    # --- NEE: sample one light (reference integrator.rs:359-570) ---
    if scene.n_lights > 0:
        u_select = u1(0)
        u_light = u2d(1)
        li_idx, sel_pdf_n, _ = smp.sample_distribution_1d_discrete(
            dist_at(it.p), u_select
        )
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
        sh_t = jnp.where(contrib_ok, dist * (1.0 - 1e-3), -1.0)
        occluded = si.scene_intersect_p(
            scene, p_shadow, sh_d, sh_t, accel, time=time
        )
        w_light = jnp.where(
            ls.is_delta, 1.0, smp.power_heuristic(1.0, ls.pdf, 1.0, scat_pdf)
        )
        # detached sampling: the MIS weight and the light-SELECTION pdf
        # are sampling artifacts (constants under AD), but the area
        # pdf's measure-conversion factor (dist^2 / cos) is a real
        # geometric dependence — keeping it differentiable is what
        # carries camera/geometry gradients; material/light gradients
        # are unchanged (the pdf does not depend on those parameters)
        inv_pdf = jax.lax.stop_gradient(
            w_light / jnp.maximum(sel_pdf_n, 1e-12)
        ) / jnp.maximum(ls.pdf, 1e-12)
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

    # --- BSSRDF: subsurface transport (reference path.rs:191-249) ---
    if scene.has_subsurface:
        (L, beta, o, d, alive, specular_bounce, prev_bsdf_pdf) = sss_transport(
            scene, accel, it, bs, ss, ts, beta, L, alive, o, d,
            specular_bounce, prev_bsdf_pdf, light_dist, u1, u2d, 7,
        )

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


def radiance(
    scene: sa.Scene,
    cfg: PathCfg,
    sampler_cfg: smpl.SamplerCfg,
    ctx: smpl.SampleCtx,
    ray_o,
    ray_d,
    accel: Optional[bvhmod.LBVH] = None,
    light_distrib=None,
    mega=None,
    time=None,
    diffs=None,
    regen: bool = False,
):
    """Estimate L for a wavefront of camera rays.  Returns (N,3).

    regen: enable the wavefront path-regeneration loop (regen.py) for
    accelerated scenes — same estimator, ~100% live traversal lanes.
    Forward rendering only: the regeneration while_loop is not
    reverse-mode differentiable, so AD callers leave this False.

    diffs: optional ops/differentials.RayDiffs for the camera rays —
    texture-footprint mip filtering at primary hits (like the reference,
    only camera rays carry differentials; secondary bounces evaluate at
    the finest level, camera.rs:28 / interaction.rs:388).

    time: (N,) per-lane ray times in [0,1] — consumed by animated
    primitives (object motion blur); None = shutter open.

    light_distrib: optional SpatialDistrib (models/lightdistrib.py) — the
    reference's SpatialLightDistribution semantics: light selection pdfs
    depend on the shading point's voxel.
    mega: optional ops/pallas_path.MegaCfg (STATIC, host-derived) — routes
    the whole bounce loop through the single-kernel Pallas megakernel for
    statically-simple scenes (same math, ~2x fewer HBM passes)."""
    n = ray_o.shape[0]
    light_dist = _light_select_dist(scene) if scene.n_lights > 0 else None
    if light_distrib is not None:
        from .. import lightdistrib as ldist

        def dist_at(p):
            return ldist.lookup(light_distrib, p)
    else:
        def dist_at(p):
            return light_dist
    dims_per_bounce = DIMS_PER_BOUNCE + (SSS_EXTRA_DIMS if scene.has_subsurface else 0)

    # hoist ALL bounce dimensions into one Sobol launch (the per-bounce
    # kernel setup — index scrambling etc. — dominated the sampler cost;
    # one (N, total_dims) table + a dynamic slice per bounce is ~6x less).
    # The final emit-only pass consumes no dims, hence max_depth bounces.
    if (
        mega is not None
        and cfg.max_depth > 0
        and sampler_cfg.kind == smpl.SOBOL
        and ctx.pss is None
    ):
        from ...ops import pallas_path as pp
        from ...ops.scene_intersect import _use_pallas

        if _use_pallas() or pp.interpret_enabled():
            # the megakernel generates its own bounce dims in-kernel from
            # the Sobol global index — no hoisted dim table needed
            bits = (
                32
                if sampler_cfg.spp * (4 ** sampler_cfg.log2_resolution) <= (1 << 32)
                else 52
            )
            return pp.mega_radiance(
                scene, mega, cfg, ctx.global_index.hi, ctx.global_index.lo,
                DIM_CAMERA, bits, ray_o, ray_d,
            )

    if regen:
        from . import regen as regen_mod

        if regen_mod.eligible(scene, cfg, sampler_cfg, ctx, accel, n,
                              time=time, diffs=diffs):
            return regen_mod.radiance_regen(
                scene, cfg, sampler_cfg, ctx, ray_o, ray_d, accel,
                light_distrib=light_distrib, time=time,
            )

    total_dims = dims_per_bounce * cfg.max_depth
    all_dims = (
        smpl.get_dims(sampler_cfg, ctx, DIM_CAMERA, total_dims)
        if 0 < total_dims <= 128
        else None
    )

    def add_emitted(it, o, d, L, beta, alive, specular_bounce, prev_bsdf_pdf):
        return _add_emitted(
            scene, dist_at, it, o, d, L, beta, alive, specular_bounce,
            prev_bsdf_pdf,
        )

    def body(bounce, state):
        o, d, L, beta, alive, specular_bounce, prev_bsdf_pdf, eta_scale = state
        # dead lanes get t_max = -1: the traversal's root slab test fails
        # instantly, so wavefront compaction drops them instead of walking
        # the full tree with an unchanged stale ray (on the statue ~50% of
        # lanes are dead from bounce 2 on)
        t_cast = jnp.where(alive, vm.INFINITY, -1.0)
        it = si.scene_intersect(scene, o, d, t_cast, accel, time=time)
        L = add_emitted(it, o, d, L, beta, alive, specular_bounce, prev_bsdf_pdf)
        alive = alive & it.valid
        dim0 = DIM_CAMERA + bounce * dims_per_bounce
        if all_dims is not None:
            dims = jax.lax.dynamic_slice_in_dim(
                all_dims, bounce * dims_per_bounce, dims_per_bounce, axis=1
            )
        else:
            # get_dims returns None for samplers without a batched table
            # (e.g. random/stratified at dynamic dim0) — fall back to
            # per-dim dynamic lookups
            dims = smpl.get_dims(sampler_cfg, ctx, dim0, dims_per_bounce)
        u1 = u2d = None
        if dims is None:
            def u1(k):
                return smpl.get_1d_dyn(sampler_cfg, ctx, dim0 + k)

            def u2d(k):
                return smpl.get_2d_dyn(sampler_cfg, ctx, dim0 + k)
        return _shade_and_extend(
            scene, cfg, accel, time, dist_at, light_dist, diffs, dims,
            bounce, it,
            (o, d, L, beta, alive, specular_bounce, prev_bsdf_pdf, eta_scale),
            u1=u1, u2d=u2d,
        )

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
    if cfg.max_depth > 0:
        state = jax.lax.fori_loop(0, cfg.max_depth, body, state)
    # final pass: the path's last vertex only collects emission (no NEE,
    # no extension) — ~1/3 of a full bounce body's cost
    o, d, L, beta, alive, specular_bounce, prev_bsdf_pdf, _ = state
    it = si.scene_intersect(
        scene, o, d, jnp.where(alive, vm.INFINITY, -1.0), accel
    )
    return add_emitted(it, o, d, L, beta, alive, specular_bounce, prev_bsdf_pdf)
