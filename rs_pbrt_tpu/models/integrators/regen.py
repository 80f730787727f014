"""Wavefront path regeneration: keep every traversal lane ~100% live.

The fixed-depth wavefront (path.radiance) pays full traversal width for
every bounce: dead lanes cost the same as live ones (a 25%-live traversal
costs full price — tools/tpu_probe9.py E), and the argsort compaction
ladder only recovers width in factor-of-4 steps while costing ~1ms per
stage at 64k lanes (~10ms at 512k).  Regeneration replaces the ladder:
dead lanes are REFILLED in-loop with not-yet-traced camera paths, so
every iteration's closest-hit + shadow traversals run at ~full liveness
and the only width waste is the final drain tail.

The reference's analogue is the tile work queue feeding fresh pixels to
idle threads (blockqueue/mod.rs:11-78); wavefront regeneration is the
standard GPU formulation (Laine et al. 2013, PAPERS.md #1) re-shaped for
the TPU: refill bookkeeping is a cumsum + row gathers (no atomics), and
per-path Sobol dimensions come from one hoisted table indexed by path id,
so a path's samples are IDENTICAL to the fixed-depth loop's — the two
estimators agree bit-for-bit per path (tests/test_regen.py).

Eligibility (decided statically by the caller): hoisted Sobol dims
(kind == SOBOL, no PSS override, total dims <= 128) and no camera ray
differentials (diffs gathering per refill is possible but not worth the
extra per-iteration gathers until a textured accel scene needs it).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops import gathers as gx
from ...ops import scene_intersect as si
from ...models import samplers as smpl
from ...utils import vecmath as vm
from .path import (
    DIM_CAMERA,
    DIMS_PER_BOUNCE,
    SSS_EXTRA_DIMS,
    PathCfg,
    _add_emitted,
    _light_select_dist,
    _shade_and_extend,
)

# per-dispatch lane width of the regeneration loop; total paths per
# dispatch may be much larger (the loop streams them through).
# Round-5 width sweep on the statue (cache-busted, call-time knob):
# 8k=448k / 16k=549.8k / 32k=527k / 64k=509k / 128k=432k / 256k=325k
# paths/s — narrower lanes iterate more but each iteration's row gathers
# and argfree refill are cheaper; 16k is the sweet spot
REGEN_LANE_WIDTH = 1 << 14


def eligible(scene, cfg: PathCfg, sampler_cfg, ctx, accel, n_paths,
             time=None, diffs=None, lane_width=None):
    """Host-side static check: can radiance_regen serve this call?"""
    if lane_width is None:
        lane_width = REGEN_LANE_WIDTH
    dims_per_bounce = DIMS_PER_BOUNCE + (
        SSS_EXTRA_DIMS if scene.has_subsurface else 0
    )
    total = dims_per_bounce * cfg.max_depth
    return (
        accel is not None
        and cfg.max_depth > 0
        and sampler_cfg.kind == smpl.SOBOL
        and ctx.pss is None
        and 0 < total <= 128
        and diffs is None
        and n_paths > lane_width  # no refill opportunity below one width
    )


def radiance_regen(
    scene,
    cfg: PathCfg,
    sampler_cfg,
    ctx,
    ray_o,
    ray_d,
    accel,
    light_distrib=None,
    time=None,
    lane_width=None,
):
    """Estimate L for n_paths camera rays with a lane_width regeneration
    loop.  Returns (n_paths, 3) in path order — identical layout (and,
    per path, identical samples/arithmetic) to path.radiance, so the
    caller's film path is unchanged."""
    n_paths = ray_o.shape[0]
    # read the module knob at CALL time (a def-time default would freeze
    # it and silently ignore A/B sweeps — round-5 lesson)
    W = min(lane_width or REGEN_LANE_WIDTH, n_paths)
    light_dist = _light_select_dist(scene) if scene.n_lights > 0 else None
    if light_distrib is not None:
        from .. import lightdistrib as ldist

        def dist_at(p):
            return ldist.lookup(light_distrib, p)
    else:
        def dist_at(p):
            return light_dist

    dims_per_bounce = DIMS_PER_BOUNCE + (
        SSS_EXTRA_DIMS if scene.has_subsurface else 0
    )
    total_dims = dims_per_bounce * cfg.max_depth
    # one Sobol launch for every path x bounce dim (path.radiance hoists
    # the same table; here rows are gathered by PATH ID so a refilled lane
    # consumes exactly the dims the fixed-depth loop would have)
    all_dims = smpl.get_dims(sampler_cfg, ctx, DIM_CAMERA, total_dims)

    time_tab = time if time is not None else None
    md = cfg.max_depth

    def gather_path(idx):
        """Lane init data for path ids idx (clipped; caller masks)."""
        ii = jnp.clip(idx, 0, n_paths - 1)
        o = gx.take_rows(ray_o, ii)
        d = gx.take_rows(ray_d, ii)
        t = gx.take_rows(time_tab[:, None], ii)[:, 0] if time_tab is not None else None
        return o, d, t

    def body(carry):
        (nxt, o, d, L, beta, alive, spec, prev_pdf, eta, bounce, pid,
         t_lane, out) = carry
        # --- one path vertex for every lane (each at its own depth) ---
        t_cast = jnp.where(alive, vm.INFINITY, -1.0)
        it = si.scene_intersect(scene, o, d, t_cast, accel, time=t_lane)
        L = _add_emitted(scene, dist_at, it, o, d, L, beta, alive, spec,
                         prev_pdf)
        alive = alive & it.valid
        # the vertex at max_depth only collects emission (the fixed-depth
        # loop's final pass)
        at_limit = bounce >= md
        dims_row = gx.take_rows(all_dims, jnp.clip(pid, 0, n_paths - 1))
        dims = jnp.zeros((W, dims_per_bounce), all_dims.dtype)
        for b_ in range(md):
            sel = (bounce == b_)[:, None]
            dims = jnp.where(
                sel, dims_row[:, b_ * dims_per_bounce:(b_ + 1) * dims_per_bounce],
                dims,
            )
        state = _shade_and_extend(
            scene, cfg, accel, t_lane, dist_at, light_dist, None, dims,
            bounce, it,
            (o, d, L, beta, alive & ~at_limit, spec, prev_pdf, eta),
        )
        o, d, L, beta, alive, spec, prev_pdf, eta = state
        bounce = jnp.where(alive, bounce + 1, bounce)

        # --- write finished paths, refill dead lanes ---
        dead = ~alive
        write_idx = jnp.where(dead & (pid >= 0), pid, n_paths)
        out = out.at[write_idx].set(L, mode="drop")
        rank = jnp.cumsum(dead.astype(jnp.int32)) - 1
        new_id = nxt + rank
        fill = dead & (new_id < n_paths)
        no, nd, nt = gather_path(new_id)
        o = jnp.where(fill[:, None], no, o)
        d = jnp.where(fill[:, None], nd, d)
        if t_lane is not None:
            t_lane = jnp.where(fill, nt, t_lane)
        L = jnp.where(fill[:, None], 0.0, L)
        beta = jnp.where(fill[:, None], 1.0, beta)
        spec = jnp.where(fill, True, spec)
        prev_pdf = jnp.where(fill, 1.0, prev_pdf)
        eta = jnp.where(fill, 1.0, eta)
        bounce = jnp.where(fill, 0, bounce)
        pid = jnp.where(fill, new_id, jnp.where(dead, -1, pid))
        alive = alive | fill
        nxt = jnp.minimum(nxt + jnp.sum(dead.astype(jnp.int32)), n_paths)
        return (nxt, o, d, L, beta, alive, spec, prev_pdf, eta, bounce,
                pid, t_lane, out)

    def cond(carry):
        nxt, alive = carry[0], carry[5]
        return (nxt < n_paths) | jnp.any(alive)

    pid0 = jnp.arange(W, dtype=jnp.int32)
    o0, d0, t0 = gather_path(pid0)
    zero3 = o0 * 0.0
    zero1 = zero3[..., 0]
    # varying-derived zeros: under shard_map the carries must inherit the
    # ray shard's device-varying axes or the while_loop rejects the
    # carry-type mismatch (same rule as sppm._photon_pass accumulators)
    zi = (jnp.sum(ray_o[:1, :1]) * 0.0).astype(jnp.int32)
    zf = jnp.sum(ray_o[:1, :1]) * 0.0
    carry = (
        jnp.int32(W) + zi,
        o0, d0, zero3, zero3 + 1.0,
        zero1 == 0.0,            # alive
        zero1 == 0.0,            # specular_bounce
        zero1 + 1.0,             # prev_bsdf_pdf
        zero1 + 1.0,             # eta_scale
        jnp.zeros(W, jnp.int32) + zi,  # bounce
        pid0 + zi,
        t0,
        jnp.zeros((n_paths, 3), jnp.float32) + zf,
    )
    carry = jax.lax.while_loop(cond, body, carry)
    return carry[-1]
