"""Round-5 statue A/B: wavefront path regeneration vs the compaction
ladder, regen lane-width sweep, and wide24-vs-wide12 under regen
(ADVICE r4 medium #1: wide24 default must win END-TO-END, not just raw).

Uses the bench statue cache (1.31M tris, 256x256 @ 8spp).  Sum-readback
timing."""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    (jnp.ones((256, 256)) @ jnp.ones((256, 256))).block_until_ready()

    sys.path.insert(0, "/root/repo")
    from bench import CACHE, _statue_cached

    from rs_pbrt_tpu.models import samplers as smpl
    from rs_pbrt_tpu.models.integrators import regen as regenmod
    from rs_pbrt_tpu.models.integrators import render as rdr

    res = (256, 256)
    spp = 8
    scene, camera, accel, _ = _statue_cached(CACHE, 8, res, spp)
    cfg = rdr.RenderCfg("path", spp=spp, max_depth=5, rr_threshold=1.0)
    scfg = smpl.make_sampler(smpl.SOBOL, spp, res)
    paths = res[0] * res[1] * spp

    def timed(tag, accel_v, reps=3, **kw):
        def run():
            img = rdr.render(scene, camera, cfg, scfg, accel=accel_v, **kw)
            float(jnp.sum(img))

        run()
        ts = []
        for _ in range(reps):
            t0 = time.time()
            run()
            ts.append(time.time() - t0)
        dt = min(ts)
        print(f"{tag}: {dt*1e3:.0f}ms = {paths/dt/1e3:.1f}k paths/s "
              f"(all {[f'{t*1e3:.0f}' for t in ts]})", flush=True)
        return dt

    # A. baseline: compaction ladder (regen off), wide24
    timed("ladder wide24", accel, regen=False)
    # B. regen wide24, lane width sweep
    for w in (1 << 16, 1 << 17, 1 << 18):
        regenmod.REGEN_LANE_WIDTH = w
        timed(f"regen wide24 W={w>>10}k", accel, regen=True)
    regenmod.REGEN_LANE_WIDTH = 1 << 16
    # C. regen wide12 (force: drop the wide256 table from the tri LBVH)
    accel12 = accel._replace(
        tri=accel.tri._replace(wide256=None, wide256_dflag=None)
    )
    timed("regen wide12 W=64k", accel12, regen=True)

    # D. traversal knobs under regen: unroll / compact_stages sweeps via a
    # patched dispatch (scene_intersect hardcodes unroll=2, stages=3)
    from rs_pbrt_tpu.ops import bvh as bvhmod
    from rs_pbrt_tpu.ops import scene_intersect as si

    orig24 = bvhmod.bvh24_intersect_tris

    def sweep(unroll, stages):
        def patched(o, d, t_max, w256, depth, any_hit=False, **kw):
            return orig24(o, d, t_max, w256, depth, any_hit=any_hit,
                          unroll=unroll, compact_stages=stages)

        bvhmod.bvh24_intersect_tris = patched
        try:
            # bust the jit cache: the patched traversal must re-trace
            jax.clear_caches()
            timed(f"regen wide24 unroll={unroll} stages={stages}", accel,
                  regen=True)
        finally:
            bvhmod.bvh24_intersect_tris = orig24

    for u, st in ((2, 2), (3, 3), (4, 3), (2, 4)):
        sweep(u, st)
    return 0


if __name__ == "__main__":
    sys.exit(main())
