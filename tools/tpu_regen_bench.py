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
    # C. regen wide12 (force: drop the wide256 table)
    accel12 = accel._replace(wide256=None, wide256_dflag=None)
    timed("regen wide12 W=64k", accel12, regen=True)
    timed("ladder wide12", accel12, regen=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
