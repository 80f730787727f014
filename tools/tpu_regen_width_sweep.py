"""Fine regen lane-width sweep around the 16k optimum (round-5 coarse
sweep: 8k=448k, 16k=549.8k, 32k=527k).  Same-process A/B, sum-readback
timing, default BVH12+unroll=2 traversal (the production config)."""

import sys
import time


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

    def timed(tag, reps=4):
        def run():
            img = rdr.render(scene, camera, cfg, scfg, accel=accel, regen=True)
            float(jnp.sum(img))

        run()  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.time()
            run()
            ts.append(time.time() - t0)
        dt = min(ts)
        print(f"{tag}: {dt*1e3:.0f}ms = {paths/dt/1e3:.1f}k paths/s "
              f"(all {[f'{t*1e3:.0f}' for t in ts]})", flush=True)
        return paths / dt

    best = (0.0, None)
    for w in (12 << 10, 16 << 10, 20 << 10, 24 << 10):
        regenmod.REGEN_LANE_WIDTH = w
        r = timed(f"regen W={w>>10}k")
        if r > best[0]:
            best = (r, w)
    # re-measure the winner and the incumbent back-to-back (chip drift)
    for w in (best[1], 16 << 10):
        regenmod.REGEN_LANE_WIDTH = w
        timed(f"recheck W={w>>10}k")
    return 0


if __name__ == "__main__":
    sys.exit(main())
