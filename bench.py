#!/usr/bin/env python
"""Headline benchmark: Cornell box path tracing throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference renderer's only published throughput signal is the
Cornell progress bar — 1024 16x16 tiles at 1828.38 tiles/s for 500x500 @
8spp on a 28-core CPU (reference docs/source/getting_started.rst:163-174),
i.e. ~3.57M camera paths/s.  vs_baseline is our paths/s over that.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    # warm the device (first op through the tunnel is slow)
    x = jnp.ones((256, 256))
    (x @ x).block_until_ready()

    from rs_pbrt_tpu.models import samplers as smpl
    from rs_pbrt_tpu.models.integrators import render as rdr
    from rs_pbrt_tpu.scene import presets

    res = (256, 256)
    spp = 64
    scene, camera = presets.cornell_box(resolution=res)
    cfg = rdr.RenderCfg("path", spp=spp, max_depth=5, rr_threshold=1.0)
    scfg = smpl.make_sampler(smpl.SOBOL, spp, camera.resolution)

    # one 4.2M-lane batch covers the full 64 spp: a single dispatch, no
    # film round-trip between batches (feeding a jitted output back as an
    # input recompiles for its device-chosen layout).  Warm-up compiles the
    # exact timed signature.
    lanes = 1 << 23
    jax.block_until_ready(rdr.render(scene, camera, cfg, scfg, max_lanes=lanes))

    t0 = time.time()
    img = rdr.render(scene, camera, cfg, scfg, max_lanes=lanes)
    jax.block_until_ready(img)
    dt = time.time() - t0

    paths = res[0] * res[1] * spp
    paths_per_s = paths / dt
    baseline = 3.57e6  # reference 28-core CPU camera paths/s
    print(
        json.dumps(
            {
                "metric": "camera_paths/s/chip (Cornell 256x256 path 64spp sobol)",
                "value": round(paths_per_s, 1),
                "unit": "paths/s",
                "vs_baseline": round(paths_per_s / baseline, 3),
            }
        )
    )

    # ---- config #2: Ganesha-scale (BASELINE.md row 3) — 1.31M-triangle
    # displaced icosphere exercising LBVH traversal end to end.  The
    # reference publishes no throughput for its 4.3M-tri statue scene;
    # vs_baseline reuses the only published CPU signal (Cornell tiles/s),
    # which overstates the reference at this scale — conservative for us.
    from rs_pbrt_tpu.ops.scene_intersect import build_accel
    from rs_pbrt_tpu.scene import bigscene

    res2 = (256, 256)
    spp2 = 8
    scene2, camera2 = bigscene.statue_scene(resolution=res2, subdivisions=8)
    accel2 = build_accel(scene2, kind="bvh")
    cfg2 = rdr.RenderCfg("path", spp=spp2, max_depth=5, rr_threshold=1.0)
    scfg2 = smpl.make_sampler(smpl.SOBOL, spp2, res2)
    jax.block_until_ready(
        rdr.render(scene2, camera2, cfg2, scfg2, accel=accel2, max_lanes=lanes)
    )
    t0 = time.time()
    img2 = rdr.render(scene2, camera2, cfg2, scfg2, accel=accel2, max_lanes=lanes)
    jax.block_until_ready(img2)
    dt2 = time.time() - t0
    paths2 = res2[0] * res2[1] * spp2
    print(
        json.dumps(
            {
                "metric": "camera_paths/s/chip (1.31M-tri statue 256x256 path 8spp, LBVH)",
                "value": round(paths2 / dt2, 1),
                "unit": "paths/s",
                "vs_baseline": round(paths2 / dt2 / baseline, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
