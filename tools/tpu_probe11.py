"""Round-5 probe #2: why does finalize=True cost +60-100ms at HEAD when it
SAVED 30ms in r3 (tools/tpu_probe10.py: D no-finalize 110ms vs E finalize
167-207ms, and zero-radiance B still 203ms)?  Variants isolate: output
arity, readback method, fused-vs-separate to_rgb, and the finalize path
with zero radiance."""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    (jnp.ones((256, 256)) @ jnp.ones((256, 256))).block_until_ready()

    from rs_pbrt_tpu.models import samplers as smpl
    from rs_pbrt_tpu.models.integrators import render as rdr
    from rs_pbrt_tpu.ops import film as filmmod
    from rs_pbrt_tpu.ops import pallas_path as pp
    from rs_pbrt_tpu.scene import presets

    res = (256, 256)
    spp = 64
    scene, camera = presets.cornell_box(resolution=res)
    scfg = smpl.make_sampler(smpl.SOBOL, spp, camera.resolution)
    mega = pp.mega_cfg(scene, None, None)
    paths = res[0] * res[1] * spp
    fcfg = filmmod.make_filter(filmmod.FILTER_BOX)
    rect = (0, 256, 0, 256)

    def t_of(name, fn, reps=5):
        fn()
        ts = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        dt = min(ts)
        print(f"{name}: {dt*1e3:.0f}ms = {paths/dt/1e6:.1f}M paths/s "
              f"(all: {[f'{t*1e3:.0f}' for t in ts]})", flush=True)

    def batch(finalize):
        return rdr.render_batch(
            scene, None, camera, "path", 5, 1.0, scfg, None, fcfg, None,
            jnp.uint32(0), None, grid_spp=spp, grid_rect=rect, extra=(),
            mega=mega, finalize=finalize,
        )

    # 1. no-finalize, read one elem (probe10 D, repeated for today's floor)
    t_of("D  no-finalize, rgb[0,0]", lambda: np.asarray(batch(False).rgb[0, 0]))

    # 2. no-finalize, full film readback
    t_of("D2 no-finalize, asarray(rgb)", lambda: np.asarray(batch(False).rgb))

    # 3. finalize, asarray(img) (probe10 E)
    t_of("E  finalize, asarray(img)", lambda: np.asarray(batch(True)[1]))

    # 4. finalize, sum-readback
    t_of("E2 finalize, float(sum(img))",
         lambda: float(jnp.sum(batch(True)[1])))

    # 5. separate to_rgb dispatch (the r3 129ms pattern)
    to_rgb_j = jax.jit(filmmod.to_rgb)
    t_of("F  no-finalize + separate to_rgb",
         lambda: np.asarray(to_rgb_j(batch(False))))

    # 6. zero-radiance with and without finalize
    real = rdr.radiance_fn
    rdr.radiance_fn = lambda *a, **k: (
        lambda scene, cfg_s, ctx, o, d, accel, ld=None, time=None,
        diffs=None: o * 0.0
    )
    try:
        t_of("B0 zero-rad no-finalize", lambda: np.asarray(batch(False).rgb[0, 0]))
        t_of("B1 zero-rad finalize", lambda: np.asarray(batch(True)[1]))
    finally:
        rdr.radiance_fn = real
    return 0


if __name__ == "__main__":
    sys.exit(main())
