"""On-chip A/B: 24-wide (1024B-row) vs 12-wide (512B-row) statue
traversal, plus unroll variants.  Forced readback timing."""

import os
import sys
import time

import numpy as np

CACHE = "/tmp/statue_wide24_cache.npz"


def build_cache():
    import jax.numpy as jnp

    from rs_pbrt_tpu.models import cameras as cam
    from rs_pbrt_tpu.ops import bvh_native
    from rs_pbrt_tpu.scene import bigscene

    scene, camera = bigscene.statue_scene(subdivisions=8)
    p0 = np.asarray(scene.tri_p0)
    p1 = np.asarray(scene.tri_p1)
    p2 = np.asarray(scene.tri_p2)
    bmin = np.minimum(np.minimum(p0, p1), p2)
    bmax = np.maximum(np.maximum(p0, p1), p2)
    t0 = time.time()
    lb = bvh_native.build_lbvh_native(
        bmin, bmax, tris=(p0, p1, p2), sah=True, lean=True, wide24=True
    )
    print(f"SAH+wide build {time.time()-t0:.1f}s "
          f"wide12_rows={lb.wide128.shape[0]} d12={lb.wide12_depth} "
          f"wide24_rows={lb.wide256.shape[0]} d24={lb.wide24_depth}", flush=True)
    w, h = camera.resolution
    reps = 8
    xs = np.arange(w, dtype=np.float32)
    ys = np.arange(h, dtype=np.float32)
    grid = np.stack([np.tile(xs, h), np.repeat(ys, w)], -1) + 0.5
    rng = np.random.RandomState(0)
    pf = np.tile(grid, (reps, 1)) + rng.uniform(-0.5, 0.5, (reps * w * h, 2)).astype(np.float32)
    rays = cam.generate_rays(
        camera, jnp.asarray(pf), jnp.zeros((len(pf), 2), jnp.float32),
        jnp.zeros((len(pf),), jnp.float32),
    )
    np.savez(
        CACHE,
        wide12=np.asarray(lb.wide128), d12=np.int32(lb.wide12_depth),
        wide24=np.asarray(lb.wide256), d24=np.int32(lb.wide24_depth),
        o=np.asarray(rays.o), d=np.asarray(rays.d),
    )


def main():
    if not os.path.exists(CACHE):
        build_cache()
    z = np.load(CACHE)

    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    (jnp.ones((256, 256)) @ jnp.ones((256, 256))).block_until_ready()

    from rs_pbrt_tpu.ops import bvh as bvhmod

    o_all = jnp.asarray(z["o"])
    d_all = jnp.asarray(z["d"])
    w12 = jax.device_put(jnp.asarray(z["wide12"]))
    d12 = int(z["d12"])
    w24 = jax.device_put(jnp.asarray(z["wide24"]))
    d24 = int(z["d24"])
    print(f"rows: wide12={w12.shape[0]} wide24={w24.shape[0]} "
          f"d12={d12} d24={d24}", flush=True)

    cases = [
        ("bvh24", jax.jit(
            lambda o, d, t: bvhmod.bvh24_intersect_tris(o, d, t, w24, d24))),
        ("bvh24-unroll2", jax.jit(
            lambda o, d, t: bvhmod.bvh24_intersect_tris(o, d, t, w24, d24,
                                                        unroll=2))),
        ("bvh12-unroll2", jax.jit(
            lambda o, d, t: bvhmod.bvh12_intersect_tris(o, d, t, w12, d12,
                                                        unroll=2))),
        ("bvh24-anyhit", jax.jit(
            lambda o, d, t: bvhmod.bvh24_intersect_tris(o, d, t, w24, d24,
                                                        any_hit=True))),
        ("bvh12-base", jax.jit(
            lambda o, d, t: bvhmod.bvh12_intersect_tris(o, d, t, w12, d12))),
    ]
    jax.block_until_ready((w12, w24, o_all, d_all))

    def run(fn, o, d, t):
        h = fn(o, d, t)
        return float(jnp.sum(h.t * 1e-30) + jnp.sum(h.valid))

    for name, fn in cases:
        for R in (65536, 524288):
            o = o_all[:R]
            d = d_all[:R]
            t_max = jnp.full((R,), 1e30, jnp.float32)
            try:
                t0 = time.time(); run(fn, o, d, t_max); tc = time.time() - t0
                dts = []
                for _ in range(2):
                    t0 = time.time(); chk = run(fn, o, d, t_max)
                    dts.append(time.time() - t0)
                dt = min(dts)
                print(f"{name} R={R}: compile+run={tc:.1f}s "
                      f"run={dt*1e3:.0f}ms ({R/dt/1e6:.2f}M rays/s) "
                      f"hits={chk:.0f}", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name} R={R}: FAIL {type(e).__name__}: {e}", flush=True)
                return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
