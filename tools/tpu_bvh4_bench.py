"""On-chip benchmark: BVH4 wide traversal vs rope-gather on the statue
scene, pixel-ordered and shuffled rays.  Forced readback timing."""

import os
import sys
import time

import numpy as np

CACHE = "/tmp/statue_wide_cache.npz"


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
    lb = bvh_native.build_lbvh_native(bmin, bmax, tris=(p0, p1, p2), sah=True)
    print(f"SAH+wide4+stream build {time.time()-t0:.1f}s "
          f"wide_rows={lb.wide64.shape[0]} depth={lb.wide_depth}", flush=True)
    w, h = camera.resolution
    # pixel-ordered rays, 8 jittered copies of the 256x256 grid = 524288
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
        wide=np.asarray(lb.wide64), depth=np.int32(lb.wide_depth),
        stream=np.asarray(lb.stream16),
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

    wide = jax.device_put(jnp.asarray(z["wide"]))
    depth = int(z["depth"])
    o_all = jnp.asarray(z["o"])
    d_all = jnp.asarray(z["d"])
    jax.block_until_ready((wide, o_all, d_all))
    print(f"wide rows={wide.shape[0]} depth={depth}", flush=True)

    f4 = jax.jit(lambda o, d, t: bvhmod.bvh4_intersect_tris(o, d, t, wide, depth))
    f4a = jax.jit(
        lambda o, d, t: bvhmod.bvh4_intersect_tris(o, d, t, wide, depth, any_hit=True)
    )

    def run(fn, o, d, t):
        h = fn(o, d, t)
        return float(jnp.sum(h.t * 1e-30) + jnp.sum(h.valid))

    perm = np.random.RandomState(1).permutation(o_all.shape[0])
    for name, fn in (("bvh4-closest", f4), ("bvh4-anyhit", f4a)):
        for order in ("pixel", "shuffled"):
            for R in (65536, 524288):
                if order == "shuffled":
                    o = o_all[perm[:R]]
                    d = d_all[perm[:R]]
                else:
                    o = o_all[:R]
                    d = d_all[:R]
                o, d = jax.block_until_ready((jnp.asarray(o), jnp.asarray(d)))
                t_max = jnp.full((R,), 1e30, jnp.float32)
                try:
                    t0 = time.time()
                    run(fn, o, d, t_max)
                    tc = time.time() - t0
                    t0 = time.time()
                    chk = run(fn, o, d, t_max)
                    dt = time.time() - t0
                    print(
                        f"{name} {order} R={R}: compile+run={tc:.1f}s run={dt*1e3:.0f}ms "
                        f"({R/dt/1e6:.2f}M rays/s) hits={chk:.0f}",
                        flush=True,
                    )
                except Exception as e:  # noqa: BLE001
                    print(f"{name} {order} R={R}: FAIL {type(e).__name__}: {e}", flush=True)
                    return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
