"""On-chip benchmark of the frontier-sweep BVH traversal vs the gather
rope traversal, on the statue scene.  Caches the built stream + rays to
/tmp/statue_cache.npz (scene build is 25-140s of numpy; the cache makes
re-runs start in seconds).  Timings force host readback (block_until_ready
via the tunnel does not reliably wait)."""

import os
import sys
import time

import numpy as np

CACHE = "/tmp/statue_cache.npz"


def build_cache():
    from rs_pbrt_tpu.models import cameras as cam
    from rs_pbrt_tpu.ops import bvh_native
    from rs_pbrt_tpu.scene import bigscene
    import jax.numpy as jnp

    scene, camera = bigscene.statue_scene(subdivisions=8)
    p0 = np.asarray(scene.tri_p0)
    p1 = np.asarray(scene.tri_p1)
    p2 = np.asarray(scene.tri_p2)
    bmin = np.minimum(np.minimum(p0, p1), p2)
    bmax = np.maximum(np.maximum(p0, p1), p2)
    lb = bvh_native.build_lbvh_native(bmin, bmax, tris=(p0, p1, p2))
    w, h = camera.resolution
    R = 1 << 19
    rng = np.random.RandomState(0)
    pf = np.stack([rng.uniform(0, w, R), rng.uniform(0, h, R)], -1).astype(np.float32)
    rays = cam.generate_rays(
        camera, jnp.asarray(pf), jnp.zeros((R, 2), jnp.float32), jnp.zeros((R,), jnp.float32)
    )
    np.savez(
        CACHE,
        stream=np.asarray(lb.stream16),
        o=np.asarray(rays.o),
        d=np.asarray(rays.d),
    )


def main():
    if not os.path.exists(CACHE):
        t0 = time.time()
        build_cache()
        print(f"cache built in {time.time()-t0:.0f}s", flush=True)
    z = np.load(CACHE)

    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    x = jnp.ones((256, 256))
    (x @ x).block_until_ready()

    from rs_pbrt_tpu.ops import bvh as bvhmod

    stream = jax.device_put(jnp.asarray(z["stream"]))
    o_all = jnp.asarray(z["o"])
    d_all = jnp.asarray(z["d"])
    jax.block_until_ready((stream, o_all, d_all))
    print(f"stream rows={stream.shape[0]}", flush=True)

    def run(fn, o, d, t):
        h = fn(o, d, t)
        # force readback: sums require full completion
        return float(jnp.sum(h.t * 1e-30) + jnp.sum(h.tri))

    for name, fn_base in (
        ("sweep", bvhmod.bvh_sweep_intersect_tris),
        ("rope-gather", bvhmod.bvh_intersect_tris_stream),
    ):
        blocks = (4096, 8192, 32768) if name == "sweep" else (0,)
        for blk in blocks:
            if name == "sweep":
                fn = jax.jit(
                    lambda o, d, t, blk=blk: bvhmod.bvh_sweep_intersect_tris(
                        o, d, t, stream, block=blk
                    )
                )
            else:
                fn = jax.jit(
                    lambda o, d, t: bvhmod.bvh_intersect_tris_stream(o, d, t, stream)
                )
            for R in (65536, 524288):
                if name == "rope-gather" and R > 65536:
                    continue  # known ~16s; skip
                o = o_all[:R]
                d = d_all[:R]
                t_max = jnp.full((R,), 1e30, jnp.float32)
                try:
                    t0 = time.time()
                    _ = run(fn, o, d, t_max)
                    tc = time.time() - t0
                    t0 = time.time()
                    chk = run(fn, o, d, t_max)
                    dt = time.time() - t0
                    print(
                        f"{name} blk={blk} R={R}: compile+run={tc:.1f}s "
                        f"run={dt*1e3:.0f}ms ({R/dt/1e6:.2f}M rays/s) chk={chk:.0f}",
                        flush=True,
                    )
                except Exception as e:  # noqa: BLE001
                    print(f"{name} blk={blk} R={R}: FAIL {type(e).__name__}: {e}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
