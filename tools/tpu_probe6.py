"""Probe 6: decompose the BVH4 per-iteration cost.
(a) in-loop gather rate for width-64 rows; (b) gather-only loop vs
gather+slab vs full body; (c) re-time bvh4 after shear hoisting."""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    (jnp.ones((256, 256)) @ jnp.ones((256, 256))).block_until_ready()
    rng = np.random.RandomState(0)

    z = np.load("/tmp/statue_wide_cache.npz")
    wide = jax.device_put(jnp.asarray(z["wide"]))
    depth = int(z["depth"])
    M = wide.shape[0]
    jax.block_until_ready(wide)

    def timeit(f, R, iters, label):
        idx0 = jnp.asarray(rng.randint(0, M, R).astype(np.int32))
        _ = float(f(jnp.int32(iters), idx0))
        ts = []
        for _k in range(2):
            idx = jnp.asarray(rng.randint(0, M, R).astype(np.int32))
            _ = float(jnp.sum(idx))
            t0 = time.time()
            _ = float(f(jnp.int32(iters), idx))
            ts.append(time.time() - t0)
        dt = min(ts)
        print(
            f"{label} R={R}: {dt*1e3:.0f}ms / {iters} iters = "
            f"{dt/iters*1e3:.2f}ms/iter ({R*iters/dt/1e6:.0f}M rows/s)",
            flush=True,
        )

    # (a) gather-only loop over the wide table
    def loop_g(n, idx):
        def body(c):
            i, idx, acc = c
            row = wide[idx]
            idx = (idx * 1103515245 + 12345) % M
            idx = jnp.where(idx < 0, idx + M, idx)
            return i + 1, idx, acc + row[:, 0]
        return jnp.sum(jax.lax.while_loop(lambda c: c[0] < n, body,
                                          (0, idx, jnp.zeros_like(idx, jnp.float32)))[2])

    for R in (65536, 524288):
        timeit(jax.jit(loop_g), R, 100, "gather64-only")

    # (b) gather + 4-wide slab test
    def loop_gs(n, idx):
        o = jnp.ones((idx.shape[0], 3), jnp.float32) * 0.1
        inv = jnp.ones((idx.shape[0], 3), jnp.float32) * 2.0

        def body(c):
            i, idx, acc = c
            row = wide[idx]
            bmin4 = jnp.stack([row[:, 0:4], row[:, 4:8], row[:, 8:12]], axis=1)
            bmax4 = jnp.stack([row[:, 12:16], row[:, 16:20], row[:, 20:24]], axis=1)
            t_lo = (bmin4 - o[:, :, None]) * inv[:, :, None]
            t_hi = (bmax4 - o[:, :, None]) * inv[:, :, None]
            tn = jnp.max(jnp.minimum(t_lo, t_hi), axis=1)
            tf = jnp.min(jnp.maximum(t_lo, t_hi), axis=1)
            acc = acc + jnp.sum(jnp.where(tn <= tf, tn, 0.0), axis=1)
            idx = (idx * 1103515245 + 12345) % M
            idx = jnp.where(idx < 0, idx + M, idx)
            return i + 1, idx, acc
        return jnp.sum(jax.lax.while_loop(lambda c: c[0] < n, body,
                                          (0, idx, jnp.zeros_like(idx, jnp.float32)))[2])

    for R in (65536, 524288):
        timeit(jax.jit(loop_gs), R, 100, "gather64+slab")

    # (c) full bvh4 after shear hoist
    from rs_pbrt_tpu.ops import bvh as bvhmod

    o_all = jnp.asarray(z["o"])
    d_all = jnp.asarray(z["d"])
    f4 = jax.jit(lambda o, d, t: bvhmod.bvh4_intersect_tris(o, d, t, wide, depth))
    for R in (65536, 524288):
        o = o_all[:R]
        d = d_all[:R]
        t_max = jnp.full((R,), 1e30, jnp.float32)
        h = f4(o, d, t_max)
        _ = float(jnp.sum(h.t * jnp.where(h.valid, 1e-3, 0.0)))
        t0 = time.time()
        h = f4(o, d, t_max)
        _ = float(jnp.sum(h.t * jnp.where(h.valid, 1e-3, 0.0)))
        dt = time.time() - t0
        print(f"bvh4 hoisted R={R}: {dt*1e3:.0f}ms ({R/dt/1e6:.2f}M rays/s)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
