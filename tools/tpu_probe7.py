"""Probe 7: bvh4 with an iteration counter + post-fix timing."""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    (jnp.ones((256, 256)) @ jnp.ones((256, 256))).block_until_ready()

    z = np.load("/tmp/statue_wide_cache.npz")
    wide = jax.device_put(jnp.asarray(z["wide"]))
    depth = int(z["depth"])
    o_all = jnp.asarray(z["o"])
    d_all = jnp.asarray(z["d"])
    jax.block_until_ready((wide, o_all, d_all))

    # counter variant: replicate the public traversal's loop with a
    # counter in the carry (keep in sync manually; diagnostic only)
    from rs_pbrt_tpu.ops import bvh as bvhmod

    def with_counter(o, d, t_max):
        R = o.shape[0]
        # piggyback: run cond/body from the real traversal by wrapping
        # while_loop; easiest is to re-run traversal then separately count
        # iterations with a tiny carried int using the same body.
        # Instead: count = while loop over the REAL state plus i.
        import rs_pbrt_tpu.ops.bvh as B

        orig_while = jax.lax.while_loop
        count = {}

        def counting_while(cond, body, init):
            def cond2(s):
                return cond(s[1])

            def body2(s):
                return (s[0] + 1, body(s[1]))

            out = orig_while(cond2, body2, (jnp.int32(0), init))
            count["iters"] = out[0]
            return out[1]

        jax.lax.while_loop = counting_while
        try:
            h = B.bvh4_intersect_tris(o, d, t_max, wide, depth)
        finally:
            jax.lax.while_loop = orig_while
        return h, count["iters"]

    f = jax.jit(lambda o, d, t: with_counter(o, d, t))
    for R in (65536, 524288):
        o = o_all[:R]
        d = d_all[:R]
        t_max = jnp.full((R,), 1e30, jnp.float32)
        h, iters = f(o, d, t_max)
        _ = float(jnp.sum(h.t * jnp.where(h.valid, 1e-3, 0.0)))
        t0 = time.time()
        h, iters = f(o, d, t_max)
        chk = float(jnp.sum(h.t * jnp.where(h.valid, 1e-3, 0.0)))
        dt = time.time() - t0
        print(
            f"bvh4+fix R={R}: {dt*1e3:.0f}ms iters={int(iters)} "
            f"-> {dt/int(iters)*1e3:.2f}ms/iter ({R/dt/1e6:.2f}M rays/s)",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
