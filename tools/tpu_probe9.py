"""Probe 9 (round 4): why did the 512k-lane statue render LOSE to the
64k-lane one (226k vs 388k paths/s) despite raw traversal winning
(2.04M vs 1.34M rays/s)?

Suspects, measured here:
  D. argsort cost at 524k lanes (the compaction ladder runs ~4 argsorts
     per traversal; each traversal call pays them even when few lanes
     are live)
  E. bvh24-unroll2 at 524k with compact_stages 0 / 2 / 6 — isolates the
     ladder's contribution on a SHORT-WALK wavefront (t_max small so
     most lanes finish instantly, mimicking late bounces)
  A. gather row-rate at 128 vs 256 cols (confirms the ~42GB/s byte
     ceiling hypothesis from the bvh24 tie)

Forced-readback timing."""

import sys
import time

import numpy as np


def timed(fn, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    (jnp.ones((256, 256)) @ jnp.ones((256, 256))).block_until_ready()
    rng = np.random.RandomState(0)

    # ---- D: argsort / top_k at wavefront sizes ----
    for R in (65536, 524288):
        live = jnp.asarray(rng.randint(0, 2, R).astype(np.int32))

        @jax.jit
        def srt(l):
            return jnp.argsort(l, stable=True)[: R // 4].sum()

        _ = int(srt(live))
        dt = timed(lambda: int(srt(live)))
        print(f"D argsort R={R}: {dt*1e3:.2f}ms", flush=True)

    # ---- E: ladder sweep on the real wide24 table ----
    try:
        z = np.load("/tmp/statue_wide24_cache.npz")
        from rs_pbrt_tpu.ops import bvh as bvhmod

        w24 = jax.device_put(jnp.asarray(z["wide24"]))
        d24 = int(z["d24"])
        R = 524288
        ob = jnp.asarray(z["o"][:R])
        db = jnp.asarray(z["d"][:R])

        def run(fn, t):
            h = fn(ob, db, t)
            return float(jnp.sum(h.t * 1e-30) + jnp.sum(h.valid))

        for stages in (0, 2, 6):
            fn = jax.jit(lambda o, d, t, s=stages: bvhmod.bvh24_intersect_tris(
                o, d, t, w24, d24, compact_stages=s, unroll=2))
            # full-work wavefront
            t_full = jnp.full((R,), 1e30, jnp.float32)
            # late-bounce mimic: 75% of lanes dead (t_max=-1)
            dead = jnp.asarray((rng.rand(R) < 0.75).astype(np.float32))
            t_part = jnp.where(dead > 0, -1.0, 1e30)
            t0 = time.time(); run(fn, t_full); tc = time.time() - t0
            dt_full = timed(lambda: run(fn, t_full), reps=2)
            dt_part = timed(lambda: run(fn, t_part), reps=2)
            print(f"E stages={stages}: compile={tc:.0f}s "
                  f"full={dt_full*1e3:.0f}ms ({R/dt_full/1e6:.2f}M rays/s) "
                  f"25%live={dt_part*1e3:.0f}ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print("E skipped:", e, flush=True)

    # ---- A: width sweep ----
    M = 194419
    R = 65536
    N_IT = 64
    for W in (128, 256):
        tw = jnp.asarray(rng.rand(M, W).astype(np.float32))

        def loopw(n, idx, tw=tw, W=W):
            def body(c):
                i, idx, acc = c
                row = tw[idx]
                idx = (idx * 1103515245 + 12345) % M
                idx = jnp.where(idx < 0, idx + M, idx)
                return i + 1, idx, acc + row[:, 0] + row[:, W - 1]

            return jnp.sum(jax.lax.while_loop(
                lambda c: c[0] < n, body, (0, idx, jnp.zeros_like(idx, jnp.float32))
            )[2])

        lw = jax.jit(loopw)
        idx0 = jnp.asarray(rng.randint(0, M, R).astype(np.int32))
        _ = float(lw(jnp.int32(4), idx0))
        dt = timed(lambda: float(lw(jnp.int32(N_IT), idx0)))
        print(f"A width={W} ({W*4}B rows): {R*N_IT/dt/1e6:.1f}M rows/s "
              f"= {R*N_IT*W*4/dt/2**30:.1f} GiB/s", flush=True)
        del tw

    return 0


if __name__ == "__main__":
    sys.exit(main())
