"""Probe 9 (round 4): decompose the wide-traversal iteration cost and
test 1024B-row gather rate, to pick between BVH24 / unroll / queue
compaction as the next accel lever.

A. gather row-rate vs row width at wide12-like table geometry
   (194k rows): 128 cols (512B) vs 256 cols (1024B).  If 1024B holds the
   row rate, a 24-wide tree cuts row count ~1.4x for free.
B. bvh12 body decomposition at 65536 lanes x 64 fixed iterations:
   gather-only vs gather+slab vs full body.  Shows whether iterations
   are gather-bound (queue/compaction wins) or VPU-bound (wider rows
   win) or overhead-bound (unroll wins).
C. coherent (sorted) vs random gather indices, same table.

Forced-readback timing (block_until_ready lies through the tunnel).
"""

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
    R = 65536
    M = 194419
    N_IT = 64

    # ---- A + C: width / coherence ----
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
        print(f"A width={W} ({W*4}B rows, table {M*W*4>>20}MB): "
              f"{R*N_IT/dt/1e6:.1f}M rows/s", flush=True)

        if W == 128:
            # C: sorted-coherent indices, small per-iter drift
            def loops(n, idx, tw=tw):
                def body(c):
                    i, idx, acc = c
                    row = tw[idx]
                    idx = jnp.clip(idx + (idx % 5) - 2, 0, M - 1)
                    return i + 1, idx, acc + row[:, 0]

                return jnp.sum(jax.lax.while_loop(
                    lambda c: c[0] < n, body,
                    (0, idx, jnp.zeros_like(idx, jnp.float32))
                )[2])

            ls = jax.jit(loops)
            idxs = jnp.asarray(np.sort(rng.randint(0, M, R)).astype(np.int32))
            _ = float(ls(jnp.int32(4), idxs))
            dt = timed(lambda: float(ls(jnp.int32(N_IT), idxs)))
            print(f"C sorted-coherent width=128: {R*N_IT/dt/1e6:.1f}M rows/s",
                  flush=True)
        del tw

    # ---- B: bvh12 body decomposition (synthetic but same shapes) ----
    table = jnp.asarray(rng.rand(M, 128).astype(np.float32))
    o = jnp.asarray(rng.rand(R, 3).astype(np.float32))
    inv_d = jnp.asarray((1.0 / (rng.rand(R, 3) + 0.1)).astype(np.float32))

    def mk_gather_only():
        def loop(n, idx):
            def body(c):
                i, idx, acc = c
                row = table[idx]
                nxt = (idx * 1103515245 + 12345) % M
                nxt = jnp.where(nxt < 0, nxt + M, nxt)
                return i + 1, nxt, acc + row[:, 0]

            return jnp.sum(jax.lax.while_loop(
                lambda c: c[0] < n, body, (0, idx, jnp.zeros_like(idx, jnp.float32))
            )[2])

        return jax.jit(loop)

    def mk_gather_slab():
        def loop(n, idx):
            def body(c):
                i, idx, acc = c
                row = table[idx]
                tnx = (row[:, 0:12] - o[:, 0:1]) * inv_d[:, 0:1]
                tfx = (row[:, 36:48] - o[:, 0:1]) * inv_d[:, 0:1]
                tny = (row[:, 12:24] - o[:, 1:2]) * inv_d[:, 1:2]
                tfy = (row[:, 48:60] - o[:, 1:2]) * inv_d[:, 1:2]
                tnz = (row[:, 24:36] - o[:, 2:3]) * inv_d[:, 2:3]
                tfz = (row[:, 60:72] - o[:, 2:3]) * inv_d[:, 2:3]
                tn = jnp.maximum(jnp.maximum(jnp.minimum(tnx, tfx), jnp.minimum(tny, tfy)), jnp.minimum(tnz, tfz))
                tf = jnp.minimum(jnp.minimum(jnp.maximum(tnx, tfx), jnp.maximum(tny, tfy)), jnp.maximum(tnz, tfz))
                hit = (tn <= tf) & (tf > 0)
                nxt = (idx * 1103515245 + 12345) % M
                nxt = jnp.where(nxt < 0, nxt + M, nxt)
                return i + 1, nxt, acc + jnp.sum(jnp.where(hit, tn, 0.0), axis=1)

            return jnp.sum(jax.lax.while_loop(
                lambda c: c[0] < n, body, (0, idx, jnp.zeros_like(idx, jnp.float32))
            )[2])

        return jax.jit(loop)

    for name, mk in (("gather-only", mk_gather_only), ("gather+slab", mk_gather_slab)):
        lp = mk()
        idx0 = jnp.asarray(rng.randint(0, M, R).astype(np.int32))
        _ = float(lp(jnp.int32(4), idx0))
        dt = timed(lambda: float(lp(jnp.int32(N_IT), idx0)))
        print(f"B {name}: {dt/N_IT*1e3:.3f}ms/iter at {R} lanes "
              f"({R*N_IT/dt/1e6:.1f}M rows/s)", flush=True)

    # full real body, fixed iterations: load the statue wide12 table
    try:
        z = np.load("/tmp/statue_wide12_cache.npz")
        from rs_pbrt_tpu.ops import bvh as bvhmod

        w12 = jax.device_put(jnp.asarray(z["wide12"]))
        d12 = int(z["d12"])
        ob = jnp.asarray(z["o"][:R])
        db = jnp.asarray(z["d"][:R])
        t_max = jnp.full((R,), 1e30, jnp.float32)

        for stages, unroll, tag in ((3, 1, "base"), (3, 2, "unroll2"), (5, 1, "stages5")):
            fn = jax.jit(lambda o, d, t, s=stages, u=unroll: bvhmod.bvh12_intersect_tris(
                o, d, t, w12, d12, compact_stages=s, unroll=u))
            t0 = time.time()
            h = fn(ob, db, t_max)
            chk = float(jnp.sum(h.t * 1e-30) + jnp.sum(h.valid))
            tc = time.time() - t0
            dts = []
            for _ in range(2):
                t0 = time.time()
                h = fn(ob, db, t_max)
                chk = float(jnp.sum(h.t * 1e-30) + jnp.sum(h.valid))
                dts.append(time.time() - t0)
            dt = min(dts)
            print(f"B bvh12[{tag}] R={R}: compile={tc:.0f}s run={dt*1e3:.0f}ms "
                  f"({R/dt/1e6:.2f}M rays/s) hits={chk:.0f}", flush=True)
    except Exception as e:  # noqa: BLE001
        print("B bvh12 real-body section skipped:", e, flush=True)

    return 0


if __name__ == "__main__":
    sys.exit(main())
