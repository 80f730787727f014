"""Probe v2: distinct inputs per repetition (the axon tunnel appears to
memoize identical dispatches), plus a known-FLOPs matmul calibration."""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    x = jnp.ones((256, 256))
    (x @ x).block_until_ready()

    rng = np.random.RandomState(0)

    # calibration: 4096^3 matmul = 137 GFLOP; bf16 MXU v5e ~197 TFLOPs
    a = jnp.asarray(rng.rand(4096, 4096).astype(np.float32))
    b = jnp.asarray(rng.rand(4096, 4096).astype(np.float32))
    mm = jax.jit(lambda a, b: a @ b)
    jax.block_until_ready(mm(a, b))
    for k in range(3):
        t0 = time.time()
        jax.block_until_ready(mm(a + float(k), b))
        dt = time.time() - t0
        print(f"matmul 4096^3 rep{k}: {dt*1e3:.2f}ms {2*4096**3/dt/1e12:.1f} TFLOP/s", flush=True)

    M = 2_621_447
    f = jax.jit(lambda t, i: t[i])
    for width in (16, 32):
        table = jnp.asarray(rng.rand(M, width).astype(np.float32))
        jax.block_until_ready(table)
        for R in (16384, 131072, 524288):
            idxs = [jnp.asarray(rng.randint(0, M, R).astype(np.int32)) for _ in range(3)]
            jax.block_until_ready(f(table, idxs[0]))
            ts = []
            for i in idxs:
                t0 = time.time()
                jax.block_until_ready(f(table, i))
                ts.append(time.time() - t0)
            dt = min(ts)
            print(
                f"gather width={width} R={R}: {[f'{t*1e3:.2f}' for t in ts]}ms "
                f"best {R/dt/1e6:.1f}M rows/s {R*width*4/dt/1e9:.2f}GB/s",
                flush=True,
            )
        del table

    # while_loop per-iteration overhead, distinct inputs
    def loop(n, x):
        def body(c):
            i, x = c
            return i + 1, x * 1.000001 + 1e-9

        return jax.lax.while_loop(lambda c: c[0] < n, body, (0, x))[1]

    lj = jax.jit(loop)
    for R in (16384, 524288):
        jax.block_until_ready(lj(jnp.int32(1000), jnp.ones((R,), jnp.float32)))
        ts = []
        for k in range(3):
            xx = jnp.full((R,), 1.0 + 0.001 * k, jnp.float32)
            jax.block_until_ready(xx)
            t0 = time.time()
            jax.block_until_ready(lj(jnp.int32(1000), xx))
            ts.append(time.time() - t0)
        print(f"while_loop 1000 iters R={R}: {[f'{t*1e3:.1f}' for t in ts]}ms", flush=True)

    # while_loop with gather body (the traversal shape)
    table16 = jnp.asarray(rng.rand(M, 16).astype(np.float32))

    def loopg(n, idx):
        def body(c):
            i, idx, acc = c
            row = table16[idx]
            idx = (idx * 1103515245 + 12345) % M
            idx = jnp.where(idx < 0, idx + M, idx)
            return i + 1, idx, acc + row[:, 0]

        return jax.lax.while_loop(
            lambda c: c[0] < n, body, (0, idx, jnp.zeros_like(idx, jnp.float32))
        )[2]

    gj = jax.jit(loopg)
    for R in (16384, 131072, 524288):
        jax.block_until_ready(gj(jnp.int32(100), jnp.asarray(rng.randint(0, M, R).astype(np.int32))))
        ts = []
        for k in range(3):
            idx = jnp.asarray(rng.randint(0, M, R).astype(np.int32))
            jax.block_until_ready(idx)
            t0 = time.time()
            jax.block_until_ready(gj(jnp.int32(100), idx))
            ts.append(time.time() - t0)
        dt = min(ts)
        print(
            f"while_loop 100 gather-iters R={R}: {[f'{t*1e3:.1f}' for t in ts]}ms "
            f"-> {R*100/dt/1e6:.1f}M gathered-rows/s",
            flush=True,
        )

    # same but body ALSO has ~40 elementwise VPU ops on (R,) lanes (traversal glue)
    def loopg2(n, idx):
        def body(c):
            i, idx, acc = c
            row = table16[idx]
            a = row[:, 0] * acc + row[:, 1]
            b = jnp.maximum(row[:, 2], a) * jnp.minimum(row[:, 3], acc)
            cm = jnp.where(a < b, a, b) + jnp.where(a > b, row[:, 4], row[:, 5])
            d2 = jnp.abs(cm) + jnp.sqrt(jnp.abs(a * b) + 1e-9)
            e = jnp.where(d2 > 1.0, d2 * 0.5, d2 * 2.0)
            idx = (idx * 1103515245 + 12345) % M
            idx = jnp.where(idx < 0, idx + M, idx)
            return i + 1, idx, acc + e * 1e-6
        return jax.lax.while_loop(
            lambda c: c[0] < n, body, (0, idx, jnp.zeros_like(idx, jnp.float32))
        )[2]

    g2 = jax.jit(loopg2)
    for R in (131072, 524288):
        jax.block_until_ready(g2(jnp.int32(100), jnp.asarray(rng.randint(0, M, R).astype(np.int32))))
        ts = []
        for k in range(3):
            idx = jnp.asarray(rng.randint(0, M, R).astype(np.int32))
            jax.block_until_ready(idx)
            t0 = time.time()
            jax.block_until_ready(g2(jnp.int32(100), idx))
            ts.append(time.time() - t0)
        dt = min(ts)
        print(f"while_loop 100 gather+glue iters R={R}: {[f'{t*1e3:.1f}' for t in ts]}ms", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
