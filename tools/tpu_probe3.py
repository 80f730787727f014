"""Probe v3: force host scalar readback per repetition so timings include
true device completion (block_until_ready via the axon tunnel appears not
to wait for dispatch completion)."""

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

    # baseline: scalar readback round-trip cost
    s = jnp.float32(1.0)
    for k in range(3):
        t0 = time.time()
        _ = float(s + k)
        print(f"scalar roundtrip rep{k}: {(time.time()-t0)*1e3:.2f}ms", flush=True)

    a = jnp.asarray(rng.rand(4096, 4096).astype(np.float32))
    b = jnp.asarray(rng.rand(4096, 4096).astype(np.float32))
    mm = jax.jit(lambda a, b: jnp.sum(a @ b))
    _ = float(mm(a, b))
    for k in range(3):
        t0 = time.time()
        v = float(mm(a + float(k + 1), b))
        dt = time.time() - t0
        print(f"matmul+sum 4096^3 rep{k}: {dt*1e3:.2f}ms {2*4096**3/dt/1e12:.1f} TFLOP/s", flush=True)

    M = 2_621_447
    table16 = jnp.asarray(rng.rand(M, 16).astype(np.float32))
    g = jax.jit(lambda t, i: jnp.sum(t[i]))
    for R in (16384, 131072, 524288):
        _ = float(g(table16, jnp.asarray(rng.randint(0, M, R).astype(np.int32))))
        ts = []
        for k in range(3):
            idx = jnp.asarray(rng.randint(0, M, R).astype(np.int32))
            _ = float(jnp.sum(idx))  # sync upload
            t0 = time.time()
            v = float(g(table16, idx))
            ts.append(time.time() - t0)
        dt = min(ts)
        print(
            f"gather+sum width=16 R={R}: {[f'{t*1e3:.2f}' for t in ts]}ms "
            f"best {R/dt/1e6:.1f}M rows/s {R*16*4/dt/1e9:.2f}GB/s",
            flush=True,
        )

    # while_loop elementwise
    def loop(n, x):
        def body(c):
            i, x = c
            return i + 1, x * 1.000001 + 1e-9
        return jnp.sum(jax.lax.while_loop(lambda c: c[0] < n, body, (0, x))[1])

    lj = jax.jit(loop)
    for R in (16384, 524288):
        _ = float(lj(jnp.int32(1000), jnp.ones((R,), jnp.float32)))
        ts = []
        for k in range(3):
            xx = jnp.full((R,), 1.0 + 0.001 * k, jnp.float32)
            _ = float(jnp.sum(xx))
            t0 = time.time()
            v = float(lj(jnp.int32(1000), xx))
            ts.append(time.time() - t0)
        print(f"while_loop 1000 elementwise iters R={R}: {[f'{t*1e3:.1f}' for t in ts]}ms", flush=True)

    # while_loop with gather body — the traversal shape
    def loopg(n, idx):
        def body(c):
            i, idx, acc = c
            row = table16[idx]
            idx = (idx * 1103515245 + 12345) % M
            idx = jnp.where(idx < 0, idx + M, idx)
            return i + 1, idx, acc + row[:, 0]
        return jnp.sum(jax.lax.while_loop(
            lambda c: c[0] < n, body, (0, idx, jnp.zeros_like(idx, jnp.float32))
        )[2])

    gj = jax.jit(loopg)
    for R in (16384, 131072, 524288):
        _ = float(gj(jnp.int32(100), jnp.asarray(rng.randint(0, M, R).astype(np.int32))))
        ts = []
        for k in range(3):
            idx = jnp.asarray(rng.randint(0, M, R).astype(np.int32))
            _ = float(jnp.sum(idx))
            t0 = time.time()
            v = float(gj(jnp.int32(100), idx))
            ts.append(time.time() - t0)
        dt = min(ts)
        print(
            f"while_loop 100 gather-iters R={R}: {[f'{t*1e3:.1f}' for t in ts]}ms "
            f"-> {R*100/dt/1e6:.1f}M gathered-rows/s",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
