"""Probe 4: is the HBM row gather fast when NOT fused into a while_loop?
All timings force scalar readback.  Run ALONE on the chip."""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    (jnp.ones((256, 256)) @ jnp.ones((256, 256))).block_until_ready()

    rng = np.random.RandomState(0)
    M = 2_621_447
    table = jnp.asarray(rng.rand(M, 16).astype(np.float32))
    jax.block_until_ready(table)
    R = 524288

    def bench(name, fn, *args_list):
        # args_list: list of distinct arg tuples; time best of them
        _ = float(fn(*args_list[0]))  # compile
        ts = []
        for args in args_list:
            t0 = time.time()
            _ = float(fn(*args))
            ts.append(time.time() - t0)
        print(f"{name}: {[f'{t*1e3:.2f}' for t in ts]}ms", flush=True)
        return min(ts)

    def idxs(n=3):
        return [(jnp.asarray(rng.randint(0, M, R).astype(np.int32)),) for _ in range(n)]

    # 1. standalone gather
    g1 = jax.jit(lambda i: jnp.sum(table[i]))
    dt = bench("standalone gather 524k x 16f32", g1, *idxs())
    print(f"  -> {R/dt/1e6:.0f}M rows/s", flush=True)

    # 2. scan of 100 gather steps
    def step(idx, _):
        row = table[idx]
        idx = (idx * 1103515245 + 12345) % M
        idx = jnp.where(idx < 0, idx + M, idx)
        return idx, jnp.sum(row[:, 0])

    s1 = jax.jit(lambda i: jnp.sum(jax.lax.scan(step, i, None, length=100)[1]))
    dt = bench("scan 100 gather steps", s1, *idxs())
    print(f"  -> {R*100/dt/1e6:.0f}M rows/s", flush=True)

    # 3. scan with optimization_barrier around the gather
    def step_b(idx, _):
        idx_b = jax.lax.optimization_barrier(idx)
        row = jax.lax.optimization_barrier(table[idx_b])
        idx = (idx * 1103515245 + 12345) % M
        idx = jnp.where(idx < 0, idx + M, idx)
        return idx, jnp.sum(row[:, 0])

    s2 = jax.jit(lambda i: jnp.sum(jax.lax.scan(step_b, i, None, length=100)[1]))
    dt = bench("scan 100 gather steps +barrier", s2, *idxs())
    print(f"  -> {R*100/dt/1e6:.0f}M rows/s", flush=True)

    # 4. host loop of 100 dispatched steps
    st = jax.jit(lambda i: ((i * 1103515245 + 12345) % M, jnp.sum(table[i][:, 0])))

    def host_loop(idx):
        acc = 0.0
        for _ in range(100):
            idx, s = st(idx)
        return float(s) + acc

    i0 = idxs(1)[0][0]
    _ = host_loop(i0)
    ts = []
    for args in idxs(3):
        t0 = time.time()
        _ = host_loop(args[0])
        ts.append(time.time() - t0)
    dt = min(ts)
    print(f"host-loop 100 gather steps: {[f'{t*1e3:.1f}' for t in ts]}ms -> {R*100/dt/1e6:.0f}M rows/s", flush=True)

    # 5. ONE dispatch doing 100 *independent* gathers (parallel, no carry)
    def par(idx):
        tot = jnp.float32(0)
        for k in range(100):
            i2 = (idx + k * 9973) % M
            tot = tot + jnp.sum(table[i2][:, 0])
        return tot

    p1 = jax.jit(par)
    dt = bench("one dispatch, 100 independent gathers", p1, *idxs())
    print(f"  -> {R*100/dt/1e6:.0f}M rows/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
