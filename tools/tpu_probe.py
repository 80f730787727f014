"""On-chip microbenchmarks that decide the BVH traversal redesign:
(1) XLA random-row gather throughput from an HBM-resident table, by row
    width and lane count;
(2) lax.while_loop fixed per-iteration overhead;
(3) whether Mosaic's dynamic_gather (take_along_axis) compiles in a
    Pallas kernel on this backend, and its in-VMEM throughput.
"""

import sys
import time

import numpy as np


def timeit(f, *args, reps=3):
    import jax

    jax.block_until_ready(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(f(*args))
        ts.append(time.time() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    x = jnp.ones((256, 256))
    (x @ x).block_until_ready()

    M = 2_621_447
    rng = np.random.RandomState(0)

    # --- 1: gather throughput ---
    for width in (8, 16, 32, 64):
        table = jnp.asarray(rng.rand(M, width).astype(np.float32))
        jax.block_until_ready(table)
        for R in (16384, 131072, 524288):
            idx = jnp.asarray(rng.randint(0, M, R).astype(np.int32))
            f = jax.jit(lambda t, i: t[i])
            dt = timeit(f, table, idx)
            print(
                f"gather width={width} R={R}: {dt*1e3:.2f}ms "
                f"{R/dt/1e6:.1f}M rows/s {R*width*4/dt/1e9:.2f}GB/s",
                flush=True,
            )
        del table

    # sorted indices (coherent) vs random
    width = 16
    table = jnp.asarray(rng.rand(M, width).astype(np.float32))
    R = 131072
    idx_s = jnp.asarray(np.sort(rng.randint(0, M, R)).astype(np.int32))
    f = jax.jit(lambda t, i: t[i])
    dt = timeit(f, table, idx_s)
    print(f"gather SORTED width=16 R={R}: {dt*1e3:.2f}ms {R/dt/1e6:.1f}M rows/s", flush=True)
    # narrow-range indices (all within one 64k-row window)
    idx_n = jnp.asarray(rng.randint(0, 65536, R).astype(np.int32))
    dt = timeit(f, table, idx_n)
    print(f"gather 64k-WINDOW width=16 R={R}: {dt*1e3:.2f}ms {R/dt/1e6:.1f}M rows/s", flush=True)

    # --- 2: while_loop per-iteration overhead (tiny body) ---
    def loop(n, x):
        def body(c):
            i, x = c
            return i + 1, x * 1.000001 + 1e-9

        return jax.lax.while_loop(lambda c: c[0] < n, body, (0, x))[1]

    for R in (16384, 524288):
        xx = jnp.ones((R,), jnp.float32)
        g = jax.jit(loop, static_argnums=())
        dt = timeit(g, jnp.int32(1000), xx)
        print(f"while_loop 1000 iters R={R}: {dt*1e3:.1f}ms -> {dt:.6f}s/1000 iters", flush=True)

    # body with one gather per iteration (the traversal shape)
    table16 = jnp.asarray(rng.rand(M, 16).astype(np.float32))

    def loopg(n, idx):
        def body(c):
            i, idx, acc = c
            row = table16[idx]
            idx = (idx * 1103515245 + 12345) % M
            return i + 1, idx, acc + row[:, 0]

        return jax.lax.while_loop(
            lambda c: c[0] < n, body, (0, idx, jnp.zeros_like(idx, jnp.float32))
        )[2]

    for R in (16384, 131072, 524288):
        idx = jnp.asarray(rng.randint(0, M, R).astype(np.int32))
        dt = timeit(jax.jit(loopg), jnp.int32(100), idx)
        print(
            f"while_loop 100 iters w/ gather R={R}: {dt*1e3:.1f}ms "
            f"({dt*1e7/100/R*1e3:.1f}ns/lane-iter... {R*100/dt/1e6:.1f}M gathered-rows/s)",
            flush=True,
        )

    # --- 3: Pallas dynamic_gather availability + speed ---
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        C = 2048

        def kern(tab_ref, idx_ref, out_ref):
            tab = tab_ref[:]  # (16, C)
            idx = idx_ref[:]  # (16, C)
            out_ref[:] = jnp.take_along_axis(tab, idx, axis=1)

        tab = jnp.asarray(rng.rand(16, C).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, C, (16, C)).astype(np.int32))
        f = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((16, C), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        out = jax.block_until_ready(f(tab, idx))
        ref = np.take_along_axis(np.asarray(tab), np.asarray(idx), 1)
        ok = np.allclose(np.asarray(out), ref)
        print(f"pallas dynamic_gather (16,{C}): compiles, correct={ok}", flush=True)

        # throughput: loop 1000 gathers inside one kernel
        def kern_loop(tab_ref, idx_ref, out_ref):
            tab = tab_ref[:]
            def body(i, c):
                idx, acc = c
                g = jnp.take_along_axis(tab, idx, axis=1)
                idx = jax.lax.rem(idx * 1103515245 + 12345, C)
                idx = jnp.where(idx < 0, idx + C, idx)
                return idx, acc + g
            _, acc = jax.lax.fori_loop(0, 1000, body, (idx_ref[:], jnp.zeros_like(tab)))
            out_ref[:] = acc

        f2 = pl.pallas_call(
            kern_loop,
            out_shape=jax.ShapeDtypeStruct((16, C), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        dt = timeit(f2, tab, idx)
        rows = 1000 * C  # each gather fetches C lanes x 16 cols = C rows-worth
        print(
            f"pallas dynamic_gather loop: {dt*1e3:.2f}ms for 1000x(16,{C}) "
            f"-> {rows/dt/1e6:.0f}M row-fetches/s",
            flush=True,
        )
    except Exception as e:  # noqa: BLE001
        import traceback

        traceback.print_exc()
        print(f"pallas dynamic_gather FAILED: {type(e).__name__}: {e}", flush=True)

    return 0


if __name__ == "__main__":
    sys.exit(main())
