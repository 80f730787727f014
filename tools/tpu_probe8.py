"""Probe 8 (round 4): what ACTUALLY bounds the gather unit.

Round-3 measurements established ~47M rows/s for wavefront gathers from
big HBM tables and ~300M rows/s for <=256KB tables, but never separated
TABLE size from WORKING-SET size, never tested row widths past 64 f32
cols, and never tested index coherence.  Those three answers pick the
round-4 traversal design:
  - working-set effect  -> sort rays + treelet row layout, keep XLA loop
  - width-free row rate -> go BVH8/BVH16 (fewer, wider rows)
  - neither             -> Pallas treelet kernel w/ bulk DMA

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
    R = 524288
    N_IT = 50

    # ---- A: working-set vs table-size (16-col rows, 2.6M-row table) ----
    M = 2621447
    table = jnp.asarray(rng.rand(M, 16).astype(np.float32))

    def make_loop(window, sort_mode, M=M, table=table):
        # idx walks an LCG inside [base, base+window); base fixed -> the
        # aggregate working set is window rows even though the table is M
        def loop(n, idx, base):
            def body(c):
                i, idx, acc = c
                row = table[base + idx]
                idx = (idx * 1103515245 + 12345) % window
                idx = jnp.where(idx < 0, idx + window, idx)
                return i + 1, idx, acc + row[:, 0]

            return jnp.sum(jax.lax.while_loop(
                lambda c: c[0] < n, body, (0, idx, jnp.zeros_like(idx, jnp.float32))
            )[2])

        return jax.jit(loop)

    for window in (4096, 65536, 1048576, M):
        lp = make_loop(window, None)
        idx0 = rng.randint(0, window, R).astype(np.int32)
        base = jnp.int32(0)
        _ = float(lp(jnp.int32(4), jnp.asarray(idx0), base))
        dt = timed(lambda: float(lp(jnp.int32(N_IT), jnp.asarray(idx0), base)))
        print(f"A working-set={window*64//1024}KB (table 160MB): "
              f"{R*N_IT/dt/1e6:.0f}M rows/s", flush=True)

    # coherent (sorted) indices over the FULL table: nearby lanes fetch
    # nearby rows, aggregate working set = full table
    def loop_sorted(n, idx):
        def body(c):
            i, idx, acc = c
            row = table[idx]
            # drift each lane by a small random-ish step, keep sortedness
            idx = jnp.clip(idx + (idx % 7) - 3, 0, M - 1)
            return i + 1, idx, acc + row[:, 0]

        return jnp.sum(jax.lax.while_loop(
            lambda c: c[0] < n, body, (0, idx, jnp.zeros_like(idx, jnp.float32))
        )[2])

    lps = jax.jit(loop_sorted)
    idx_sorted = np.sort(rng.randint(0, M, R)).astype(np.int32)
    _ = float(lps(jnp.int32(4), jnp.asarray(idx_sorted)))
    dt = timed(lambda: float(lps(jnp.int32(N_IT), jnp.asarray(idx_sorted))))
    print(f"A sorted-coherent full-table: {R*N_IT/dt/1e6:.0f}M rows/s", flush=True)
    del table

    # ---- B: row width sweep at large table ----
    for W in (16, 64, 128, 256):
        Mw = min(2621447, (1 << 28) // W)  # cap table at 1GB
        tw = jnp.asarray(rng.rand(Mw, W).astype(np.float32))

        def loopw(n, idx, Mw=Mw, tw=tw):
            def body(c):
                i, idx, acc = c
                row = tw[idx]
                idx = (idx * 1103515245 + 12345) % Mw
                idx = jnp.where(idx < 0, idx + Mw, idx)
                return i + 1, idx, acc + row[:, 0] + row[:, W - 1]

            return jnp.sum(jax.lax.while_loop(
                lambda c: c[0] < n, body, (0, idx, jnp.zeros_like(idx, jnp.float32))
            )[2])

        lw = jax.jit(loopw)
        idx0 = jnp.asarray(rng.randint(0, Mw, R).astype(np.int32))
        _ = float(lw(jnp.int32(4), idx0))
        dt = timed(lambda: float(lw(jnp.int32(N_IT), idx0)))
        print(f"B width={W} cols ({W*4}B rows, table {Mw*W*4>>20}MB): "
              f"{R*N_IT/dt/1e6:.0f}M rows/s = {R*N_IT*W*4/dt/2**30:.1f} GiB/s",
              flush=True)
        del tw

    # ---- C: two independent gathers per iteration (ILP) ----
    Mc = 2621447
    t1 = jnp.asarray(rng.rand(Mc, 16).astype(np.float32))
    t2 = jnp.asarray(rng.rand(Mc, 16).astype(np.float32))

    def loopc(n, ia, ib):
        def body(c):
            i, ia, ib, acc = c
            ra = t1[ia]
            rb = t2[ib]
            ia = (ia * 1103515245 + 12345) % Mc
            ia = jnp.where(ia < 0, ia + Mc, ia)
            ib = (ib * 22695477 + 1) % Mc
            ib = jnp.where(ib < 0, ib + Mc, ib)
            return i + 1, ia, ib, acc + ra[:, 0] + rb[:, 0]

        return jnp.sum(jax.lax.while_loop(
            lambda c: c[0] < n, body,
            (0, ia, ib, jnp.zeros_like(ia, jnp.float32))
        )[3])

    lc = jax.jit(loopc)
    Rh = R // 2  # same total rows/iter as A
    ia0 = jnp.asarray(rng.randint(0, Mc, Rh).astype(np.int32))
    ib0 = jnp.asarray(rng.randint(0, Mc, Rh).astype(np.int32))
    _ = float(lc(jnp.int32(4), ia0, ib0))
    dt = timed(lambda: float(lc(jnp.int32(N_IT), ia0, ib0)))
    print(f"C 2 interleaved gathers (2x{Rh} lanes): "
          f"{2*Rh*N_IT/dt/1e6:.0f}M rows/s total", flush=True)

    return 0


if __name__ == "__main__":
    sys.exit(main())
