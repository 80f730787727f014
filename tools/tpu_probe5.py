"""Probe 5: in-loop gather rate vs table size + one-hot matmul step cost.
Short; forced readback."""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    (jnp.ones((256, 256)) @ jnp.ones((256, 256))).block_until_ready()
    rng = np.random.RandomState(0)
    R = 524288

    for M in (1024, 4096, 65536, 524288, 2621447):
        table = jnp.asarray(rng.rand(M, 16).astype(np.float32))

        def loopg(n, idx, M=M, table=table):
            def body(c):
                i, idx, acc = c
                row = table[idx]
                idx = (idx * 1103515245 + 12345) % M
                idx = jnp.where(idx < 0, idx + M, idx)
                return i + 1, idx, acc + row[:, 0]

            return jnp.sum(jax.lax.while_loop(
                lambda c: c[0] < n, body, (0, idx, jnp.zeros_like(idx, jnp.float32))
            )[2])

        gj = jax.jit(loopg)
        _ = float(gj(jnp.int32(50), jnp.asarray(rng.randint(0, M, R).astype(np.int32))))
        ts = []
        for _k in range(2):
            idx = jnp.asarray(rng.randint(0, M, R).astype(np.int32))
            _ = float(jnp.sum(idx))
            t0 = time.time()
            _ = float(gj(jnp.int32(50), idx))
            ts.append(time.time() - t0)
        dt = min(ts)
        print(f"in-loop gather table={M}: {R*50/dt/1e6:.0f}M rows/s", flush=True)
        del table

    # one-hot step cost: (L,C) onehot + HIGHEST matmul to (L,16), in a loop
    C = 2048
    chunk = jnp.asarray(rng.rand(C, 16).astype(np.float32))
    for L in (2048, 8192):
        col = jnp.arange(C, dtype=jnp.int32)

        def loopo(n, idx, L=L):
            def body(c):
                i, idx, acc = c
                oh = (idx[:, None] == col[None, :]).astype(jnp.float32)
                row = jnp.dot(oh, chunk, preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
                idx = (idx * 1103515245 + 12345) % C
                idx = jnp.where(idx < 0, idx + C, idx)
                return i + 1, idx, acc + row[:, 0]

            return jnp.sum(jax.lax.while_loop(
                lambda c: c[0] < n, body, (0, idx, jnp.zeros((L,), jnp.float32))
            )[2])

        gj = jax.jit(loopo)
        _ = float(gj(jnp.int32(100), jnp.asarray(rng.randint(0, C, L).astype(np.int32))))
        ts = []
        for _k in range(2):
            idx = jnp.asarray(rng.randint(0, C, L).astype(np.int32))
            _ = float(jnp.sum(idx))
            t0 = time.time()
            _ = float(gj(jnp.int32(100), idx))
            ts.append(time.time() - t0)
        dt = min(ts)
        print(
            f"one-hot step L={L} C={C}: {dt/100*1e6:.1f}us/step "
            f"({L*100/dt/1e6:.0f}M lane-rows/s)",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
