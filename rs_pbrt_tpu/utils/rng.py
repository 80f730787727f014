"""Random number generation.

Two generators:

1. ``Pcg32`` — exact NumPy port of the reference's PCG32
   (src/core/rng.rs:15-82), used host-side (scene build, shuffles) and in
   parity tests.  Stateful, sequential — not for device code.

2. ``hash_*`` — stateless counter-based device RNG (pcg3d-style hash mixing)
   used inside kernels where the reference draws from a per-thread Rng; being
   counter-based it is reproducible under any sharding, which replaces the
   reference's per-tile reseeding (src/core/integrator.rs:113) with something
   order-independent.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# reference src/core/rng.rs
PCG32_DEFAULT_STATE = 0x853C49E6748FEA9B
PCG32_DEFAULT_STREAM = 0xDA3E39CB94B95BDB
PCG32_MULT = 0x5851F42D4C957F2D
FLOAT_ONE_MINUS_EPSILON = np.float32(1.0 - np.finfo(np.float32).eps / 2)

_M64 = (1 << 64) - 1


class Pcg32:
    """Bit-exact PCG32 (reference src/core/rng.rs:21-82)."""

    def __init__(self, init_state=None, init_seq=None):
        if init_state is None:
            self.state = PCG32_DEFAULT_STATE
            self.inc = PCG32_DEFAULT_STREAM
        else:
            self.state = 0
            self.inc = ((int(init_seq) << 1) | 1) & _M64
            self.uniform_uint32()
            self.state = (self.state + int(init_state)) & _M64
            self.uniform_uint32()

    def uniform_uint32(self) -> int:
        old = self.state
        self.state = (old * PCG32_MULT + self.inc) & _M64
        xorshifted = (((old >> 18) ^ old) >> 27) & 0xFFFFFFFF
        rot = (old >> 59) & 31
        return ((xorshifted >> rot) | (xorshifted << ((32 - rot) & 31))) & 0xFFFFFFFF

    def uniform_uint32_bounded(self, b: int) -> int:
        threshold = (~b + 1) % b if b else 0
        while True:
            r = self.uniform_uint32()
            if r >= threshold:
                return r % b

    def uniform_float(self) -> np.float32:
        return min(
            FLOAT_ONE_MINUS_EPSILON,
            np.float32(self.uniform_uint32() * np.float32(2.3283064365386963e-10)),
        )


def shuffle(arr, rng: Pcg32, n_dims=1):
    """In-place Fisher-Yates matching reference sampling.rs shuffle."""
    count = len(arr) // n_dims
    for i in range(count):
        other = i + rng.uniform_uint32_bounded(count - i)
        for j in range(n_dims):
            k1, k2 = n_dims * i + j, n_dims * other + j
            arr[k1], arr[k2] = arr[k2], arr[k1]
    return arr


# ---- device-side stateless hash RNG ----

U32 = jnp.uint32


def hash_u32(x):
    """lowbias32 finalizer-style integer hash."""
    x = jnp.asarray(x, U32)
    x ^= x >> U32(16)
    x *= U32(0x7FEB352D)
    x ^= x >> U32(15)
    x *= U32(0x846CA68B)
    x ^= x >> U32(16)
    return x


def hash_combine(a, b):
    a = jnp.asarray(a, U32)
    b = jnp.asarray(b, U32)
    return hash_u32(a ^ (b + U32(0x9E3779B9) + (a << U32(6)) + (a >> U32(2))))


def uniform_u32(*keys):
    """Stateless uniform uint32 from any number of integer keys."""
    h = jnp.asarray(keys[0], U32)
    for k in keys[1:]:
        h = hash_combine(h, k)
    return hash_u32(h)


def uniform_float(*keys):
    """Uniform in [0, 1) from integer keys."""
    bits = uniform_u32(*keys)
    return jnp.minimum(
        FLOAT_ONE_MINUS_EPSILON,
        bits.astype(jnp.float32) * np.float32(2.3283064365386963e-10),
    )
