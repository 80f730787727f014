"""64-bit unsigned integer emulation as (hi, lo) uint32 pairs.

TPUs (and default JAX) have no u64; the reference's Sobol'/Halton index math
uses u64 (src/core/lowdiscrepancy.rs:1014-1126).  Only xor / shift / bit-test
/ add are needed, which are cheap on split words.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

U32 = jnp.uint32


class U64(NamedTuple):
    hi: jnp.ndarray
    lo: jnp.ndarray


def make(hi, lo):
    return U64(jnp.asarray(hi, U32), jnp.asarray(lo, U32))


def from_u32(lo):
    lo = jnp.asarray(lo, U32)
    return U64(jnp.zeros_like(lo), lo)


def from_python(x: int):
    return U64(jnp.uint32((x >> 32) & 0xFFFFFFFF), jnp.uint32(x & 0xFFFFFFFF))


def xor(a: U64, b: U64) -> U64:
    return U64(a.hi ^ b.hi, a.lo ^ b.lo)


def shl(a: U64, n: int) -> U64:
    """Left shift by a static amount."""
    if n == 0:
        return a
    if n >= 64:
        z = jnp.zeros_like(a.lo)
        return U64(z, z)
    if n >= 32:
        return U64(a.lo << U32(n - 32), jnp.zeros_like(a.lo))
    return U64((a.hi << U32(n)) | (a.lo >> U32(32 - n)), a.lo << U32(n))


def shr(a: U64, n: int) -> U64:
    if n == 0:
        return a
    if n >= 64:
        z = jnp.zeros_like(a.lo)
        return U64(z, z)
    if n >= 32:
        return U64(jnp.zeros_like(a.hi), a.hi >> U32(n - 32))
    return U64(a.hi >> U32(n), (a.lo >> U32(n)) | (a.hi << U32(32 - n)))


def bit(a: U64, i: int):
    """Test static bit i; returns bool array."""
    if i < 32:
        return (a.lo >> U32(i)) & U32(1) > 0
    return (a.hi >> U32(i - 32)) & U32(1) > 0


def add(a: U64, b: U64) -> U64:
    lo = a.lo + b.lo
    carry = (lo < a.lo).astype(U32)
    return U64(a.hi + b.hi + carry, lo)


def add_u32(a: U64, b) -> U64:
    return add(a, from_u32(b))


def mul_u32(a, b):
    """Full 32x32 -> 64 multiply of uint32 arrays."""
    a = jnp.asarray(a, U32)
    b = jnp.asarray(b, U32)
    a_lo, a_hi = a & U32(0xFFFF), a >> U32(16)
    b_lo, b_hi = b & U32(0xFFFF), b >> U32(16)
    ll = a_lo * b_lo
    lh = a_lo * b_hi
    hl = a_hi * b_lo
    hh = a_hi * b_hi
    mid = (ll >> U32(16)) + (lh & U32(0xFFFF)) + (hl & U32(0xFFFF))
    lo = (ll & U32(0xFFFF)) | (mid << U32(16))
    hi = hh + (lh >> U32(16)) + (hl >> U32(16)) + (mid >> U32(16))
    return U64(hi, lo)


def to_python(a: U64):
    return (int(a.hi) << 32) | int(a.lo)
