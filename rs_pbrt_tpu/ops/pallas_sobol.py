"""Pallas TPU kernel: Sobol' sample evaluation for a block of dimensions.

The XLA lowering of the 52-step XOR-select bit-matrix multiply
(ops/lowdiscrepancy.sobol_sample) measured ~22ms per dimension-pair at 262k
lanes — it dominated the whole integrator (6x22ms of a 187ms bounce loop).
This kernel evaluates ALL dimensions a bounce needs in one pass over the
ray tile with the direction-number table resident in VMEM; the XOR chain
stays in registers.

Output matches ops/lowdiscrepancy.sobol_sample bit-for-bit.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import lowdiscrepancy as ld
from ..utils.rng import FLOAT_ONE_MINUS_EPSILON

LANE = 128
SUB = 64
TILE = SUB * LANE
_INV_2_32 = np.float32(2.3283064365386963e-10)

from .pallas_intersect import interpret_enabled


def _sobol_kernel(n_dims: int, n_bits: int, hi, lo, dim0, mats, *outs):
    """Bits-outer / dims-inner XOR accumulation: each index bit is
    extracted ONCE and applied to every dimension's accumulator (the
    dims-outer form re-extracted all 52 bits per dimension — ~2.4x more
    VPU ops).  n_bits=32 skips the high word entirely when the caller
    proves the global index fits 32 bits (spp << 2*log2res <= 2^32)."""
    hiv = hi[...]
    lov = lo[...]
    d0 = dim0[0]
    vs = [jnp.zeros(lov.shape, jnp.uint32) for _ in range(n_dims)]
    for i in range(min(n_bits, 32)):
        b = ((lov >> jnp.uint32(i)) & jnp.uint32(1)) > 0
        for k in range(n_dims):
            vs[k] = vs[k] ^ jnp.where(b, mats[d0 + k, i], jnp.uint32(0))
    for i in range(max(n_bits - 32, 0)):
        b = ((hiv >> jnp.uint32(i)) & jnp.uint32(1)) > 0
        for k in range(n_dims):
            vs[k] = vs[k] ^ jnp.where(b, mats[d0 + k, 32 + i], jnp.uint32(0))
    for k in range(n_dims):
        v = vs[k]
        # u32 -> f32 via i32 halves (Mosaic lacks the direct cast)
        vf = (v >> jnp.uint32(1)).astype(jnp.int32).astype(jnp.float32) * 2.0 + (
            v & jnp.uint32(1)
        ).astype(jnp.int32).astype(jnp.float32)
        outs[k][...] = jnp.minimum(vf * _INV_2_32, FLOAT_ONE_MINUS_EPSILON)


@partial(jax.jit, static_argnames=("n_dims", "n_bits", "interpret"))
def _sobol_call(hi, lo, dim0_arr, mats, n_dims: int, n_bits: int, interpret: bool = False):
    rows = hi.shape[0]
    spec = pl.BlockSpec((SUB, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec(mats.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    dim_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    shp = jax.ShapeDtypeStruct((rows, LANE), jnp.float32)
    return pl.pallas_call(
        partial(_sobol_kernel, n_dims, n_bits),
        interpret=interpret,
        grid=(rows // SUB,),
        in_specs=[spec, spec, dim_spec, mat_spec],
        out_specs=[spec] * n_dims,
        out_shape=[shp] * n_dims,
    )(hi, lo, dim0_arr, mats)


def sobol_dims(index_hi, index_lo, dim0, n_dims: int, index_bits: int = 52):
    """(N,) u32 pair + traced scalar dim0 -> (N, n_dims) f32 Sobol samples
    for dimensions [dim0, dim0 + n_dims).  index_bits: static bound on the
    global index width (pass 32 when spp << 2*log2res fits u32 — the
    common case — to skip the high-word XOR chain)."""
    n = index_lo.shape[0]
    n_pad = -(-n // TILE) * TILE
    rows = n_pad // LANE
    hi = jnp.pad(index_hi, (0, n_pad - n)).reshape(rows, LANE)
    lo = jnp.pad(index_lo, (0, n_pad - n)).reshape(rows, LANE)
    dim0_arr = jnp.asarray(dim0, jnp.int32).reshape(1)
    outs = _sobol_call(
        hi, lo, dim0_arr, ld.SOBOL_MATRICES_32, n_dims, int(index_bits),
        interpret=interpret_enabled(),
    )
    return jnp.stack([o.reshape(-1)[:n] for o in outs], axis=-1)
