"""Small-table gathers as one-hot MXU matmuls.

TPU's gather engine is slow for per-lane random access (each (N,) gather
from even a 32-row table measured ~1-4ms at N=262k — it dominated the
whole shading pipeline).  For small tables the TPU-native move is to turn
the gather into a dense one-hot matmul: onehot(idx) @ table rides the MXU
at effectively free cost for T up to a few thousand rows.

This is the renderer's version of the "keep the FLOPs on the MXU" rule —
enum/index dispatch becomes linear algebra.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# above this row count the N*T one-hot work stops being free; fall back
ONEHOT_MAX_ROWS = 2048


def take_rows(table, idx):
    """table: (T, C) float32; idx: (N,) int -> (N, C).

    One-hot matmul for small T, gather otherwise."""
    T = table.shape[0]
    idx = jnp.asarray(idx)
    if T == 1:
        return jnp.broadcast_to(table[0], idx.shape + (table.shape[1],))
    if T <= ONEHOT_MAX_ROWS:
        oh = (idx[:, None] == jnp.arange(T, dtype=idx.dtype)[None, :]).astype(
            table.dtype
        )
        # Precision.HIGHEST: the MXU's default bf16 input truncation would
        # corrupt gathered geometry (548.75 -> 548!); f32 passes are still
        # ~free at these sizes
        return jnp.dot(
            oh, table, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    return table[idx]


def col(attr, c):
    """Column c of a take_rows result."""
    return attr[..., c]


def col3(attr, c):
    return attr[..., c : c + 3]


def col2(attr, c):
    return attr[..., c : c + 2]


def coli(attr, c):
    """Integer column (values round-trip exactly through f32 for |v|<2^24)."""
    return jnp.round(attr[..., c]).astype(jnp.int32)


def colb(attr, c):
    return attr[..., c] > 0.5
