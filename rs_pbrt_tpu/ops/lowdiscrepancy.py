"""Low-discrepancy sequences as stateless, random-access device functions.

TPU-native replacement for reference src/core/lowdiscrepancy.rs.  The
reference enumerates samples with stateful generators (gray-code increments,
per-pixel offsets cached in atomics); here every sampler value is a pure
function of (index, dimension, scramble) so any lane can evaluate any sample
— the property that lets us shard pixels/samples arbitrarily across devices.

Bit-matrix multiplies (Sobol') are 32/52-step XOR-select reductions over the
extracted direction-number tables (data/tables.npz), fully vectorized over
lanes on the VPU.
"""

from __future__ import annotations

from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import u64
from ..utils.rng import FLOAT_ONE_MINUS_EPSILON, Pcg32

U32 = jnp.uint32

_DATA = np.load(Path(__file__).resolve().parent.parent / "data" / "tables.npz")
SOBOL_MATRICES_32 = jnp.asarray(_DATA["sobol_matrices_32"])  # (1024, 52) u32
VDC_LO = jnp.asarray(_DATA["vdc_lo"])  # (25, 50)
VDC_HI = jnp.asarray(_DATA["vdc_hi"])
VDC_INV_LO = jnp.asarray(_DATA["vdc_inv_lo"])  # (26, 52)
VDC_INV_HI = jnp.asarray(_DATA["vdc_inv_hi"])
C_MAX_MIN_DIST = jnp.asarray(_DATA["c_max_min_dist"])  # (17, 32)
PRIMES = _DATA["primes"]  # numpy, host-side
PRIME_SUMS = _DATA["prime_sums"]
NUM_SOBOL_DIMENSIONS = 1024
SOBOL_MATRIX_SIZE = 52

_INV_2_32 = np.float32(2.3283064365386963e-10)  # 0x1p-32


def reverse_bits_32(n):
    n = jnp.asarray(n, U32)
    n = (n << U32(16)) | (n >> U32(16))
    n = ((n & U32(0x00FF00FF)) << U32(8)) | ((n & U32(0xFF00FF00)) >> U32(8))
    n = ((n & U32(0x0F0F0F0F)) << U32(4)) | ((n & U32(0xF0F0F0F0)) >> U32(4))
    n = ((n & U32(0x33333333)) << U32(2)) | ((n & U32(0xCCCCCCCC)) >> U32(2))
    n = ((n & U32(0x55555555)) << U32(1)) | ((n & U32(0xAAAAAAAA)) >> U32(1))
    return n


def multiply_generator(c, a):
    """v = C a over GF(2): XOR columns of c (32, lanes-broadcastable) selected
    by bits of a (reference lowdiscrepancy.rs:799)."""
    a = jnp.asarray(a, U32)
    v = jnp.zeros_like(a)
    for i in range(32):
        bit = (a >> U32(i)) & U32(1)
        v = v ^ jnp.where(bit > 0, c[i], U32(0))
    return v


def sobol_sample(index: u64.U64, dimension, scramble=None):
    """Sobol' sample: 52-bit index, dim gathered per call
    (reference lowdiscrepancy.rs:1046 sobol_sample_float).

    index: U64 (lanes,);  dimension: scalar or (lanes,) int32;
    scramble: u32 (lanes,) or None.
    """
    mat = SOBOL_MATRICES_32[dimension]  # (..., 52) or (52,)
    v = jnp.zeros_like(index.lo) if scramble is None else jnp.asarray(scramble, U32)
    for i in range(32):
        bit = (index.lo >> U32(i)) & U32(1)
        v = v ^ jnp.where(bit > 0, mat[..., i], U32(0))
    for i in range(SOBOL_MATRIX_SIZE - 32):
        bit = (index.hi >> U32(i)) & U32(1)
        v = v ^ jnp.where(bit > 0, mat[..., 32 + i], U32(0))
    return jnp.minimum(v.astype(jnp.float32) * _INV_2_32, FLOAT_ONE_MINUS_EPSILON)


def sobol_interval_to_index(m: int, frame, p, max_frame_bits: int = 32):
    """Index of sample `frame` falling in pixel p when the Sobol' domain is
    scaled to 2^m x 2^m pixels (reference lowdiscrepancy.rs:1014).

    m: static log2(resolution); frame: (lanes,) u32 sample number;
    p: (lanes, 2) int32 pixel coords.  Returns U64 global sample index.
    """
    frame = jnp.asarray(frame, U32)
    if m == 0:
        return u64.U64(jnp.zeros_like(frame), frame)
    m2 = m << 1
    index = u64.shl(u64.from_u32(frame), m2)
    delta_lo = jnp.zeros_like(frame)
    delta_hi = jnp.zeros_like(frame)
    row_lo, row_hi = VDC_LO[m - 1], VDC_HI[m - 1]
    for c in range(min(max_frame_bits, VDC_LO.shape[1])):
        bit = (frame >> U32(c)) & U32(1)
        delta_lo = delta_lo ^ jnp.where(bit > 0, row_lo[c], U32(0))
        delta_hi = delta_hi ^ jnp.where(bit > 0, row_hi[c], U32(0))
    # b = ((px << m) | py) ^ delta  (px, py < 2^m)
    px = p[..., 0].astype(U32)
    py = p[..., 1].astype(U32)
    b = u64.xor(u64.xor(u64.shl(u64.from_u32(px), m), u64.from_u32(py)),
                u64.U64(delta_hi, delta_lo))
    inv_lo, inv_hi = VDC_INV_LO[m - 1], VDC_INV_HI[m - 1]
    ix_lo, ix_hi = index.lo, index.hi
    for c in range(2 * m):
        bit = u64.bit(b, c)
        ix_lo = ix_lo ^ jnp.where(bit, inv_lo[c], U32(0))
        ix_hi = ix_hi ^ jnp.where(bit, inv_hi[c], U32(0))
    return u64.U64(ix_hi, ix_lo)


def van_der_corput_sample(index, scramble=None):
    """Base-2 radical inverse with optional XOR scramble (random access form
    of reference gray-code van_der_corput, lowdiscrepancy.rs:857)."""
    v = reverse_bits_32(index)
    if scramble is not None:
        v = v ^ jnp.asarray(scramble, U32)
    return jnp.minimum(v.astype(jnp.float32) * _INV_2_32, FLOAT_ONE_MINUS_EPSILON)


# first two Sobol' dimension generator matrices in bit-reversed ("gray code
# sampling") convention used by (0,2)-sequence samplers: dim0 is identity
# (van der Corput); dim1 from SOBOL_MATRICES_32 rows — we evaluate dim1 via
# sobol_sample on 32-bit index instead, which is equivalent.
def sobol_02(index, scramble_x=None, scramble_y=None):
    """Random-access (0,2)-sequence point for 32-bit index
    (reference sobol_2d, lowdiscrepancy.rs:919)."""
    index = jnp.asarray(index, U32)
    x = van_der_corput_sample(index, scramble_x)
    idx64 = u64.from_u32(index)
    mat = SOBOL_MATRICES_32[1]
    v = jnp.zeros_like(index) if scramble_y is None else jnp.asarray(scramble_y, U32)
    for i in range(32):
        bit = (index >> U32(i)) & U32(1)
        v = v ^ jnp.where(bit > 0, mat[i], U32(0))
    y = jnp.minimum(v.astype(jnp.float32) * _INV_2_32, FLOAT_ONE_MINUS_EPSILON)
    del idx64
    return jnp.stack([x, y], axis=-1)


def max_min_dist_sample(index, matrix_idx: int, scramble=None):
    """Sample from the max-min-distance matrices C_MAX_MIN_DIST[matrix_idx]
    (reference maxmin sampler); returns x in [0,1)."""
    c = C_MAX_MIN_DIST[matrix_idx]
    v = multiply_generator(c, index)
    if scramble is not None:
        v = v ^ jnp.asarray(scramble, U32)
    return jnp.minimum(v.astype(jnp.float32) * _INV_2_32, FLOAT_ONE_MINUS_EPSILON)


def radical_inverse(base_index, a, max_digits: int = 32):
    """Radical inverse in the base_index-th prime (reference
    lowdiscrepancy.rs:1126).  base_index is STATIC (python int); a is (lanes,)
    uint32.  base 0 => bit reversal fast path."""
    if base_index == 0:
        return van_der_corput_sample(a)
    base = int(PRIMES[base_index])
    a = jnp.asarray(a, U32)
    # digits needed: ceil(32 / log2(base))
    n_digits = int(np.ceil(32 / np.log2(base)))
    n_digits = min(n_digits, max_digits)
    inv_base = np.float32(1.0 / base)
    reversed_digits = jnp.zeros_like(a)
    inv_base_n = jnp.ones(a.shape, jnp.float32)
    cur = a
    for _ in range(n_digits):
        nonzero = cur > 0
        nxt = cur // U32(base)
        digit = cur - nxt * U32(base)
        reversed_digits = jnp.where(
            nonzero, reversed_digits * U32(base) + digit, reversed_digits
        )
        inv_base_n = jnp.where(nonzero, inv_base_n * inv_base, inv_base_n)
        cur = nxt
    return jnp.minimum(
        reversed_digits.astype(jnp.float32) * inv_base_n, FLOAT_ONE_MINUS_EPSILON
    )


def scrambled_radical_inverse(base_index, a, perm, max_digits: int = 32):
    """Scrambled radical inverse (reference lowdiscrepancy.rs
    scrambled_radical_inverse_specialized).  perm: (base,) uint32 device array
    for this base; base_index static."""
    base = int(PRIMES[base_index])
    a = jnp.asarray(a, U32)
    n_digits = min(int(np.ceil(32 / np.log2(base))) + 1, max_digits)
    inv_base = np.float32(1.0 / base)
    reversed_digits = jnp.zeros_like(a)
    inv_base_n = jnp.ones(a.shape, jnp.float32)
    cur = a
    for _ in range(n_digits):
        nonzero = cur > 0
        nxt = cur // U32(base)
        digit = cur - nxt * U32(base)
        pdigit = perm[digit]
        reversed_digits = jnp.where(
            nonzero, reversed_digits * U32(base) + pdigit, reversed_digits
        )
        inv_base_n = jnp.where(nonzero, inv_base_n * inv_base, inv_base_n)
        cur = nxt
    tail = inv_base * perm[0].astype(jnp.float32) / (1.0 - inv_base)
    return jnp.minimum(
        inv_base_n * (reversed_digits.astype(jnp.float32) + tail),
        FLOAT_ONE_MINUS_EPSILON,
    )


def inverse_radical_inverse_2(inverse, n_digits: int):
    """Inverse of the base-2 radical inverse over n_digits digits: the index
    whose radical inverse has digit string `inverse` (reference
    lowdiscrepancy.rs:788 specialized to base 2 = n_digits-bit reversal)."""
    inverse = jnp.asarray(inverse, U32)
    index = jnp.zeros_like(inverse)
    for _ in range(n_digits):
        index = (index << U32(1)) | (inverse & U32(1))
        inverse = inverse >> U32(1)
    return index


def inverse_radical_inverse_3(inverse, n_digits: int):
    """Base-3 variant of inverse_radical_inverse (reference :788)."""
    inverse = jnp.asarray(inverse, U32)
    index = jnp.zeros_like(inverse)
    for _ in range(n_digits):
        digit = inverse % U32(3)
        inverse = inverse // U32(3)
        index = index * U32(3) + digit
    return index


# ---------------------------------------------------------------------------
# Halton permutation tables (reference samplers/halton.rs:19-26: a single
# lazily-built table from a default-seeded PCG32, shared by every sampler).
# Built lazily and grown on demand: building base i consumes the PCG32 stream
# strictly after bases < i, so a K-base prefix is bit-exact vs the reference's
# full 1000-base table.
_halton_perms_host: np.ndarray | None = None
_halton_perms_bases = 0
_halton_perms_dev = None


def halton_permutations(n_bases: int):
    """Device (flat u32) scrambling permutations covering the first n_bases
    prime bases, offset by PRIME_SUMS.  Grown geometrically so repeated calls
    with increasing dims don't rebuild the PCG stream."""
    global _halton_perms_host, _halton_perms_bases, _halton_perms_dev
    if n_bases > _halton_perms_bases:
        grow = max(n_bases, 2 * max(_halton_perms_bases, 32))
        grow = min(grow, len(PRIMES))
        _halton_perms_host = compute_radical_inverse_permutations(n_bases=grow)
        _halton_perms_bases = grow
        _halton_perms_dev = jnp.asarray(_halton_perms_host.astype(np.uint32))
    return _halton_perms_dev


def halton_sample(index, dim: int, base_exp_x: int, base_scale_y: int):
    """Halton sample for a 32-bit global index with STATIC dim (reference
    halton.rs:216-227 sample_dimension): dims 0/1 shift out the
    pixel-selecting digits (yielding the in-pixel offset directly), higher
    dims use the scrambled radical inverse in the dim-th prime base."""
    index = jnp.asarray(index, U32)
    if dim == 0:
        # radical_inverse(0, ·) == bit reversal == van_der_corput_sample
        return van_der_corput_sample(index >> U32(base_exp_x))
    if dim == 1:
        return radical_inverse(1, index // U32(base_scale_y))
    perms = halton_permutations(dim + 1)
    base = int(PRIMES[dim])
    off = int(PRIME_SUMS[dim])
    return scrambled_radical_inverse(dim, index, perms[off : off + base])


def halton_sample_dyn(index, dim, max_bases: int = 256):
    """Halton sample with a TRACED dim >= 2 (bounded by max_bases): the prime
    base and permutation offset are gathered per lane; a fixed 14-digit loop
    covers every base >= 5 at 32-bit index width (base 5 needs
    ceil(32/log2 5) = 14 digits; traced dims only occur for integrator
    dimensions, which start at 5)."""
    perms = halton_permutations(max_bases)
    primes_d = jnp.asarray(PRIMES[:max_bases].astype(np.uint32))
    sums_d = jnp.asarray(PRIME_SUMS[:max_bases].astype(np.uint32))
    dim = jnp.clip(jnp.asarray(dim, jnp.int32), 2, max_bases - 1)
    base = primes_d[dim]
    off = sums_d[dim]
    a = jnp.asarray(index, U32)
    inv_base = 1.0 / base.astype(jnp.float32)
    reversed_digits = jnp.zeros_like(a)
    inv_base_n = jnp.ones(jnp.shape(a), jnp.float32)
    cur = a
    for _ in range(14):
        nonzero = cur > 0
        nxt = cur // base
        digit = cur - nxt * base
        pdigit = perms[(off + digit).astype(jnp.int32)]
        reversed_digits = jnp.where(
            nonzero, reversed_digits * base + pdigit, reversed_digits
        )
        inv_base_n = jnp.where(nonzero, inv_base_n * inv_base, inv_base_n)
        cur = nxt
    tail = inv_base * perms[off.astype(jnp.int32)].astype(jnp.float32) / (1.0 - inv_base)
    return jnp.minimum(
        inv_base_n * (reversed_digits.astype(jnp.float32) + tail),
        FLOAT_ONE_MINUS_EPSILON,
    )


def compute_radical_inverse_permutations(rng: Pcg32 | None = None, n_bases: int = 1000):
    """Host-side permutation tables for the first n_bases prime bases
    (reference lowdiscrepancy.rs:2165 compute_radical_inverse_permutations),
    flattened with PRIME_SUMS offsets.  Bit-exact vs the reference when given
    the same Pcg32 (the shuffle consumes the identical bounded-int stream).

    NOTE: integrators consume ~2 dims per bounce; n_bases only needs to cover
    the deepest dimension actually sampled, so callers pass a small bound
    instead of the reference's full 1000 (which costs a 3.6M-element
    sequential shuffle).
    """
    from ..utils.rng import shuffle

    if rng is None:
        rng = Pcg32()
    n_bases = min(n_bases, len(PRIMES))
    total = int(PRIME_SUMS[n_bases - 1]) + int(PRIMES[n_bases - 1])
    perms = np.zeros(total, np.uint16)
    for i in range(n_bases):
        off = int(PRIME_SUMS[i])
        base = int(PRIMES[i])
        p = list(range(base))
        shuffle(p, rng)
        perms[off : off + base] = p
    return perms
