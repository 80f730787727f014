"""Linear BVH: vectorized Karras-style build + flat traversal arrays.

TPU-native replacement for reference src/accelerators/bvh.rs.  The reference
builds recursively with a typed arena and SAH sweeps (bvh.rs:178) — a
pointer-chasing CPU design.  Here the build is the GPU-lineage LBVH
(Morton codes + binary-radix hierarchy, Karras 2012), expressed as fully
vectorized NumPy over all internal nodes at once, so multi-million-triangle
scenes build in seconds at scene-compile time without native code.  The
traversal consumes a flat SoA node array (the analogue of the reference's
flattened LinearBVHNode, bvh.rs:77-85) with per-lane short stacks inside a
``lax.while_loop``.

Node encoding: internal nodes 0..N-2; child references >= 0 are internal
node ids, negative ids c encode leaf/primitive index (~c).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import vecmath as vm
from .intersect import TriHit, intersect_tri

STACK_DEPTH = 64  # mirrors the 64-slot traversal stack of reference bvh.rs:420


class LBVH(NamedTuple):
    child_l: jnp.ndarray  # (N-1,) int32
    child_r: jnp.ndarray  # (N-1,) int32
    bmin_l: jnp.ndarray  # (N-1,3) AABB of left child
    bmax_l: jnp.ndarray
    bmin_r: jnp.ndarray  # (N-1,3) AABB of right child
    bmax_r: jnp.ndarray
    prim_ids: jnp.ndarray  # (N,) int32: leaf k -> original primitive index
    # packed per-node row: [cl(bits), cr(bits), bmin_l, bmax_l, bmin_r,
    # bmax_r, pad, pad] — traversal reads ONE (16,) row gather per step
    # instead of six scattered gathers (the XLA TPU gather unit is the
    # traversal bottleneck; contiguous 64B rows are ~6x fewer descriptors).
    nodes16: jnp.ndarray = None  # (N-1, 16) f32, child ids bitcast


def pack_nodes(child_l, child_r, bmin_l, bmax_l, bmin_r, bmax_r):
    """Host packing of the traversal node row (numpy)."""
    n = len(child_l)
    out = np.zeros((n, 16), np.float32)
    out[:, 0] = np.asarray(child_l, np.int32).view(np.float32)
    out[:, 1] = np.asarray(child_r, np.int32).view(np.float32)
    out[:, 2:5] = bmin_l
    out[:, 5:8] = bmax_l
    out[:, 8:11] = bmin_r
    out[:, 11:14] = bmax_r
    return out


def _expand_bits_10(v):
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def morton3(x, y, z):
    """30-bit morton code from 10-bit per-axis ints (numpy)."""
    return (
        (_expand_bits_10(x.astype(np.uint32)) << 2)
        | (_expand_bits_10(y.astype(np.uint32)) << 1)
        | _expand_bits_10(z.astype(np.uint32))
    )


def build_lbvh(bmin, bmax) -> LBVH:
    """Build from per-primitive AABBs (numpy arrays, host-side).

    bmin/bmax: (N,3) float32.  Returns device-ready LBVH pytree.
    """
    bmin = np.asarray(bmin, np.float32)
    bmax = np.asarray(bmax, np.float32)
    n = bmin.shape[0]
    if n == 1:
        # degenerate: single primitive — fake one internal node with both
        # children pointing at the leaf (traversal handles duplicate fine
        # because the second hit test is idempotent)
        return LBVH(
            jnp.asarray([-1], jnp.int32),
            jnp.asarray([-1], jnp.int32),
            jnp.asarray(bmin[None, 0]),
            jnp.asarray(bmax[None, 0]),
            jnp.asarray(bmin[None, 0]),
            jnp.asarray(bmax[None, 0]),
            jnp.asarray([0], jnp.int32),
            jnp.asarray(pack_nodes(
                np.asarray([-1]), np.asarray([-1]),
                bmin[None, 0], bmax[None, 0], bmin[None, 0], bmax[None, 0],
            )),
        )

    centroid = 0.5 * (bmin + bmax)
    c_lo = centroid.min(0)
    c_ext = np.maximum(centroid.max(0) - c_lo, 1e-12)
    q = np.clip(((centroid - c_lo) / c_ext) * 1023.0, 0, 1023).astype(np.uint32)
    codes30 = morton3(q[:, 0], q[:, 1], q[:, 2])
    # make keys unique by appending the primitive index (Karras' tie-break)
    keys = (codes30.astype(np.uint64) << np.uint64(32)) | np.arange(n, dtype=np.uint64)
    order = np.argsort(keys, kind="stable")
    keys = keys[order]
    prim_ids = order.astype(np.int32)
    sb = bmin[order]
    sB = bmax[order]

    # delta(i, j): common-prefix length between keys i and j (valid j only)
    def delta(i, j):
        out = np.full(i.shape, -1, np.int64)
        ok = (j >= 0) & (j < n)
        x = keys[i[ok]] ^ keys[j[ok]]
        # count leading zeros of 64-bit x (x != 0 guaranteed by unique keys)
        lz = 63 - np.floor(np.log2(x.astype(np.float64) + 0.5)).astype(np.int64)
        lz = np.where(x == 0, 64, lz)
        out[ok] = lz
        return out

    i = np.arange(n - 1, dtype=np.int64)
    d = np.sign(delta(i, i + 1) - delta(i, i - 1)).astype(np.int64)
    d = np.where(d == 0, 1, d)

    # find upper bound for range length
    delta_min = delta(i, i - d)
    lmax = np.full(n - 1, 2, np.int64)
    while True:
        probe = i + lmax * d
        grow = delta(i, probe) > delta_min
        if not grow.any():
            break
        lmax = np.where(grow, lmax * 2, lmax)
        if lmax.max() > 4 * n:
            break

    # binary search exact range end
    l = np.zeros(n - 1, np.int64)
    t = lmax // 2
    while t.max() >= 1:
        probe = i + (l + t) * d
        ok = delta(i, probe) > delta_min
        l = np.where(ok, l + t, l)
        t = t // 2
    j = i + l * d  # other end of range

    # binary search split position (Karras findSplit): for
    # t = ceil(l/2), ceil(l/4), ..., 1: advance s by t while the common
    # prefix past s+t still exceeds the node's own prefix
    delta_node = delta(i, j)
    s = np.zeros(n - 1, np.int64)
    done = np.zeros(n - 1, bool)
    div = 2
    while not done.all():
        t = np.maximum((l + div - 1) // div, 1)
        probe = i + (s + t) * d
        ok = (delta(i, probe) > delta_node) & ~done
        s = np.where(ok, s + t, s)
        done |= t == 1
        div *= 2
    gamma_split = i + s * d + np.minimum(d, 0)

    lo = np.minimum(i, j)
    hi = np.maximum(i, j)
    # children: leaf if the child range is a single element
    child_l = np.where(lo == gamma_split, ~gamma_split, gamma_split).astype(np.int64)
    child_r = np.where(hi == gamma_split + 1, ~(gamma_split + 1), gamma_split + 1).astype(
        np.int64
    )

    # internal-node AABBs over leaf ranges [lo, hi] via log-levels of
    # prefix-reduced mins/maxs (sparse table) — O(n log n), all vectorized
    levels = max(1, int(np.ceil(np.log2(n))))
    mins = [sb]
    maxs = [sB]
    for k in range(levels):
        half = 1 << k
        prev_min, prev_max = mins[-1], maxs[-1]
        m2 = prev_min.copy()
        M2 = prev_max.copy()
        m2[: n - half] = np.minimum(prev_min[: n - half], prev_min[half:])
        M2[: n - half] = np.maximum(prev_max[: n - half], prev_max[half:])
        mins.append(m2)
        maxs.append(M2)

    def range_bounds(a, b):
        ln = b - a + 1
        k = np.maximum(np.floor(np.log2(np.maximum(ln, 1))).astype(np.int64), 0)
        off = b - (1 << k) + 1
        mins_s = np.stack(mins)  # (levels+1, n, 3)
        maxs_s = np.stack(maxs)
        mn = np.minimum(mins_s[k, a], mins_s[k, off])
        mx = np.maximum(maxs_s[k, a], maxs_s[k, off])
        return mn, mx

    def child_bounds(c):
        is_leaf = c < 0
        leaf_idx = ~c
        a = np.where(is_leaf, leaf_idx, 0)
        # internal child ranges: child node id cn has range [lo[cn], hi[cn]]
        cn = np.where(is_leaf, 0, c)
        mn_i, mx_i = range_bounds(lo[cn], hi[cn])
        mn = np.where(is_leaf[:, None], sb[a], mn_i)
        mx = np.where(is_leaf[:, None], sB[a], mx_i)
        return mn.astype(np.float32), mx.astype(np.float32)

    bmin_l, bmax_l = child_bounds(child_l)
    bmin_r, bmax_r = child_bounds(child_r)

    return LBVH(
        jnp.asarray(child_l, jnp.int32),
        jnp.asarray(child_r, jnp.int32),
        jnp.asarray(bmin_l),
        jnp.asarray(bmax_l),
        jnp.asarray(bmin_r),
        jnp.asarray(bmax_r),
        jnp.asarray(prim_ids),
        jnp.asarray(
            pack_nodes(child_l, child_r, bmin_l, bmax_l, bmin_r, bmax_r)
        ),
    )


def _slab(o, inv_d, t_max, bmin, bmax):
    t_lo = (bmin - o) * inv_d
    t_hi = (bmax - o) * inv_d
    t_near = jnp.max(jnp.minimum(t_lo, t_hi), axis=-1)
    t_far = jnp.min(jnp.maximum(t_lo, t_hi), axis=-1) * (1.0 + 2.0 * vm.gamma(3.0))
    hit = (t_near <= t_far) & (t_far > 0.0) & (t_near < t_max)
    return hit, t_near


def bvh_intersect_tris(o, d, t_max, bvh: LBVH, p0, p1, p2, any_hit: bool = False):
    """Closest-hit (or any-hit) BVH traversal over triangle leaves.

    o,d,t_max: (R,·); p0..p2: (T,3) in ORIGINAL primitive order (leaf ids are
    remapped through bvh.prim_ids).  Per-lane explicit stack in registers/
    VMEM, every lane advances one internal node per iteration; terminated
    lanes idle (compaction is a later optimization).
    """
    R = o.shape[0]
    inv_d = 1.0 / jnp.where(d == 0.0, 1e-20, d)

    stack = jnp.zeros((R, STACK_DEPTH), jnp.int32)
    sp = jnp.ones((R,), jnp.int32)  # root (internal node 0) pre-pushed
    best_t = jnp.asarray(t_max, jnp.float32)
    best_tri = jnp.full((R,), -1, jnp.int32)
    best_b0 = jnp.zeros((R,), jnp.float32)
    best_b1 = jnp.zeros((R,), jnp.float32)
    lanes = jnp.arange(R)

    def leaf_test(c, is_leaf_mask, best):
        best_t, best_tri, best_b0, best_b1 = best
        leaf = jnp.where(is_leaf_mask, ~c, 0)
        prim = bvh.prim_ids[leaf]
        hit, t, b0, b1 = intersect_tri(o, d, best_t, p0[prim], p1[prim], p2[prim])
        hit &= is_leaf_mask
        upd = hit & (t < best_t)
        return (
            jnp.where(upd, t, best_t),
            jnp.where(upd, prim, best_tri),
            jnp.where(upd, b0, best_b0),
            jnp.where(upd, b1, best_b1),
        )

    def cond(state):
        sp = state[1]
        if any_hit:
            found = state[3] >= 0
            return jnp.any((sp > 0) & ~found)
        return jnp.any(sp > 0)

    def body(state):
        stack, sp, best_t, best_tri, best_b0, best_b1 = state
        active = sp > 0
        if any_hit:
            active &= best_tri < 0
        node = stack[lanes, jnp.maximum(sp - 1, 0)]
        sp = jnp.where(active, sp - 1, sp)

        if bvh.nodes16 is not None:
            # one contiguous 64B row gather per step (children bitcast)
            row = bvh.nodes16[node]
            cl = jax.lax.bitcast_convert_type(row[:, 0], jnp.int32)
            cr = jax.lax.bitcast_convert_type(row[:, 1], jnp.int32)
            hit_l, tn_l = _slab(o, inv_d, best_t, row[:, 2:5], row[:, 5:8])
            hit_r, tn_r = _slab(o, inv_d, best_t, row[:, 8:11], row[:, 11:14])
        else:
            cl = bvh.child_l[node]
            cr = bvh.child_r[node]
            hit_l, tn_l = _slab(o, inv_d, best_t, bvh.bmin_l[node], bvh.bmax_l[node])
            hit_r, tn_r = _slab(o, inv_d, best_t, bvh.bmin_r[node], bvh.bmax_r[node])
        hit_l &= active
        hit_r &= active

        # leaf children: test primitive immediately
        best = (best_t, best_tri, best_b0, best_b1)
        best = leaf_test(cl, hit_l & (cl < 0), best)
        best = leaf_test(cr, hit_r & (cr < 0), best)
        best_t, best_tri, best_b0, best_b1 = best

        # internal children: push far then near (so near pops first)
        push_l = hit_l & (cl >= 0)
        push_r = hit_r & (cr >= 0)
        near_is_l = tn_l <= tn_r
        first = jnp.where(near_is_l, cl, cr)  # pushed last
        second = jnp.where(near_is_l, cr, cl)
        push_first = jnp.where(near_is_l, push_l, push_r)
        push_second = jnp.where(near_is_l, push_r, push_l)

        stack = stack.at[lanes, jnp.minimum(sp, STACK_DEPTH - 1)].set(
            jnp.where(push_second, second, stack[lanes, jnp.minimum(sp, STACK_DEPTH - 1)])
        )
        sp = jnp.where(push_second, jnp.minimum(sp + 1, STACK_DEPTH), sp)
        stack = stack.at[lanes, jnp.minimum(sp, STACK_DEPTH - 1)].set(
            jnp.where(push_first, first, stack[lanes, jnp.minimum(sp, STACK_DEPTH - 1)])
        )
        sp = jnp.where(push_first, jnp.minimum(sp + 1, STACK_DEPTH), sp)
        return stack, sp, best_t, best_tri, best_b0, best_b1

    state = (stack, sp, best_t, best_tri, best_b0, best_b1)
    state = jax.lax.while_loop(cond, body, state)
    _, _, best_t, best_tri, best_b0, best_b1 = state
    valid = best_tri >= 0
    return TriHit(valid, best_t, best_tri, best_b0, best_b1)
