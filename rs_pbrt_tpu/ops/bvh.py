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

# bump whenever builder output or row layouts change: disk caches of built
# accels (bench.py, tools) key on this so a layout change can never be
# silently served stale rows (ADVICE r3 #3)
ACCEL_VERSION = 6

# frontier-sweep window (rows per dynamic_slice chunk); also the stream
# row-count alignment.  2048 keeps the one-hot gather matmul at
# (lanes, 2048) @ (2048, 16) — comfortably MXU-sized.
SWEEP_CHUNK = 2048


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


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
    # packed per-LEAF triangle row in leaf order: [p0(3), p1(3), p2(3),
    # prim_id(bits), pad...] — ONE row gather per leaf test instead of
    # four (p0/p1/p2/prim_ids).  None for non-triangle BVHs (curves,
    # instances).
    tris16: jnp.ndarray = None  # (N, 16) f32
    # unified rope-traversal node stream (internal rows then leaf rows),
    # built when triangle data is supplied — see build_stream below
    stream16: jnp.ndarray = None  # (done, 16) f32
    # unified 4-wide 256B rows (native wide4_build collapse): ONE gather
    # per traversal step fetches 4 child boxes or 4 packed triangles —
    # the TPU gather unit is row-rate-bound (~47M rows/s from HBM,
    # tools/tpu_probe5.py), so wide rows quarter the step count
    wide64: jnp.ndarray = None  # (M, 64) f32
    # max wide-tree depth (stack bound), SHAPE-ENCODED as a (depth, 0)
    # array: a plain int field would become a tracer through jit
    # boundaries (the accel rides jit arguments)
    wide_dflag: jnp.ndarray = None
    # unified 12-wide 512B rows (native wide12_build): round-4 probes
    # (tools/tpu_probe8.py) measured 512B rows gathering at the SAME
    # ~82M rows/s as 256B rows with zero gather ILP — so tripling the
    # arity per row cuts traversal row count ~2-3x at the same rate.
    # This is the TPU accel path of record; wide64 remains for parity
    # tests and the megakernel.
    wide128: jnp.ndarray = None  # (M, 128) f32
    wide128_dflag: jnp.ndarray = None
    # unified 24-wide 1024B rows (native wide24_build; same layout family,
    # offsets scale with the arity) — round-4 A/B candidate against the
    # 12-wide rows; kept only when it measures faster
    wide256: jnp.ndarray = None  # (M, 256) f32
    wide256_dflag: jnp.ndarray = None

    @property
    def wide_depth(self) -> int:
        return 0 if self.wide_dflag is None else self.wide_dflag.shape[0]

    @property
    def wide24_depth(self) -> int:
        return 0 if self.wide256_dflag is None else self.wide256_dflag.shape[0]

    @property
    def wide12_depth(self) -> int:
        return 0 if self.wide128_dflag is None else self.wide128_dflag.shape[0]


def pack_nodes(child_l, child_r, bmin_l, bmax_l, bmin_r, bmax_r):
    """Host packing of the traversal node row (numpy).  Cols 14/15 are
    reserved padding (the row is padded to 64B so one gather fetches the
    whole node)."""
    n = len(child_l)
    cl = np.asarray(child_l, np.int32)
    cr = np.asarray(child_r, np.int32)
    out = np.zeros((n, 16), np.float32)
    out[:, 0] = cl.view(np.float32)
    out[:, 1] = cr.view(np.float32)
    out[:, 2:5] = bmin_l
    out[:, 5:8] = bmax_l
    out[:, 8:11] = bmin_r
    out[:, 11:14] = bmax_r
    return out


def pack_leaf_tris(prim_ids, p0, p1, p2):
    """Host packing of leaf-ordered triangle rows (numpy): leaf k holds the
    vertices and the ORIGINAL primitive id (bitcast) of prim_ids[k]."""
    ids = np.asarray(prim_ids, np.int64)
    out = np.zeros((len(ids), 16), np.float32)
    out[:, 0:3] = np.asarray(p0, np.float32)[ids]
    out[:, 3:6] = np.asarray(p1, np.float32)[ids]
    out[:, 6:9] = np.asarray(p2, np.float32)[ids]
    out[:, 9] = ids.astype(np.int32).view(np.float32)
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


def build_lbvh(bmin, bmax, tris=None) -> LBVH:
    """Build from per-primitive AABBs (numpy arrays, host-side).

    bmin/bmax: (N,3) float32.  tris: optional (p0, p1, p2) numpy arrays —
    when given, leaf-ordered packed triangle rows are attached (tris16) so
    traversal does one gather per leaf test.  Returns device-ready LBVH.
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
            None if tris is None else jnp.asarray(
                pack_leaf_tris(np.asarray([0]), *tris)
            ),
            None if tris is None else jnp.asarray(
                _stream_single(bmin[0], bmax[0], *tris)
            ),
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
        None if tris is None else jnp.asarray(pack_leaf_tris(prim_ids, *tris)),
        None if tris is None else jnp.asarray(build_stream(
            (child_l, child_r), bmin_l, bmax_l, bmin_r, bmax_r, prim_ids,
            *tris,
        )),
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
        if bvh.tris16 is not None:
            # one 64B leaf-row gather: vertices + original prim id
            row = bvh.tris16[leaf]
            prim = jax.lax.bitcast_convert_type(row[:, 9], jnp.int32)
            hit, t, b0, b1 = intersect_tri(
                o, d, best_t, row[:, 0:3], row[:, 3:6], row[:, 6:9]
            )
        else:
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


# ---------------------------------------------------------------------------
# Stackless escape-link ("rope") traversal
# ---------------------------------------------------------------------------
# The per-lane short-stack traversal above needs a (R, STACK) scatter-write
# and gather per step; on TPU those per-lane 2D dynamic updates cost ~2.5ms
# per 65k lanes — 100x the node-row gather (0.04ms) — making the stacked
# walk non-viable at scale.  The rope traversal keeps per-ray state to ONE
# node id: every node knows where the DFS goes on hit (first child) and on
# miss (escape link to the next unvisited subtree).  Each step is a single
# contiguous row gather + vector tests + a where() — zero scatters.  The
# fixed DFS order loses front-to-back ordering (the reference's
# dir_is_neg stack ordering, bvh.rs:420-461), costing ~1.5-2x more leaf
# tests, repaid 100x by the vectorization.

def _stream_single(bmin0, bmax0, p0, p1, p2):
    """Degenerate 1-primitive rope stream: internal root -> leaf -> done
    (the fake root's duplicated child must NOT self-link)."""
    done = SWEEP_CHUNK
    out = np.zeros((done, 16), np.float32)
    out[0, 0:3] = bmin0
    out[0, 3:6] = bmax0
    out[0, 9] = 1.0
    out[0, 10] = float(done)
    out[1, 0:3] = np.asarray(p0, np.float32)[0]
    out[1, 3:6] = np.asarray(p1, np.float32)[0]
    out[1, 6:9] = np.asarray(p2, np.float32)[0]
    out[1, 10] = float(done)
    out[1, 12] = 0.0
    out[1, 15] = 1.0
    out[2:, 10] = float(done)
    out[2:, 15] = 1.0
    return out


def build_stream(lbvh_np_children, bmin_l, bmax_l, bmin_r, bmax_r, prim_ids,
                 p0, p1, p2):
    """Host build of the unified rope node stream (numpy), in DFS
    PRE-ORDER with all links stored as plain f32 VALUES.

    Row layout (16 f32 cols), discriminated by col 15 (0=internal, 1=leaf):
      internal: [bmin(0:3), bmax(3:6), -, -, -, hit(9), miss(10), ...]
      leaf:     [p0(0:3), p1(3:6), p2(6:9), -, miss(10), -, prim(12), ...]
    Links/prim ids are float VALUES (exact for ids < 2^24 — asserted), not
    bitcasts: the frontier-sweep traversal fetches rows with a bf16x3
    one-hot MXU matmul, which reproduces true f32 values exactly but NOT
    arbitrary int bit patterns (NaN/denormal payloads).  The terminator is
    the row count rounded up to the sweep chunk (SWEEP_CHUNK) — i.e. one
    past the last padded row — so `cur >= stream.shape[0]` means done.

    DFS pre-order gives the sweep its key invariant: every link points
    STRICTLY FORWARD, so a ray's row sequence is monotonically increasing
    and a whole wavefront can be served by one forward pass over the
    stream in chunk-sized windows (see bvh_sweep_intersect_tris).
    """
    child_l, child_r = lbvh_np_children
    n1 = len(child_l)  # internal count = n-1
    n = n1 + 1

    def row_of(c):
        # child ref -> row id (internal id, or (n-1)+leaf for c<0)
        c = np.asarray(c, np.int64)
        return np.where(c < 0, n1 + (~c), c).astype(np.int64)

    rl = row_of(child_l)
    rr = row_of(child_r)

    # parent + is-left-child per row (root row 0 has none)
    n_rows = n1 + n
    parent = np.full(n_rows, -1, np.int64)
    is_left = np.zeros(n_rows, bool)
    parent[rl] = np.arange(n1)
    is_left[rl] = True
    parent[rr] = np.arange(n1)
    sibling_right = np.full(n_rows, -1, np.int64)
    sibling_right[rl] = rr  # left child's right sibling

    # miss links: miss(root)=-1; miss(left)=right sibling;
    # miss(right)=miss(parent) — resolved by iterating the parent
    # recurrence until fixpoint (<= tree depth rounds, all vectorized)
    miss = np.full(n_rows, -2, np.int64)  # -2 = unresolved
    miss[0] = -1
    rows = np.arange(n_rows)
    par = parent[rows]
    # right-child chains resolve one level per round; iterate until
    # fixpoint (tree depth rounds — SAH trees can exceed the 64 levels of
    # morton|index radix trees) and fail LOUDLY on a stall instead of
    # silently dropping subtrees (ADVICE r2 #3)
    while True:
        unresolved = miss == -2
        if not unresolved.any():
            break
        # left children: escape to the right sibling (always resolvable)
        cand = np.where(is_left & (par >= 0), rr[np.maximum(par, 0)], -2)
        # right children: inherit parent's miss (may still be unresolved)
        par_miss = miss[np.maximum(par, 0)]
        cand = np.where(~is_left & (par >= 0), par_miss, cand)
        new_miss = np.where(unresolved & (cand != -2), cand, miss)
        if (new_miss == miss).all():
            raise AssertionError(
                f"BVH rope build: {int(unresolved.sum())} miss links "
                "unresolvable (orphaned rows — builder emitted a bad tree)"
            )
        miss = new_miss

    # ---- DFS pre-order rank via pointer-doubling list ranking ----
    # the always-hit walk (internal -> first child, leaf -> miss) visits
    # every row exactly once: a linked list whose order IS DFS pre-order
    is_leaf_row = np.zeros(n_rows, bool)
    is_leaf_row[n1:] = True
    nxt = np.where(is_leaf_row, miss, np.concatenate([rl, np.zeros(n, np.int64)]))
    # rank-from-tail by doubling: d[i] = #rows after i in the walk
    d = (nxt >= 0).astype(np.int64)
    ptr = np.where(nxt >= 0, nxt, 0)
    hops = 1
    while hops < n_rows:
        d = d + np.where(nxt >= 0, d[ptr], 0)
        nxt = np.where(nxt >= 0, nxt[ptr], -1)
        ptr = np.where(nxt >= 0, nxt, 0)
        hops *= 2
    rank = (n_rows - 1) - d  # DFS position of each original row

    assert n_rows < (1 << 24), "stream links exceed exact-f32 range"
    done = _round_up(n_rows, SWEEP_CHUNK)

    def to_rank(link):
        link = np.asarray(link, np.int64)
        return np.where(link < 0, done, rank[np.maximum(link, 0)]).astype(np.float64)

    out = np.zeros((done, 16), np.float32)
    rows = np.zeros((n_rows, 16), np.float32)
    # internal rows
    bmin_own = np.minimum(bmin_l, bmin_r)
    bmax_own = np.maximum(bmax_l, bmax_r)
    rows[:n1, 0:3] = bmin_own
    rows[:n1, 3:6] = bmax_own
    rows[:n1, 9] = to_rank(rl)
    rows[:n1, 10] = to_rank(miss[:n1])
    # leaf rows
    ids = np.asarray(prim_ids, np.int64)
    rows[n1:, 0:3] = np.asarray(p0, np.float32)[ids]
    rows[n1:, 3:6] = np.asarray(p1, np.float32)[ids]
    rows[n1:, 6:9] = np.asarray(p2, np.float32)[ids]
    rows[n1:, 10] = to_rank(miss[n1:])
    rows[n1:, 12] = ids.astype(np.float64)
    rows[n1:, 15] = 1.0
    out[rank] = rows
    # padding rows: inert leaves that terminate immediately (unreachable)
    out[n_rows:, 10] = done
    out[n_rows:, 15] = 1.0
    # DFS invariant: every internal row's hit link is the next row, and
    # every link points strictly forward (monotone sweep property)
    pos = np.arange(n_rows)
    internal = out[:n_rows, 15] < 0.5
    assert (np.round(out[:n_rows, 9]).astype(np.int64)[internal] == pos[internal] + 1).all()
    assert (np.round(out[:n_rows, 10]).astype(np.int64) > pos).all()
    return out


def _stream_step(o, d, inv_d, row, active, best):
    """One rope step shared by the gather and sweep traversals: slab test
    (internal rows) / watertight tri test (leaf rows) + link advance.
    Returns (next_row_id, new_best)."""
    best_t, best_tri, best_b0, best_b1 = best
    is_leaf = row[:, 15] > 0.5
    t_lo = (row[:, 0:3] - o) * inv_d
    t_hi = (row[:, 3:6] - o) * inv_d
    t_near = jnp.max(jnp.minimum(t_lo, t_hi), axis=-1)
    t_far = jnp.min(jnp.maximum(t_lo, t_hi), axis=-1) * (1.0 + 2.0 * vm.gamma(3.0))
    box_hit = (t_near <= t_far) & (t_far > 0.0) & (t_near < best_t)
    hit_link = jnp.round(row[:, 9]).astype(jnp.int32)
    miss_link = jnp.round(row[:, 10]).astype(jnp.int32)
    prim = jnp.round(row[:, 12]).astype(jnp.int32)
    hit, t, b0, b1 = intersect_tri(
        o, d, best_t, row[:, 0:3], row[:, 3:6], row[:, 6:9]
    )
    upd = active & is_leaf & hit & (t < best_t)
    best = (
        jnp.where(upd, t, best_t),
        jnp.where(upd, prim, best_tri),
        jnp.where(upd, b0, best_b0),
        jnp.where(upd, b1, best_b1),
    )
    nxt = jnp.where(is_leaf | ~box_hit, miss_link, hit_link)
    return nxt, best


def bvh_intersect_tris_stream(o, d, t_max, stream16, any_hit: bool = False):
    """Closest-hit (or any-hit) rope traversal over the unified node
    stream via per-lane HBM row gathers.  o, d, t_max: (R, ·); stream16:
    (done, 16) device array (done = padded row count = terminator id).

    NOTE: on real TPUs row gathers inside a while_loop serialize at
    ~30-45M rows/s (descriptor-bound) — use bvh_sweep_intersect_tris
    there.  This path remains the fast CPU/test reference."""
    R = o.shape[0]
    done = stream16.shape[0]
    inv_d = 1.0 / jnp.where(d == 0.0, 1e-20, d)

    # varying-typed initial carries: under shard_map the while_loop carry
    # must keep a consistent varying type, and t_max is often an unvarying
    # splat constant — derive the varying zero from the ray data
    vary_f = jnp.sum(o * 0.0, axis=-1)
    best_t = jnp.asarray(t_max, jnp.float32) + vary_f
    vary_i = vary_f.astype(jnp.int32)
    cur = vary_i  # root row
    best_tri = vary_i - 1
    best_b0 = vary_f
    best_b1 = vary_f

    def cond(state):
        cur = state[0]
        if any_hit:
            return jnp.any((cur < done) & (state[2] < 0))
        return jnp.any(cur < done)

    def body(state):
        cur, best_t, best_tri, best_b0, best_b1 = state
        active = cur < done
        if any_hit:
            active &= best_tri < 0
        row = stream16[jnp.minimum(cur, done - 1)]
        nxt, best = _stream_step(
            o, d, inv_d, row, active, (best_t, best_tri, best_b0, best_b1)
        )
        cur = jnp.where(active, nxt, cur)
        return (cur,) + best

    state = (cur, best_t, best_tri, best_b0, best_b1)
    state = jax.lax.while_loop(cond, body, state)
    _, best_t, best_tri, best_b0, best_b1 = state
    valid = best_tri >= 0
    return TriHit(valid, best_t, best_tri, best_b0, best_b1)


def bvh4_intersect_tris(
    o, d, t_max, wide64, wide_depth: int, any_hit: bool = False,
    compact_stages: int = 3,
):
    """ORDERED 4-wide BVH traversal over the unified 256B row array — the
    TPU accel path of record.

    Economics (measured, tools/tpu_probe*.py): the XLA gather unit fetches
    HBM table rows at a fixed ROW rate (~47M rows/s at wavefront sizes)
    regardless of row width, and per-while-iteration overhead is the other
    cost floor — so the traversal wants the FEWEST, WIDEST steps.  Each
    iteration does exactly ONE row gather: an internal row carries 4 child
    AABBs (slab-tested in parallel on the VPU, nearest hit descended
    first), a leaf row carries 4 packed triangles (watertight-tested in
    parallel).  Front-to-back ordering + t_max pruning gives ~3x fewer
    visits than the DFS rope walk (CPU measurement: 35 vs 113 mean visits
    on the 1.31M-tri statue).  Deferred siblings live in a per-lane
    roll-stack of PACKED u32 entries (child-group base << 4 | pending-hit
    mask) — pushes are contiguous whole-array shifts, not the per-lane 2D
    scatters that cost ~100x a node gather on TPU.

    ADAPTIVE COMPACTION (compact_stages > 0): per-lane visit counts are
    heavy-tailed (statue: mean 14, p99 42, max 72) and every iteration
    pays the FULL wavefront's gather row count — so once the live-lane
    count drops below a quarter of the current wavefront, live lanes are
    argsort-compacted into a 4x smaller prefix and the loop continues
    there (correctness guaranteed: compaction only triggers when every
    live lane fits the prefix).  Two stages cut the statue traversal's
    row fetches ~2.5x.

    Mirrors reference bvh.rs:401-514 (64-slot stack machine, dir_is_neg
    near-child ordering) as capability; the algorithm is shaped by the
    gather-row economics above instead.
    """
    R = o.shape[0]
    K = max(2 * wide_depth + 4, 8)
    eps = 1.0 + 2.0 * vm.gamma(3.0)
    from .intersect import ray_shear

    bits = jnp.asarray([1, 2, 4, 8], jnp.int32)

    def live_mask(st):
        l = ((st["cur"] & 15) != 0) | ((st["stack"][:, 0] & 15) != 0)
        if any_hit:
            l &= st["best_tri"] < 0
        return l

    def body(st):
        cur, stack = st["cur"], st["stack"]
        best_t, best_tri = st["best_t"], st["best_tri"]
        best_b0, best_b1 = st["best_b0"], st["best_b1"]
        o, d, inv_d = st["o"], st["d"], st["inv_d"]
        shear1 = st["shear"]
        n = cur.shape[0]
        # pop: if cur has no pending bits, pull the stack top
        need = (cur & 15) == 0
        cur = jnp.where(need, stack[:, 0], cur)
        stack = jnp.where(
            need[:, None],
            jnp.concatenate([stack[:, 1:], jnp.zeros_like(stack[:, :1])], axis=1),
            stack,
        )
        mask = cur & 15
        active = mask != 0
        if any_hit:
            active &= best_tri < 0
        low = mask & (-mask)
        biti = (
            jnp.where(low == 2, 1, 0)
            + jnp.where(low == 4, 2, 0)
            + jnp.where(low == 8, 3, 0)
        )
        row_id = (jax.lax.shift_right_logical(cur, 4)) + biti
        cur = jax.lax.bitwise_xor(cur, low)  # clear the visited bit

        row = wide64[jnp.where(active, row_id, 0)]  # THE one gather (n,64)
        is_leaf = row[:, 63] > 0.5

        # ---- internal: 4 child slab tests ----
        o_ = o[:, :, None]
        i_ = inv_d[:, :, None]
        bmin4 = jnp.stack([row[:, 0:4], row[:, 4:8], row[:, 8:12]], axis=1)
        bmax4 = jnp.stack([row[:, 12:16], row[:, 16:20], row[:, 20:24]], axis=1)
        t_lo = (bmin4 - o_) * i_
        t_hi = (bmax4 - o_) * i_
        tn = jnp.max(jnp.minimum(t_lo, t_hi), axis=1)  # (n,4)
        tf = jnp.min(jnp.maximum(t_lo, t_hi), axis=1) * eps
        hit4 = (tn <= tf) & (tf > 0.0) & (tn < best_t[:, None])
        hit4 &= (active & ~is_leaf)[:, None]
        # mask slots >= the row's child count: "inverted" empty boxes pass
        # the slab test (per-axis min/max repairs the inversion) — see the
        # wide12 traversal note.  Rare here (the 4-wide collapse almost
        # always fills all slots) but phantom on partially-filled rows.
        cnt4 = jnp.round(row[:, 25]).astype(jnp.int32)
        hit4 &= jnp.arange(4, dtype=jnp.int32)[None, :] < cnt4[:, None]
        child_base = jnp.round(row[:, 24]).astype(jnp.int32)
        tn_m = jnp.where(hit4, tn, jnp.inf)
        near = jnp.argmin(tn_m, axis=1).astype(jnp.int32)
        has_hit = jnp.any(hit4, axis=1)
        near_bit = jnp.left_shift(jnp.int32(1), near)
        hit_bits = jnp.sum(jnp.where(hit4, bits[None, :], 0), axis=1)
        rest = hit_bits & ~near_bit

        def push(stack, entry, do):
            shifted = jnp.concatenate([entry[:, None], stack[:, :-1]], axis=1)
            return jnp.where(do[:, None], shifted, stack)

        descend = active & ~is_leaf & has_hit
        base_sh = jax.lax.shift_left(child_base, 4)
        stack = push(stack, cur, descend & ((cur & 15) != 0))
        stack = push(stack, base_sh | rest, descend & (rest != 0))
        cur = jnp.where(descend, base_sh | near_bit, cur)

        # ---- leaf: 4 packed triangle tests ----
        p04 = row[:, 0:12].reshape(n, 4, 3)
        p14 = row[:, 12:24].reshape(n, 4, 3)
        p24 = row[:, 24:36].reshape(n, 4, 3)
        th, tt, tb0, tb1 = intersect_tri(
            o[:, None, :], d[:, None, :], best_t[:, None], p04, p14, p24,
            shear=shear1,
        )
        th &= (active & is_leaf)[:, None]
        tt_m = jnp.where(th, tt, jnp.inf)
        bi = jnp.argmin(tt_m, axis=1)
        tri_hit = jnp.any(th, axis=1)
        # one-hot select instead of take_along_axis: (n,4) per-lane
        # gathers hit the same slow gather unit as table rows
        onehot = bi[:, None] == jnp.arange(4, dtype=bi.dtype)[None, :]
        take = lambda a: jnp.sum(jnp.where(onehot, a, 0.0), axis=1)
        t_new = jnp.min(tt_m, axis=1)
        upd = tri_hit & (t_new < best_t)
        prim4 = jnp.round(row[:, 36:40]).astype(jnp.int32)
        best_t = jnp.where(upd, t_new, best_t)
        best_tri = jnp.where(
            upd, jnp.sum(jnp.where(onehot, prim4, 0), axis=1), best_tri
        )
        best_b0 = jnp.where(upd, take(tb0), best_b0)
        best_b1 = jnp.where(upd, take(tb1), best_b1)
        return dict(
            cur=cur, stack=stack, best_t=best_t, best_tri=best_tri,
            best_b0=best_b0, best_b1=best_b1, o=o, d=d, inv_d=inv_d,
            shear=shear1,
        )

    # ---- initial full-wavefront state (varying-typed carries: under
    # shard_map the while_loop carry must keep a consistent varying type,
    # and t_max is often an unvarying splat constant) ----
    inv_d = 1.0 / jnp.where(d == 0.0, 1e-20, d)
    vary_f = jnp.sum(o * 0.0, axis=-1)
    best_t = jnp.asarray(t_max, jnp.float32) + vary_f
    vary_i = vary_f.astype(jnp.int32)
    shear1 = tuple(s[:, None] for s in ray_shear(o, d))
    state = dict(
        cur=vary_i + 1,  # base 0, mask {bit0} -> row 0
        stack=jnp.zeros((R, K), jnp.int32) + vary_i[:, None],
        best_t=best_t, best_tri=vary_i - 1,
        best_b0=vary_f, best_b1=vary_f,
        o=o, d=d, inv_d=inv_d, shear=shear1,
    )

    state = _compacted_traversal(body, live_mask, state, R, compact_stages)
    best_tri = state["best_tri"]
    valid = best_tri >= 0
    return TriHit(valid, state["best_t"], best_tri, state["best_b0"], state["best_b1"])


def _compacted_traversal(body, live_mask, state, R, compact_stages, unroll=1,
                         compact_factor=4):
    """Adaptive wavefront-compaction driver shared by the wide traversals.

    Per-lane visit counts are heavy-tailed (statue: mean 14, p99 42, max
    72 on the 4-wide tree) and every while-iteration pays the FULL
    wavefront's gather row count — so once the live-lane count drops below
    a quarter of the current wavefront, live lanes are argsort-compacted
    into a 4x smaller prefix and the loop continues there (correctness
    guaranteed: compaction only triggers when every live lane fits the
    prefix).  Quartering stages measured equal to halving on the statue
    (131.9k vs 129.9k paths/s) with half the compiled loops.

    unroll > 1 applies `body` that many times per while iteration: lanes
    whose walk is finished no-op inside `body`, so the only cost is up to
    unroll-1 wasted steps at the very end of each loop, against saving the
    fixed ~0.2-0.7ms-per-iteration dispatch glue (CLAUDE.md measurement)
    on every iteration.

    compact_stages bounds the LADDER LENGTH, but the floor is what
    matters: the size builder below stops quartering at 1024 lanes, so
    stages must be enough to REACH that floor from R (3 was tuned at
    R=64k; at the round-4 512k lane cap 3 stages left an 8192-lane floor
    and the heavy tail iterations ran 8x too wide — statue end-to-end
    DROPPED from 388k to 246k paths/s until the ladder was deepened)."""
    if unroll > 1:
        inner = body

        def body(st):  # noqa: F811 — deliberate wrap
            for _ in range(unroll):
                st = inner(st)
            return st

    # compact_factor: ladder granularity.  A stage only exits (and
    # compacts) when live < next size, so entry-width waste is bounded by
    # the factor — e.g. a wavefront entering with 28% live rides the full
    # width under factor 4 but compacts immediately under factor 2.
    # Factor 2 doubles the argsort/loop count in exchange.
    sizes = [R]
    for _ in range(max(compact_stages, 0)):
        nxt = sizes[-1] // compact_factor
        if nxt < 1024:
            break
        sizes.append(nxt)

    for si, size in enumerate(sizes):
        if si > 0:
            l = live_mask(state)
            order = jnp.argsort(jnp.where(l, 0, 1), stable=True)
            sel = order[:size]
            sub = {
                k: (tuple(x[sel] for x in v) if isinstance(v, tuple) else v[sel])
                for k, v in state.items()
            }
        else:
            sel = None
            sub = state
        last = si == len(sizes) - 1
        next_size = None if last else sizes[si + 1]

        def cond(st, next_size=next_size):
            l = live_mask(st)
            any_l = jnp.any(l)
            if next_size is None:
                return any_l
            return any_l & (jnp.sum(l.astype(jnp.int32)) > next_size)

        sub = jax.lax.while_loop(cond, body, sub)
        if si > 0:
            state = {
                k: (tuple(x.at[sel].set(sx) for x, sx in zip(v, sub[k]))
                    if isinstance(v, tuple) else v.at[sel].set(sub[k]))
                for k, v in state.items()
            }
        else:
            state = sub
    return state


# wide12 row layout (native/lbvh.cpp wide12_build): 128 f32 cols,
# discriminated by col 127 (0=internal, 1=leaf)
W12 = 12
_W12_BASE = 72   # internal: child-group base row id
_W12_COUNT = 73  # internal: live child count
_W12_P1 = 36     # leaf: second vertices block
_W12_P2 = 72
_W12_PRIM = 108
_W12_FLAG = 127


def _tri_test_soa(o, t_max, shear, X0, Y0, Z0, X1, Y1, Z1, X2, Y2, Z2):
    """Watertight ray-triangle test on COMPONENT-SOA vertex slices.

    Same math as ops/intersect.intersect_tri (reference
    triangle.rs:154-449) but with every operand a (lanes, K) component
    array: the 12-wide traversal feeds (n,12) slices of the gathered row
    directly, avoiding the (n,K,3) minor-dim-3 relayouts that cost more
    than the row gather itself (round-4 chip bisect, tools/).
    shear: ray_shear(o, d) columns reshaped (n,1).  Returns
    (hit, t, b0, b1) each (lanes, K)."""
    kx, ky, kz, sx, sy, sz = shear
    ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]

    def perm(k, ax, ay, az):
        return jnp.where(k == 0, ax, jnp.where(k == 1, ay, az))

    def permuted(X, Y, Z):
        px, py, pz = X - ox, Y - oy, Z - oz
        return (
            perm(kx, px, py, pz), perm(ky, px, py, pz), perm(kz, px, py, pz)
        )

    x0, y0, z0 = permuted(X0, Y0, Z0)
    x1, y1, z1 = permuted(X1, Y1, Z1)
    x2, y2, z2 = permuted(X2, Y2, Z2)
    x0 = x0 + sx * z0
    y0 = y0 + sy * z0
    x1 = x1 + sx * z1
    y1 = y1 + sy * z1
    x2 = x2 + sx * z2
    y2 = y2 + sy * z2

    e0 = x1 * y2 - y1 * x2
    e1 = x2 * y0 - y2 * x0
    e2 = x0 * y1 - y0 * x1
    neg = (e0 < 0) | (e1 < 0) | (e2 < 0)
    pos = (e0 > 0) | (e1 > 0) | (e2 > 0)
    miss_sign = neg & pos
    det = e0 + e1 + e2
    miss_det = det == 0.0

    z0s = sz * z0
    z1s = sz * z1
    z2s = sz * z2
    t_scaled = e0 * z0s + e1 * z1s + e2 * z2s
    miss_range = jnp.where(
        det < 0.0,
        (t_scaled >= 0.0) | (t_scaled < t_max * det),
        (t_scaled <= 0.0) | (t_scaled > t_max * det),
    )

    inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
    b0 = e0 * inv_det
    b1 = e1 * inv_det
    t = t_scaled * inv_det

    # conservative t error bound (triangle.rs:421-449)
    max_zt = jnp.maximum(jnp.maximum(jnp.abs(z0s), jnp.abs(z1s)), jnp.abs(z2s))
    delta_z = vm.gamma(3.0) * max_zt
    max_xt = jnp.maximum(jnp.maximum(jnp.abs(x0), jnp.abs(x1)), jnp.abs(x2))
    max_yt = jnp.maximum(jnp.maximum(jnp.abs(y0), jnp.abs(y1)), jnp.abs(y2))
    delta_x = vm.gamma(5.0) * (max_xt + max_zt)
    delta_y = vm.gamma(5.0) * (max_yt + max_zt)
    delta_e = 2.0 * (
        vm.gamma(2.0) * max_xt * max_yt + delta_y * max_xt + delta_x * max_yt
    )
    max_e = jnp.maximum(jnp.maximum(jnp.abs(e0), jnp.abs(e1)), jnp.abs(e2))
    delta_t = (
        3.0
        * (vm.gamma(3.0) * max_e * max_zt + delta_e * max_zt + delta_z * max_e)
        * jnp.abs(inv_det)
    )
    miss_eps = t <= delta_t

    hit = ~(miss_sign | miss_det | miss_range | miss_eps)
    return hit, t, b0, b1


def bvh12_intersect_tris(
    o, d, t_max, wide128, wide_depth: int, any_hit: bool = False,
    compact_stages: int = 3, unroll: int = 1, compact_factor: int = 4,
):
    """ORDERED 12-wide BVH traversal over unified 512B rows — the TPU
    accel path of record (round 4).

    Same algorithm as bvh4_intersect_tris (one row gather per iteration,
    nearest-child-first descent, packed pending masks, roll-stack pushes,
    adaptive compaction) at triple the arity: round-4 probes
    (tools/tpu_probe8.py) measured 512B rows gathering at the same ~82M
    rows/s as 256B rows and no gather ILP, so the widest row that holds a
    full child set minimizes the only real cost — row count.  12 child
    AABBs or 12 packed triangles per row cut interior levels ~1.8x and
    leaf visits ~3x vs the 4-wide tree.  Pending-child state no longer
    fits one packed u32 (base<<4|mask needed 4 bits; 12 need 12), so
    `cur` and the roll-stack are parallel (base, mask) i32 pairs.
    Mirrors reference bvh.rs:401-514 capability (stack machine,
    dir_is_neg ordering) with a hardware-shaped algorithm.
    """
    return _bvhw_intersect_tris(
        o, d, t_max, wide128, wide_depth, W12, any_hit, compact_stages, unroll,
        compact_factor,
    )


def bvh24_intersect_tris(
    o, d, t_max, wide256, wide_depth: int, any_hit: bool = False,
    compact_stages: int = 3, unroll: int = 1, compact_factor: int = 4,
):
    """24-wide variant over 1024B rows (native wide24_build) — same
    ordered traversal at double arity; see bvh12_intersect_tris."""
    return _bvhw_intersect_tris(
        o, d, t_max, wide256, wide_depth, 24, any_hit, compact_stages, unroll,
        compact_factor,
    )


def _bvhw_intersect_tris(
    o, d, t_max, table, wide_depth: int, W: int, any_hit: bool,
    compact_stages: int, unroll: int = 1, compact_factor: int = 4,
):
    """Arity-generic ordered wide traversal (row layout offsets are all
    multiples of the arity W; see native/lbvh.cpp WideN)."""
    R = o.shape[0]
    K = max(2 * wide_depth + 4, 8)
    eps = 1.0 + 2.0 * vm.gamma(3.0)
    from .intersect import ray_shear

    rw = table.shape[1]
    _W12_BASE = 6 * W
    _W12_COUNT = 6 * W + 1
    _W12_PRIM = 9 * W
    _W12_FLAG = rw - 1
    wide128 = table
    bits = jax.lax.shift_left(jnp.int32(1), jnp.arange(W, dtype=jnp.int32))
    full = jnp.int32((1 << W) - 1)

    def live_mask(st):
        l = (st["cur_m"] != 0) | (st["stk_m"][:, 0] != 0)
        if any_hit:
            l &= st["best_tri"] < 0
        return l

    def body(st):
        cur_b, cur_m = st["cur_b"], st["cur_m"]
        stk_b, stk_m = st["stk_b"], st["stk_m"]
        best_t, best_tri = st["best_t"], st["best_tri"]
        best_b0, best_b1 = st["best_b0"], st["best_b1"]
        o, d, inv_d = st["o"], st["d"], st["inv_d"]
        shear1 = st["shear"]
        n = cur_b.shape[0]
        # pop: if cur has no pending bits, pull the stack top
        need = cur_m == 0
        cur_b = jnp.where(need, stk_b[:, 0], cur_b)
        cur_m = jnp.where(need, stk_m[:, 0], cur_m)
        shift = lambda s: jnp.concatenate(
            [s[:, 1:], jnp.zeros_like(s[:, :1])], axis=1
        )
        stk_b = jnp.where(need[:, None], shift(stk_b), stk_b)
        stk_m = jnp.where(need[:, None], shift(stk_m), stk_m)
        active = cur_m != 0
        if any_hit:
            active &= best_tri < 0
        low = cur_m & (-cur_m)
        # bit index from the f32 exponent (exact: one-hot values < 2^24)
        biti = jax.lax.shift_right_logical(
            jax.lax.bitcast_convert_type(low.astype(jnp.float32), jnp.int32), 23
        ) - 127
        biti = jnp.where(active, biti, 0)
        row_id = cur_b + biti
        cur_m = jax.lax.bitwise_xor(cur_m, low)  # clear the visited bit

        row = wide128[jnp.where(active, row_id, 0)]  # THE one gather (n,128)
        is_leaf = row[:, _W12_FLAG] > 0.5

        # ---- internal: 12 child slab tests, all in the (n,12) lane
        # domain (no (n,3,12) stacking: minor-dim-3 relayouts cost more
        # than the row gather, round-4 chip bisect) ----
        def axis_slab(c_min, c_max, oc, ic):
            t1 = (row[:, c_min : c_min + W] - oc) * ic
            t2 = (row[:, c_max : c_max + W] - oc) * ic
            return jnp.minimum(t1, t2), jnp.maximum(t1, t2)

        tnx, tfx = axis_slab(0 * W, 3 * W, o[:, 0:1], inv_d[:, 0:1])
        tny, tfy = axis_slab(1 * W, 4 * W, o[:, 1:2], inv_d[:, 1:2])
        tnz, tfz = axis_slab(2 * W, 5 * W, o[:, 2:3], inv_d[:, 2:3])
        tn = jnp.maximum(jnp.maximum(tnx, tny), tnz)  # (n,12)
        tf = jnp.minimum(jnp.minimum(tfx, tfy), tfz) * eps
        hit12 = (tn <= tf) & (tf > 0.0) & (tn < best_t[:, None])
        hit12 &= (active & ~is_leaf)[:, None]
        # CRITICAL: mask slots >= the row's child count.  Empty slots carry
        # "inverted" boxes, but the slab test repairs inversion through the
        # per-axis min/max — an inverted box ALWAYS hits (tn=-inf, tf=+inf),
        # so unmasked empty slots descend into other groups' rows (visits
        # explode ~20x on the statue; results stay right — the phantom rows
        # hold real geometry — but the walk is chaotic)
        cnt = jnp.round(row[:, _W12_COUNT]).astype(jnp.int32)
        hit12 &= jnp.arange(W, dtype=jnp.int32)[None, :] < cnt[:, None]
        child_base = jnp.round(row[:, _W12_BASE]).astype(jnp.int32)
        tn_m = jnp.where(hit12, tn, jnp.inf)
        near = jnp.argmin(tn_m, axis=1).astype(jnp.int32)
        has_hit = jnp.any(hit12, axis=1)
        near_bit = jax.lax.shift_left(jnp.int32(1), near)
        hit_bits = jnp.sum(jnp.where(hit12, bits[None, :], 0), axis=1)
        rest = hit_bits & (full ^ near_bit)

        def push(stk, entry, do):
            shifted = jnp.concatenate([entry[:, None], stk[:, :-1]], axis=1)
            return jnp.where(do[:, None], shifted, stk)

        descend = active & ~is_leaf & has_hit
        resume = descend & (cur_m != 0)
        stk_b = push(stk_b, cur_b, resume)
        stk_m = push(stk_m, cur_m, resume)
        defer = descend & (rest != 0)
        stk_b = push(stk_b, child_base, defer)
        stk_m = push(stk_m, rest, defer)
        cur_b = jnp.where(descend, child_base, cur_b)
        cur_m = jnp.where(descend, near_bit, cur_m)

        # ---- leaf: 12 packed triangle tests on component-SoA slices ----
        g = lambda c0: row[:, c0 : c0 + W]
        th, tt, tb0, tb1 = _tri_test_soa(
            o, best_t[:, None], shear1,
            *[g(i * W) for i in range(9)],
        )
        th &= (active & is_leaf)[:, None]
        tt_m = jnp.where(th, tt, jnp.inf)
        bi = jnp.argmin(tt_m, axis=1)
        tri_hit = jnp.any(th, axis=1)
        # one-hot select instead of take_along_axis: (n,12) per-lane
        # gathers hit the same slow gather unit as table rows
        onehot = bi[:, None] == jnp.arange(W, dtype=bi.dtype)[None, :]
        take = lambda a: jnp.sum(jnp.where(onehot, a, 0.0), axis=1)
        t_new = jnp.min(tt_m, axis=1)
        upd = tri_hit & (t_new < best_t)
        prim12 = jnp.round(row[:, _W12_PRIM : _W12_PRIM + W]).astype(jnp.int32)
        best_t = jnp.where(upd, t_new, best_t)
        best_tri = jnp.where(
            upd, jnp.sum(jnp.where(onehot, prim12, 0), axis=1), best_tri
        )
        best_b0 = jnp.where(upd, take(tb0), best_b0)
        best_b1 = jnp.where(upd, take(tb1), best_b1)
        return dict(
            cur_b=cur_b, cur_m=cur_m, stk_b=stk_b, stk_m=stk_m,
            best_t=best_t, best_tri=best_tri,
            best_b0=best_b0, best_b1=best_b1, o=o, d=d, inv_d=inv_d,
            shear=shear1,
        )

    # varying-typed carries (see bvh4_intersect_tris)
    inv_d = 1.0 / jnp.where(d == 0.0, 1e-20, d)
    vary_f = jnp.sum(o * 0.0, axis=-1)
    best_t = jnp.asarray(t_max, jnp.float32) + vary_f
    vary_i = vary_f.astype(jnp.int32)
    shear1 = tuple(s[:, None] for s in ray_shear(o, d))
    state = dict(
        cur_b=vary_i, cur_m=vary_i + 1,  # base 0, mask {bit0} -> row 0
        stk_b=jnp.zeros((R, K), jnp.int32) + vary_i[:, None],
        stk_m=jnp.zeros((R, K), jnp.int32) + vary_i[:, None],
        best_t=best_t, best_tri=vary_i - 1,
        best_b0=vary_f, best_b1=vary_f,
        o=o, d=d, inv_d=inv_d, shear=shear1,
    )
    state = _compacted_traversal(body, live_mask, state, R, compact_stages, unroll,
                                 compact_factor)
    best_tri = state["best_tri"]
    valid = best_tri >= 0
    return TriHit(valid, state["best_t"], best_tri, state["best_b0"], state["best_b1"])


def bvh_sweep_intersect_tris(
    o, d, t_max, stream16, any_hit: bool = False, block: int = 8192
):
    """Closest-hit (or any-hit) FRONTIER-SWEEP traversal — the TPU path.

    TPU economics (measured, tools/tpu_probe*.py): per-lane row gathers
    from an HBM node table inside a while_loop serialize at ~30-45M
    rows/s, capping any gather-based walk at well under 1M rays/s.  The
    sweep instead exploits the stream's DFS pre-order (links only point
    forward -> each lane's row id is monotonically increasing): rays are
    processed in blocks; each block walks a frontier of SWEEP_CHUNK-row
    windows loaded with a CONTIGUOUS dynamic_slice (full HBM bandwidth,
    no gather descriptors), and per-lane rows are selected from the
    window by a one-hot bf16x3 matmul on the MXU (exact for true f32
    values — links/ids are stored as plain floats; see ops/gathers.py).
    Lanes ahead of the frontier idle until the window reaches them; DFS
    monotonicity guarantees each window is visited at most once per
    block.  Mirrors reference bvh.rs:401-514 capability (stack machine)
    with a hardware-matched algorithm instead of a stack.
    """
    R = o.shape[0]
    done = stream16.shape[0]
    C = SWEEP_CHUNK

    pad = _round_up(max(R, 1), block) - R
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
        t_max = jnp.concatenate(
            [jnp.asarray(t_max, jnp.float32), jnp.full((pad,), -1.0, jnp.float32)]
        )
    n_blocks = (R + pad) // block

    def run_block(args):
        o, d, t_max = args
        inv_d = 1.0 / jnp.where(d == 0.0, 1e-20, d)
        cur = jnp.where(t_max > 0, 0, done).astype(jnp.int32)
        best_t = jnp.asarray(t_max, jnp.float32)
        best_tri = jnp.full((block,), -1, jnp.int32)
        best_b0 = jnp.zeros((block,), jnp.float32)
        best_b1 = jnp.zeros((block,), jnp.float32)
        col = jnp.arange(C, dtype=jnp.int32)

        def cond(state):
            cur = state[0]
            if any_hit:
                return jnp.any((cur < done) & (state[2] < 0))
            return jnp.any(cur < done)

        def body(state):
            cur, best_t, best_tri, best_b0, best_b1 = state
            active = cur < done
            if any_hit:
                active &= best_tri < 0
            posn = jnp.where(active, cur, done)
            base = (jnp.min(posn) // C) * C
            window = jax.lax.dynamic_slice(stream16, (base, 0), (C, 16))

            def in_cond(s):
                cur = s[0]
                act = cur < done
                if any_hit:
                    act &= s[2] < 0
                return jnp.any(act & (cur >= base) & (cur < base + C))

            def in_body(s):
                cur, best_t, best_tri, best_b0, best_b1 = s
                act = cur < done
                if any_hit:
                    act &= best_tri < 0
                in_w = act & (cur >= base) & (cur < base + C)
                idx = jnp.where(in_w, cur - base, 0)
                oh = (idx[:, None] == col[None, :]) & in_w[:, None]
                row = jnp.dot(
                    oh.astype(jnp.float32), window,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                nxt, best = _stream_step(
                    o, d, inv_d, row, in_w, (best_t, best_tri, best_b0, best_b1)
                )
                cur = jnp.where(in_w, nxt, cur)
                return (cur,) + best

            return jax.lax.while_loop(
                in_cond, in_body, (cur, best_t, best_tri, best_b0, best_b1)
            )

        state = (cur, best_t, best_tri, best_b0, best_b1)
        state = jax.lax.while_loop(cond, body, state)
        _, best_t, best_tri, best_b0, best_b1 = state
        return best_t, best_tri, best_b0, best_b1

    reshape = lambda a: a.reshape((n_blocks, block) + a.shape[1:])
    bt, btri, b0, b1 = jax.lax.map(
        run_block, (reshape(o), reshape(d), reshape(jnp.asarray(t_max, jnp.float32)))
    )
    flat = lambda a: a.reshape((n_blocks * block,) + a.shape[2:])[:R]
    best_t, best_tri, best_b0, best_b1 = flat(bt), flat(btri), flat(b0), flat(b1)
    valid = best_tri >= 0
    return TriHit(valid, best_t, best_tri, best_b0, best_b1)
