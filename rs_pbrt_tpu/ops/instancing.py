"""Two-level BVH object instancing — reference src/core/primitive.rs
TransformedPrimitive (:198-265).

The reference wraps an inner BVH in a per-instance transform and resolves
it through pointer dispatch; the .pbrt flattening fallback duplicates
geometry per instance (O(I x T) memory).  Here instanced scenes keep ONE
copy of each prototype mesh plus:

- a top-level LBVH over instance world AABBs,
- per-instance object<->world transforms,
- per-prototype inner LBVHs over the shared triangle table.

Traversal is two-phase (TPU-friendly: no nested per-lane re-entry):
phase 1 walks the top-level tree collecting the K nearest candidate
instances per ray (by AABB entry distance, pruned by current best-t);
phase 2 iterates the K candidates, transforms the ray into object space,
and runs the inner traversal masked per lane.  K bounds the instance
OVERLAP along a ray (not the instance count); overlapping-instance piles
deeper than K fall back to the flattened path at build time.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import transform as tr
from . import bvh as bvhmod

K_CANDIDATES = 4


class InstanceAccel(NamedTuple):
    top: bvhmod.LBVH  # over instance AABBs (prim_ids -> instance index)
    inner: bvhmod.LBVH  # ONE inner tree over the shared prototype tris
    #   (prototypes are concatenated; inner leaves are global tri ids)
    inst_o2w: jnp.ndarray  # (I,4,4)
    inst_w2o: jnp.ndarray  # (I,4,4)
    inst_root: jnp.ndarray  # (I,) inner SUBTREE root node for the instance's
    #   prototype (node id into inner.child_*)
    inst_tri0: jnp.ndarray  # (I,) prototype's first global triangle id
    inst_mat: jnp.ndarray  # (I,) material id applied to the instance
    inst_light: jnp.ndarray  # (I,) area light id or -1 (usually -1)


def build_instance_accel(proto_ranges, proto_bounds, inst_proto, inst_o2w,
                         inst_mat, tri_bmin, tri_bmax):
    """Host build.

    proto_ranges: list of (tri0, tri1) per prototype into the shared tri table
    proto_bounds: (P, 2, 3) object-space AABB per prototype
    inst_proto:   (I,) prototype index per instance
    inst_o2w:     (I, 4, 4)
    tri_bmin/max: (T, 3) per-tri AABBs of the SHARED table (object space)
    """
    inst_proto = np.asarray(inst_proto, np.int64)
    inst_o2w = np.asarray(inst_o2w, np.float32)
    n_inst = inst_proto.shape[0]

    # one inner LBVH per prototype, concatenated into a single node array
    roots = []
    nodes = []
    node_off = 0
    for (t0, t1) in proto_ranges:
        sub = bvhmod.build_lbvh(tri_bmin[t0:t1], tri_bmax[t0:t1])
        # remap: internal child ids shift by node_off; leaves (~c) index
        # prim_ids which we rebase to global tri ids
        cl = np.asarray(sub.child_l, np.int64)
        cr = np.asarray(sub.child_r, np.int64)
        pid = np.asarray(sub.prim_ids, np.int64) + t0

        def remap(c):
            internal = c >= 0
            leaf_prim = pid[np.where(internal, 0, ~c)]
            return np.where(internal, c + node_off, ~leaf_prim)

        # leaves reference prim ids DIRECTLY after rebasing: store global
        # tri id in the leaf encoding itself (prim_ids becomes identity)
        nodes.append((remap(cl), remap(cr),
                      np.asarray(sub.bmin_l), np.asarray(sub.bmax_l),
                      np.asarray(sub.bmin_r), np.asarray(sub.bmax_r)))
        roots.append(node_off)
        node_off += cl.shape[0]

    child_l = np.concatenate([n[0] for n in nodes])
    child_r = np.concatenate([n[1] for n in nodes])
    bmin_l = np.concatenate([n[2] for n in nodes])
    bmax_l = np.concatenate([n[3] for n in nodes])
    bmin_r = np.concatenate([n[4] for n in nodes])
    bmax_r = np.concatenate([n[5] for n in nodes])
    n_tris_total = tri_bmin.shape[0]
    inner = bvhmod.LBVH(
        jnp.asarray(child_l, jnp.int32), jnp.asarray(child_r, jnp.int32),
        jnp.asarray(bmin_l), jnp.asarray(bmax_l),
        jnp.asarray(bmin_r), jnp.asarray(bmax_r),
        jnp.arange(n_tris_total, dtype=jnp.int32),  # identity remap
    )

    # top-level tree over transformed instance bounds
    pb = np.asarray(proto_bounds, np.float32)[inst_proto]  # (I,2,3)
    lo = pb[:, 0]
    hi = pb[:, 1]
    cs = np.stack([
        np.stack([np.where(m & 1, hi[:, 0], lo[:, 0]),
                  np.where(m & 2, hi[:, 1], lo[:, 1]),
                  np.where(m & 4, hi[:, 2], lo[:, 2])], -1)
        for m in range(8)
    ], 1)  # (I,8,3)
    R = inst_o2w[:, :3, :3]
    t = inst_o2w[:, :3, 3]
    wc = np.einsum("ikj,icj->ick", R, cs) + t[:, None, :]
    wmin = wc.min(1).astype(np.float32)
    wmax = wc.max(1).astype(np.float32)
    top = bvhmod.build_lbvh(wmin, wmax)

    inst_w2o = np.linalg.inv(inst_o2w.astype(np.float64)).astype(np.float32)
    tri0 = np.asarray([proto_ranges[p][0] for p in inst_proto], np.int32)
    return InstanceAccel(
        top, inner,
        jnp.asarray(inst_o2w), jnp.asarray(inst_w2o),
        jnp.asarray(np.asarray(roots, np.int32)[inst_proto]),
        jnp.asarray(tri0),
        jnp.asarray(np.asarray(inst_mat, np.int32)),
        jnp.full(n_inst, -1, jnp.int32),
    )


def _collect_candidates(o, d, t_max, top: bvhmod.LBVH, k: int):
    """Phase 1: K nearest instance-leaf hits per lane (by slab t_near)."""
    R = o.shape[0]
    inv_d = 1.0 / jnp.where(d == 0.0, 1e-20, d)
    stack = jnp.zeros((R, bvhmod.STACK_DEPTH), jnp.int32)
    sp = jnp.ones((R,), jnp.int32)
    lanes = jnp.arange(R)
    cand = jnp.full((R, k), -1, jnp.int32)
    cand_t = jnp.full((R, k), jnp.inf, jnp.float32)

    def insert(cand, cand_t, inst, tn, mask):
        # keep the k smallest-entry candidates (insertion by max-replace)
        worst = jnp.argmax(cand_t, axis=1)
        worst_t = jnp.take_along_axis(cand_t, worst[:, None], 1)[:, 0]
        do = mask & (tn < worst_t)
        cand = cand.at[lanes, worst].set(jnp.where(do, inst, cand[lanes, worst]))
        cand_t = cand_t.at[lanes, worst].set(jnp.where(do, tn, cand_t[lanes, worst]))
        return cand, cand_t

    def cond(state):
        return jnp.any(state[1] > 0)

    def body(state):
        stack, sp, cand, cand_t = state
        active = sp > 0
        node = stack[lanes, jnp.maximum(sp - 1, 0)]
        sp = jnp.where(active, sp - 1, sp)
        cl = top.child_l[node]
        cr = top.child_r[node]
        hit_l, tn_l = bvhmod._slab(o, inv_d, t_max, top.bmin_l[node], top.bmax_l[node])
        hit_r, tn_r = bvhmod._slab(o, inv_d, t_max, top.bmin_r[node], top.bmax_r[node])
        hit_l &= active
        hit_r &= active
        # leaf children -> candidate list
        inst_l = top.prim_ids[jnp.where(cl < 0, ~cl, 0)]
        inst_r = top.prim_ids[jnp.where(cr < 0, ~cr, 0)]
        cand, cand_t = insert(cand, cand_t, inst_l, jnp.maximum(tn_l, 0.0), hit_l & (cl < 0))
        cand, cand_t = insert(cand, cand_t, inst_r, jnp.maximum(tn_r, 0.0), hit_r & (cr < 0))
        # internal children: push
        for push, child in ((hit_l & (cl >= 0), cl), (hit_r & (cr >= 0), cr)):
            slot = jnp.minimum(sp, bvhmod.STACK_DEPTH - 1)
            stack = stack.at[lanes, slot].set(jnp.where(push, child, stack[lanes, slot]))
            sp = jnp.where(push, jnp.minimum(sp + 1, bvhmod.STACK_DEPTH), sp)
        return stack, sp, cand, cand_t

    state = jax.lax.while_loop(cond, body, (stack, sp, cand, cand_t))
    _, _, cand, cand_t = state
    # sort candidates by entry distance so near instances shrink t first
    order = jnp.argsort(cand_t, axis=1)
    return jnp.take_along_axis(cand, order, 1), jnp.take_along_axis(cand_t, order, 1)


def _inner_traverse(o, d, t_max, inner: bvhmod.LBVH, root, p0, p1, p2, active):
    """Masked inner traversal from per-lane subtree roots."""
    R = o.shape[0]
    inv_d = 1.0 / jnp.where(d == 0.0, 1e-20, d)
    stack = jnp.zeros((R, bvhmod.STACK_DEPTH), jnp.int32)
    stack = stack.at[:, 0].set(root)
    sp = active.astype(jnp.int32)
    lanes = jnp.arange(R)
    best_t = jnp.asarray(t_max, jnp.float32)
    best_tri = jnp.full((R,), -1, jnp.int32)
    best_b0 = jnp.zeros((R,), jnp.float32)
    best_b1 = jnp.zeros((R,), jnp.float32)

    from .intersect import intersect_tri

    def leaf_test(c, is_leaf_mask, best):
        best_t, best_tri, best_b0, best_b1 = best
        prim = jnp.where(is_leaf_mask, ~c, 0)
        hit, t, b0, b1 = intersect_tri(o, d, best_t, p0[prim], p1[prim], p2[prim])
        upd = hit & is_leaf_mask & (t < best_t)
        return (
            jnp.where(upd, t, best_t),
            jnp.where(upd, prim, best_tri),
            jnp.where(upd, b0, best_b0),
            jnp.where(upd, b1, best_b1),
        )

    def cond(state):
        return jnp.any(state[1] > 0)

    def body(state):
        stack, sp, best_t, best_tri, best_b0, best_b1 = state
        act = sp > 0
        node = stack[lanes, jnp.maximum(sp - 1, 0)]
        sp = jnp.where(act, sp - 1, sp)
        cl = inner.child_l[node]
        cr = inner.child_r[node]
        hit_l, tn_l = bvhmod._slab(o, inv_d, best_t, inner.bmin_l[node], inner.bmax_l[node])
        hit_r, tn_r = bvhmod._slab(o, inv_d, best_t, inner.bmin_r[node], inner.bmax_r[node])
        hit_l &= act
        hit_r &= act
        best = (best_t, best_tri, best_b0, best_b1)
        best = leaf_test(cl, hit_l & (cl < 0), best)
        best = leaf_test(cr, hit_r & (cr < 0), best)
        best_t, best_tri, best_b0, best_b1 = best
        near_is_l = tn_l <= tn_r
        first = jnp.where(near_is_l, cl, cr)
        second = jnp.where(near_is_l, cr, cl)
        push_first = jnp.where(near_is_l, hit_l, hit_r) & (first >= 0)
        push_second = jnp.where(near_is_l, hit_r, hit_l) & (second >= 0)
        cap = bvhmod.STACK_DEPTH - 1
        slot = jnp.minimum(sp, cap)
        stack = stack.at[lanes, slot].set(jnp.where(push_second, second, stack[lanes, slot]))
        sp = jnp.where(push_second, jnp.minimum(sp + 1, bvhmod.STACK_DEPTH), sp)
        slot = jnp.minimum(sp, cap)
        stack = stack.at[lanes, slot].set(jnp.where(push_first, first, stack[lanes, slot]))
        sp = jnp.where(push_first, jnp.minimum(sp + 1, bvhmod.STACK_DEPTH), sp)
        return stack, sp, best_t, best_tri, best_b0, best_b1

    state = (stack, sp, best_t, best_tri, best_b0, best_b1)
    state = jax.lax.while_loop(cond, body, state)
    return state[2], state[3], state[4], state[5]


class InstanceHit(NamedTuple):
    valid: jnp.ndarray
    t: jnp.ndarray  # world-space ray parameter
    tri: jnp.ndarray  # global triangle id within the shared table
    inst: jnp.ndarray  # instance id
    b0: jnp.ndarray
    b1: jnp.ndarray


def instance_intersect(o, d, t_max, acc: InstanceAccel, p0, p1, p2,
                       k: int = K_CANDIDATES) -> InstanceHit:
    """Two-phase closest hit through instanced geometry.  p0..p2: the
    SHARED prototype triangle table (object space)."""
    cand, _cand_t = _collect_candidates(o, d, t_max, acc.top, k)
    best_t = jnp.asarray(t_max, jnp.float32)
    best_tri = jnp.full(o.shape[0], -1, jnp.int32)
    best_inst = jnp.full(o.shape[0], -1, jnp.int32)
    best_b0 = jnp.zeros(o.shape[0], jnp.float32)
    best_b1 = jnp.zeros(o.shape[0], jnp.float32)
    for j in range(k):
        inst = cand[:, j]
        active = inst >= 0
        ii = jnp.maximum(inst, 0)
        w2o = acc.inst_w2o[ii]
        # object-space ray; direction NOT normalized so t matches world t
        oo = tr.xform_point(w2o, o)
        od = tr.xform_vector(w2o, d)
        root = acc.inst_root[ii]
        t, tri, b0, b1 = _inner_traverse(oo, od, best_t, acc.inner, root, p0, p1, p2, active)
        upd = active & (tri >= 0) & (t < best_t)
        best_t = jnp.where(upd, t, best_t)
        best_tri = jnp.where(upd, tri, best_tri)
        best_inst = jnp.where(upd, inst, best_inst)
        best_b0 = jnp.where(upd, b0, best_b0)
        best_b1 = jnp.where(upd, b1, best_b1)
    return InstanceHit(
        best_tri >= 0, best_t, best_tri, jnp.maximum(best_inst, 0), best_b0, best_b1
    )
