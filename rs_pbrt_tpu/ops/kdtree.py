"""SAH kd-tree accelerator — reference src/accelerators/kdtreeaccel.rs.

Parity accelerator (the LBVH is the default, api.rs:528).  The build is
host-side recursive numpy following the reference's SAH edge sweep
(kdtreeaccel.rs:253-499): per node, candidate splits are the sorted prim
bound edges per axis; cost = trav + isect*(1-bonus_if_empty)*(pA*nA+pB*nB)
relative area.  The traversal is the reference's KdToDo stack walk
(kdtreeaccel.rs:503-730) expressed as a per-lane (node, tmin, tmax) stack
inside ``lax.while_loop``.

Node SoA (flattened from the reference's packed 8-byte union):
  axis  (M,) i32: 0/1/2 interior split axis, 3 = leaf
  split (M,) f32: split position (interior)
  above (M,) i32: index of the above child (below child = node+1)
  start (M,) i32 / count (M,) i32: leaf range into prim_ids
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import vecmath as vm
from .intersect import TriHit, intersect_tri

STACK_DEPTH = 64  # reference kdtreeaccel.rs MAX_TO_DO = 64


class KdTree(NamedTuple):
    axis: jnp.ndarray  # (M,)
    split: jnp.ndarray  # (M,)
    above: jnp.ndarray  # (M,)
    start: jnp.ndarray  # (M,)
    count: jnp.ndarray  # (M,)
    prim_ids: jnp.ndarray  # (P,)
    bmin: jnp.ndarray  # (3,)
    bmax: jnp.ndarray  # (3,)
    # zero-size array whose SHAPE is the max leaf primitive count (static
    # under jit -> the traversal's per-leaf loop unrolls to it)
    leaf_cap: jnp.ndarray


def build_kdtree(
    bmin,
    bmax,
    isect_cost=80.0,
    trav_cost=1.0,
    empty_bonus=0.5,
    max_prims=1,
    max_depth=-1,
) -> KdTree:
    """Build from per-primitive AABBs (host numpy)."""
    bmin = np.asarray(bmin, np.float32)
    bmax = np.asarray(bmax, np.float32)
    n = bmin.shape[0]
    if max_depth <= 0:
        max_depth = int(round(8.0 + 1.3 * np.log2(max(n, 1))))
    world_lo = bmin.min(0)
    world_hi = bmax.max(0)

    axis_l, split_l, above_l, start_l, count_l = [], [], [], [], []
    prim_ids_out = []

    def add_leaf(prims):
        axis_l.append(3)
        split_l.append(0.0)
        above_l.append(0)
        start_l.append(len(prim_ids_out))
        count_l.append(len(prims))
        prim_ids_out.extend(prims.tolist())
        return len(axis_l) - 1

    def build(prims, lo, hi, depth, bad_refines):
        nprims = prims.shape[0]
        if nprims <= max_prims or depth == 0:
            return add_leaf(prims)
        # SAH sweep over the bound edges of each axis (kdtreeaccel.rs:286-400)
        d = hi - lo
        inv_total_sa = 1.0 / max(2.0 * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0]), 1e-20)
        old_cost = isect_cost * nprims
        best = None  # (cost, axis, edge position, below_mask)
        for axis in np.argsort(-d):  # try widest axis first
            e_lo = bmin[prims, axis]
            e_hi = bmax[prims, axis]
            # edge list: (pos, is_start)
            pos = np.concatenate([e_lo, e_hi])
            typ = np.concatenate([np.zeros(nprims, np.int8), np.ones(nprims, np.int8)])
            order = np.lexsort((typ, pos))  # starts before ends at equal pos
            pos_s = pos[order]
            typ_s = typ[order]
            n_below = np.cumsum(typ_s == 0)  # after processing edge i
            n_above = nprims - np.cumsum(typ_s == 1)
            # candidate = each edge strictly inside the node bound
            inside = (pos_s > lo[axis]) & (pos_s < hi[axis])
            if not inside.any():
                continue
            o0, o1, o2 = [(axis + k) % 3 for k in range(3)]
            below_sa = 2.0 * (
                d[o1] * d[o2] + (pos_s - lo[axis]) * (d[o1] + d[o2])
            )
            above_sa = 2.0 * (
                d[o1] * d[o2] + (hi[axis] - pos_s) * (d[o1] + d[o2])
            )
            p_below = below_sa * inv_total_sa
            p_above = above_sa * inv_total_sa
            # counts at an edge: below includes starts before it; ends at the
            # edge move prims out of above BEFORE evaluating (reference order)
            nb = np.concatenate([[0], n_below[:-1]])
            na = n_above
            eb = np.where((na == 0) | (nb == 0), empty_bonus, 0.0)
            cost = trav_cost + isect_cost * (1.0 - eb) * (p_below * nb + p_above * na)
            cost = np.where(inside, cost, np.inf)
            k = int(np.argmin(cost))
            if best is None or cost[k] < best[0]:
                best = (float(cost[k]), int(axis), float(pos_s[k]))
            if best is not None and best[0] < old_cost:
                break  # reference also stops once a good axis is found

        if best is None:
            return add_leaf(prims)
        cost, axis, split = best
        if cost > old_cost:
            bad_refines += 1
        if (cost > 4.0 * old_cost and nprims < 16) or bad_refines == 3:
            return add_leaf(prims)
        below = prims[bmin[prims, axis] < split]
        above = prims[bmax[prims, axis] > split]
        # degenerate split: everything on one side -> leaf
        if len(below) == nprims and len(above) == nprims:
            return add_leaf(prims)
        node_id = len(axis_l)
        axis_l.append(axis)
        split_l.append(split)
        above_l.append(-1)  # patched after below subtree is built
        start_l.append(0)
        count_l.append(0)
        lo_b = lo.copy()
        hi_b = hi.copy()
        hi_b[axis] = split
        build(below, lo_b, hi_b, depth - 1, bad_refines)
        above_l[node_id] = len(axis_l)
        lo_a = lo.copy()
        hi_a = hi.copy()
        lo_a[axis] = split
        build(above, lo_a, hi_a, depth - 1, bad_refines)
        return node_id

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(10000, old_limit))
    try:
        build(np.arange(n), world_lo.copy(), world_hi.copy(), max_depth, 0)
    finally:
        sys.setrecursionlimit(old_limit)

    max_leaf = max([c for a, c in zip(axis_l, count_l) if a == 3] + [1])
    return KdTree(
        jnp.asarray(np.asarray(axis_l, np.int32)),
        jnp.asarray(np.asarray(split_l, np.float32)),
        jnp.asarray(np.asarray(above_l, np.int32)),
        jnp.asarray(np.asarray(start_l, np.int32)),
        jnp.asarray(np.asarray(count_l, np.int32)),
        jnp.asarray(np.asarray(prim_ids_out if prim_ids_out else [0], np.int32)),
        jnp.asarray(world_lo),
        jnp.asarray(world_hi),
        jnp.zeros((max_leaf, 0), jnp.float32),
    )


def kdtree_intersect_tris(o, d, t_max, kt: KdTree, p0, p1, p2, any_hit: bool = False):
    """Closest-hit traversal (kdtreeaccel.rs:503-730) over triangle leaves.
    Leaves are visited one primitive per loop iteration (count is small:
    max_prims default 1)."""
    R = o.shape[0]
    inv_d = 1.0 / jnp.where(d == 0.0, 1e-20, d)

    # clip against the world bound (kdtreeaccel.rs:517)
    t_lo = (kt.bmin - o) * inv_d
    t_hi = (kt.bmax - o) * inv_d
    t_near = jnp.maximum(jnp.max(jnp.minimum(t_lo, t_hi), -1), 0.0)
    t_far = jnp.min(jnp.maximum(t_lo, t_hi), -1)
    entered = t_near <= t_far

    stack_node = jnp.zeros((R, STACK_DEPTH), jnp.int32)
    stack_tmin = jnp.zeros((R, STACK_DEPTH), jnp.float32)
    stack_tmax = jnp.zeros((R, STACK_DEPTH), jnp.float32)
    lanes = jnp.arange(R)
    sp = entered.astype(jnp.int32)
    stack_tmin = stack_tmin.at[:, 0].set(t_near)
    stack_tmax = stack_tmax.at[:, 0].set(jnp.minimum(t_far, t_max))

    best_t = jnp.asarray(t_max, jnp.float32)
    best_tri = jnp.full((R,), -1, jnp.int32)
    best_b0 = jnp.zeros((R,), jnp.float32)
    best_b1 = jnp.zeros((R,), jnp.float32)

    def cond(state):
        sp = state[3]
        if any_hit:
            return jnp.any((sp > 0) & (state[5] < 0))
        return jnp.any(sp > 0)

    def body(state):
        stack_node, stack_tmin, stack_tmax, sp, best_t, best_tri, best_b0, best_b1 = state
        active = sp > 0
        if any_hit:
            active &= best_tri < 0
        top = jnp.maximum(sp - 1, 0)
        node = stack_node[lanes, top]
        tmin = stack_tmin[lanes, top]
        tmax = stack_tmax[lanes, top]

        axis = kt.axis[node]
        is_leaf = axis == 3
        # early-out: node interval past the closest hit (kdtreeaccel.rs:540)
        dead = active & (tmin > best_t)
        pop_now = dead

        # ---- leaf: test all of its primitives (unrolled to the build-time
        # max leaf size carried in leaf_cap's shape) ----
        cnt = kt.count[node]
        start = kt.start[node]
        leaf_live = active & is_leaf & ~dead
        max_leaf = kt.leaf_cap.shape[0]
        P = kt.prim_ids.shape[0]
        for k in range(max_leaf):
            prim = kt.prim_ids[jnp.clip(start + k, 0, P - 1)]
            hit, t, b0, b1 = intersect_tri(o, d, best_t, p0[prim], p1[prim], p2[prim])
            upd = leaf_live & (k < cnt) & hit & (t < best_t)
            best_t = jnp.where(upd, t, best_t)
            best_tri = jnp.where(upd, prim, best_tri)
            best_b0 = jnp.where(upd, b0, best_b0)
            best_b1 = jnp.where(upd, b1, best_b1)
        pop_now = pop_now | (active & is_leaf)

        # ---- interior: compute near/far, push far, descend near ----
        interior = active & ~is_leaf & ~dead
        ax = jnp.clip(axis, 0, 2)
        o_ax = jnp.take_along_axis(o, ax[:, None], -1)[:, 0]
        d_ax = jnp.take_along_axis(d, ax[:, None], -1)[:, 0]
        inv_ax = jnp.take_along_axis(inv_d, ax[:, None], -1)[:, 0]
        split = kt.split[node]
        t_plane = (split - o_ax) * inv_ax
        below_first = (o_ax < split) | ((o_ax == split) & (d_ax <= 0))
        below_child = node + 1
        above_child = kt.above[node]
        first = jnp.where(below_first, below_child, above_child)
        second = jnp.where(below_first, above_child, below_child)
        # which children are actually traversed (kdtreeaccel.rs:600-640);
        # only_first takes PRIORITY when both conditions hold (t_plane<=0
        # also implies t_plane<tmin for tmin>=0 — the reference's if/else
        # ordering)
        only_first = (t_plane > tmax) | (t_plane <= 0)
        only_second = (t_plane < tmin) & ~only_first

        # write the current slot with the near child (descend in place)
        new_node = jnp.where(only_second, second, first)
        new_tmax = jnp.where(only_first | only_second, tmax, jnp.minimum(t_plane, tmax))
        new_tmin = jnp.where(only_second, jnp.maximum(t_plane, tmin), tmin)
        stack_node = stack_node.at[lanes, top].set(
            jnp.where(interior, new_node, stack_node[lanes, top])
        )
        stack_tmin = stack_tmin.at[lanes, top].set(
            jnp.where(interior, new_tmin, stack_tmin[lanes, top])
        )
        stack_tmax = stack_tmax.at[lanes, top].set(
            jnp.where(interior, new_tmax, stack_tmax[lanes, top])
        )
        # push the far child above it when both are traversed
        push_far = interior & ~only_first & ~only_second
        slot = jnp.minimum(sp, STACK_DEPTH - 1)
        stack_node = stack_node.at[lanes, slot].set(
            jnp.where(push_far, second, stack_node[lanes, slot])
        )
        stack_tmin = stack_tmin.at[lanes, slot].set(
            jnp.where(push_far, jnp.maximum(t_plane, tmin), stack_tmin[lanes, slot])
        )
        stack_tmax = stack_tmax.at[lanes, slot].set(
            jnp.where(push_far, tmax, stack_tmax[lanes, slot])
        )
        # far child goes UNDER the near one: swap top and slot so the near
        # child pops first
        swap = push_far
        nn = stack_node[lanes, top]
        nt0 = stack_tmin[lanes, top]
        nt1 = stack_tmax[lanes, top]
        fn_ = stack_node[lanes, slot]
        ft0 = stack_tmin[lanes, slot]
        ft1 = stack_tmax[lanes, slot]
        stack_node = stack_node.at[lanes, top].set(jnp.where(swap, fn_, nn))
        stack_tmin = stack_tmin.at[lanes, top].set(jnp.where(swap, ft0, nt0))
        stack_tmax = stack_tmax.at[lanes, top].set(jnp.where(swap, ft1, nt1))
        stack_node = stack_node.at[lanes, slot].set(jnp.where(swap, nn, fn_))
        stack_tmin = stack_tmin.at[lanes, slot].set(jnp.where(swap, nt0, ft0))
        stack_tmax = stack_tmax.at[lanes, slot].set(jnp.where(swap, nt1, ft1))
        sp = jnp.where(push_far, jnp.minimum(sp + 1, STACK_DEPTH), sp)

        sp = jnp.where(pop_now, sp - 1, sp)
        return stack_node, stack_tmin, stack_tmax, sp, best_t, best_tri, best_b0, best_b1

    state = (stack_node, stack_tmin, stack_tmax, sp, best_t, best_tri, best_b0, best_b1)
    state = jax.lax.while_loop(cond, body, state)
    best_t, best_tri, best_b0, best_b1 = state[4:]
    valid = best_tri >= 0
    return TriHit(valid, best_t, best_tri, best_b0, best_b1)
