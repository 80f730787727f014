"""Cubic Bézier curve (hair) intersection — build-time flattening + SPMD test.

TPU-native replacement for reference src/shapes/curve.rs.  The reference
intersects each curve by per-ray recursive subdivision to an adaptive depth
chosen so the linear leaf approximation errs by < width/20
(curve.rs:449-466) — divergent control flow a TPU cannot vectorize.  Here
the subdivision happens ONCE at scene-build time: every curve is blossomed
down to that same adaptive depth (computed conservatively in object space,
where the depth formula's second differences are rotation-invariant up to
the L2/Linf gap — we use the L2 norm, which only deepens the split), so the
render-time test is the reference's LEAF test (curve.rs:215-343) evaluated
for every (ray, segment) pair in parallel: a pure branch-free vector
program.  Segments get their own AABBs and ride the same LBVH as triangles
(a second tree; see scene_intersect).

Curve types (curve.rs:21): 0 = flat, 1 = cylinder, 2 = ribbon.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import vecmath as vm

FLAT = 0
CYLINDER = 1
RIBBON = 2

# packed per-segment attribute row (gather target; see ops/gathers.py)
CV_CP = 0  # 0:12 four control points (world space)
CV_W0 = 12  # width at u0
CV_W1 = 13  # width at u1
CV_U0 = 14  # global curve parameter at segment start
CV_U1 = 15
CV_N0 = 16  # 16:19 ribbon normal at u0 (world)
CV_N1 = 19  # 19:22 ribbon normal at u1
CV_NORM_ANGLE = 22  # angle between n0,n1 (ribbon slerp)
CV_INV_SIN_NA = 23  # 1/sin(norm_angle) (0 when degenerate)
CV_TYPE = 24
CV_MAT = 25
N_CURVE_ATTR = 26


# ---------------------------------------------------------------------------
# host-side build: blossom curves to leaf segments (numpy)
# ---------------------------------------------------------------------------


def _blossom_np(cp, u0, u1, u2):
    """Bézier blossom (curve.rs:631): cp (...,4,3), scalars/arrays u."""
    a0 = cp[..., 0, :] + (cp[..., 1, :] - cp[..., 0, :]) * u0[..., None]
    a1 = cp[..., 1, :] + (cp[..., 2, :] - cp[..., 1, :]) * u0[..., None]
    a2 = cp[..., 2, :] + (cp[..., 3, :] - cp[..., 2, :]) * u0[..., None]
    b0 = a0 + (a1 - a0) * u1[..., None]
    b1 = a1 + (a2 - a1) * u1[..., None]
    return b0 + (b1 - b0) * u2[..., None]


def _segment_cps_np(cp, u0, u1):
    """Control points of the sub-curve over [u0,u1] via blossoming
    (curve.rs:346-356)."""
    return np.stack(
        [
            _blossom_np(cp, u0, u0, u0),
            _blossom_np(cp, u0, u0, u1),
            _blossom_np(cp, u0, u1, u1),
            _blossom_np(cp, u1, u1, u1),
        ],
        axis=-2,
    )


def adaptive_depth_np(cp, width0, width1):
    """Reference refinement-depth formula (curve.rs:449-466) evaluated
    conservatively at build time: L0 = max L2-norm second difference
    (>= the per-axis max in any rotated frame), eps = max width / 20;
    depth = clamp(log4(sqrt(2)*6*L0/(8 eps)), 0, 10)."""
    d2 = cp[..., 0:2, :] - 2.0 * cp[..., 1:3, :] + cp[..., 2:4, :]
    l0 = np.sqrt((d2**2).sum(-1)).max(-1)
    eps = np.maximum(np.maximum(width0, width1) * 0.05, 1e-12)
    x = np.maximum(1.41421356 * 6.0 * l0 / (8.0 * eps), 1e-12)
    r0 = (np.log2(x) / 2.0).astype(np.int32)
    return np.clip(r0, 0, 10)


def flatten_curves(
    cps, width0, width1, ctype, n0=None, n1=None, splitdepth=3, max_total_depth=10
):
    """Flatten N curves -> M leaf segments (host, numpy).

    cps: (N,4,3) object-to-world already applied.  width0/width1: (N,).
    ctype: (N,) int.  n0/n1: (N,3) ribbon normals or None.
    splitdepth: the reference's per-curve segment count exponent
    (curve.rs:119 n_segments = 1 << split_depth); the ADDITIONAL adaptive
    depth replaces its render-time recursion.

    Returns dict of segment arrays + per-segment AABBs.
    """
    cps = np.asarray(cps, np.float32).reshape(-1, 4, 3)
    n = cps.shape[0]
    width0 = np.broadcast_to(np.asarray(width0, np.float32), (n,))
    width1 = np.broadcast_to(np.asarray(width1, np.float32), (n,))
    ctype = np.broadcast_to(np.asarray(ctype, np.int32), (n,))
    if n0 is None:
        n0 = np.zeros((n, 3), np.float32)
        n1 = np.zeros((n, 3), np.float32)
    else:
        n0 = np.asarray(n0, np.float32).reshape(n, 3)
        n1 = np.asarray(n1, np.float32).reshape(n, 3)

    depth = np.minimum(adaptive_depth_np(cps, width0, width1) + splitdepth, max_total_depth)
    n_segs = (1 << depth).astype(np.int64)
    total = int(n_segs.sum())

    curve_of = np.repeat(np.arange(n), n_segs)
    seg_in_curve = np.arange(total) - np.repeat(np.cumsum(n_segs) - n_segs, n_segs)
    inv = 1.0 / n_segs[curve_of].astype(np.float32)
    u0 = seg_in_curve.astype(np.float32) * inv
    u1 = (seg_in_curve + 1).astype(np.float32) * inv

    cp_par = cps[curve_of]
    seg_cp = _segment_cps_np(cp_par, u0, u1).astype(np.float32)  # (M,4,3)
    w_par0 = width0[curve_of]
    w_par1 = width1[curve_of]
    w0 = w_par0 + (w_par1 - w_par0) * u0
    w1 = w_par0 + (w_par1 - w_par0) * u1

    # ribbon normals at segment endpoints via the parent's sin-slerp
    # (curve.rs:256-263)
    pn0 = n0[curve_of]
    pn1 = n1[curve_of]
    dotn = np.clip((pn0 * pn1).sum(-1), 0.0, 1.0)
    ang = np.arccos(dotn)
    inv_sin = np.where(ang > 1e-6, 1.0 / np.maximum(np.sin(ang), 1e-12), 0.0)

    def slerp_n(u):
        s0 = np.where(ang > 1e-6, np.sin((1.0 - u) * ang) * inv_sin, 1.0 - u)
        s1 = np.where(ang > 1e-6, np.sin(u * ang) * inv_sin, u)
        v = s0[:, None] * pn0 + s1[:, None] * pn1
        ln = np.sqrt((v**2).sum(-1, keepdims=True))
        return v / np.maximum(ln, 1e-12)

    sn0 = slerp_n(u0).astype(np.float32)
    sn1 = slerp_n(u1).astype(np.float32)
    sdot = np.clip((sn0 * sn1).sum(-1), 0.0, 1.0)
    sang = np.arccos(sdot).astype(np.float32)
    sinv = np.where(sang > 1e-6, 1.0 / np.maximum(np.sin(sang), 1e-12), 0.0).astype(np.float32)

    half_w = (np.maximum(w0, w1) * 0.5)[:, None].astype(np.float32)
    bmin = seg_cp.min(axis=1) - half_w
    bmax = seg_cp.max(axis=1) + half_w

    return dict(
        crv_cp=seg_cp,  # (M,4,3)
        crv_w0=w0.astype(np.float32),
        crv_w1=w1.astype(np.float32),
        crv_u0=u0.astype(np.float32),
        crv_u1=u1.astype(np.float32),
        crv_n0=sn0,
        crv_n1=sn1,
        crv_norm_angle=sang,
        crv_inv_sin_na=sinv,
        crv_type=ctype[curve_of].astype(np.int32),
        crv_curve_id=curve_of.astype(np.int32),
        bmin=bmin.astype(np.float32),
        bmax=bmax.astype(np.float32),
    )


def pack_curve_attr(arrs, mat_ids):
    """Pack the flattened segment dict + per-segment material ids into the
    (M, N_CURVE_ATTR) f32 gather row."""
    m = arrs["crv_cp"].shape[0]
    at = np.zeros((m, N_CURVE_ATTR), np.float32)
    at[:, CV_CP : CV_CP + 12] = arrs["crv_cp"].reshape(m, 12)
    at[:, CV_W0] = arrs["crv_w0"]
    at[:, CV_W1] = arrs["crv_w1"]
    at[:, CV_U0] = arrs["crv_u0"]
    at[:, CV_U1] = arrs["crv_u1"]
    at[:, CV_N0 : CV_N0 + 3] = arrs["crv_n0"]
    at[:, CV_N1 : CV_N1 + 3] = arrs["crv_n1"]
    at[:, CV_NORM_ANGLE] = arrs["crv_norm_angle"]
    at[:, CV_INV_SIN_NA] = arrs["crv_inv_sin_na"]
    at[:, CV_TYPE] = arrs["crv_type"]
    at[:, CV_MAT] = np.asarray(mat_ids, np.float32)
    return at


# ---------------------------------------------------------------------------
# device-side leaf test (jnp; vectorized over trailing batch dims)
# ---------------------------------------------------------------------------


def eval_bezier(cp, u):
    """de Casteljau point + derivative (curve.rs:651).  cp: (...,4,3)."""
    u = u[..., None]
    a0 = vm.lerp(u, cp[..., 0, :], cp[..., 1, :])
    a1 = vm.lerp(u, cp[..., 1, :], cp[..., 2, :])
    a2 = vm.lerp(u, cp[..., 2, :], cp[..., 3, :])
    b0 = vm.lerp(u, a0, a1)
    b1 = vm.lerp(u, a1, a2)
    p = vm.lerp(u, b0, b1)
    deriv = 3.0 * (b1 - b0)
    # degenerate-deriv fallback (curve.rs eval_bezier: use cp3-cp0)
    small = vm.length_squared(deriv) < 1e-14
    deriv = jnp.where(small[..., None], cp[..., 3, :] - cp[..., 0, :], deriv)
    return p, deriv


class CurveSegHit(NamedTuple):
    hit: jnp.ndarray  # bool
    t: jnp.ndarray  # ray parameter
    u: jnp.ndarray  # global curve u
    v: jnp.ndarray  # cross-width coordinate
    w: jnp.ndarray  # clamped local parameter (for detail recompute)


def _ray_frame(o, d, cp0, cp3):
    """Per-(ray,segment) orthonormal ray frame oriented so the curve runs
    along +x (curve.rs:385-415)."""
    ez = vm.normalize(d)
    up = vm.cross(d, cp3 - cp0)
    degen = vm.length_squared(up) < 1e-18
    up_fb, _ = vm.coordinate_system(ez)
    up = jnp.where(degen[..., None], up_fb, up)
    ex = vm.normalize(vm.cross(up, ez))
    ey = vm.cross(ez, ex)
    return ex, ey, ez


def _to_frame(p, o, ex, ey, ez):
    q = p - o
    return jnp.stack([vm.dot(q, ex), vm.dot(q, ey), vm.dot(q, ez)], axis=-1)


def curve_seg_test(o, d, t_max, cp, w0, w1, u0, u1, n0, n1, norm_angle, inv_sin_na, ctype):
    """The reference's leaf intersection test (curve.rs:215-343), branch-free.

    o,d: (...,3) rays; cp: (...,4,3) world-space segment control points;
    all other args broadcast over the batch.  Returns CurveSegHit.
    """
    ex, ey, ez = _ray_frame(o, d, cp[..., 0, :], cp[..., 3, :])
    q = _to_frame(cp, o[..., None, :], ex[..., None, :], ey[..., None, :], ez[..., None, :])
    ray_length = vm.length(d)
    z_max = ray_length * t_max
    max_width = jnp.maximum(w0, w1)

    # conservative xyz slab rejects (curve.rs:425-447)
    hi = q.max(axis=-2)
    lo = q.min(axis=-2)
    ok = ~(
        (hi[..., 1] + 0.5 * max_width < 0.0)
        | (lo[..., 1] - 0.5 * max_width > 0.0)
        | (hi[..., 0] + 0.5 * max_width < 0.0)
        | (lo[..., 0] - 0.5 * max_width > 0.0)
        | (hi[..., 2] + 0.5 * max_width < 0.0)
        | (lo[..., 2] - 0.5 * max_width > z_max)
    )

    # endpoint tangent edge functions (curve.rs:221-230)
    q0, q1, q2, q3 = q[..., 0, :], q[..., 1, :], q[..., 2, :], q[..., 3, :]
    edge0 = (q1[..., 1] - q0[..., 1]) * (-q0[..., 1]) + q0[..., 0] * (q0[..., 0] - q1[..., 0])
    edge1 = (q2[..., 1] - q3[..., 1]) * (-q3[..., 1]) + q3[..., 0] * (q3[..., 0] - q2[..., 0])
    ok &= (edge0 >= 0.0) & (edge1 >= 0.0)

    # closest approach along the chord (curve.rs:232-253)
    seg_dir = q3[..., 0:2] - q0[..., 0:2]
    denom = jnp.sum(seg_dir * seg_dir, axis=-1)
    ok &= denom > 0.0
    w = jnp.sum(-q0[..., 0:2] * seg_dir, axis=-1) / jnp.maximum(denom, 1e-20)
    u = jnp.clip(vm.lerp(w, u0, u1), u0, u1)

    # width at u (linear along the parent curve, so segment-local lerp)
    span = jnp.where(u1 == u0, 1.0, u1 - u0)
    lw = (u - u0) / span
    hit_width = vm.lerp(lw, w0, w1)

    # ribbon orientation scaling (curve.rs:256-264)
    is_ribbon = ctype == RIBBON
    sin0 = jnp.sin((1.0 - lw) * norm_angle) * inv_sin_na
    sin1 = jnp.sin(lw * norm_angle) * inv_sin_na
    straight = norm_angle < 1e-6
    s0 = jnp.where(straight, 1.0 - lw, sin0)
    s1 = jnp.where(straight, lw, sin1)
    n_hit = s0[..., None] * n0 + s1[..., None] * n1
    ribbon_scale = jnp.abs(vm.dot(n_hit, d)) / jnp.maximum(ray_length, 1e-20)
    hit_width = jnp.where(is_ribbon, hit_width * ribbon_scale, hit_width)

    # curve point at w & width/z tests (curve.rs:266-277)
    wc = jnp.clip(w, 0.0, 1.0)
    pc, dpcdw = eval_bezier(q, wc)
    dist2 = pc[..., 0] ** 2 + pc[..., 1] ** 2
    ok &= dist2 <= hit_width * hit_width * 0.25
    ok &= (pc[..., 2] >= 0.0) & (pc[..., 2] <= z_max)

    # v coordinate from the side of the tangent (curve.rs:279-286)
    dist = jnp.sqrt(jnp.maximum(dist2, 0.0))
    edge_func = dpcdw[..., 0] * (-pc[..., 1]) + pc[..., 0] * dpcdw[..., 1]
    ratio = dist / jnp.maximum(hit_width, 1e-20)
    v = jnp.where(edge_func > 0.0, 0.5 + ratio, 0.5 - ratio)

    t = pc[..., 2] / jnp.maximum(ray_length, 1e-20)
    ok &= t > 1e-7
    return CurveSegHit(ok, jnp.where(ok, t, jnp.inf), u, v, wc)


def curve_seg_detail(o, d, cp, w0, w1, u0, u1, n0, n1, norm_angle, inv_sin_na, ctype, w, v):
    """Shading geometry for a found hit (curve.rs:288-336): world-space
    p, p_error, dpdu, shading/geometric normal."""
    ex, ey, ez = _ray_frame(o, d, cp[..., 0, :], cp[..., 3, :])
    p_world, dpdu = eval_bezier(cp, w)  # world-space point + fiber tangent

    span = jnp.where(u1 == u0, 1.0, u1 - u0)
    u = vm.lerp(w, u0, u1)
    lw = (u - u0) / span
    hit_width = vm.lerp(lw, w0, w1)

    straight = norm_angle < 1e-6
    s0 = jnp.where(straight, 1.0 - lw, jnp.sin((1.0 - lw) * norm_angle) * inv_sin_na)
    s1 = jnp.where(straight, lw, jnp.sin(lw * norm_angle) * inv_sin_na)
    n_hit = s0[..., None] * n0 + s1[..., None] * n1

    # ribbon dpdv (curve.rs:303-305)
    dpdv_ribbon = vm.normalize(vm.cross(n_hit, dpdu)) * hit_width[..., None]

    # flat / cylinder dpdv in the ray plane (curve.rs:306-322)
    dpdu_plane = jnp.stack(
        [vm.dot(dpdu, ex), vm.dot(dpdu, ey), vm.dot(dpdu, ez)], axis=-1
    )
    dpdv_plane = vm.normalize(
        jnp.stack(
            [-dpdu_plane[..., 1], dpdu_plane[..., 0], jnp.zeros_like(dpdu_plane[..., 0])],
            axis=-1,
        )
    ) * hit_width[..., None]
    # cylinder: rotate dpdv_plane by -theta about dpdu_plane (Rodrigues)
    theta = vm.lerp(v, -90.0, 90.0) * (jnp.pi / 180.0)
    axis = vm.normalize(dpdu_plane)
    ct = jnp.cos(-theta)[..., None]
    st = jnp.sin(-theta)[..., None]
    rotated = (
        dpdv_plane * ct
        + vm.cross(axis, dpdv_plane) * st
        + axis * vm.dot(axis, dpdv_plane)[..., None] * (1.0 - ct)
    )
    dpdv_plane = jnp.where((ctype == CYLINDER)[..., None], rotated, dpdv_plane)
    dpdv_flat = (
        dpdv_plane[..., 0:1] * ex + dpdv_plane[..., 1:2] * ey + dpdv_plane[..., 2:3] * ez
    )
    dpdv = jnp.where((ctype == RIBBON)[..., None], dpdv_ribbon, dpdv_flat)
    ns = vm.normalize(vm.cross(dpdu, dpdv))
    p_err = jnp.broadcast_to((2.0 * hit_width)[..., None], p_world.shape)
    return p_world, p_err, dpdu, ns


def _gather_seg(attr_rows):
    """Split a gathered (N, N_CURVE_ATTR) row into the leaf-test args."""
    at = attr_rows
    cp = at[..., CV_CP : CV_CP + 12].reshape(at.shape[:-1] + (4, 3))
    return dict(
        cp=cp,
        w0=at[..., CV_W0],
        w1=at[..., CV_W1],
        u0=at[..., CV_U0],
        u1=at[..., CV_U1],
        n0=at[..., CV_N0 : CV_N0 + 3],
        n1=at[..., CV_N1 : CV_N1 + 3],
        norm_angle=at[..., CV_NORM_ANGLE],
        inv_sin_na=at[..., CV_INV_SIN_NA],
        ctype=at[..., CV_TYPE].astype(jnp.int32),
    )


class CurveHit(NamedTuple):
    valid: jnp.ndarray  # (N,) bool
    t: jnp.ndarray  # (N,)
    seg: jnp.ndarray  # (N,) int32 best segment id
    w: jnp.ndarray  # (N,) local parameter of the hit
    u: jnp.ndarray  # (N,)
    v: jnp.ndarray  # (N,)


def intersect_curves_brute(o, d, t_max, crv_attr):
    """All-pairs (ray, segment) sweep; fine for modest segment counts."""
    s = _gather_seg(crv_attr[None, :, :])  # (1,C,·) broadcast over rays
    h = curve_seg_test(
        o[:, None, :], d[:, None, :], t_max[:, None],
        s["cp"], s["w0"], s["w1"], s["u0"], s["u1"],
        s["n0"], s["n1"], s["norm_angle"], s["inv_sin_na"], s["ctype"],
    )
    best = jnp.argmin(h.t, axis=1)
    take = lambda a: jnp.take_along_axis(a, best[:, None], axis=1)[:, 0]
    bt = take(h.t)
    valid = jnp.isfinite(bt)
    return CurveHit(
        valid,
        jnp.where(valid, bt, t_max),
        best.astype(jnp.int32),
        take(h.w),
        take(h.u),
        take(h.v),
    )


def bvh_intersect_curves(o, d, t_max, bvh, crv_attr, any_hit: bool = False):
    """LBVH traversal with the curve leaf test (same skeleton as
    bvh.bvh_intersect_tris; leaves index crv_attr rows)."""
    from . import bvh as bvhmod

    R = o.shape[0]
    inv_d = 1.0 / jnp.where(d == 0.0, 1e-20, d)
    stack = jnp.zeros((R, bvhmod.STACK_DEPTH), jnp.int32)
    sp = jnp.ones((R,), jnp.int32)
    best_t = jnp.asarray(t_max, jnp.float32)
    best_seg = jnp.full((R,), -1, jnp.int32)
    best_w = jnp.zeros((R,), jnp.float32)
    best_u = jnp.zeros((R,), jnp.float32)
    best_v = jnp.zeros((R,), jnp.float32)
    lanes = jnp.arange(R)

    def leaf_test(c, is_leaf_mask, best):
        best_t, best_seg, best_w, best_u, best_v = best
        leaf = jnp.where(is_leaf_mask, ~c, 0)
        prim = bvh.prim_ids[leaf]
        s = _gather_seg(crv_attr[prim])
        h = curve_seg_test(
            o, d, best_t,
            s["cp"], s["w0"], s["w1"], s["u0"], s["u1"],
            s["n0"], s["n1"], s["norm_angle"], s["inv_sin_na"], s["ctype"],
        )
        upd = h.hit & is_leaf_mask & (h.t < best_t)
        return (
            jnp.where(upd, h.t, best_t),
            jnp.where(upd, prim, best_seg),
            jnp.where(upd, h.w, best_w),
            jnp.where(upd, h.u, best_u),
            jnp.where(upd, h.v, best_v),
        )

    def cond(state):
        sp = state[1]
        if any_hit:
            return jnp.any((sp > 0) & (state[3] < 0))
        return jnp.any(sp > 0)

    def body(state):
        stack, sp, best_t, best_seg, best_w, best_u, best_v = state
        active = sp > 0
        if any_hit:
            active &= best_seg < 0
        node = stack[lanes, jnp.maximum(sp - 1, 0)]
        sp = jnp.where(active, sp - 1, sp)
        cl = bvh.child_l[node]
        cr = bvh.child_r[node]
        hit_l, tn_l = bvhmod._slab(o, inv_d, best_t, bvh.bmin_l[node], bvh.bmax_l[node])
        hit_r, tn_r = bvhmod._slab(o, inv_d, best_t, bvh.bmin_r[node], bvh.bmax_r[node])
        hit_l &= active
        hit_r &= active

        best = (best_t, best_seg, best_w, best_u, best_v)
        best = leaf_test(cl, hit_l & (cl < 0), best)
        best = leaf_test(cr, hit_r & (cr < 0), best)
        best_t, best_seg, best_w, best_u, best_v = best

        push_l = hit_l & (cl >= 0)
        push_r = hit_r & (cr >= 0)
        near_is_l = tn_l <= tn_r
        first = jnp.where(near_is_l, cl, cr)
        second = jnp.where(near_is_l, cr, cl)
        push_first = jnp.where(near_is_l, push_l, push_r)
        push_second = jnp.where(near_is_l, push_r, push_l)
        cap = bvhmod.STACK_DEPTH - 1
        stack = stack.at[lanes, jnp.minimum(sp, cap)].set(
            jnp.where(push_second, second, stack[lanes, jnp.minimum(sp, cap)])
        )
        sp = jnp.where(push_second, jnp.minimum(sp + 1, bvhmod.STACK_DEPTH), sp)
        stack = stack.at[lanes, jnp.minimum(sp, cap)].set(
            jnp.where(push_first, first, stack[lanes, jnp.minimum(sp, cap)])
        )
        sp = jnp.where(push_first, jnp.minimum(sp + 1, bvhmod.STACK_DEPTH), sp)
        return stack, sp, best_t, best_seg, best_w, best_u, best_v

    state = (stack, sp, best_t, best_seg, best_w, best_u, best_v)
    state = jax.lax.while_loop(cond, body, state)
    _, _, best_t, best_seg, best_w, best_u, best_v = state
    valid = best_seg >= 0
    return CurveHit(valid, best_t, jnp.maximum(best_seg, 0), best_w, best_u, best_v)


def curve_interaction(o, d, crv_attr, hit: CurveHit):
    """Full shading record for the winning segment of each lane."""
    from . import gathers as gx

    at = gx.take_rows(crv_attr, hit.seg)
    s = _gather_seg(at)
    p, p_err, dpdu, ns = curve_seg_detail(
        o, d, s["cp"], s["w0"], s["w1"], s["u0"], s["u1"],
        s["n0"], s["n1"], s["norm_angle"], s["inv_sin_na"], s["ctype"],
        hit.w, hit.v,
    )
    uv = jnp.stack([hit.u, hit.v], axis=-1)
    mat = at[..., CV_MAT].astype(jnp.int32)
    return p, p_err, dpdu, ns, uv, mat
