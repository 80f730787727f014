"""Batched ray-primitive intersection kernels.

TPU-native replacement for reference src/shapes/{triangle,sphere,cylinder,
disk}.rs intersection routines.  Everything is elementwise math over
(ray, primitive) pairs, laid out for the VPU; the watertight triangle test
follows the permute+shear formulation of reference triangle.rs:134-449
(including the conservative error-bound t test), vectorized over lanes.

Conventions:
  rays: o (R,3), d (R,3), t_max (R,)
  triangle SoA: p0/p1/p2 (T,3)
  hit record: t, b0/b1 (barycentrics), prim index, valid mask
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import vecmath as vm

BIG_T = np.float32(1e30)


class TriHit(NamedTuple):
    valid: jnp.ndarray  # (R,) bool
    t: jnp.ndarray  # (R,)
    tri: jnp.ndarray  # (R,) int32 triangle index (or -1)
    b0: jnp.ndarray  # (R,) barycentric wrt p0
    b1: jnp.ndarray  # (R,)


def _max_dim(v):
    return jnp.argmax(jnp.abs(v), axis=-1)


def _comp(v, k):
    """Select component k (0/1/2) of (...,3) arrays WITHOUT gathers — 3-way
    select keeps the whole intersection test fusible by XLA (gathers break
    fusion and make the dense sweep HBM-bound)."""
    return jnp.where(k == 0, v[..., 0], jnp.where(k == 1, v[..., 1], v[..., 2]))


def ray_shear(o, d):
    """Per-ray permutation + shear constants (reference triangle.rs:154-192).

    Returns (kx, ky, kz, sx, sy, sz) with k* int32 (R,)."""
    kz = _max_dim(d)
    kx = jnp.where(kz + 1 == 3, 0, kz + 1)
    ky = jnp.where(kx + 1 == 3, 0, kx + 1)
    dz = _comp(d, kz)
    dx = _comp(d, kx)
    dy = _comp(d, ky)
    inv_dz = 1.0 / dz
    return kx, ky, kz, -dx * inv_dz, -dy * inv_dz, inv_dz


def intersect_tri(o, d, t_max, p0, p1, p2, shear=None):
    """Watertight ray-triangle test for broadcast-compatible batches.

    o,d: (..., 3); p0..p2: (..., 3) (broadcast, typically (R,1,3) vs (T,3)).
    Returns (hit mask, t, b0, b1) with the conservative error-bound t test
    from reference triangle.rs:376-449.
    shear: optional precomputed ray_shear(o, d) — hoist it when calling
    from inside a traversal loop (it is constant per ray)."""
    kx, ky, kz, sx, sy, sz = ray_shear(o, d) if shear is None else shear

    def _permuted(p):
        pt = p - o
        return _comp(pt, kx), _comp(pt, ky), _comp(pt, kz)

    x0, y0, z0 = _permuted(p0)
    x1, y1, z1 = _permuted(p1)
    x2, y2, z2 = _permuted(p2)
    # shear x/y only; z sheared after the edge tests
    x0 = x0 + sx * z0
    y0 = y0 + sy * z0
    x1 = x1 + sx * z1
    y1 = y1 + sy * z1
    x2 = x2 + sx * z2
    y2 = y2 + sy * z2

    e0 = x1 * y2 - y1 * x2
    e1 = x2 * y0 - y2 * x0
    e2 = x0 * y1 - y0 * x1
    # (reference recomputes in f64 when any edge fn is 0; on TPU we accept the
    # f32 result — edge-on rays are caught by the e==0 || det==0 rejects)
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
    b2 = e2 * inv_det
    t = t_scaled * inv_det

    # conservative error bound on t (reference triangle.rs:421-449)
    max_zt = jnp.maximum(jnp.maximum(jnp.abs(z0s), jnp.abs(z1s)), jnp.abs(z2s))
    delta_z = vm.gamma(3.0) * max_zt
    max_xt = jnp.maximum(jnp.maximum(jnp.abs(x0), jnp.abs(x1)), jnp.abs(x2))
    max_yt = jnp.maximum(jnp.maximum(jnp.abs(y0), jnp.abs(y1)), jnp.abs(y2))
    delta_x = vm.gamma(5.0) * (max_xt + max_zt)
    delta_y = vm.gamma(5.0) * (max_yt + max_zt)
    delta_e = 2.0 * (vm.gamma(2.0) * max_xt * max_yt + delta_y * max_xt + delta_x * max_yt)
    max_e = jnp.maximum(jnp.maximum(jnp.abs(e0), jnp.abs(e1)), jnp.abs(e2))
    delta_t = (
        3.0
        * (vm.gamma(3.0) * max_e * max_zt + delta_e * max_zt + delta_z * max_e)
        * jnp.abs(inv_det)
    )
    miss_eps = t <= delta_t

    hit = ~(miss_sign | miss_det | miss_range | miss_eps)
    return hit, t, b0, b1


def intersect_tris_brute(o, d, t_max, p0, p1, p2, tile: int = 0):
    """Closest-hit over all T triangles by brute force.

    o,d: (R,3); p0..p2: (T,3).  For T up to a few thousand this dense
    (R,T) sweep is the fastest possible TPU path (pure VPU, no divergence)
    — it replaces BVH traversal for small scenes.
    """
    R = o.shape[0]
    T = p0.shape[0]
    hit, t, b0, b1 = intersect_tri(
        o[:, None, :], d[:, None, :], t_max[:, None], p0[None], p1[None], p2[None]
    )
    t_valid = jnp.where(hit, t, BIG_T)
    best = jnp.argmin(t_valid, axis=1)
    best_t = jnp.take_along_axis(t_valid, best[:, None], axis=1)[:, 0]
    valid = best_t < BIG_T
    take = lambda a: jnp.take_along_axis(a, best[:, None], axis=1)[:, 0]
    return TriHit(
        valid,
        jnp.where(valid, best_t, t_max),
        jnp.where(valid, best.astype(jnp.int32), -1),
        take(b0),
        take(b1),
    )


def intersect_tris_brute_p(o, d, t_max, p0, p1, p2):
    """Any-hit (shadow ray) over all triangles."""
    hit, _, _, _ = intersect_tri(
        o[:, None, :], d[:, None, :], t_max[:, None], p0[None], p1[None], p2[None]
    )
    return jnp.any(hit, axis=1)


# ---- quadrics ----


class QuadricHit(NamedTuple):
    valid: jnp.ndarray
    t: jnp.ndarray
    p_obj: jnp.ndarray  # (…,3) object-space hit point (reprojected)
    phi: jnp.ndarray


def _sphere_quadratic(o, d, radius):
    a = vm.dot(d, d)
    b = 2.0 * vm.dot(o, d)
    c = vm.dot(o, o) - radius * radius
    return vm.quadratic(a, b, c)


def intersect_sphere(o, d, t_max, radius, z_min, z_max, phi_max):
    """Object-space partial-sphere intersection (reference sphere.rs).

    o,d: (...,3) object-space ray; scalars broadcastable.
    Returns nearest valid QuadricHit honoring z/phi clipping.
    """

    def shape_test(p):
        phi = jnp.arctan2(p[..., 1], p[..., 0])
        phi = jnp.where(phi < 0.0, phi + 2.0 * vm.PI, phi)
        ok = (
            (p[..., 2] >= z_min)
            & (p[..., 2] <= z_max)
            & (phi <= phi_max)
        )
        return ok, phi

    has, t0, t1 = _sphere_quadratic(o, d, radius)

    def reproject(t):
        p = o + t[..., None] * d
        # reproject onto the sphere to cut accumulated FP error
        # (reference sphere.rs p_hit *= radius / distance)
        scale = radius / jnp.maximum(vm.length(p), 1e-20)
        p = p * scale[..., None]
        # avoid phi singularity at poles (reference: tweak x if x==y==0)
        px = jnp.where((p[..., 0] == 0.0) & (p[..., 1] == 0.0), 1e-5 * radius, p[..., 0])
        return jnp.stack([px, p[..., 1], p[..., 2]], axis=-1)

    p0h = reproject(t0)
    ok0, phi0 = shape_test(p0h)
    ok0 &= has & (t0 > 0.0) & (t0 < t_max)
    p1h = reproject(t1)
    ok1, phi1 = shape_test(p1h)
    ok1 &= has & (t1 > 0.0) & (t1 < t_max)

    use0 = ok0
    valid = ok0 | ok1
    t = jnp.where(use0, t0, t1)
    p = jnp.where(use0[..., None], p0h, p1h)
    phi = jnp.where(use0, phi0, phi1)
    return QuadricHit(valid, jnp.where(valid, t, t_max), p, phi)


def intersect_cylinder(o, d, t_max, radius, z_min, z_max, phi_max):
    """reference cylinder.rs: quadratic in x,y only."""
    a = d[..., 0] ** 2 + d[..., 1] ** 2
    b = 2.0 * (d[..., 0] * o[..., 0] + d[..., 1] * o[..., 1])
    c = o[..., 0] ** 2 + o[..., 1] ** 2 - radius * radius
    has, t0, t1 = vm.quadratic(a, b, c)

    def at(t):
        p = o + t[..., None] * d
        hit_rad = jnp.sqrt(jnp.maximum(p[..., 0] ** 2 + p[..., 1] ** 2, 1e-20))
        scale = radius / hit_rad
        p = jnp.stack([p[..., 0] * scale, p[..., 1] * scale, p[..., 2]], axis=-1)
        phi = jnp.arctan2(p[..., 1], p[..., 0])
        phi = jnp.where(phi < 0.0, phi + 2.0 * vm.PI, phi)
        ok = (p[..., 2] >= z_min) & (p[..., 2] <= z_max) & (phi <= phi_max)
        return p, phi, ok

    p0h, phi0, ok0 = at(t0)
    ok0 &= has & (t0 > 0.0) & (t0 < t_max)
    p1h, phi1, ok1 = at(t1)
    ok1 &= has & (t1 > 0.0) & (t1 < t_max)
    valid = ok0 | ok1
    t = jnp.where(ok0, t0, t1)
    p = jnp.where(ok0[..., None], p0h, p1h)
    phi = jnp.where(ok0, phi0, phi1)
    return QuadricHit(valid, jnp.where(valid, t, t_max), p, phi)


def intersect_disk(o, d, t_max, height, radius, inner_radius, phi_max):
    """reference disk.rs: plane z=height, annulus + phi clip."""
    dz = d[..., 2]
    t = (height - o[..., 2]) / jnp.where(dz == 0.0, 1.0, dz)
    p = o + t[..., None] * d
    # reproject exactly onto the plane (disk.rs: p_hit.z = height) — a hit
    # point off-plane by 1 ulp makes shadow rays stochastically
    # self-occlude (t slightly > 0 on re-intersection)
    p = jnp.stack([p[..., 0], p[..., 1], jnp.broadcast_to(height, t.shape)], axis=-1)
    dist2 = p[..., 0] ** 2 + p[..., 1] ** 2
    phi = jnp.arctan2(p[..., 1], p[..., 0])
    phi = jnp.where(phi < 0.0, phi + 2.0 * vm.PI, phi)
    valid = (
        (dz != 0.0)
        & (t > 0.0)
        & (t < t_max)
        & (dist2 <= radius * radius)
        & (dist2 >= inner_radius * inner_radius)
        & (phi <= phi_max)
    )
    return QuadricHit(valid, jnp.where(valid, t, t_max), p, phi)


# ---- AABB slab test (BVH traversal building block) ----


def intersect_aabb(o, inv_d, t_max, bmin, bmax):
    """Slab test with conservative 1+2*gamma(3) padding
    (reference bvh.rs:424 / geometry.rs Bounds3f::intersect_p)."""
    t_lo = (bmin - o) * inv_d
    t_hi = (bmax - o) * inv_d
    t_near = jnp.max(jnp.minimum(t_lo, t_hi), axis=-1)
    t_far = jnp.min(jnp.maximum(t_lo, t_hi), axis=-1) * (1.0 + 2.0 * vm.gamma(3.0))
    return (t_near <= t_far) & (t_far > 0.0) & (t_near < t_max)
