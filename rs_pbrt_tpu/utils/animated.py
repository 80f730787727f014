"""AnimatedTransform — reference src/core/transform.rs:894-2204.

Decompose (host): M = T R S with R a quaternion via polar decomposition
(transform.rs decompose :2032-2100).  Interpolate (device): per-lane lerp
of translation + quaternion slerp + lerp of the scale matrix, recompose.
Used for camera shutter motion blur; animated object transforms ride the
same helper at build time."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _quat_from_matrix(m):
    """Rotation matrix (3,3) -> quaternion (x,y,z,w) (quaternion.rs)."""
    tr = np.trace(m)
    if tr > 0.0:
        s = np.sqrt(tr + 1.0)
        w = s / 2.0
        s = 0.5 / s
        return np.array(
            [(m[2, 1] - m[1, 2]) * s, (m[0, 2] - m[2, 0]) * s, (m[1, 0] - m[0, 1]) * s, w]
        )
    i = int(np.argmax([m[0, 0], m[1, 1], m[2, 2]]))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(max(m[i, i] - (m[j, j] + m[k, k]) + 1.0, 1e-12))
    q = np.zeros(4)
    q[i] = s * 0.5
    s = 0.5 / s
    q[3] = (m[k, j] - m[j, k]) * s
    q[j] = (m[j, i] + m[i, j]) * s
    q[k] = (m[k, i] + m[i, k]) * s
    return q


def decompose(m):
    """(4,4) -> (T (3,), quat (4,), S (3,3)) (transform.rs:2032-2100):
    polar decomposition by iterated averaging with the inverse transpose."""
    m = np.asarray(m, np.float64)
    T = m[:3, 3].copy()
    M = m[:3, :3].copy()
    R = M.copy()
    for _ in range(100):
        R_next = 0.5 * (R + np.linalg.inv(R.T))
        if np.abs(R_next - R).max() < 1e-10:
            R = R_next
            break
        R = R_next
    q = _quat_from_matrix(R)
    S = np.linalg.inv(R) @ M
    return T.astype(np.float32), q.astype(np.float32), S.astype(np.float32)


def interpolate(t, T0, q0, S0, T1, q1, S1):
    """Per-lane interpolated (..., 4, 4) matrices (transform.rs:2104-2204).
    t: (...,) in [0,1]; the six parts are host constants."""
    t = jnp.clip(jnp.asarray(t, jnp.float32), 0.0, 1.0)
    T = (1.0 - t)[..., None] * jnp.asarray(T0) + t[..., None] * jnp.asarray(T1)
    # slerp (quaternion.rs slerp): negate for shortest arc
    q0j = jnp.asarray(q0)
    q1j = jnp.asarray(q1)
    # axis=-1: supports per-lane parameter batches (animated-mesh hits
    # interpolate a gathered (N,4) quaternion pair) as well as host consts
    cos_t = jnp.sum(q0j * q1j, axis=-1, keepdims=True)
    q1j = jnp.where(cos_t < 0.0, -q1j, q1j)
    cos_t = jnp.abs(cos_t)[..., 0]
    theta = jnp.arccos(jnp.clip(cos_t, -1.0, 1.0))
    sin_t = jnp.maximum(jnp.sin(theta), 1e-6)
    near = cos_t > 0.9995
    w0 = jnp.where(near, 1.0 - t, jnp.sin((1.0 - t) * theta) / sin_t)
    w1 = jnp.where(near, t, jnp.sin(t * theta) / sin_t)
    q = w0[..., None] * q0j + w1[..., None] * q1j
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1),
        ],
        -2,
    )
    S = (1.0 - t)[..., None, None] * jnp.asarray(S0) + t[..., None, None] * jnp.asarray(S1)
    M3 = R @ S
    out = jnp.zeros(t.shape + (4, 4), jnp.float32)
    out = out.at[..., :3, :3].set(M3)
    out = out.at[..., :3, 3].set(T)
    out = out.at[..., 3, 3].set(1.0)
    return out


def _quat_to_mat_np(q):
    x, y, z, w = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def motion_bounds(T0, q0, S0, T1, q1, S1, points):
    """Conservative AABB of `points` (N,3) under the animated transform
    over the WHOLE t in [0,1] interval — host/build-time (reference
    transform.rs:2207-2281 motion_bounds / bound_point_motion).

    The reference bounds each corner's motion by symbolically
    differentiating the interpolated-matrix path and interval-searching
    the derivative's zeros (an auto-generated ~600-term expansion).  We
    use a closed-form chord + arc-deviation bound instead: with
    x(t) = T(t) + R(t) v(t), T and v = S(t)p linear and
    R(t) = R0 rot(a, t*theta) the slerp arc,

        || x(t) - lerp(x(0), x(1))(t) ||
          <= (1-t) 2 sin(t theta/2) d(v0) + t 2 sin((1-t) theta/2) d(v1)
          <= t (1-t) theta (d0 + d1)  <=  theta (d0 + d1) / 4

    where d(v) is the distance of v from the rotation axis a (of
    q0^-1 q1, shortest arc).  So the endpoint-union box padded by
    theta(d0+d1)/4 per point contains the whole path.  nlerp (the
    near-case in `interpolate`) lies on the same great-circle arc, so
    the bound covers it too.  Looser than the reference's root-finding
    (by <= ~23% of the pad at theta=pi) but strictly conservative and
    26 lines instead of 600."""
    P = np.asarray(points, np.float64).reshape(-1, 3)
    T0 = np.asarray(T0, np.float64)
    T1 = np.asarray(T1, np.float64)
    S0 = np.asarray(S0, np.float64).reshape(3, 3)
    S1 = np.asarray(S1, np.float64).reshape(3, 3)
    q0 = np.asarray(q0, np.float64)
    q1 = np.asarray(q1, np.float64)
    v0 = P @ S0.T
    v1 = P @ S1.T
    x0 = v0 @ _quat_to_mat_np(q0).T + T0
    x1 = v1 @ _quat_to_mat_np(q1).T + T1
    # relative rotation q0^-1 q1 (x,y,z,w), shortest arc
    x0q, y0q, z0q, w0q = -q0[0], -q0[1], -q0[2], q0[3]  # conjugate
    x1q, y1q, z1q, w1q = q1
    qd = np.array([
        w0q * x1q + x0q * w1q + y0q * z1q - z0q * y1q,
        w0q * y1q - x0q * z1q + y0q * w1q + z0q * x1q,
        w0q * z1q + x0q * y1q - y0q * x1q + z0q * w1q,
        w0q * w1q - x0q * x1q - y0q * y1q - z0q * z1q,
    ])
    if qd[3] < 0.0:
        qd = -qd
    theta = 2.0 * np.arccos(np.clip(qd[3], -1.0, 1.0))
    an = np.linalg.norm(qd[:3])
    axis = qd[:3] / an if an > 1e-12 else np.array([0.0, 0.0, 1.0])
    dist = lambda v: np.linalg.norm(v - np.outer(v @ axis, axis), axis=-1)
    pad = (0.25 * theta * (dist(v0) + dist(v1)))[:, None]
    lo = np.minimum(x0 - pad, x1 - pad).min(0)
    hi = np.maximum(x0 + pad, x1 + pad).max(0)
    return lo.astype(np.float32), hi.astype(np.float32)


def inverse_affine(m):
    """Per-lane inverse of affine (..., 4, 4) matrices (3x3 cofactor +
    translation); used to carry rays into the object space of an animated
    primitive at ray time (reference transform.rs Transform keeps m_inv
    precomputed; an interpolated matrix must invert on the fly)."""
    a = m[..., :3, :3]
    t = m[..., :3, 3]
    c00 = a[..., 1, 1] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 1]
    c01 = a[..., 1, 2] * a[..., 2, 0] - a[..., 1, 0] * a[..., 2, 2]
    c02 = a[..., 1, 0] * a[..., 2, 1] - a[..., 1, 1] * a[..., 2, 0]
    det = a[..., 0, 0] * c00 + a[..., 0, 1] * c01 + a[..., 0, 2] * c02
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1.0, det)
    adj = jnp.stack(
        [
            jnp.stack([c00,
                       a[..., 0, 2] * a[..., 2, 1] - a[..., 0, 1] * a[..., 2, 2],
                       a[..., 0, 1] * a[..., 1, 2] - a[..., 0, 2] * a[..., 1, 1]], -1),
            jnp.stack([c01,
                       a[..., 0, 0] * a[..., 2, 2] - a[..., 0, 2] * a[..., 2, 0],
                       a[..., 0, 2] * a[..., 1, 0] - a[..., 0, 0] * a[..., 1, 2]], -1),
            jnp.stack([c02,
                       a[..., 0, 1] * a[..., 2, 0] - a[..., 0, 0] * a[..., 2, 1],
                       a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]], -1),
        ],
        -2,
    )
    a_inv = adj * inv_det[..., None, None]
    t_inv = -jnp.einsum("...ij,...j->...i", a_inv, t)
    out = jnp.zeros(m.shape, jnp.float32)
    out = out.at[..., :3, :3].set(a_inv)
    out = out.at[..., :3, 3].set(t_inv)
    out = out.at[..., 3, 3].set(1.0)
    return out
