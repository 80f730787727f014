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
