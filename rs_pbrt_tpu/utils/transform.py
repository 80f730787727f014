"""4x4 transforms, batched and functional.

TPU-native replacement for reference src/core/transform.rs.  A Transform is a
pair of (4,4) matrices (forward, inverse) carried as arrays; all application
functions broadcast over leading batch dims.  Error-bound propagation for
transformed points follows transform.rs:662-814 (needed for robust ray
offsetting on watertight surfaces).

Animated transforms (transform.rs:894) are represented by decomposed
(translate, rotate-quaternion, scale) pairs interpolated per-ray inside the
camera ray-gen kernel; see utils/quaternion.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from . import vecmath as vm


class Transform(NamedTuple):
    m: jnp.ndarray  # (..., 4, 4) forward
    m_inv: jnp.ndarray  # (..., 4, 4) inverse


def identity():
    return Transform(np.eye(4, dtype=np.float32), np.eye(4, dtype=np.float32))


def from_matrix(m):
    """Type-preserving: host inputs build host transforms (scene-construction
    path must never touch the device — a tunnel readback costs seconds);
    traced inputs (grad wrt camera pose) stay traced."""
    if isinstance(m, (np.ndarray, list, tuple)):
        m64 = np.asarray(m, np.float64)
        return Transform(m64.astype(np.float32), np.linalg.inv(m64).astype(np.float32))
    m = jnp.asarray(m, jnp.float32)
    return Transform(m, jnp.linalg.inv(m))


def inverse(t: Transform) -> Transform:
    return Transform(t.m_inv, t.m)


def compose(a: Transform, b: Transform) -> Transform:
    """a ∘ b (apply b first)."""
    return Transform(a.m @ b.m, b.m_inv @ a.m_inv)


def translate(delta) -> Transform:
    d = np.asarray(delta, np.float32)
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = d
    mi = np.eye(4, dtype=np.float32)
    mi[:3, 3] = -d
    return Transform(m, mi)


def scale(sx, sy, sz) -> Transform:
    m = np.diag(np.array([sx, sy, sz, 1.0], np.float32))
    mi = np.diag(np.array([1.0 / sx, 1.0 / sy, 1.0 / sz, 1.0], np.float32))
    return Transform(m, mi)


def rotate_x(deg) -> Transform:
    s, c = np.sin(np.deg2rad(deg)), np.cos(np.deg2rad(deg))
    m = np.eye(4, dtype=np.float32)
    m[1, 1], m[1, 2], m[2, 1], m[2, 2] = c, -s, s, c
    return Transform(m, m.T.copy())


def rotate_y(deg) -> Transform:
    s, c = np.sin(np.deg2rad(deg)), np.cos(np.deg2rad(deg))
    m = np.eye(4, dtype=np.float32)
    m[0, 0], m[0, 2], m[2, 0], m[2, 2] = c, s, -s, c
    return Transform(m, m.T.copy())


def rotate_z(deg) -> Transform:
    s, c = np.sin(np.deg2rad(deg)), np.cos(np.deg2rad(deg))
    m = np.eye(4, dtype=np.float32)
    m[0, 0], m[0, 1], m[1, 0], m[1, 1] = c, -s, s, c
    return Transform(m, m.T.copy())


def rotate(deg, axis) -> Transform:
    """Rotation about arbitrary axis (reference transform.rs rotate)."""
    a = np.asarray(axis, np.float64)
    a = a / np.linalg.norm(a)
    s, c = np.sin(np.deg2rad(deg)), np.cos(np.deg2rad(deg))
    m = np.eye(4, dtype=np.float64)
    m[0, 0] = a[0] * a[0] + (1 - a[0] * a[0]) * c
    m[0, 1] = a[0] * a[1] * (1 - c) - a[2] * s
    m[0, 2] = a[0] * a[2] * (1 - c) + a[1] * s
    m[1, 0] = a[0] * a[1] * (1 - c) + a[2] * s
    m[1, 1] = a[1] * a[1] + (1 - a[1] * a[1]) * c
    m[1, 2] = a[1] * a[2] * (1 - c) - a[0] * s
    m[2, 0] = a[0] * a[2] * (1 - c) - a[1] * s
    m[2, 1] = a[1] * a[2] * (1 - c) + a[0] * s
    m[2, 2] = a[2] * a[2] + (1 - a[2] * a[2]) * c
    m = m.astype(np.float32)
    return Transform(m, m.T.copy())


def look_at(eye, look, up) -> Transform:
    """Camera-to-world (reference transform.rs look_at)."""
    eye = np.asarray(eye, np.float64)
    look = np.asarray(look, np.float64)
    up = np.asarray(up, np.float64)
    d = look - eye
    d = d / np.linalg.norm(d)
    right = np.cross(up / np.linalg.norm(up), d)
    rn = np.linalg.norm(right)
    if rn < 1e-9:
        raise ValueError("look_at: up and viewing direction are parallel")
    right /= rn
    new_up = np.cross(d, right)
    c2w = np.eye(4, dtype=np.float64)
    c2w[:3, 0] = right
    c2w[:3, 1] = new_up
    c2w[:3, 2] = d
    c2w[:3, 3] = eye
    c2w = c2w.astype(np.float32)
    return Transform(c2w, np.linalg.inv(c2w.astype(np.float64)).astype(np.float32))


def perspective(fov_deg, znear, zfar) -> Transform:
    """Perspective projection (reference transform.rs perspective)."""
    persp = np.zeros((4, 4), np.float32)
    persp[0, 0] = persp[1, 1] = 1.0
    persp[2, 2] = zfar / (zfar - znear)
    persp[2, 3] = -zfar * znear / (zfar - znear)
    persp[3, 2] = 1.0
    inv_tan = 1.0 / np.tan(np.deg2rad(fov_deg) / 2.0)
    t = from_matrix(persp)
    return compose(scale(inv_tan, inv_tan, 1.0), t)


def orthographic(znear, zfar) -> Transform:
    return compose(
        scale(1.0, 1.0, 1.0 / (zfar - znear)), translate([0.0, 0.0, -znear])
    )


# ---- application (batched) ----


def xform_point(t_m, p):
    """Apply (...,4,4) matrix to (...,3) points."""
    r = jnp.einsum("...ij,...j->...i", t_m[..., :3, :3], p) + t_m[..., :3, 3]
    w = jnp.einsum("...j,...j->...", t_m[..., 3, :3], p) + t_m[..., 3, 3]
    return r / w[..., None]


def xform_point_with_error(t_m, p):
    """Point transform + absolute error bound (transform.rs:662-700)."""
    r = xform_point(t_m, p)
    abs_sum = jnp.einsum("...ij,...j->...i", jnp.abs(t_m[..., :3, :3]), jnp.abs(p)) + jnp.abs(
        t_m[..., :3, 3]
    )
    return r, vm.gamma(3.0) * abs_sum


def xform_vector(t_m, v):
    return jnp.einsum("...ij,...j->...i", t_m[..., :3, :3], v)


def xform_normal(t_inv, n):
    """Normals transform by the inverse transpose."""
    return jnp.einsum("...ji,...j->...i", t_inv[..., :3, :3], n)


def xform_ray(t_m, o, d):
    return xform_point(t_m, o), xform_vector(t_m, d)


def xform_bounds(t_m, bmin, bmax):
    """Transform an AABB conservatively (all 8 corners)."""
    corners = jnp.stack(
        [
            jnp.stack([jnp.where(m & (1 << i), bmax[..., i], bmin[..., i]) for i in range(3)], axis=-1)
            for m in range(8)
        ],
        axis=0,
    )
    xc = xform_point(t_m, corners)
    return jnp.min(xc, axis=0), jnp.max(xc, axis=0)


def swaps_handedness(t_m):
    det = jnp.linalg.det(t_m[..., :3, :3])
    return det < 0.0
