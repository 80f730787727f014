"""Vector math over SoA arrays with a trailing xyz axis.

TPU-native replacement for the reference's Vector3/Point3/Normal3 structs
(reference: src/core/geometry.rs).  There are no wrapper classes: geometry is
plain ``jnp`` arrays of shape ``(..., 3)`` so every operation is batched and
fusible by XLA.  Free functions mirror the reference's semantics
(dot/cross/normalize/coordinate_system/face_forward/spherical_direction),
including the parts that matter for numerical parity (e.g. cross products in
f64-free form, spherical theta clamping).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

Float = jnp.float32

# Constants (reference: src/core/pbrt.rs:16-28)
PI = 3.14159265358979323846
INV_PI = 0.31830988618379067154
INV_2_PI = 0.15915494309189533577
INV_4_PI = 0.07957747154594766788
PI_OVER_2 = 1.57079632679489661923
PI_OVER_4 = 0.78539816339744830961
SQRT_2 = 1.41421356237309504880
# Largest f32 strictly below 1.0 (reference: src/core/rng.rs FLOAT_ONE_MINUS_EPSILON)
ONE_MINUS_EPSILON = np.float32(1.0 - np.finfo(np.float32).eps / 2)
MACHINE_EPSILON = np.float32(np.finfo(np.float32).eps / 2)
SHADOW_EPSILON = 0.0001
INFINITY = np.float32(np.finfo(np.float32).max)


def gamma(n):
    """FP error bound helper (reference: src/core/pbrt.rs:94)."""
    return (n * MACHINE_EPSILON) / (1.0 - n * MACHINE_EPSILON)


def clamp(x, lo, hi):
    return jnp.clip(x, lo, hi)


def lerp(t, a, b):
    return (1.0 - t) * a + t * b


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def absdot(a, b):
    return jnp.abs(dot(a, b))


def cross(a, b):
    return jnp.cross(a, b)


def length_squared(v):
    return dot(v, v)


def length(v):
    # floor inside the sqrt: sqrt's backward at exactly 0 is inf, and
    # 0-cotangent x inf = NaN poisons reverse-mode geometry gradients
    # (zero-length shadow/edge vectors on unselected where-branches);
    # values for |v| > 1e-15 are bit-identical
    return jnp.sqrt(jnp.maximum(length_squared(v), 1e-30))


def normalize(v):
    return v / jnp.maximum(length(v), 1e-20)[..., None]


def distance(p1, p2):
    return length(p1 - p2)


def distance_squared(p1, p2):
    return length_squared(p1 - p2)


def face_forward(n, v):
    """Flip n to the same hemisphere as v (reference: src/core/geometry.rs)."""
    return jnp.where((dot(n, v) < 0.0)[..., None], -n, n)


def max_component(v):
    return jnp.max(v, axis=-1)


def max_dimension(v):
    """Index of the largest component (reference geometry.rs max_dimension)."""
    return jnp.argmax(v, axis=-1)


def permute(v, ix, iy, iz):
    """Gather components of v by per-lane indices."""
    return jnp.stack(
        [
            jnp.take_along_axis(v, ix[..., None], axis=-1)[..., 0],
            jnp.take_along_axis(v, iy[..., None], axis=-1)[..., 0],
            jnp.take_along_axis(v, iz[..., None], axis=-1)[..., 0],
        ],
        axis=-1,
    )


def coordinate_system(v1):
    """Build an orthonormal frame around unit v1.

    Matches reference src/core/geometry.rs coordinate_system (branch on
    |x|>|y|), vectorized with where-select.
    """
    ax = jnp.abs(v1[..., 0])
    ay = jnp.abs(v1[..., 1])
    x, y, z = v1[..., 0], v1[..., 1], v1[..., 2]
    inv_a = 1.0 / jnp.sqrt(jnp.maximum(x * x + z * z, 1e-20))
    inv_b = 1.0 / jnp.sqrt(jnp.maximum(y * y + z * z, 1e-20))
    v2a = jnp.stack([-z * inv_a, jnp.zeros_like(x), x * inv_a], axis=-1)
    v2b = jnp.stack([jnp.zeros_like(x), z * inv_b, -y * inv_b], axis=-1)
    v2 = jnp.where((ax > ay)[..., None], v2a, v2b)
    v3 = cross(v1, v2)
    return v2, v3


def spherical_direction(sin_theta, cos_theta, phi):
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def spherical_direction_vec(sin_theta, cos_theta, phi, x, y, z):
    """Spherical direction in the frame (x, y, z)."""
    return (
        (sin_theta * jnp.cos(phi))[..., None] * x
        + (sin_theta * jnp.sin(phi))[..., None] * y
        + cos_theta[..., None] * z
    )


def spherical_theta(v):
    return jnp.arccos(jnp.clip(v[..., 2], -1.0, 1.0))


def spherical_phi(v):
    p = jnp.arctan2(v[..., 1], v[..., 0])
    return jnp.where(p < 0.0, p + 2.0 * PI, p)


def quadratic(a, b, c):
    """Stable quadratic solve; returns (has_solution, t0, t1) with t0<=t1.

    Reference computes the discriminant in f64 (src/core/pbrt.rs:250).  TPUs
    have no f64; we use the numerically stable form with the b/2 trick which
    is accurate enough for quadric intersection at scene scales, and robust
    hit validation is additionally guarded by error-bound padding in the
    intersect kernels.
    """
    disc = b * b - 4.0 * a * c
    has = disc >= 0.0
    root = jnp.sqrt(jnp.maximum(disc, 0.0))
    q = jnp.where(b < 0.0, -0.5 * (b - root), -0.5 * (b + root))
    t0 = q / jnp.where(a == 0.0, 1.0, a)
    t1 = c / jnp.where(q == 0.0, 1.0, q)
    lo = jnp.minimum(t0, t1)
    hi = jnp.maximum(t0, t1)
    return has, lo, hi


def next_float_up(x):
    """Next representable f32 toward +inf (reference: src/core/pbrt.rs:61)."""
    xi = jnp.asarray(x, jnp.float32).view(jnp.int32)
    xi = jnp.where(jnp.asarray(x) >= 0.0, xi + 1, xi - 1)
    out = xi.view(jnp.float32)
    out = jnp.where(jnp.asarray(x) == 0.0, np.float32(1e-45), out)
    return jnp.where(jnp.isinf(jnp.asarray(x)) & (jnp.asarray(x) > 0), x, out)


def next_float_down(x):
    xi = jnp.asarray(x, jnp.float32).view(jnp.int32)
    xi = jnp.where(jnp.asarray(x) > 0.0, xi - 1, xi + 1)
    out = xi.view(jnp.float32)
    out = jnp.where(jnp.asarray(x) == 0.0, np.float32(-1e-45), out)
    return jnp.where(jnp.isinf(jnp.asarray(x)) & (jnp.asarray(x) < 0), x, out)


def offset_ray_origin(p, p_error, n, w):
    """Robust ray-origin offsetting (reference: src/core/interaction.rs:62-95)."""
    d = dot(jnp.abs(n), p_error)
    offset = d[..., None] * n
    offset = jnp.where((dot(w, n) < 0.0)[..., None], -offset, offset)
    po = p + offset
    po_up = next_float_up(po)
    po_dn = next_float_down(po)
    pos = offset > 0.0
    neg = offset < 0.0
    return jnp.where(pos, po_up, jnp.where(neg, po_dn, po))
