"""Monte-Carlo sampling warps and piecewise-constant distributions.

TPU-native replacement for reference src/core/sampling.rs.  All warps are
pure elementwise functions over batched ``u`` in ``[0,1)^2`` — they run on
the VPU inside whatever kernel calls them.  Distribution1D/2D become
(cumsum at build time) + (vectorized ``searchsorted`` at sample time),
replacing the reference's per-call binary search (sampling.rs:17-213).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..utils import vecmath as vm

PI = vm.PI


def uniform_sample_hemisphere(u):
    z = u[..., 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * PI * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


UNIFORM_HEMISPHERE_PDF = 1.0 / (2.0 * PI)


def uniform_sample_sphere(u):
    z = 1.0 - 2.0 * u[..., 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * PI * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


UNIFORM_SPHERE_PDF = 1.0 / (4.0 * PI)


def concentric_sample_disk(u):
    """reference sampling.rs concentric_sample_disk."""
    offset = 2.0 * u - 1.0
    ox, oy = offset[..., 0], offset[..., 1]
    zero = (ox == 0.0) & (oy == 0.0)
    use_x = jnp.abs(ox) > jnp.abs(oy)
    r = jnp.where(use_x, ox, oy)
    safe_ox = jnp.where(ox == 0.0, 1.0, ox)
    safe_oy = jnp.where(oy == 0.0, 1.0, oy)
    theta = jnp.where(
        use_x,
        (PI / 4.0) * (oy / safe_ox),
        (PI / 2.0) - (PI / 4.0) * (ox / safe_oy),
    )
    out = jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)
    return jnp.where(zero[..., None], 0.0, out)


def cosine_sample_hemisphere(u):
    d = concentric_sample_disk(u)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - d[..., 0] ** 2 - d[..., 1] ** 2))
    return jnp.stack([d[..., 0], d[..., 1], z], axis=-1)


def cosine_hemisphere_pdf(cos_theta):
    return cos_theta * (1.0 / PI)


def uniform_cone_pdf(cos_theta_max):
    return 1.0 / (2.0 * PI * (1.0 - cos_theta_max))


def uniform_sample_cone(u, cos_theta_max):
    cos_theta = (1.0 - u[..., 0]) + u[..., 0] * cos_theta_max
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    phi = u[..., 1] * 2.0 * PI
    return jnp.stack(
        [jnp.cos(phi) * sin_theta, jnp.sin(phi) * sin_theta, cos_theta], axis=-1
    )


def uniform_sample_triangle(u):
    su0 = jnp.sqrt(u[..., 0])
    return jnp.stack([1.0 - su0, u[..., 1] * su0], axis=-1)


def balance_heuristic(nf, f_pdf, ng, g_pdf):
    return (nf * f_pdf) / (nf * f_pdf + ng * g_pdf)


def power_heuristic(nf, f_pdf, ng, g_pdf):
    """beta=2 MIS weight (reference sampling.rs:229)."""
    f = nf * f_pdf
    g = ng * g_pdf
    denom = f * f + g * g
    return jnp.where(denom > 0.0, (f * f) / jnp.maximum(denom, 1e-30), 0.0)


def stratified_sample_1d(rng_u, n, jitter=True):
    """n stratified samples given n uniform jitters rng_u (n,)."""
    i = jnp.arange(n, dtype=jnp.float32)
    j = rng_u if jitter else 0.5
    return jnp.minimum((i + j) / n, vm.ONE_MINUS_EPSILON)


def stratified_sample_2d(rng_u, nx, ny, jitter=True):
    """(nx*ny, 2) stratified samples; rng_u is (nx*ny, 2) jitters."""
    ix = jnp.tile(jnp.arange(nx, dtype=jnp.float32), ny)
    iy = jnp.repeat(jnp.arange(ny, dtype=jnp.float32), nx)
    j = rng_u if jitter else 0.5
    x = jnp.minimum((ix + j[..., 0]) / nx, vm.ONE_MINUS_EPSILON)
    y = jnp.minimum((iy + j[..., 1]) / ny, vm.ONE_MINUS_EPSILON)
    return jnp.stack([x, y], axis=-1)


# ---- Distribution1D / Distribution2D ----


class Distribution1D(NamedTuple):
    """Piecewise-constant 1D distribution (reference sampling.rs:17)."""

    func: jnp.ndarray  # (n,)
    cdf: jnp.ndarray  # (n+1,)
    func_int: jnp.ndarray  # scalar


def make_distribution_1d(func) -> Distribution1D:
    func = jnp.abs(jnp.asarray(func, jnp.float32))
    n = func.shape[-1]
    cdf = jnp.concatenate(
        [jnp.zeros(func.shape[:-1] + (1,), jnp.float32), jnp.cumsum(func / n, axis=-1)],
        axis=-1,
    )
    func_int = cdf[..., -1]
    # degenerate (all-zero) distribution falls back to uniform, like reference
    uniform_cdf = jnp.arange(n + 1, dtype=jnp.float32) / n
    safe = func_int[..., None] > 0.0
    cdf = jnp.where(safe, cdf / jnp.where(safe, func_int[..., None], 1.0), uniform_cdf)
    return Distribution1D(func, cdf, func_int)


# below this CDF length the comparison-count form (pure elementwise +
# reduction, no gathers — TPU gathers measured ~ms at wavefront sizes)
# replaces binary search
COUNT_SEARCH_MAX = 512


def find_interval(cdf, u):
    """Largest i with cdf[..., i] <= u, clamped to [0, n-2]
    (vectorized replacement of reference pbrt.rs:214 find_interval).

    cdf: (..., n) broadcastable against u: (...,).
    """
    n = cdf.shape[-1]
    if n <= COUNT_SEARCH_MAX:
        idx = jnp.sum((cdf <= u[..., None]).astype(jnp.int32), axis=-1) - 1
        return jnp.clip(idx, 0, n - 2)
    lo = jnp.zeros(jnp.broadcast_shapes(cdf.shape[:-1], u.shape), jnp.int32)
    hi = jnp.full_like(lo, n - 1)
    n_steps = int(np.ceil(np.log2(max(n, 2)))) + 1
    for _ in range(n_steps):
        mid = (lo + hi) // 2
        below = jnp.take_along_axis(
            jnp.broadcast_to(cdf, lo.shape + (n,)), mid[..., None], axis=-1
        )[..., 0] <= u
        lo = jnp.where(below, mid, lo)
        hi = jnp.where(below, hi, mid)
    return jnp.clip(lo, 0, n - 2)


def bracket_cdf(cdf, u):
    """(offset, cdf[offset], cdf[offset+1]) without gathers for small n:
    the bracketing values come from masked min/max reductions."""
    n = cdf.shape[-1]
    o = find_interval(cdf, u)
    if n <= COUNT_SEARCH_MAX:
        oh = o[..., None] == jnp.arange(n)
        c0 = jnp.sum(jnp.where(oh, cdf, 0.0), axis=-1)
        oh1 = o[..., None] + 1 == jnp.arange(n)
        c1 = jnp.sum(jnp.where(oh1, cdf, 0.0), axis=-1)
    else:
        c0 = jnp.take_along_axis(jnp.broadcast_to(cdf, o.shape + (n,)), o[..., None], axis=-1)[..., 0]
        c1 = jnp.take_along_axis(jnp.broadcast_to(cdf, o.shape + (n,)), o[..., None] + 1, axis=-1)[..., 0]
    return o, c0, c1


_find_interval = find_interval


def sample_distribution_1d_continuous(dist: Distribution1D, u):
    """Returns (value in [0,1), pdf, offset)."""
    n = dist.func.shape[-1]
    o, c0, c1 = bracket_cdf(dist.cdf, u)
    denom = c1 - c0
    du = jnp.where(denom > 0.0, (u - c0) / jnp.where(denom > 0.0, denom, 1.0), u - c0)
    f = _read_at(dist.func, o)
    pdf = jnp.where(dist.func_int > 0.0, f / jnp.maximum(dist.func_int, 1e-30), 0.0)
    return (o.astype(jnp.float32) + du) / n, pdf, o


def sample_distribution_1d_discrete(dist: Distribution1D, u):
    """Returns (offset, pdf, remapped u)."""
    n = dist.func.shape[-1]
    o, c0, c1 = bracket_cdf(dist.cdf, u)
    f = _read_at(dist.func, o)
    pdf = jnp.where(
        dist.func_int > 0.0, f / jnp.maximum(dist.func_int * n, 1e-30), 0.0
    )
    u_remapped = jnp.where(c1 > c0, (u - c0) / jnp.maximum(c1 - c0, 1e-30), 0.0)
    return o, pdf, u_remapped


def distribution_1d_discrete_pdf(dist: Distribution1D, index):
    n = dist.func.shape[-1]
    f = _read_at(dist.func, index)
    return f / jnp.maximum(dist.func_int * n, 1e-30)


def _read_at(arr, idx):
    """Gather-free table read for small tables (one-hot mask + reduce)."""
    n = arr.shape[-1]
    if n <= COUNT_SEARCH_MAX:
        oh = idx[..., None] == jnp.arange(n)
        return jnp.sum(jnp.where(oh, arr, 0.0), axis=-1)
    return jnp.take(arr, idx, axis=-1)


class Distribution2D(NamedTuple):
    """2D piecewise-constant distribution (reference sampling.rs:150).

    conditional: per-row Distribution1D over u (stacked on axis 0)
    marginal: Distribution1D over v (rows)
    """

    cond_func: jnp.ndarray  # (nv, nu)
    cond_cdf: jnp.ndarray  # (nv, nu+1)
    cond_func_int: jnp.ndarray  # (nv,)
    marg_func: jnp.ndarray  # (nv,)
    marg_cdf: jnp.ndarray  # (nv+1,)
    marg_func_int: jnp.ndarray  # scalar


def make_distribution_2d(func) -> Distribution2D:
    func = jnp.abs(jnp.asarray(func, jnp.float32))  # (nv, nu)
    cond = make_distribution_1d(func)
    marg = make_distribution_1d(cond.func_int)
    return Distribution2D(
        cond.func, cond.cdf, cond.func_int, marg.func, marg.cdf, marg.func_int
    )


def sample_distribution_2d(dist: Distribution2D, u):
    """u: (..., 2) -> ((..., 2) point in [0,1)^2, pdf)."""
    nv, nu = dist.cond_func.shape
    marg = Distribution1D(dist.marg_func, dist.marg_cdf, dist.marg_func_int)
    d1, pdf1, v_idx = sample_distribution_1d_continuous(marg, u[..., 1])
    cond_cdf = dist.cond_cdf[v_idx]  # (..., nu+1)
    cond_func = dist.cond_func[v_idx]  # (..., nu)
    cond_int = dist.cond_func_int[v_idx]
    o = find_interval(cond_cdf, u[..., 0])
    c0 = jnp.take_along_axis(cond_cdf, o[..., None], axis=-1)[..., 0]
    c1 = jnp.take_along_axis(cond_cdf, o[..., None] + 1, axis=-1)[..., 0]
    denom = c1 - c0
    du = jnp.where(denom > 0.0, (u[..., 0] - c0) / jnp.where(denom > 0.0, denom, 1.0), 0.0)
    f = jnp.take_along_axis(cond_func, o[..., None], axis=-1)[..., 0]
    pdf0 = jnp.where(cond_int > 0.0, f / jnp.maximum(cond_int, 1e-30), 0.0)
    d0 = (o.astype(jnp.float32) + du) / nu
    return jnp.stack([d0, d1], axis=-1), pdf0 * pdf1


def distribution_2d_pdf(dist: Distribution2D, p):
    """pdf of a point in [0,1)^2 (reference sampling.rs Distribution2D::pdf)."""
    nv, nu = dist.cond_func.shape
    iu = jnp.clip((p[..., 0] * nu).astype(jnp.int32), 0, nu - 1)
    iv = jnp.clip((p[..., 1] * nv).astype(jnp.int32), 0, nv - 1)
    return dist.cond_func[iv, iu] / jnp.maximum(dist.marg_func_int, 1e-30)
