"""Participating media kernels: Henyey-Greenstein phase + homogeneous
transmittance/distance sampling.

TPU-native replacement for reference src/core/medium.rs (HenyeyGreenstein
:297-330, phase_hg :389) and src/media/homogeneous.rs (Beer-Lambert tr :33,
per-channel distance sampling :37-90).  Grid media (delta/ratio tracking,
src/media/grid.rs) land with the density-grid scene tables.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..utils import vecmath as vm


def phase_hg(cos_theta, g):
    """reference medium.rs:389."""
    denom = 1.0 + g * g + 2.0 * g * cos_theta
    return vm.INV_4_PI * (1.0 - g * g) / jnp.maximum(denom * jnp.sqrt(jnp.maximum(denom, 1e-12)), 1e-12)


def hg_sample_phase(wo, u, g):
    """Sample the HG phase function (reference medium.rs sample_p :313-330).

    Returns (wi, phase value == pdf)."""
    safe_g = jnp.where(jnp.abs(g) < 1e-3, 1e-3, g)
    sqr = (1.0 - g * g) / (1.0 + safe_g - 2.0 * safe_g * u[..., 0])
    cos_theta_g = -(1.0 + g * g - sqr * sqr) / (2.0 * safe_g)
    cos_theta = jnp.where(jnp.abs(g) < 1e-3, 1.0 - 2.0 * u[..., 0], cos_theta_g)
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    phi = 2.0 * vm.PI * u[..., 1]
    v1, v2 = vm.coordinate_system(wo)
    wi = vm.spherical_direction_vec(sin_theta, cos_theta, phi, v1, v2, wo)
    return wi, phase_hg(cos_theta, g)


def homogeneous_tr(sigma_t, dist):
    """Beer-Lambert transmittance (reference homogeneous.rs:33)."""
    return jnp.exp(-jnp.clip(sigma_t * dist[..., None], 0.0, 80.0))


class MediumSample(NamedTuple):
    sampled: jnp.ndarray  # (N,) bool: scattered in the medium
    t: jnp.ndarray  # (N,) distance
    weight: jnp.ndarray  # (N,3) beta multiplier (includes Tr and pdf)


def homogeneous_sample(sigma_a, sigma_s, u_channel, u_dist, t_max):
    """Distance sampling with per-channel importance (reference
    homogeneous.rs:37-90).

    sigma_a/sigma_s: (N,3); u_channel/u_dist/t_max: (N,)."""
    sigma_t = sigma_a + sigma_s
    channel = jnp.clip((u_channel * 3.0).astype(jnp.int32), 0, 2)
    sig_c = jnp.take_along_axis(sigma_t, channel[..., None], axis=-1)[..., 0]
    sig_c = jnp.maximum(sig_c, 1e-12)
    dist = -jnp.log(jnp.maximum(1.0 - u_dist, 1e-12)) / sig_c
    t = jnp.minimum(dist, t_max)
    sampled = dist < t_max
    tr = homogeneous_tr(sigma_t, t)
    density = jnp.where(sampled[..., None], sigma_t * tr, tr)
    pdf = jnp.mean(density, axis=-1)
    pdf = jnp.maximum(pdf, 1e-12)
    weight = jnp.where(
        sampled[..., None], tr * sigma_s / pdf[..., None], tr / pdf[..., None]
    )
    return MediumSample(sampled, t, weight)


def grid_density(grid, w2m, p):
    """Trilinear density lookup (reference media/grid.rs density/d).

    grid: (D,H,W) per-lane selected density; w2m: (...,4,4); p: (...,3)
    world points.  Medium space is the unit cube."""
    from ..utils import transform as tr

    pm = tr.xform_point(w2m, p)
    d, h, w = grid.shape[-3], grid.shape[-2], grid.shape[-1]
    # continuous voxel coords (pbrt: p * n - 0.5)
    gx = pm[..., 0] * w - 0.5
    gy = pm[..., 1] * h - 0.5
    gz = pm[..., 2] * d - 0.5
    inside = (
        (pm[..., 0] >= 0) & (pm[..., 0] < 1)
        & (pm[..., 1] >= 0) & (pm[..., 1] < 1)
        & (pm[..., 2] >= 0) & (pm[..., 2] < 1)
    )
    x0 = jnp.floor(gx); y0 = jnp.floor(gy); z0 = jnp.floor(gz)
    fx = gx - x0; fy = gy - y0; fz = gz - z0
    acc = jnp.zeros(pm.shape[:-1], jnp.float32)
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                xi = jnp.clip(x0 + dx, 0, w - 1).astype(jnp.int32)
                yi = jnp.clip(y0 + dy, 0, h - 1).astype(jnp.int32)
                zi = jnp.clip(z0 + dz, 0, d - 1).astype(jnp.int32)
                wgt = (
                    (fx if dx else 1 - fx) * (fy if dy else 1 - fy) * (fz if dz else 1 - fz)
                )
                acc = acc + wgt * grid[..., zi, yi, xi] if grid.ndim == 3 else acc
    if grid.ndim == 3:
        return jnp.where(inside, acc, 0.0)
    raise ValueError("grid must be (D,H,W)")


def grid_sample_distance(grid, w2m, max_density, sigma_t_avg, o, d, t_max, u_seq):
    """Delta tracking (reference grid.rs sample :209-271), bounded steps.

    u_seq: (..., STEPS, 2) uniforms.  Returns (sampled, t)."""
    steps = u_seq.shape[-2]
    inv_max = 1.0 / jnp.maximum(sigma_t_avg * max_density, 1e-12)
    t = jnp.zeros(o.shape[:-1], jnp.float32)
    sampled = jnp.zeros(o.shape[:-1], bool)
    done = jnp.zeros(o.shape[:-1], bool)
    for i in range(steps):
        u1 = u_seq[..., i, 0]
        u2 = u_seq[..., i, 1]
        t_new = t - jnp.log(jnp.maximum(1.0 - u1, 1e-12)) * inv_max
        past = t_new >= t_max
        p = o + t_new[..., None] * d
        dens = grid_density(grid, w2m, p)
        real = u2 < dens / jnp.maximum(max_density, 1e-12)
        hit_now = ~done & ~past & real
        sampled = sampled | hit_now
        t = jnp.where(done, t, jnp.minimum(t_new, t_max))
        done = done | past | hit_now
    return sampled, t


def grid_tr(grid, w2m, max_density, sigma_t_avg, o, d, dist, u_seq):
    """Ratio tracking transmittance (reference grid.rs tr :155-208)."""
    steps = u_seq.shape[-2]
    inv_max = 1.0 / jnp.maximum(sigma_t_avg * max_density, 1e-12)
    t = jnp.zeros(o.shape[:-1], jnp.float32)
    tr_acc = jnp.ones(o.shape[:-1], jnp.float32)
    done = jnp.zeros(o.shape[:-1], bool)
    for i in range(steps):
        u1 = u_seq[..., i, 0]
        t_new = t - jnp.log(jnp.maximum(1.0 - u1, 1e-12)) * inv_max
        past = t_new >= dist
        p = o + t_new[..., None] * d
        dens = grid_density(grid, w2m, p)
        tr_acc = jnp.where(
            done | past, tr_acc, tr_acc * (1.0 - dens / jnp.maximum(max_density, 1e-12))
        )
        t = t_new
        done = done | past
    return jnp.clip(tr_acc, 0.0, 1.0)
