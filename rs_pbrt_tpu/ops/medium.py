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
