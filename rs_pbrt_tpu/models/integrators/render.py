"""Render driver: samples -> camera rays -> integrator -> film.

TPU-native replacement for the reference's shared tile render loop
(src/core/integrator.rs:70-220).  The BlockQueue/thread-pool becomes a flat
wavefront of (pixel, sample) lanes, batched to bound memory; spp batches
replace tiles as the work/checkpoint unit.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import bvh as bvhmod
from ...ops import film as filmmod
from ...scene import arrays as sa
from .. import cameras as cam
from .. import samplers as smpl
from . import path as pathmod


class RenderCfg(NamedTuple):
    integrator: str  # static
    spp: int  # static
    max_depth: int  # static
    rr_threshold: float  # static
    light_strategy: str = "power"  # "uniform" | "power" | "spatial"
    #   (reference lightdistrib.rs create_light_sample_distribution :393)


def _camera_rays(camera: cam.Camera, sampler_cfg, ctx, pixel):
    u_film = smpl.get_2d(sampler_cfg, ctx, 0)
    u_time = smpl.get_1d(sampler_cfg, ctx, 2)
    u_lens = smpl.get_2d(sampler_cfg, ctx, 3)
    p_film = pixel.astype(jnp.float32) + u_film
    rays = cam.generate_rays(camera, p_film, u_lens, u_time)
    return rays, p_film


def radiance_fn(integrator: str, max_depth: int, rr_threshold: float):
    """Integrator dispatch (reference Integrator enum integrator.rs:31)."""
    from . import direct as directmod

    if integrator == "path":
        pcfg = pathmod.PathCfg(max_depth, rr_threshold)
        return lambda scene, cfg_s, ctx, o, d, accel, ld=None: pathmod.radiance(
            scene, pcfg, cfg_s, ctx, o, d, accel, light_distrib=ld
        )
    if integrator == "volpath":
        from . import volpath as volmod

        pcfg = pathmod.PathCfg(max_depth, rr_threshold)
        return lambda scene, cfg_s, ctx, o, d, accel, ld=None: volmod.radiance(
            scene, pcfg, cfg_s, ctx, o, d, accel
        )
    if integrator == "ao":
        acfg = directmod.AOCfg(n_samples=8, cos_sample=True)
        return lambda scene, cfg_s, ctx, o, d, accel, ld=None: directmod.ao_radiance(
            scene, acfg, cfg_s, ctx, o, d, accel
        )
    if integrator == "whitted":
        wcfg = directmod.WhittedCfg(max_depth)
        return lambda scene, cfg_s, ctx, o, d, accel, ld=None: directmod.whitted_radiance(
            scene, wcfg, cfg_s, ctx, o, d, accel
        )
    if integrator == "directlighting":
        dcfg = directmod.DirectLightingCfg(max_depth, sample_all=False)
        return lambda scene, cfg_s, ctx, o, d, accel, ld=None: directmod.directlighting_radiance(
            scene, dcfg, cfg_s, ctx, o, d, accel
        )
    raise ValueError(f"unknown integrator {integrator!r}")


@partial(
    jax.jit,
    static_argnames=("integrator", "max_depth", "rr_threshold", "sampler_cfg", "filter_cfg"),
)
def render_batch(
    scene: sa.Scene,
    accel,
    camera: cam.Camera,
    integrator: str,
    max_depth: int,
    rr_threshold: float,
    sampler_cfg: smpl.SamplerCfg,
    film: filmmod.Film,
    filter_cfg: filmmod.FilterCfg,
    pixel: jnp.ndarray,  # (N,2) int32
    sample_num: jnp.ndarray,  # (N,) uint32
    light_distrib=None,
):
    """One wavefront batch.  Static args exclude spp so different sample
    counts share one compilation (only shapes + depth matter)."""
    ctx = smpl.make_ctx(sampler_cfg, pixel, sample_num)
    rays, p_film = _camera_rays(camera, sampler_cfg, ctx, pixel)
    L = radiance_fn(integrator, max_depth, rr_threshold)(
        scene, sampler_cfg, ctx, rays.o, rays.d, accel, light_distrib
    )
    L = L * rays.weight[..., None]
    return filmmod.add_samples(film, filter_cfg, p_film, L)


def render(
    scene: sa.Scene,
    camera: cam.Camera,
    cfg: RenderCfg,
    sampler_cfg: smpl.SamplerCfg,
    filter_cfg: Optional[filmmod.FilterCfg] = None,
    accel: Optional[bvhmod.LBVH] = None,
    max_lanes: int = 1 << 20,
):
    """Single-device render: loops spp batches over the full pixel grid.

    Returns the resolved linear RGB image (H, W, 3).
    """
    if filter_cfg is None:
        filter_cfg = filmmod.make_filter(filmmod.FILTER_BOX)
    w, h = camera.resolution
    n_pix = w * h
    xs, ys = np.meshgrid(np.arange(w, dtype=np.int32), np.arange(h, dtype=np.int32))
    pixels = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1))
    film = filmmod.make_film((w, h))

    light_distrib = None
    if getattr(cfg, "light_strategy", "power") == "spatial" and scene.n_lights > 0:
        from .. import lightdistrib as ldist

        light_distrib = ldist.build_spatial(scene)

    spp_per_batch = max(1, min(cfg.spp, max_lanes // n_pix))
    sample = 0
    while sample < cfg.spp:
        nb = min(spp_per_batch, cfg.spp - sample)
        pix = jnp.tile(pixels, (nb, 1))
        snums = jnp.repeat(
            jnp.arange(sample, sample + nb, dtype=jnp.uint32), n_pix
        )
        film = render_batch(
            scene, accel, camera, cfg.integrator, cfg.max_depth, cfg.rr_threshold,
            sampler_cfg, film, filter_cfg, pix, snums, light_distrib,
        )
        sample += nb
    return filmmod.to_rgb(film)
