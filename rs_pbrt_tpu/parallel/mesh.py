"""Multi-device rendering: shard_map over a device mesh + film psum.

TPU-native replacement for the reference's thread-level parallelism
(src/blockqueue/mod.rs work-stealing tile queue + crossbeam channels +
RwLock film merge, src/core/integrator.rs:101-215).  The mapping (SURVEY
§2.2):

  BlockQueue tile stealing  -> static even shard of the (pixel, sample)
                               lane space over mesh axis 'd'
  worker->collector channel -> per-device partial films
  RwLock film merge         -> lax.psum over 'd' (rides ICI)
  per-tile sampler reseed   -> samplers are stateless in (pixel, sample),
                               so any shard assignment is deterministic

Scene tables are replicated (Cornell..Ganesha fit HBM); sharding scene
arrays by primitive range is the >HBM escape hatch (future work).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models import cameras as cam
from ..models import samplers as smpl
from ..models.integrators import path as pathmod
from ..models.integrators import render as rdr
from ..ops import film as filmmod
from ..scene import arrays as sa


def make_mesh(devices=None, axis: str = "d") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def render_sharded(
    scene: sa.Scene,
    camera: cam.Camera,
    cfg: rdr.RenderCfg,
    sampler_cfg: smpl.SamplerCfg,
    filter_cfg: Optional[filmmod.FilterCfg] = None,
    mesh: Optional[Mesh] = None,
    accel=None,
    spp_per_batch: Optional[int] = None,
    crop=None,
):
    """Data-parallel render over the mesh's 'd' axis.

    Lanes (pixel x sample) are sharded evenly; every device accumulates a
    full-resolution partial film over its lanes; films are psum-reduced.
    Deterministic: the image is bit-identical for any device count because
    samplers are stateless and the film sum is reassociated per-pixel over
    a fixed sample order.
    """
    if filter_cfg is None:
        filter_cfg = filmmod.make_filter(filmmod.FILTER_BOX)
    if mesh is None:
        mesh = make_mesh()
    # lanes shard over ALL mesh axes: a 1-D ("d",) chip mesh and a 2-D
    # ("h", "d") hosts-x-chips mesh (parallel/distributed.make_host_mesh)
    # run the same program; the film psum over ("h", "d") lowers to an ICI
    # reduce per host + one film all-reduce across hosts on DCN
    axes = tuple(mesh.axis_names)
    n_dev = mesh.devices.size
    w, h = camera.resolution
    # film cropwindow: lanes cover the cropped rect only; the film (and
    # psum) stays full-res with zeros outside (same as render()'s grid_rect)
    if crop is None:
        crop = getattr(cfg, "crop", None)
    px0, px1, py0, py1 = rdr.crop_pixel_rect((w, h), crop)
    cw, ch = px1 - px0, py1 - py0
    n_pix = cw * ch
    # device-side pixel list (host np arrays would transfer MBs per batch)
    xs = jnp.arange(px0, px1, dtype=jnp.int32)
    ys = jnp.arange(py0, py1, dtype=jnp.int32)
    pixels = jnp.stack([jnp.tile(xs, ch), jnp.repeat(ys, cw)], axis=-1)

    # pad pixel count to device multiple with out-of-frame sentinel pixels
    pad = (-n_pix) % n_dev
    if pad:
        pixels = jnp.concatenate([pixels, jnp.full((pad, 2), -1, jnp.int32)])
    n_lane_pix = pixels.shape[0]

    if spp_per_batch is None:
        spp_per_batch = max(1, min(cfg.spp, (1 << 20) // n_lane_pix))

    # single-kernel bounce loop when the (concrete) scene is eligible —
    # the megakernel composes with shard_map: each device runs it on its
    # lane shard (host-side static decision, ops/pallas_path.mega_cfg)
    mega = None
    if cfg.integrator == "path":
        from ..ops import pallas_path as pp

        mega = pp.mega_cfg(scene, accel, None)

    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    @jax.jit
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axes), P(axes), P()),
        out_specs=P(),
    )
    def worker(pix_shard, snum_shard, scene):
        ctx = smpl.make_ctx(sampler_cfg, pix_shard, snum_shard, frame_lt_spp=True)
        u_film, u_time, u_lens = smpl.get_camera_dims(sampler_cfg, ctx, pix_shard)
        p_film = pix_shard.astype(jnp.float32) + u_film
        rays = cam.generate_rays(camera, p_film, u_lens, u_time)
        L = rdr.radiance_fn(cfg.integrator, cfg.max_depth, cfg.rr_threshold, mega=mega)(
            scene, sampler_cfg, ctx, rays.o, rays.d, accel
        )
        L = L * rays.weight[..., None]
        # out-of-frame sentinel lanes contribute nothing
        valid = jnp.all(pix_shard >= 0, axis=-1)
        L = jnp.where(valid[..., None], L, 0.0)
        p_film = jnp.where(valid[..., None], p_film, -10.0)
        partial_film = filmmod.add_samples(
            filmmod.make_film((w, h)), filter_cfg, p_film, L
        )
        # tile DP result reduction: per-device partial films -> psum
        # (ICI within a host; hierarchical ICI+DCN on a ("h", "d") mesh)
        return filmmod.Film(
            jax.lax.psum(partial_film.rgb, axes),
            jax.lax.psum(partial_film.weight, axes),
            jax.lax.psum(partial_film.splat, axes),
        )

    film = filmmod.make_film((w, h))
    sample = 0
    while sample < cfg.spp:
        nb = min(spp_per_batch, cfg.spp - sample)
        pix = jnp.tile(pixels, (nb, 1))
        snums = jnp.repeat(jnp.arange(sample, sample + nb, dtype=jnp.uint32), n_lane_pix)
        batch = worker(pix, snums, scene)
        film = filmmod.Film(
            film.rgb + batch.rgb, film.weight + batch.weight, film.splat + batch.splat
        )
        sample += nb
    return filmmod.to_rgb(film)
