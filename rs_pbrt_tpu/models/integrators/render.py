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


# per-dispatch lane cap for accelerated (BVH) scenes — see render().
# Round-4 A/B: RAW traversal runs ~1.3x more rays/s at 524k lanes than at
# 64k (tools/tpu_bvh24_bench.py), but END-TO-END the 512k cap measured
# 226-246k paths/s on the statue vs 388k at 64k (BENCH ledger) — the
# mid-liveness bounces ride the quartering ladder's entry width and the
# in-dispatch argsorts grow ~10x (tools/tpu_probe9.py stages sweep), so
# the smaller dispatch wins end to end.  Keep 64k.
ACCEL_LANE_CAP = 1 << 16

# total paths per dispatch when the regeneration loop is active (the loop
# itself runs regen.REGEN_LANE_WIDTH lanes; this bounds dispatch WALL TIME
# against the ~1-minute worker-kill budget)
REGEN_PATH_CAP = 1 << 20


class RenderCfg(NamedTuple):
    integrator: str  # static
    spp: int  # static
    max_depth: int  # static
    rr_threshold: float  # static
    light_strategy: str = "power"  # "uniform" | "power" | "spatial"
    #   (reference lightdistrib.rs create_light_sample_distribution :393)
    crop: Optional[tuple] = None  # scene-file film "cropwindow" (x0,x1,y0,y1)
    extra: Optional[dict] = None  # integrator-specific params (bdpt/mlt/
    #   sppm factories, reference api.rs make_integrator :205-473)
    accelerator: str = "bvh"  # "bvh" | "kdtree" (reference api.rs:528)


def _camera_rays(camera: cam.Camera, sampler_cfg, ctx, pixel, want_diffs=False):
    u_film, u_time, u_lens = smpl.get_camera_dims(sampler_cfg, ctx, pixel)
    p_film = pixel.astype(jnp.float32) + u_film
    rays = cam.generate_rays(camera, p_film, u_lens, u_time)
    diffs = None
    if want_diffs:
        from ...ops import differentials as rd

        diffs = rd.camera_differentials(
            camera, rays, p_film, u_lens, u_time, sampler_cfg.spp
        )
    return rays, p_film, diffs


def radiance_fn(integrator: str, max_depth: int, rr_threshold: float,
                extra: tuple = (), mega=None, regen: bool = False):
    """Integrator dispatch (reference Integrator enum integrator.rs:31).
    extra: hashable tuple of integrator-specific (name, value) params
    (RenderCfg.extra) — static under jit.  mega: optional static
    ops/pallas_path.MegaCfg routing "path" through the bounce megakernel."""
    from . import direct as directmod

    e = dict(extra)
    if integrator == "path":
        pcfg = pathmod.PathCfg(max_depth, rr_threshold)
        return lambda scene, cfg_s, ctx, o, d, accel, ld=None, time=None, diffs=None: pathmod.radiance(
            scene, pcfg, cfg_s, ctx, o, d, accel, light_distrib=ld, mega=mega,
            time=time, diffs=diffs, regen=regen,
        )
    if integrator == "volpath":
        from . import volpath as volmod

        pcfg = pathmod.PathCfg(max_depth, rr_threshold)
        return lambda scene, cfg_s, ctx, o, d, accel, ld=None, time=None, diffs=None: volmod.radiance(
            scene, pcfg, cfg_s, ctx, o, d, accel, diffs=diffs
        )
    if integrator == "ao":
        acfg = directmod.AOCfg(
            n_samples=int(e.get("n_samples", 8)),
            cos_sample=bool(e.get("cos_sample", True)),
        )
        return lambda scene, cfg_s, ctx, o, d, accel, ld=None, time=None, diffs=None: directmod.ao_radiance(
            scene, acfg, cfg_s, ctx, o, d, accel
        )
    if integrator == "whitted":
        wcfg = directmod.WhittedCfg(max_depth)
        return lambda scene, cfg_s, ctx, o, d, accel, ld=None, time=None, diffs=None: directmod.whitted_radiance(
            scene, wcfg, cfg_s, ctx, o, d, accel, diffs=diffs
        )
    if integrator == "directlighting":
        dcfg = directmod.DirectLightingCfg(
            max_depth, sample_all=(e.get("strategy", "all") == "all")
        )
        return lambda scene, cfg_s, ctx, o, d, accel, ld=None, time=None, diffs=None: directmod.directlighting_radiance(
            scene, dcfg, cfg_s, ctx, o, d, accel, diffs=diffs
        )
    raise ValueError(f"unknown integrator {integrator!r}")


@partial(
    jax.jit,
    static_argnames=(
        "integrator", "max_depth", "rr_threshold", "sampler_cfg", "filter_cfg",
        "grid_spp", "grid_rect", "extra", "mega", "finalize", "regen",
    ),
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
    grid_spp: int = 0,
    grid_rect=None,
    extra: tuple = (),
    mega=None,
    finalize: bool = False,
    regen: bool = False,
):
    """One wavefront batch.  Static args exclude spp so different sample
    counts share one compilation (only shapes + depth matter).
    grid_spp > 0 asserts the lanes are grid_spp ordered copies of the
    (possibly cropped) pixel grid, enabling the scatter-free box-filter
    film path; grid_rect = static (y0, h, x0, w) crop window.
    pixel=None (grid mode): the pixel/sample arrays are BUILT IN-DISPATCH
    from grid_rect + the sample_num scalar — the host-side tile/repeat
    ops each cost a tunnel round trip otherwise.  film=None likewise
    builds the zero film in-dispatch (resolution from the camera)."""
    if film is None:
        film = filmmod.make_film(camera.resolution)
    if pixel is None:
        y0, hh, x0, ww = grid_rect
        nb = grid_spp
        xs = jnp.arange(x0, x0 + ww, dtype=jnp.int32)
        ys = jnp.arange(y0, y0 + hh, dtype=jnp.int32)
        grid_px = jnp.stack([jnp.tile(xs, hh), jnp.repeat(ys, ww)], axis=-1)
        pixel = jnp.tile(grid_px, (nb, 1))
        sample_num = jnp.repeat(
            jnp.arange(0, nb, dtype=jnp.uint32), hh * ww
        ) + sample_num.astype(jnp.uint32)
    ctx = smpl.make_ctx(sampler_cfg, pixel, sample_num, frame_lt_spp=True)
    from ...ops import differentials as rd

    want_diffs = rd.needs_diffs(scene) and integrator in (
        "path", "volpath", "whitted", "directlighting"
    )
    rays, p_film, diffs = _camera_rays(
        camera, sampler_cfg, ctx, pixel, want_diffs=want_diffs
    )
    L = radiance_fn(integrator, max_depth, rr_threshold, extra, mega,
                    regen=regen)(
        scene, sampler_cfg, ctx, rays.o, rays.d, accel, light_distrib,
        time=rays.time, diffs=diffs,
    )
    L = L * rays.weight[..., None]
    if grid_spp:
        fast = filmmod.add_samples_grid(film, filter_cfg, L, grid_spp, grid_rect)
        if fast is not None:
            return (fast, filmmod.to_rgb(fast)) if finalize else fast
    out = filmmod.add_samples(film, filter_cfg, p_film, L)
    # finalize fuses the film resolve into the SAME dispatch: a separate
    # to_rgb call costs a full ~30ms tunnel round trip (measured,
    # tools/tpu_cornell_profile.py: 129ms -> 99ms for Cornell 64spp)
    return (out, filmmod.to_rgb(out)) if finalize else out


def save_checkpoint(path, film: filmmod.Film, next_sample: int):
    """Write progressive-render state (film sums + sample counter).

    Checkpoint/resume has no reference equivalent (SURVEY §5: its nearest
    feature is SPPM's periodic image write); here spp batches are the
    checkpoint unit, so a killed render resumes exactly."""
    np.savez(
        path, rgb=np.asarray(film.rgb), weight=np.asarray(film.weight),
        splat=np.asarray(film.splat), next_sample=np.int64(next_sample),
    )


def load_checkpoint(path):
    """Returns (Film, next_sample) or None."""
    import os

    if not os.path.exists(path):
        return None
    z = np.load(path)
    film = filmmod.Film(
        jnp.asarray(z["rgb"]), jnp.asarray(z["weight"]), jnp.asarray(z["splat"])
    )
    return film, int(z["next_sample"])


def crop_pixel_rect(resolution, crop):
    """Fractional cropwindow -> integer pixel rect (px0, px1, py0, py1)
    (reference film.rs:224-262: pMin = ceil(res*crop0), >=1 px wide)."""
    w, h = resolution
    if crop is None:
        return 0, w, 0, h
    x0, x1, y0, y1 = crop
    px0 = int(np.ceil(w * x0))
    px1 = max(int(np.ceil(w * x1)), px0 + 1)
    py0 = int(np.ceil(h * y0))
    py1 = max(int(np.ceil(h * y1)), py0 + 1)
    return px0, px1, py0, py1


def render(
    scene: sa.Scene,
    camera: cam.Camera,
    cfg: RenderCfg,
    sampler_cfg: smpl.SamplerCfg,
    filter_cfg: Optional[filmmod.FilterCfg] = None,
    accel: Optional[bvhmod.LBVH] = None,
    max_lanes: int = 1 << 20,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 0,
    stats: Optional[dict] = None,
    crop=None,
    profile_dir: Optional[str] = None,
    mesh=None,
    regen: bool = True,
):
    """Single-device render: loops spp batches over the full pixel grid.

    Returns the resolved linear RGB image (H, W, 3).
    checkpoint_path/_every: progressive-state persistence (spp batches are
    the checkpoint unit).  stats: optional dict filled with counters
    (the reference's TODO'd nCameraRays-style stats, SURVEY §5).
    mesh: optional jax.sharding.Mesh — routes every integrator family
    through its multi-device path (parallel/mesh.py): the path family via
    render_sharded, bdpt/mlt/sppm via their chain/photon-sharded variants
    (the reference parallelizes all of them: integrator.rs:101,
    bdpt.rs:880, mlt.rs:496, sppm.rs:461).
    """
    import time as _time

    ex = cfg.extra or {}
    w, h = camera.resolution
    if crop is None:
        crop = cfg.crop  # scene-file film cropwindow
    px0, px1, py0, py1 = crop_pixel_rect((w, h), crop)
    cw, ch = px1 - px0, py1 - py0
    crop_rect = (px0, px1, py0, py1) if crop is not None else None

    def _exotic_stats(img, n_primary):
        if stats is not None:
            # forced host readback: block_until_ready does not reliably
            # wait through the axon tunnel (CLAUDE.md; measured impossible
            # 852 TFLOP/s) — same rule as bench.py's timed_render
            np.asarray(img)
            dt = max(_time.time() - t0x, 1e-9)
            stats.update(
                camera_rays=n_primary, resolution=(w, h), wall_s=dt,
                paths_per_s=n_primary / dt,
            )
        return img

    t0x = _time.time()
    if cfg.integrator == "bdpt":
        if mesh is not None:
            from ...parallel.mesh import render_bdpt_sharded as _bdpt_fn
        else:
            from .bdpt import render_bdpt as _bdpt_fn
        img = _bdpt_fn(
            scene, camera, cfg.spp, cfg.max_depth,
            sampler_cfg=sampler_cfg, accel=accel, crop_rect=crop_rect,
            **({"mesh": mesh} if mesh is not None else {}),
        )
        return _exotic_stats(img, cw * ch * cfg.spp)
    if cfg.integrator == "mlt":
        if mesh is not None:
            from ...parallel.mesh import render_mlt_sharded as _mlt_fn
        else:
            from .mlt import render_mlt as _mlt_fn
        mpp = int(ex.get("mutations_per_pixel", 16))
        img = _mlt_fn(
            scene, camera,
            mutations_per_pixel=mpp,
            max_depth=cfg.max_depth,
            n_chains=int(ex.get("chains", 4096)),
            n_bootstrap=int(ex.get("bootstrap_samples", 16384)),
            accel=accel,
            crop_rect=crop_rect,
            **({"mesh": mesh} if mesh is not None else {}),
        )
        return _exotic_stats(img, cw * ch * mpp)
    if cfg.integrator == "sppm":
        if mesh is not None:
            from ...parallel.mesh import render_sppm_sharded as _sppm_fn
        else:
            from .sppm import render_sppm as _sppm_fn
        n_it = int(ex.get("n_iterations", 16))
        img = _sppm_fn(
            scene, camera, sampler_cfg,
            n_iterations=n_it,
            photons_per_iter=int(ex.get("photons_per_iteration", 0)),
            max_depth=cfg.max_depth,
            initial_radius=float(ex.get("initial_radius", 0.0)),
            accel=accel,
            stats=stats,
            crop_rect=crop_rect,
            **({"mesh": mesh} if mesh is not None else {}),
        )
        return _exotic_stats(img, cw * ch * n_it)
    if mesh is not None:
        # path-family multi-device: shard lanes over the mesh + film psum
        from ...parallel.mesh import render_sharded

        img = render_sharded(
            scene, camera, cfg, sampler_cfg, filter_cfg=filter_cfg,
            mesh=mesh, accel=accel, crop=crop,
        )
        if stats is not None:
            np.asarray(img)
            dt = max(_time.time() - t0x, 1e-9)
            stats.update(
                camera_rays=cw * ch * cfg.spp, resolution=(w, h), wall_s=dt,
                paths_per_s=cw * ch * cfg.spp / dt,
            )
        return img
    extra_t = tuple(sorted(ex.items()))

    if filter_cfg is None:
        filter_cfg = filmmod.make_filter(filmmod.FILTER_BOX)
    grid_rect = (py0, ch, px0, cw)
    n_pix = cw * ch
    film = None  # first batch builds the zero film in-dispatch
    sample = 0
    if checkpoint_path is not None:
        ck = load_checkpoint(checkpoint_path)
        if ck is not None:
            film, sample = ck

    light_distrib = None
    if getattr(cfg, "light_strategy", "power") == "spatial" and scene.n_lights > 0:
        from .. import lightdistrib as ldist

        light_distrib = ldist.build_spatial(scene)

    # single-kernel Pallas bounce loop for statically-simple scenes
    # (host-side eligibility; None falls back to the general wavefront)
    mega = None
    if cfg.integrator == "path":
        from ...ops import pallas_path as pp

        mega = pp.mega_cfg(scene, accel, light_distrib)

    t0 = _time.time()
    prof = None
    if profile_dir is not None:
        # device-level tracing (the reference's ProfilePhase instrumentation
        # is TODO-stubbed, SURVEY §5; jax.profiler is our equivalent)
        prof = jax.profiler.trace(profile_dir)
        prof.__enter__()
    # accelerated scenes cap the per-dispatch wavefront: a BVH traversal
    # at 524k lanes is ~2s on chip and the whole bounce loop stacks ~12 of
    # them — dispatches beyond ~1 minute get the worker killed
    # (reproduced: BENCH_r02 rc=1 was a ~3 min single dispatch)
    lane_cap = max_lanes if accel is None else min(max_lanes, ACCEL_LANE_CAP)
    use_regen = False
    if regen and accel is not None and cfg.integrator == "path":
        # path regeneration streams many paths through a fixed-width lane
        # pool inside ONE dispatch (models/integrators/regen.py): the
        # dispatch budget is then total PATHS, not lane width
        from ...ops import differentials as rd
        from . import regen as regen_mod

        dpb = pathmod.DIMS_PER_BOUNCE + (
            pathmod.SSS_EXTRA_DIMS if scene.has_subsurface else 0
        )
        use_regen = (
            sampler_cfg.kind == smpl.SOBOL
            and cfg.max_depth > 0
            and 0 < dpb * cfg.max_depth <= 128
            and not rd.needs_diffs(scene)
        )
        if use_regen:
            lane_cap = min(max_lanes, REGEN_PATH_CAP)
    spp_per_batch = max(1, min(cfg.spp, lane_cap // n_pix))
    since_ck = 0
    img_final = None
    while sample < cfg.spp:
        nb = min(spp_per_batch, cfg.spp - sample)
        last = sample + nb >= cfg.spp and not (
            checkpoint_path is not None and checkpoint_every
        )
        out = render_batch(
            scene, accel, camera, cfg.integrator, cfg.max_depth, cfg.rr_threshold,
            sampler_cfg, film, filter_cfg, None, jnp.uint32(sample),
            light_distrib,
            grid_spp=nb, grid_rect=grid_rect, extra=extra_t, mega=mega,
            finalize=last, regen=use_regen,
        )
        if last:
            film, img_final = out
        else:
            film = out
        sample += nb
        since_ck += nb
        if checkpoint_path is not None and checkpoint_every and (
            since_ck >= checkpoint_every or sample >= cfg.spp
        ):
            jax.block_until_ready(film)
            save_checkpoint(checkpoint_path, film, sample)
            since_ck = 0
    img = img_final if img_final is not None else filmmod.to_rgb(film)
    if prof is not None:
        img.block_until_ready()
        prof.__exit__(None, None, None)
    if stats is not None:
        # forced host readback: block_until_ready does not reliably wait
        # through the axon tunnel (CLAUDE.md; measured impossible
        # 852 TFLOP/s) — scalar sum avoids the jittery full-image transfer
        float(jnp.sum(img))
        dt = max(_time.time() - t0, 1e-9)
        stats.update(
            camera_rays=n_pix * cfg.spp,
            spp=cfg.spp,
            resolution=(w, h),
            wall_s=dt,
            paths_per_s=n_pix * cfg.spp / dt,
            max_ray_casts=n_pix * cfg.spp * (cfg.max_depth + 1) * 2,
        )
    return img
