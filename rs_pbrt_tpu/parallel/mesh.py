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
    regen: bool = False,
):
    """Data-parallel render over the mesh's 'd' axis.

    regen: enable per-shard wavefront path regeneration for accelerated
    scenes (models/integrators/regen.py) — each device streams its lane
    shard through a 16k-lane pool.  Forward rendering only (AD callers
    like diff/grad.grad_loss keep it False: the regeneration while_loop
    is not reverse-differentiable).

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
        L = rdr.radiance_fn(cfg.integrator, cfg.max_depth, cfg.rr_threshold,
                            mega=mega, regen=regen)(
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


def _get_shard_map():
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    return shard_map


def _shard_map_norep(mesh, in_specs, out_specs):
    """shard_map decorator with the static replication check disabled.

    The exotic-integrator workers produce replicated outputs through
    psum + deterministic replicated recomputation (all_gather'd visible
    points, radius state), which the varying-manual-axes inference cannot
    prove; the device-count-invariance tests validate it empirically."""
    import inspect

    sm = _get_shard_map()
    kw = dict(mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    try:
        names = inspect.signature(sm).parameters
    except (TypeError, ValueError):
        names = {}
    flag = "check_vma" if "check_vma" in names else "check_rep"
    return partial(sm, **kw, **{flag: False})


def _pad_to_devices(arr, n_dev, fill):
    """Pad leading dim to a device multiple with a sentinel fill value."""
    n = arr.shape[0]
    pad = (-n) % n_dev
    if pad:
        filler = jnp.full((pad,) + arr.shape[1:], fill, arr.dtype)
        arr = jnp.concatenate([arr, filler])
    return arr


def render_bdpt_sharded(
    scene: sa.Scene,
    camera: cam.Camera,
    spp: int,
    max_depth: int = 5,
    sampler_cfg=None,
    mesh: Optional[Mesh] = None,
    accel=None,
    max_lanes: int = 1 << 18,
    crop_rect=None,
):
    """Multi-device BDPT: (pixel x sample) lanes sharded over the mesh,
    per-device partial films (filter samples + t=1 light-tracing splats)
    psum-reduced.

    The reference parallelizes BDPT over its tile queue with RwLock'd
    cross-tile splats (bdpt.rs:880-1059, :1038); here every device splats
    into its own full-res film and the splat buffers are psum'd with the
    rgb/weight planes — deterministic, no locks (VERDICT r4 missing #1)."""
    from ..models.integrators import bdpt as bdptmod
    from ..models.integrators.path import PathCfg

    if mesh is None:
        mesh = make_mesh()
    axes = tuple(mesh.axis_names)
    n_dev = mesh.devices.size
    if sampler_cfg is None:
        sampler_cfg = smpl.make_sampler(smpl.RANDOM, spp, camera.resolution)
    w, h = camera.resolution
    px0, px1, py0, py1 = crop_rect if crop_rect is not None else (0, w, 0, h)
    n_pix = (px1 - px0) * (py1 - py0)
    xs = jnp.arange(px0, px1, dtype=jnp.int32)
    ys = jnp.arange(py0, py1, dtype=jnp.int32)
    pixels = jnp.stack(
        [jnp.tile(xs, py1 - py0), jnp.repeat(ys, px1 - px0)], axis=-1
    )
    pixels = _pad_to_devices(pixels, n_dev, -1)
    n_lane_pix = pixels.shape[0]
    fcfg = filmmod.make_filter(filmmod.FILTER_BOX)
    pcfg = PathCfg(max_depth, 1.0)
    if accel is not None:
        max_lanes = min(max_lanes, rdr.ACCEL_LANE_CAP // 2)

    @jax.jit
    @partial(
        _get_shard_map(), mesh=mesh, in_specs=(P(axes), P(axes), P()),
        out_specs=P(),
    )
    def worker(pix_shard, snum_shard, scene):
        ctx = smpl.make_ctx(sampler_cfg, pix_shard, snum_shard)
        u_film = smpl.get_2d(sampler_cfg, ctx, 0)
        p_film = pix_shard.astype(jnp.float32) + u_film
        L, sp, sl = bdptmod.radiance_and_splats(
            scene, camera, pcfg, sampler_cfg, ctx, p_film, accel
        )
        # sentinel padding lanes contribute nothing (pixel = -1)
        valid = jnp.all(pix_shard >= 0, axis=-1)
        L = jnp.where(valid[..., None], L, 0.0)
        p_film = jnp.where(valid[..., None], p_film, -10.0)
        g = sp.shape[0] // valid.shape[0]
        valid_g = jnp.tile(valid[:, None], (g, 1))
        sl = jnp.where(valid_g, sl, 0.0)
        sp = jnp.where(valid_g, sp, -10.0)
        partial_film = filmmod.add_samples(
            filmmod.make_film((w, h)), fcfg, p_film, L
        )
        partial_film = filmmod.add_splats(partial_film, sp, sl)
        return filmmod.Film(
            jax.lax.psum(partial_film.rgb, axes),
            jax.lax.psum(partial_film.weight, axes),
            jax.lax.psum(partial_film.splat, axes),
        )

    spp_per_batch = max(1, min(spp, max_lanes // max(n_pix, 1)))
    film = filmmod.make_film((w, h))
    sample = 0
    while sample < spp:
        nb = min(spp_per_batch, spp - sample)
        pix = jnp.tile(pixels, (nb, 1))
        snums = jnp.repeat(
            jnp.arange(sample, sample + nb, dtype=jnp.uint32), n_lane_pix
        )
        batch = worker(pix, snums, scene)
        film = filmmod.Film(
            film.rgb + batch.rgb, film.weight + batch.weight,
            film.splat + batch.splat,
        )
        sample += nb
    img = filmmod.to_rgb(film, splat_scale=1.0 / spp)
    if crop_rect is not None:
        img = jnp.zeros_like(img).at[py0:py1, px0:px1].set(
            img[py0:py1, px0:px1]
        )
    return img


def _device_linear_index(mesh: Mesh):
    """Linear device index inside shard_map, row-major over mesh axes."""
    idx = 0
    for ax in mesh.axis_names:
        idx = idx * mesh.shape[ax] + jax.lax.axis_index(ax)
    return idx


def render_sppm_sharded(
    scene: sa.Scene,
    camera: cam.Camera,
    sampler_cfg,
    n_iterations: int = 16,
    photons_per_iter: int = 0,
    max_depth: int = 5,
    initial_radius: float = 0.0,
    mesh: Optional[Mesh] = None,
    accel=None,
    seed: int = 0,
    stats: dict = None,
    crop_rect=None,
):
    """Multi-device SPPM (VERDICT r4 missing #1): per iteration, the
    camera pass is sharded over pixels (each device traces its shard and
    the visible points are all_gather'd), the grid build is replicated
    (deterministic, cheap), the photon pass is sharded by photon-index
    range (the stateless counter RNG makes device d's chunk identical to
    that slice of one big pass), and the per-device phi/m partials are
    psum'd BEFORE the radius/tau update — the reference's chunked photon
    pass + AtomicFloat phi accumulation (sppm.rs:461-475, :625-627)
    without atomics.

    Same math as models/integrators/sppm.render_sppm: _camera_pass,
    _build_grid, _photon_pass, _update_state are reused verbatim."""
    from ..models.integrators import sppm as sp

    if mesh is None:
        mesh = make_mesh()
    axes = tuple(mesh.axis_names)
    n_dev = mesh.devices.size
    w, h = camera.resolution
    px0, px1, py0, py1 = crop_rect if crop_rect is not None else (0, w, 0, h)
    cw, ch = px1 - px0, py1 - py0
    n_pix = cw * ch
    if photons_per_iter <= 0:
        photons_per_iter = n_pix
    # photon count padded to a device multiple (chunks must be equal)
    ph_shard = -(-photons_per_iter // n_dev)
    photons_per_iter = ph_shard * n_dev
    if initial_radius <= 0.0:
        initial_radius = float(scene.world_radius) * 2.0 / max(w, h)
    light_dist = sp._light_select_dist(scene)

    xs = jnp.arange(px0, px1, dtype=jnp.int32)
    ys = jnp.arange(py0, py1, dtype=jnp.int32)
    pixels = jnp.stack([jnp.tile(xs, ch), jnp.repeat(ys, cw)], axis=-1)
    pixels = _pad_to_devices(pixels, n_dev, -1)
    p_pad = pixels.shape[0]

    state = sp.SPPMState(
        jnp.full(p_pad, initial_radius, jnp.float32),
        jnp.zeros((p_pad, 3), jnp.float32),
        jnp.zeros(p_pad, jnp.float32),
        jnp.zeros((p_pad, 3), jnp.float32),
    )

    from .. import models

    cammod = models.cameras

    @jax.jit
    @_shard_map_norep(
        mesh, in_specs=(P(axes), P(), P(), P()), out_specs=(P(), P(), P())
    )
    def one_iteration(pix_shard, scene, state, it_num):
        n_px = pix_shard.shape[0]
        lane_ok = jnp.all(pix_shard >= 0, axis=-1)
        ctx = smpl.make_ctx(
            sampler_cfg, pix_shard, jnp.full(n_px, it_num, jnp.uint32)
        )
        u_film = smpl.get_2d(sampler_cfg, ctx, 0)
        p_film = pix_shard.astype(jnp.float32) + u_film
        rays = cammod.generate_rays(
            camera, p_film, smpl.get_2d(sampler_cfg, ctx, 3),
            smpl.get_1d(sampler_cfg, ctx, 2),
        )
        # barrier between ray-gen and the camera pass: the XLA:TPU
        # compiler SIGILLs on the fused program (tools/tpu_sppm_bisect3.py)
        ro, rd = jax.lax.optimization_barrier((rays.o, rays.d))
        vps_shard, ld_shard = sp._camera_pass(
            scene, sampler_cfg, ctx, ro, rd, max_depth, light_dist,
            accel,
        )
        # sentinel padding lanes hold no visible point, deposit nothing
        vps_shard = vps_shard._replace(valid=vps_shard.valid & lane_ok)
        ld_shard = jnp.where(lane_ok[..., None], ld_shard, 0.0)
        # visible points are global state: gather shards (tiled, in
        # axis-index order = original pixel order)
        vps = jax.tree.map(
            lambda x: jax.lax.all_gather(x, axes, axis=0, tiled=True),
            vps_shard,
        )
        ld_inc = jax.lax.all_gather(ld_shard, axes, axis=0, tiled=True)
        grid = sp._build_grid(vps, state.radius, shuffle=it_num)
        di = _device_linear_index(mesh)
        phi, mcount = sp._photon_pass(
            scene, vps, grid, state.radius, ph_shard, max_depth, it_num,
            light_dist, accel, seed,
            idx0=di.astype(jnp.uint32) * jnp.uint32(ph_shard),
        )
        # chunked-photon partials -> one deterministic reduction (the
        # reference's AtomicFloat phi, sppm.rs:625-627)
        phi = jax.lax.psum(phi, axes)
        mcount = jax.lax.psum(mcount, axes)
        new_state = sp._update_state(state, vps, ld_inc, phi, mcount)
        return new_state, grid.overflow, grid.res

    total_overflow = 0
    last_res = 0
    for i in range(n_iterations):
        state, overflow, res = one_iteration(
            pixels, scene, state, jnp.uint32(i)
        )
        total_overflow += int(overflow)
        last_res = int(res)
    if stats is not None:
        stats["grid_bucket_overflow"] = total_overflow
        stats["grid_res_last"] = last_res

    state = jax.tree.map(lambda x: x[:n_pix], state)
    return sp._resolve(state, n_iterations, photons_per_iter, (w, h), crop_rect)


def render_mlt_sharded(
    scene: sa.Scene,
    camera: cam.Camera,
    mutations_per_pixel: int = 16,
    max_depth: int = 5,
    n_chains: int = 4096,
    n_bootstrap: int = 16384,
    mesh: Optional[Mesh] = None,
    accel=None,
    seed: int = 7,
    depth_stratified: bool = False,
    crop_rect=None,
):
    """Multi-device PSSMLT: Markov chains sharded over the mesh (the
    reference distributes chains over rayon, mlt.rs:496-570), per-device
    splat films psum'd per mutation chunk.

    The bootstrap runs unsharded (cheap, and every device count seeds the
    SAME chains).  Mutation randomness is PER-CHAIN counter-based
    (fold_in(chain_key, step)) rather than one stream per step, so the
    proposals are independent of the device layout — the determinism
    sanitizer (SURVEY §5) applies across device counts up to float
    reassociation in the splat psum."""
    from ..models.integrators import mlt as mltmod
    from ..models.integrators.path import PathCfg

    if mesh is None:
        mesh = make_mesh()
    axes = tuple(mesh.axis_names)
    n_dev = mesh.devices.size
    w, h = camera.resolution
    px0, px1, py0, py1 = crop_rect if crop_rect is not None else (0, w, 0, h)
    crop_area = (px1 - px0) * (py1 - py0)
    pcfg = PathCfg(max_depth, 1.0)
    cfg_s = smpl.make_sampler(smpl.RANDOM, 1, camera.resolution)
    n_pss = mltmod.n_pss_for_depth(max_depth, scene.has_media)
    # chain count rounded UP to a device multiple (chains are a sampling
    # knob, not semantics; the reference's nChains=1000 default is equally
    # arbitrary, mlt.rs)
    n_chains = -(-n_chains // n_dev) * n_dev
    key = jax.random.PRNGKey(seed)

    b, pss_cur, cur_eval, key = mltmod._bootstrap_chains(
        scene, camera, pcfg, cfg_s, accel, depth_stratified, crop_rect,
        n_bootstrap, n_chains, n_pss, max_depth, key,
    )
    lum_c, pf_c, L_c, sp_c, sl_c = cur_eval
    n_groups = sp_c.shape[0] // n_chains

    key, kc = jax.random.split(key)
    chain_keys = jax.vmap(lambda i: jax.random.fold_in(kc, i))(
        jnp.arange(n_chains, dtype=jnp.uint32)
    )

    n_mut = max(1, (crop_area * mutations_per_pixel) // n_chains)
    accel_scene = accel is not None and getattr(accel, "tri", None) is not None
    # same wall-time chunk budget as render_mlt (mutations run sequentially
    # inside the dispatch; n_chains/n_dev lanes wide per device)
    mut_chunk = (
        max(1, (mltmod.MLT_CHUNK_BUDGET if hasattr(mltmod, "MLT_CHUNK_BUDGET")
                else 1 << 16) // max(n_chains // n_dev, 1))
        if accel_scene else n_mut
    )

    # group-stacked splat arrays reshaped (G, n_chains, .) so the CHAIN
    # axis shards; flattened back per shard inside the worker
    sp_c = sp_c.reshape(n_groups, n_chains, 2)
    sl_c = sl_c.reshape(n_groups, n_chains, 3)

    spec_eval = (P(axes), P(axes), P(axes), P(None, *axes), P(None, *axes))
    chunk_fns = {}

    def get_chunk_fn(k):
        # one compiled shard_map per distinct chunk length (at most two:
        # the steady chunk and the ragged tail)
        if k in chunk_fns:
            return chunk_fns[k]

        @jax.jit
        @_shard_map_norep(
            mesh, in_specs=(P(axes), spec_eval, P(axes), P()),
            out_specs=(P(axes), spec_eval, P()),
        )
        def run_chunk(pss, cur_eval, keys_shard, m0):
            lum, pf, L, sp_g, sl_g = cur_eval
            nc = pss.shape[0]
            ce = (lum, pf, L, sp_g.reshape(-1, 2), sl_g.reshape(-1, 3))
            film0 = filmmod.make_film((w, h))

            def body(m, carry):
                pss, ce, film = carry
                kk = jax.vmap(jax.random.fold_in)(
                    keys_shard, jnp.full(nc, m, jnp.uint32)
                )
                ks = jax.vmap(lambda q: jax.random.split(q, 4))(kk)
                uniforms = (
                    jax.vmap(lambda q: jax.random.uniform(q, ()))(ks[:, 0]),
                    jax.vmap(lambda q: jax.random.uniform(q, (n_pss,)))(ks[:, 1]),
                    jax.vmap(lambda q: jax.random.normal(q, (n_pss,)))(ks[:, 2]),
                    jax.vmap(lambda q: jax.random.uniform(q, ()))(ks[:, 3]),
                )
                pss, ce, film = mltmod._mutation_step(
                    scene, camera, pcfg, cfg_s, accel, depth_stratified,
                    crop_rect, pss, ce, film, uniforms,
                )
                return pss, ce, film

            pss, ce, film = jax.lax.fori_loop(
                m0, m0 + k, body, (pss, ce, film0)
            )
            lum, pf, L, sp_f, sl_f = ce
            out_eval = (lum, pf, L, sp_f.reshape(n_groups, nc, 2),
                        sl_f.reshape(n_groups, nc, 3))
            # per-device splat partials -> one reduction (the reference's
            # RwLock'd film.add_splat, mlt.rs:542-548)
            return pss, out_eval, jax.lax.psum(film.splat, axes)

        chunk_fns[k] = run_chunk
        return run_chunk

    cur_eval = (lum_c, pf_c, L_c, sp_c, sl_c)
    splat = jnp.zeros((h, w, 3), jnp.float32)
    done = 0
    while done < n_mut:
        k = int(min(mut_chunk, n_mut - done))
        pss_cur, cur_eval, sp_add = get_chunk_fn(k)(
            pss_cur, cur_eval, chain_keys, jnp.uint32(done)
        )
        splat = splat + sp_add
        done += k

    total_splats = n_mut * n_chains
    scale = float(b) * crop_area / total_splats
    img = splat * scale
    if crop_rect is not None:
        img = jnp.zeros_like(img).at[py0:py1, px0:px1].set(
            img[py0:py1, px0:px1]
        )
    return img
