"""Round-5 probe: localize the Cornell full-vs-radiance gap (HEAD measured
~179ms full vs ~103ms radiance-only; r3 code on the same chip runs full in
~140ms).  Stages:
  A. full render via rdr.render (the bench path)
  B. render_batch with radiance stubbed to zeros -> pixel-build + film +
     finalize cost alone
  C. mega radiance alone (same lanes)
  D. render_batch WITHOUT finalize
All timings force host readback (block_until_ready lies through the
tunnel)."""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    (jnp.ones((256, 256)) @ jnp.ones((256, 256))).block_until_ready()

    from rs_pbrt_tpu.models import cameras as cam
    from rs_pbrt_tpu.models import samplers as smpl
    from rs_pbrt_tpu.models.integrators import path as pathmod
    from rs_pbrt_tpu.models.integrators import render as rdr
    from rs_pbrt_tpu.ops import film as filmmod
    from rs_pbrt_tpu.ops import pallas_path as pp
    from rs_pbrt_tpu.scene import presets

    res = (256, 256)
    spp = 64
    scene, camera = presets.cornell_box(resolution=res)
    cfg = rdr.RenderCfg("path", spp=spp, max_depth=5, rr_threshold=1.0)
    scfg = smpl.make_sampler(smpl.SOBOL, spp, camera.resolution)
    mega = pp.mega_cfg(scene, None, None)
    print("mega eligible:", mega is not None, flush=True)
    paths = res[0] * res[1] * spp

    def t_of(fn, reps=4):
        fn()
        ts = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        return min(ts), ts

    def report(name, fn, reps=4):
        dt, ts = t_of(fn, reps)
        print(f"{name}: {dt*1e3:.0f}ms = {paths/dt/1e6:.1f}M paths/s "
              f"(all: {[f'{t*1e3:.0f}' for t in ts]})", flush=True)
        return dt

    # A. full render
    report("A full render", lambda: np.asarray(
        rdr.render(scene, camera, cfg, scfg, max_lanes=1 << 23)))

    # B. render_batch with radiance stubbed to zeros
    real_radiance_fn = rdr.radiance_fn

    def zero_radiance_fn(integrator, max_depth, rr_threshold, extra, mega=None):
        return lambda scene, cfg_s, ctx, o, d, accel, ld=None, time=None, \
            diffs=None: o * 0.0

    rdr.radiance_fn = zero_radiance_fn
    try:
        grid_rect = (0, 256, 0, 256)

        def zb():
            out = rdr.render_batch(
                scene, None, camera, "path", 5, 1.0, scfg, None,
                filmmod.make_filter(filmmod.FILTER_BOX), None,
                jnp.uint32(0), None, grid_spp=spp, grid_rect=grid_rect,
                extra=(), mega=mega, finalize=True,
            )
            np.asarray(out[1])

        report("B film-only (zero radiance)", zb)
    finally:
        rdr.radiance_fn = real_radiance_fn

    # C. mega radiance alone
    n_pix = res[0] * res[1]
    xs = jnp.arange(res[0], dtype=jnp.int32)
    ys = jnp.arange(res[1], dtype=jnp.int32)
    pixels = jnp.stack([jnp.tile(xs, res[1]), jnp.repeat(ys, res[0])], -1)
    pix = jnp.tile(pixels, (spp, 1))
    snums = jnp.repeat(jnp.arange(spp, dtype=jnp.uint32), n_pix)
    pcfg = pathmod.PathCfg(5, 1.0)

    @jax.jit
    def rad_only(scene, pix, snums):
        ctx = smpl.make_ctx(scfg, pix, snums, frame_lt_spp=True)
        u_film, u_time, u_lens = smpl.get_camera_dims(scfg, ctx, pix)
        p_film = pix.astype(jnp.float32) + u_film
        rays = cam.generate_rays(camera, p_film, u_lens, u_time)
        L = pathmod.radiance(scene, pcfg, scfg, ctx, rays.o, rays.d, None,
                             mega=mega)
        return jnp.sum(L)

    report("C mega radiance only", lambda: float(rad_only(scene, pix, snums)))

    # D. render_batch real radiance, no finalize
    def rb_nofin():
        out = rdr.render_batch(
            scene, None, camera, "path", 5, 1.0, scfg, None,
            filmmod.make_filter(filmmod.FILTER_BOX), None,
            jnp.uint32(0), None, grid_spp=spp, grid_rect=(0, 256, 0, 256),
            extra=(), mega=mega, finalize=False,
        )
        np.asarray(out.rgb[0, 0])

    report("D render_batch no-finalize", rb_nofin)

    # E. render_batch real radiance, finalize (render() minus driver)
    def rb_fin():
        out = rdr.render_batch(
            scene, None, camera, "path", 5, 1.0, scfg, None,
            filmmod.make_filter(filmmod.FILTER_BOX), None,
            jnp.uint32(0), None, grid_spp=spp, grid_rect=(0, 256, 0, 256),
            extra=(), mega=mega, finalize=True,
        )
        np.asarray(out[1])

    report("E render_batch finalize", rb_fin)
    return 0


if __name__ == "__main__":
    sys.exit(main())
