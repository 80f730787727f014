"""Cornell throughput breakdown: whole render vs radiance-only vs film,
to reconcile the ledger (43.9M claimed) with measured (31-33M).
Forced-readback timing."""

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

    def t_of(fn, reps=3):
        fn()
        ts = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        return min(ts)

    # (a) full render via the driver
    def full():
        img = rdr.render(scene, camera, cfg, scfg, max_lanes=1 << 23)
        np.asarray(img)

    dt = t_of(full)
    print(f"full render: {dt*1e3:.0f}ms = {paths/dt/1e6:.1f}M paths/s", flush=True)

    # (b) radiance only on the same 4.2M lanes
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

    def rb():
        _ = float(rad_only(scene, pix, snums))

    dt = t_of(rb)
    print(f"radiance-only: {dt*1e3:.0f}ms = {paths/dt/1e6:.1f}M paths/s", flush=True)

    # (c) radiance without megakernel (general wavefront)
    @jax.jit
    def rad_nomega(scene, pix, snums):
        ctx = smpl.make_ctx(scfg, pix, snums, frame_lt_spp=True)
        u_film, u_time, u_lens = smpl.get_camera_dims(scfg, ctx, pix)
        p_film = pix.astype(jnp.float32) + u_film
        rays = cam.generate_rays(camera, p_film, u_lens, u_time)
        L = pathmod.radiance(scene, pcfg, scfg, ctx, rays.o, rays.d, None,
                             mega=None)
        return jnp.sum(L)

    def rn():
        _ = float(rad_nomega(scene, pix, snums))

    dt = t_of(rn)
    print(f"radiance no-mega: {dt*1e3:.0f}ms = {paths/dt/1e6:.1f}M paths/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
