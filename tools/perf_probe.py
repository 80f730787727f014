#!/usr/bin/env python
"""Component-level timing probe for the headline bench config.

Times, on the live chip, the pieces that make up one 64spp Cornell render
(4.19M lanes): closest-hit sweep, any-hit sweep, sampler dim table, camera
ray-gen, film, and the full render — so optimization effort goes where the
milliseconds are.  Run: PYTHONPATH=/root/repo:/root/.axon_site python
tools/perf_probe.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=3, warm=2):
    for _ in range(warm):
        jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def main():
    x = jnp.ones((256, 256))
    (x @ x).block_until_ready()
    print("device:", jax.devices())

    from rs_pbrt_tpu.models import cameras as cam
    from rs_pbrt_tpu.models import samplers as smpl
    from rs_pbrt_tpu.models.integrators import path as pathmod
    from rs_pbrt_tpu.models.integrators import render as rdr
    from rs_pbrt_tpu.ops import pallas_intersect as pin
    from rs_pbrt_tpu.ops import scene_intersect as si
    from rs_pbrt_tpu.scene import presets

    res = (256, 256)
    spp = 64
    scene, camera = presets.cornell_box(resolution=res)
    n = res[0] * res[1] * spp
    print(f"lanes={n}  tris={int(scene.tri_p0.shape[0])}")

    rng = np.random.default_rng(0)
    o_np = rng.uniform(50, 500, (n, 3)).astype(np.float32)
    d_np = rng.normal(size=(n, 3)).astype(np.float32)
    d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
    o = jnp.asarray(o_np)
    d = jnp.asarray(d_np)
    tmax = jnp.full((n,), 3e38, jnp.float32)
    tris_packed = pin.pack_tris(scene.tri_p0, scene.tri_p1, scene.tri_p2)

    closest = jax.jit(
        lambda o, d, t: pin.pallas_intersect_tris(
            o, d, t, scene.tri_p0, scene.tri_p1, scene.tri_p2, tris_packed
        )
    )
    anyhit = jax.jit(
        lambda o, d, t: pin.pallas_intersect_tris_p(
            o, d, t, scene.tri_p0, scene.tri_p1, scene.tri_p2, tris_packed
        )
    )
    t_closest = timeit(closest, o, d, tmax)
    t_any = timeit(anyhit, o, d, tmax)
    print(f"closest sweep : {t_closest*1e3:8.2f} ms")
    print(f"any-hit sweep : {t_any*1e3:8.2f} ms")

    # full scene_intersect (sweep + hit record build)
    full_it = jax.jit(lambda o, d, t: si.scene_intersect(scene, o, d, t, None))
    t_it = timeit(full_it, o, d, tmax)
    print(f"scene_intersect (closest + hit record): {t_it*1e3:8.2f} ms")
    occ_it = jax.jit(lambda o, d, t: si.scene_intersect_p(scene, o, d, t, None))
    t_occ = timeit(occ_it, o, d, tmax)
    print(f"scene_intersect_p                     : {t_occ*1e3:8.2f} ms")

    # sampler: full bounce-dim table (what path.radiance hoists)
    scfg = smpl.make_sampler(smpl.SOBOL, spp, camera.resolution)
    xs, ys = np.meshgrid(np.arange(res[0], dtype=np.int32), np.arange(res[1], dtype=np.int32))
    pixels = np.stack([xs.ravel(), ys.ravel()], -1)
    pix = jnp.asarray(np.tile(pixels, (spp, 1)))
    snums = jnp.repeat(jnp.arange(spp, dtype=jnp.uint32), res[0] * res[1])
    dims_total = pathmod.DIMS_PER_BOUNCE * 5

    @jax.jit
    def sample_dims(pix, snums):
        ctx = smpl.make_ctx(scfg, pix, snums)
        return smpl.get_dims(scfg, ctx, pathmod.DIM_CAMERA, dims_total)

    t_dims = timeit(sample_dims, pix, snums)
    print(f"sobol dim table ({dims_total} dims)    : {t_dims*1e3:8.2f} ms")

    @jax.jit
    def raygen(pix, snums):
        ctx = smpl.make_ctx(scfg, pix, snums)
        u_film = smpl.get_2d(scfg, ctx, 0)
        p_film = pix.astype(jnp.float32) + u_film
        return cam.generate_rays(camera, p_film, smpl.get_2d(scfg, ctx, 3), smpl.get_1d(scfg, ctx, 2))

    t_rg = timeit(raygen, pix, snums)
    print(f"camera raygen + film dims             : {t_rg*1e3:8.2f} ms")

    # full radiance
    pcfg = pathmod.PathCfg(5, 1.0)

    @jax.jit
    def rad(pix, snums, o, d):
        ctx = smpl.make_ctx(scfg, pix, snums)
        return pathmod.radiance(scene, pcfg, scfg, ctx, o, d, None)

    rays = raygen(pix, snums)
    t_rad = timeit(rad, pix, snums, rays.o, rays.d, n=2, warm=1)
    print(f"path.radiance (5 bounces + emit)      : {t_rad*1e3:8.2f} ms")

    # full bench render
    cfg = rdr.RenderCfg("path", spp=spp, max_depth=5, rr_threshold=1.0)
    t_all = timeit(
        lambda: rdr.render(scene, camera, cfg, scfg, max_lanes=1 << 23), n=2, warm=1
    )
    print(f"full render                           : {t_all*1e3:8.2f} ms")
    ideal = 6 * t_it + 5 * t_occ
    print(f"[11 sweeps at measured cost = {ideal*1e3:.2f} ms -> "
          f"shading/sampling/misc = {(t_rad - ideal)*1e3:.2f} ms]")
    print(f"paths/s full render: {n / t_all / 1e6:.2f} M")


if __name__ == "__main__":
    main()
