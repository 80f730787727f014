"""Bisect the SPPM+hair TPU compiler SIGILL (round 4): AOT-compile each
SPPM sub-pass for the caustic_hair scene separately and report which one
kills the remote tpu_compile_helper."""

import sys
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    print("devices:", jax.devices(), flush=True)
    (jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()

    from rs_pbrt_tpu.models import cameras as cam
    from rs_pbrt_tpu.models import samplers as smpl
    from rs_pbrt_tpu.models.integrators import sppm as sp
    from rs_pbrt_tpu.ops.scene_intersect import build_accel
    from rs_pbrt_tpu.scene.api import load_pbrt

    scene, camera, cfg, scfg, fcfg, _ = load_pbrt(
        "assets/scenes/caustic_hair.pbrt", {}
    )
    accel = build_accel(scene)
    w, h = camera.resolution
    P = 4096  # small wavefront: compile crash is shape-independent
    pixels = jnp.stack(
        [jnp.arange(P, dtype=jnp.int32) % w, jnp.arange(P, dtype=jnp.int32) // w],
        -1,
    )
    light_dist = sp._light_select_dist(scene)
    ctx = smpl.make_ctx(scfg, pixels, jnp.zeros(P, jnp.uint32))
    u_film = smpl.get_2d(scfg, ctx, 0)
    p_film = pixels.astype(jnp.float32) + u_film
    rays = cam.generate_rays(
        camera, p_film, smpl.get_2d(scfg, ctx, 3), smpl.get_1d(scfg, ctx, 2)
    )

    def try_compile(name, fn, *args):
        t0 = time.time()
        try:
            jax.jit(fn).lower(*args).compile()
            print(f"{name}: OK ({time.time()-t0:.0f}s)", flush=True)
            return True
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines()[0][:160]
            print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)
            return False

    ok = try_compile(
        "camera_pass",
        lambda o, d: sp._camera_pass(
            scene, scfg, ctx, o, d, 5, light_dist, accel
        ),
        rays.o, rays.d,
    )
    vps = None
    radius = jnp.full(P, 0.05, jnp.float32)
    if ok:
        vps, _ = jax.jit(
            lambda o, d: sp._camera_pass(scene, scfg, ctx, o, d, 5, light_dist, accel)
        )(rays.o, rays.d)
        try_compile("build_grid", lambda v, r: sp._build_grid(v, r), vps, radius)
        grid = jax.jit(sp._build_grid)(vps, radius)
        try_compile(
            "photon_pass",
            lambda v, g, r: sp._photon_pass(
                scene, v, g, r, P, 5, 0, light_dist, accel, 0
            ),
            vps, grid, radius,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())


def main2():
    """Stage 2: full-size shapes + the fused one-iteration program."""
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    (jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()

    from rs_pbrt_tpu.models import cameras as cam
    from rs_pbrt_tpu.models import samplers as smpl
    from rs_pbrt_tpu.models.integrators import sppm as sp
    from rs_pbrt_tpu.ops.scene_intersect import build_accel
    from rs_pbrt_tpu.scene.api import load_pbrt

    scene, camera, cfg, scfg, fcfg, _ = load_pbrt(
        "assets/scenes/caustic_hair.pbrt", {}
    )
    accel = build_accel(scene)
    w, h = camera.resolution
    P = w * h  # 40000: real bench size
    pixels = jnp.stack(
        [jnp.arange(P, dtype=jnp.int32) % w, jnp.arange(P, dtype=jnp.int32) // w],
        -1,
    )
    light_dist = sp._light_select_dist(scene)

    def cam_pass(o, d, ctx):
        return sp._camera_pass(scene, scfg, ctx, o, d, 5, light_dist, accel)

    def one_iter(px, it_num, radius):
        n_px = px.shape[0]
        ctx = smpl.make_ctx(scfg, px, jnp.full(n_px, it_num, jnp.uint32))
        u_film = smpl.get_2d(scfg, ctx, 0)
        p_film = px.astype(jnp.float32) + u_film
        rays = cam.generate_rays(
            camera, p_film, smpl.get_2d(scfg, ctx, 3), smpl.get_1d(scfg, ctx, 2)
        )
        vps, ld_inc = sp._camera_pass(
            scene, scfg, ctx, rays.o, rays.d, 5, light_dist, accel
        )
        grid = sp._build_grid(vps, radius)
        phi, mcount = sp._photon_pass(
            scene, vps, grid, radius, n_px, 5, jnp.uint32(0), light_dist, accel, 0
        )
        return phi.sum() + mcount.sum() + ld_inc.sum()

    import time as _t

    radius = jnp.full(P, 0.05, jnp.float32)
    for name, fn, args in (
        ("one_iter P=40000", one_iter, (pixels, jnp.uint32(0), radius)),
    ):
        t0 = _t.time()
        try:
            jax.jit(fn).lower(*args).compile()
            print(f"{name}: OK ({_t.time()-t0:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL {type(e).__name__}: {str(e).splitlines()[0][:160]}",
                  flush=True)
    return 0


def main3():
    """Stage 3: add the radius/tau update to the fused program (the one
    piece stage 2 omitted) on the HAIRLESS scene (both scenes SIGILL in
    the real bench, so hair is exonerated)."""
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    (jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()

    from rs_pbrt_tpu.models import cameras as cam
    from rs_pbrt_tpu.models import samplers as smpl
    from rs_pbrt_tpu.models.integrators import sppm as sp
    from rs_pbrt_tpu.ops.scene_intersect import build_accel
    from rs_pbrt_tpu.scene.api import load_pbrt
    import time as _t

    scene, camera, cfg, scfg, fcfg, _ = load_pbrt(
        "assets/scenes/caustic_only.pbrt", {}
    )
    accel = build_accel(scene)
    w, h = camera.resolution
    P = w * h
    pixels = jnp.stack(
        [jnp.arange(P, dtype=jnp.int32) % w, jnp.arange(P, dtype=jnp.int32) // w],
        -1,
    )
    light_dist = sp._light_select_dist(scene)
    state0 = sp.SPPMState(
        jnp.full(P, 0.05, jnp.float32),
        jnp.zeros((P, 3), jnp.float32),
        jnp.zeros(P, jnp.float32),
        jnp.zeros((P, 3), jnp.float32),
    )

    def one_iter_full(px, it_num, state):
        n_px = px.shape[0]
        ctx = smpl.make_ctx(scfg, px, jnp.full(n_px, it_num, jnp.uint32))
        u_film = smpl.get_2d(scfg, ctx, 0)
        p_film = px.astype(jnp.float32) + u_film
        rays = cam.generate_rays(
            camera, p_film, smpl.get_2d(scfg, ctx, 3), smpl.get_1d(scfg, ctx, 2)
        )
        vps, ld_inc = sp._camera_pass(
            scene, scfg, ctx, rays.o, rays.d, 5, light_dist, accel
        )
        grid = sp._build_grid(vps, state.radius)
        phi, mcount = sp._photon_pass(
            scene, vps, grid, state.radius, n_px, 5, jnp.uint32(0), light_dist,
            accel, 0
        )
        # inline update (sppm.render_sppm update closure math)
        mf = mcount.astype(jnp.float32)
        has = mf > 0
        n_new = state.n + sp.GAMMA * mf
        r_new = jnp.where(
            has, state.radius * jnp.sqrt(jnp.maximum(n_new, 1e-12) /
                                         jnp.maximum(state.n + mf, 1e-12)),
            state.radius,
        )
        tau_new = jnp.where(
            has[:, None],
            (state.tau + vps.beta * phi) * (r_new / jnp.maximum(state.radius, 1e-12))[:, None] ** 2,
            state.tau,
        )
        return sp.SPPMState(r_new, state.ld + ld_inc, jnp.where(has, n_new, state.n), tau_new)

    t0 = _t.time()
    try:
        jax.jit(one_iter_full).lower(pixels, jnp.uint32(0), state0).compile()
        print(f"one_iter+update P={P}: OK ({_t.time()-t0:.0f}s)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"one_iter+update: FAIL {type(e).__name__}: "
              f"{str(e).splitlines()[0][:160]}", flush=True)
    return 0
