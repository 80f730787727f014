"""SPPM SIGILL bisect #3: cam_j = jit(make_ctx + sampler dims +
generate_rays + _camera_pass) SIGILLs even at P=4096, while
jit(_camera_pass) alone compiles (bisect #1).  Split the preamble."""

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

    fname = sys.argv[1] if len(sys.argv) > 1 else "caustic_only.pbrt"
    P = 4096
    max_depth = 5
    scene, camera, cfg, scfg, fcfg, _ = load_pbrt(f"assets/scenes/{fname}", {})
    print("sampler kind:", scfg.kind, flush=True)
    accel = build_accel(scene)
    w, h = camera.resolution
    light_dist = sp._light_select_dist(scene)
    xs, ys = np.meshgrid(np.arange(w, dtype=np.int32), np.arange(h, dtype=np.int32))
    pixels = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1))[:P]

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

    def preamble(scene, px, it_num):
        n_px = px.shape[0]
        ctx = smpl.make_ctx(scfg, px, jnp.full(n_px, it_num, jnp.uint32))
        u_film = smpl.get_2d(scfg, ctx, 0)
        p_film = px.astype(jnp.float32) + u_film
        rays = cam.generate_rays(
            camera, p_film, smpl.get_2d(scfg, ctx, 3), smpl.get_1d(scfg, ctx, 2)
        )
        return rays.o, rays.d

    try_compile("preamble only", preamble, scene, pixels, jnp.uint32(0))

    def ctx_only(px, it_num):
        ctx = smpl.make_ctx(scfg, px, jnp.full(px.shape[0], it_num, jnp.uint32))
        return smpl.get_2d(scfg, ctx, 0)

    try_compile("make_ctx+get_2d only", ctx_only, pixels, jnp.uint32(0))

    # camera pass with rays as ARGUMENTS (the r4 bisect formulation)
    o = jnp.zeros((P, 3), jnp.float32)
    d = jnp.zeros((P, 3), jnp.float32) + jnp.asarray([0.0, 0.0, 1.0])
    ctx = smpl.make_ctx(scfg, pixels, jnp.zeros(P, jnp.uint32))
    try_compile(
        "_camera_pass only",
        lambda scene, o, d: sp._camera_pass(
            scene, scfg, ctx, o, d, max_depth, light_dist, accel
        ),
        scene, o, d,
    )

    # preamble + camera pass but ctx built OUTSIDE
    def half(scene, px, o_unused, it_num):
        n_px = px.shape[0]
        c2 = smpl.make_ctx(scfg, px, jnp.full(n_px, it_num, jnp.uint32))
        u_film = smpl.get_2d(scfg, c2, 0)
        p_film = px.astype(jnp.float32) + u_film
        rays = cam.generate_rays(
            camera, p_film, smpl.get_2d(scfg, c2, 3), smpl.get_1d(scfg, c2, 2)
        )
        return sp._camera_pass(
            scene, scfg, c2, rays.o, rays.d, max_depth, light_dist, accel
        )

    try_compile("preamble+_camera_pass", half, scene, pixels, o, jnp.uint32(0))
    return 0


if __name__ == "__main__":
    sys.exit(main())
