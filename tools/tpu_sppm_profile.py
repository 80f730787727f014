"""SPPM per-phase timing on the caustic scene: camera pass vs grid build
vs photon pass vs update, and the photon pass split into transport vs
deposit (27 x max_vps bounded scan).  Decides where optimization effort
goes (round-5: the full config runs ~55s/iteration on-chip)."""

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
    scene, camera, cfg, scfg, fcfg, _ = load_pbrt(f"assets/scenes/{fname}", {})
    accel = build_accel(scene)
    w, h = camera.resolution
    P = w * h
    max_depth = 5
    light_dist = sp._light_select_dist(scene)
    xs, ys = np.meshgrid(np.arange(w, dtype=np.int32), np.arange(h, dtype=np.int32))
    pixels = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1))

    def t_of(name, fn, *args, reps=3):
        out = fn(*args)
        jax.tree.map(lambda x: float(jnp.sum(x)) if hasattr(x, "dtype") else x, out)
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = fn(*args)
            jax.tree.map(
                lambda x: float(jnp.sum(x)) if hasattr(x, "dtype") else x, out
            )
            ts.append(time.time() - t0)
        print(f"{name}: {min(ts)*1e3:.0f}ms (all {[f'{t*1e3:.0f}' for t in ts]})",
              flush=True)
        return out

    def cam_pass(scene, px, it_num):
        n_px = px.shape[0]
        ctx = smpl.make_ctx(scfg, px, jnp.full(n_px, it_num, jnp.uint32))
        u_film = smpl.get_2d(scfg, ctx, 0)
        p_film = px.astype(jnp.float32) + u_film
        rays = cam.generate_rays(
            camera, p_film, smpl.get_2d(scfg, ctx, 3), smpl.get_1d(scfg, ctx, 2)
        )
        ro, rd = jax.lax.optimization_barrier((rays.o, rays.d))
        return sp._camera_pass(scene, scfg, ctx, ro, rd, max_depth, light_dist, accel)

    cam_j = jax.jit(cam_pass)
    vps, ld = t_of("camera pass", cam_j, scene, pixels, jnp.uint32(0))
    radius = jnp.full(P, float(scene.world_radius) * 2.0 / max(w, h), jnp.float32)
    grid_j = jax.jit(lambda v, r: sp._build_grid(v, r, max_vps=64, shuffle=0))
    grid = t_of("grid build", grid_j, vps, radius)

    phot_j = jax.jit(lambda s, v, g, r: sp._photon_pass(
        s, v, g, r, P, max_depth, 0, light_dist, accel, 0, max_vps=64))
    t_of("photon pass (full)", phot_j, scene, vps, grid, radius)

    # transport-only photon pass: same walk, deposits skipped (max_vps=1
    # still deposits a bit; instead monkeypatch? cheap proxy: max_vps=1)
    phot1_j = jax.jit(lambda s, v, g, r: sp._photon_pass(
        s, v, g, r, P, max_depth, 0, light_dist, accel, 0, max_vps=1))
    t_of("photon pass (max_vps=1 ~ transport+27 deposits)", phot1_j,
         scene, vps, grid, radius)
    upd_j = jax.jit(sp._update_state)
    st = sp.SPPMState(radius, jnp.zeros((P, 3)), jnp.zeros(P), jnp.zeros((P, 3)))
    t_of("update", upd_j, st, vps, ld,
         jnp.zeros((P, 3)), jnp.zeros(P, jnp.float32))
    return 0


if __name__ == "__main__":
    sys.exit(main())
