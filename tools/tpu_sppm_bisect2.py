"""Round-5 SPPM SIGILL bisect #2: the SPLIT jits (cam_j / grid_j / phot_j
/ upd_j exactly as render_sppm's chunked path builds them) still SIGILL
the remote compiler on caustic_only at the REAL 200x200 resolution, while
round-4's bisect compiled the bare sub-passes at P=4096.  Compile each
split jit at the real shapes to find the offender, then shrink."""

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
    P = int(sys.argv[2]) if len(sys.argv) > 2 else 200 * 200
    max_depth = 5

    scene, camera, cfg, scfg, fcfg, _ = load_pbrt(f"assets/scenes/{fname}", {})
    accel = build_accel(scene)
    w, h = camera.resolution
    light_dist = sp._light_select_dist(scene)
    xs, ys = np.meshgrid(np.arange(w, dtype=np.int32), np.arange(h, dtype=np.int32))
    pixels = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1))[:P]
    P = int(pixels.shape[0])
    print(f"scene={fname} res={w}x{h} P={P}", flush=True)

    def try_compile(name, fn, *args):
        t0 = time.time()
        try:
            jax.jit(fn).lower(*args).compile()
            print(f"{name}: OK ({time.time()-t0:.0f}s)", flush=True)
            return True
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines()[0][:200]
            print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)
            return False

    def cam_pass(scene, px, it_num):
        n_px = px.shape[0]
        ctx = smpl.make_ctx(scfg, px, jnp.full(n_px, it_num, jnp.uint32))
        u_film = smpl.get_2d(scfg, ctx, 0)
        p_film = px.astype(jnp.float32) + u_film
        rays = cam.generate_rays(
            camera, p_film, smpl.get_2d(scfg, ctx, 3), smpl.get_1d(scfg, ctx, 2)
        )
        return sp._camera_pass(
            scene, scfg, ctx, rays.o, rays.d, max_depth, light_dist, accel
        )

    ok = try_compile("cam_j", cam_pass, scene, pixels, jnp.uint32(0))
    if not ok:
        # shrink P to find the threshold
        for p_try in (1 << 14, 1 << 13, 1 << 12):
            try_compile(f"cam_j P={p_try}", cam_pass, scene, pixels[:p_try],
                        jnp.uint32(0))
        return 1
    vps, ld = jax.jit(cam_pass)(scene, pixels, jnp.uint32(0))
    radius = jnp.full(P, 0.05, jnp.float32)
    try_compile("grid_j", sp._build_grid, vps, radius)
    grid = jax.jit(sp._build_grid)(vps, radius)
    try_compile(
        "phot_j",
        lambda scene, vps, grid, radius, it_num, idx0: sp._photon_pass(
            scene, vps, grid, radius, P, max_depth, it_num, light_dist,
            accel, 0, idx0=idx0,
        ),
        scene, vps, grid, radius, jnp.uint32(0), jnp.uint32(0),
    )
    try_compile("upd_j", sp._update_state,
                sp.SPPMState(radius, jnp.zeros((P, 3)), jnp.zeros(P),
                             jnp.zeros((P, 3))),
                vps, ld, jnp.zeros((P, 3)), jnp.zeros(P, jnp.int32))
    return 0


if __name__ == "__main__":
    sys.exit(main())
