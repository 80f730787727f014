"""On-chip bisect of the BVH stream-traversal lane-count fault (VERDICT r2
Missing #1).  Runs the raw rope traversal at growing lane counts on the
statue scene, printing/flushing after each config so a fault at count N
still leaves the smaller results on stdout.
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    x = jnp.ones((256, 256))
    t0 = time.time()
    (x @ x).block_until_ready()
    print(f"warm-up {time.time()-t0:.1f}s", flush=True)

    from rs_pbrt_tpu.ops import bvh as bvhmod
    from rs_pbrt_tpu.ops import bvh_native
    from rs_pbrt_tpu.scene import bigscene

    t0 = time.time()
    scene, camera = bigscene.statue_scene(subdivisions=8)
    print(f"scene build {time.time()-t0:.1f}s tris={scene.n_tris}", flush=True)
    p0 = np.asarray(scene.tri_p0)
    p1 = np.asarray(scene.tri_p1)
    p2 = np.asarray(scene.tri_p2)
    bmin = np.minimum(np.minimum(p0, p1), p2)
    bmax = np.maximum(np.maximum(p0, p1), p2)
    t0 = time.time()
    assert bvh_native.native_available(), "native builder must be available"
    lb = bvh_native.build_lbvh_native(bmin, bmax, tris=(p0, p1, p2))
    stream = jax.device_put(lb.stream16)
    jax.block_until_ready(stream)
    print(f"native build+pack+upload {time.time()-t0:.1f}s rows={stream.shape[0]}", flush=True)

    # camera rays for the full 256x256 grid, replicated per sample to reach
    # the target lane count (same distribution as the real bench workload)
    from rs_pbrt_tpu.models import cameras as cam

    w, h = camera.resolution
    xs = np.arange(w, dtype=np.float32)
    ys = np.arange(h, dtype=np.float32)
    px = np.stack([np.tile(xs, h), np.repeat(ys, w)], -1) + 0.5  # (65536,2)

    trav = jax.jit(
        lambda o, d, t: bvhmod.bvh_intersect_tris_stream(o, d, t, stream)
    )

    for lanes in (1 << 14, 1 << 16, 1 << 17, 1 << 18, 1 << 19):
        reps = max(1, lanes // (w * h))
        sub = px[: min(lanes, w * h)]
        pf = np.tile(sub, (reps, 1))[:lanes]
        # jitter sample positions slightly per rep so rays differ
        rng = np.random.RandomState(0)
        pf = pf + rng.uniform(-0.5, 0.5, pf.shape).astype(np.float32)
        rays = cam.generate_rays(
            camera,
            jnp.asarray(pf),
            jnp.zeros((lanes, 2), jnp.float32),
            jnp.zeros((lanes,), jnp.float32),
        )
        o = jax.block_until_ready(rays.o)
        d = jax.block_until_ready(rays.d)
        t_max = jnp.full((lanes,), 1e30, jnp.float32)
        try:
            t0 = time.time()
            hit = trav(o, d, t_max)
            jax.block_until_ready(hit)
            tc = time.time() - t0
            t0 = time.time()
            hit = trav(o, d, t_max)
            jax.block_until_ready(hit)
            dt = time.time() - t0
            nh = int(np.asarray(hit.valid).sum())
            print(
                f"lanes={lanes}: OK compile+run={tc:.2f}s run={dt*1e3:.1f}ms "
                f"({lanes/dt/1e6:.1f}M rays/s) hits={nh}",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"lanes={lanes}: FAULT {type(e).__name__}: {e}", flush=True)
            break
    return 0


if __name__ == "__main__":
    sys.exit(main())
