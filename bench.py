#!/usr/bin/env python
"""Headline benchmarks on one chip — one JSON line per BASELINE config:
{"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference renderer's only published throughput signal is the
Cornell progress bar — 1024 16x16 tiles at 1828.38 tiles/s for 500x500 @
8spp on a 28-core CPU (reference docs/source/getting_started.rst:163-174),
i.e. ~3.57M camera paths/s.  vs_baseline is our paths/s over that (for
configs where the reference publishes nothing, this overstates the
reference — conservative for us).

Configs (BASELINE.json):
  1. Cornell path 256x256 @ 64spp
  2. directlighting + whitted, sphere/quad area lights, 256x256 @ 64spp
  3. Ganesha-scale statue (5.24M tris), 1024x1024 @ 64spp, SAH-BVH12
     (+ the 1.31M-tri 256x256 row kept for round-over-round comparison)
  4. SSS dragonette: volpath + BSSRDF @ 512spp (assets/scenes/)
  5. SPPM caustic glass + hair curves (assets/scenes/caustic_hair.pbrt)

Every config is try/except-isolated so one fault cannot zero the whole
artifact; scene+accel builds are disk-cached (host numpy assembly is
minutes at statue scale).  Timing forces host materialization of the
image: block_until_ready through the axon tunnel does not reliably wait
(measured 852 TFLOP/s "matmuls" without it, tools/tpu_probe2.py).
"""

import json
import os
import pickle
import subprocess
import sys
import time

import numpy as np

CACHE = "/tmp/rs_pbrt_bench_statue.pkl"
CACHE_BIG = "/tmp/rs_pbrt_bench_statue9.pkl"
BASELINE = 3.57e6  # reference 28-core CPU camera paths/s
LOCAL_JSON = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "BENCH_LOCAL.json")

# Round-4 post-mortem: a crashing config (SPPM SIGILLed the remote XLA:TPU
# compiler) flooded stdout/stderr with crash dumps and the driver's
# 2000-char tail lost EVERY earlier row (BENCH_r04.json parsed:null).
# Three defenses now:
#   1. every row is appended to BENCH_LOCAL.json the moment it's produced;
#   2. all rows are RE-PRINTED as the very last stdout lines of the run;
#   3. crash-prone configs run in a SUBPROCESS so compiler crashes cannot
#      take down the parent or interleave spew with its stdout.
ROWS = []


def emit(metric, value, unit, vs, **extra):
    row = {"metric": metric, "value": value, "unit": unit, "vs_baseline": vs}
    row.update(extra)
    ROWS.append(row)
    print(json.dumps(row), flush=True)
    if os.environ.get("BENCH_CHILD"):
        return  # parent appends to the file when it harvests our stdout
    try:
        with open(LOCAL_JSON, "a") as f:
            f.write(json.dumps(row) + "\n")
    except OSError:
        pass


def run_config_subprocess(name, timeout=4500):
    """Run one bench config in a child process; harvest its JSON rows.

    The child prints rows to stdout (one JSON object per line, same emit
    format).  A child crash — including an XLA compiler SIGILL that kills
    the process mid-compile — costs only that config's rows."""
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", name],
            capture_output=True, text=True, timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        print(f"{name} subprocess timed out", file=sys.stderr)
        return False
    got = False
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                row = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "metric" in row:
                ROWS.append(row)
                print(json.dumps(row), flush=True)
                try:
                    with open(LOCAL_JSON, "a") as f:
                        f.write(json.dumps(row) + "\n")
                except OSError:
                    pass
                got = True
    if not got:
        tail = (out.stderr or "")[-500:]
        print(f"{name} subprocess produced no rows (rc={out.returncode}); "
              f"stderr tail: {tail}", file=sys.stderr)
    return got


def timed_render(rdr, *args, **kw):
    import jax.numpy as jnp

    img = rdr.render(*args, **kw)
    # forced completion via SCALAR readback: float(sum) drains the device
    # queue (block_until_ready lies through the tunnel) without paying the
    # tunnel's full-image transfer, which probe11 measured at a JITTERY
    # 33-97ms per call on a 768KB image (tools/tpu_probe11.py: the same
    # Cornell dispatch is a stable 106ms with sum-readback vs 139-251ms
    # with np.asarray) — the r3->r4 "30% Cornell regression" was entirely
    # this transfer noise, not compute.
    float(jnp.sum(img))
    return img


def best_of(fn, reps=3):
    # run-to-run chip variance measured at ~15% on Cornell; report best
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return min(ts)


def bench_cornell():
    from rs_pbrt_tpu.models import samplers as smpl
    from rs_pbrt_tpu.models.integrators import render as rdr
    from rs_pbrt_tpu.scene import presets

    res = (256, 256)
    spp = 64
    scene, camera = presets.cornell_box(resolution=res)
    cfg = rdr.RenderCfg("path", spp=spp, max_depth=5, rr_threshold=1.0)
    scfg = smpl.make_sampler(smpl.SOBOL, spp, camera.resolution)

    # one 4.2M-lane batch covers the full 64 spp: a single dispatch, no
    # film round-trip between batches (feeding a jitted output back as an
    # input recompiles for its device-chosen layout).  Warm-up compiles the
    # exact timed signature.
    lanes = 1 << 23
    timed_render(rdr, scene, camera, cfg, scfg, max_lanes=lanes)
    dt = best_of(lambda: timed_render(rdr, scene, camera, cfg, scfg, max_lanes=lanes))
    paths = res[0] * res[1] * spp
    emit(
        "camera_paths/s/chip (Cornell 256x256 path 64spp sobol)",
        round(paths / dt, 1), "paths/s", round(paths / dt / BASELINE, 3),
    )


def bench_direct():
    # config 2: directlighting + whitted over sphere/quad area lights
    from rs_pbrt_tpu.models import samplers as smpl
    from rs_pbrt_tpu.models.integrators import render as rdr
    from rs_pbrt_tpu.scene import presets

    res = (256, 256)
    spp = 64
    scene, camera = presets.spheres_direct(resolution=res)
    scfg = smpl.make_sampler(smpl.SOBOL, spp, camera.resolution)
    lanes = 1 << 23
    for integ in ("directlighting", "whitted"):
        cfg = rdr.RenderCfg(integ, spp=spp, max_depth=5, rr_threshold=1.0)
        timed_render(rdr, scene, camera, cfg, scfg, max_lanes=lanes)
        dt = best_of(
            lambda: timed_render(rdr, scene, camera, cfg, scfg, max_lanes=lanes),
            reps=2,
        )
        paths = res[0] * res[1] * spp
        emit(
            f"camera_paths/s/chip (spheres {integ} 256x256 64spp, "
            "sphere+quad area lights)",
            round(paths / dt, 1), "paths/s", round(paths / dt / BASELINE, 3),
        )


def _statue_cached(cache, subdivisions, res, spp):
    import jax
    import jax.numpy as jnp

    from rs_pbrt_tpu.ops.bvh import ACCEL_VERSION, LBVH
    from rs_pbrt_tpu.scene.arrays import Scene

    # content key: field names alone miss layout/builder changes (ADVICE r3)
    schema = (Scene._fields, LBVH._fields, ACCEL_VERSION, subdivisions, res, spp)
    try:
        with open(cache, "rb") as f:
            host = pickle.load(f)
        if host.get("schema") != schema:
            raise EOFError("stale cache schema")
        scene = jax.tree.map(
            lambda a: jnp.asarray(a) if isinstance(a, np.ndarray) else a, host["scene"]
        )
        camera = host["camera"]
        accel = jax.tree.map(
            lambda a: jnp.asarray(a) if isinstance(a, np.ndarray) else a, host["accel"]
        )
        return scene, camera, accel, host.get("build_s", -1.0)
    except Exception:  # noqa: BLE001 — stale caches can fail INSIDE
        # pickle.load (old NamedTuple schemas), not just at the schema check
        pass
    from rs_pbrt_tpu.ops.scene_intersect import build_accel
    from rs_pbrt_tpu.scene import bigscene

    scene, camera = bigscene.statue_scene(resolution=res, subdivisions=subdivisions)
    t0 = time.time()
    accel = build_accel(scene, kind="bvh")
    build_s = time.time() - t0
    tonp = lambda t: jax.tree.map(
        lambda a: np.asarray(a) if hasattr(a, "shape") else a, t
    )
    try:
        with open(cache, "wb") as f:
            pickle.dump(
                {"scene": tonp(scene), "camera": camera, "accel": tonp(accel),
                 "schema": schema, "build_s": build_s}, f,
                protocol=pickle.HIGHEST_PROTOCOL,
            )
    except OSError:
        pass
    return scene, camera, accel, build_s


def bench_statue():
    # 1.31M-triangle displaced icosphere, kept small for round-over-round
    # comparability (BENCH_r02/r03 track this exact config)
    from rs_pbrt_tpu.models import samplers as smpl
    from rs_pbrt_tpu.models.integrators import render as rdr

    res2 = (256, 256)
    spp2 = 8
    scene, camera, accel, _ = _statue_cached(CACHE, 8, res2, spp2)
    cfg2 = rdr.RenderCfg("path", spp=spp2, max_depth=5, rr_threshold=1.0)
    scfg2 = smpl.make_sampler(smpl.SOBOL, spp2, res2)
    lanes = 1 << 23
    timed_render(rdr, scene, camera, cfg2, scfg2, accel=accel, max_lanes=lanes)
    dt2 = best_of(
        lambda: timed_render(rdr, scene, camera, cfg2, scfg2, accel=accel, max_lanes=lanes),
        reps=2,
    )
    paths2 = res2[0] * res2[1] * spp2
    emit(
        "camera_paths/s/chip (1.31M-tri statue 256x256 path 8spp, SAH-BVH12+regen)",
        round(paths2 / dt2, 1), "paths/s", round(paths2 / dt2 / BASELINE, 3),
    )


def bench_statue_full():
    # config 3 at reference scale (README.md:53-61: 4.3M-tri Ganesha):
    # subdiv-9 displaced icosphere = 5.24M tris, 1024x1024 @ 64spp.
    # ONE timed full render (67.1M paths is minutes, not a best-of rep).
    from rs_pbrt_tpu.models import samplers as smpl
    from rs_pbrt_tpu.models.integrators import render as rdr

    res = (1024, 1024)
    spp = 64
    scene, camera, accel, build_s = _statue_cached(CACHE_BIG, 9, res, spp)
    cfg = rdr.RenderCfg("path", spp=spp, max_depth=5, rr_threshold=1.0)
    scfg = smpl.make_sampler(smpl.SOBOL, spp, res)
    lanes = 1 << 23
    # warm-up on a 1-spp slice compiles the timed signature (same lane
    # shape: the lane cap, not spp, sets the wavefront size)
    cfg1 = rdr.RenderCfg("path", spp=1, max_depth=5, rr_threshold=1.0)
    timed_render(rdr, scene, camera, cfg1, scfg, accel=accel, max_lanes=lanes)
    t0 = time.time()
    timed_render(rdr, scene, camera, cfg, scfg, accel=accel, max_lanes=lanes)
    dt = time.time() - t0
    paths = res[0] * res[1] * spp
    emit(
        "camera_paths/s/chip (5.24M-tri statue 1024x1024 path 64spp, SAH-BVH12+regen)",
        round(paths / dt, 1), "paths/s", round(paths / dt / BASELINE, 3),
        sah_build_s=round(build_s, 1), full_render_s=round(dt, 1),
    )


def _load_scene(path, overrides=None):
    from rs_pbrt_tpu.ops.scene_intersect import build_accel
    from rs_pbrt_tpu.scene.api import load_pbrt

    scene, camera, cfg, scfg, fcfg, _ = load_pbrt(path, overrides or {})
    accel = build_accel(scene, kind=getattr(cfg, "accelerator", "bvh"))
    return scene, camera, cfg, scfg, fcfg, accel


def bench_sss():
    # config 4: volpath + BSSRDF subsurface showcase @ 512spp
    from rs_pbrt_tpu.models.integrators import render as rdr

    scene, camera, cfg, scfg, fcfg, accel = _load_scene(
        os.path.join(os.path.dirname(__file__), "assets/scenes/sss_dragonette.pbrt"),
        {"samples": 512},
    )
    w, h = camera.resolution
    lanes = 1 << 22
    # warm-up: 8spp compiles the same batch signature
    cfg8 = cfg._replace(spp=8)
    timed_render(rdr, scene, camera, cfg8, scfg, fcfg, accel=accel, max_lanes=lanes)
    t0 = time.time()
    timed_render(rdr, scene, camera, cfg, scfg, fcfg, accel=accel, max_lanes=lanes)
    dt = time.time() - t0
    paths = w * h * cfg.spp
    emit(
        f"camera_paths/s/chip (SSS dragonette volpath+BSSRDF {w}x{h} {cfg.spp}spp)",
        round(paths / dt, 1), "paths/s", round(paths / dt / BASELINE, 3),
    )


def bench_sppm_hair():
    # config 5: SPPM caustic glass + hair curves; photon passes dominate.
    # Throughput unit = (camera rays + photon launches) / s.
    # The hair+SPPM program SIGILLs the XLA:TPU remote compiler (observed
    # r4: "tpu_compile_helper subprocess exit signal SIGILL"); on that
    # failure, fall back to the hairless caustic variant so config 5
    # still gets a ledger row.
    from rs_pbrt_tpu.models.integrators import render as rdr

    for fname, label in (
        ("caustic_hair.pbrt", "caustic glass + hair"),
        ("caustic_only.pbrt", "caustic glass, hair dropped: TPU compiler SIGILL"),
    ):
        try:
            scene, camera, cfg, scfg, fcfg, accel = _load_scene(
                os.path.join(os.path.dirname(__file__), "assets/scenes", fname),
            )
            w, h = camera.resolution
            ex = dict(cfg.extra or {})
            n_it = int(ex.get("n_iterations", 16))
            # warm-up: 2 iterations compile every sub-jit INCLUDING the
            # adapted max_vps=64 deposit (the grid-overflow doubling fires
            # on iteration 0 of this scene) so the timed run is all
            # execution, no compile
            cfg2 = cfg._replace(extra={**ex, "n_iterations": 2})
            timed_render(rdr, scene, camera, cfg2, scfg, fcfg, accel=accel)
            t0 = time.time()
            timed_render(rdr, scene, camera, cfg, scfg, fcfg, accel=accel)
            dt = time.time() - t0
            work = w * h * n_it * 2  # camera pass + photon pass per iteration
            emit(
                f"sppm_rays/s/chip ({label} {w}x{h}, {n_it} iterations)",
                round(work / dt, 1), "rays/s", round(work / dt / BASELINE, 3),
            )
            return
        except Exception as e:  # noqa: BLE001
            print(f"sppm[{fname}] failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
    raise RuntimeError("all sppm variants failed")


BENCHES = [
    ("cornell", bench_cornell),
    ("direct", bench_direct),
    ("statue", bench_statue),
    ("sss", bench_sss),
    ("statue_full", bench_statue_full),
    ("sppm", bench_sppm_hair),
]
# configs that have crashed the XLA:TPU compiler/worker — always isolated
SUBPROCESS_CONFIGS = {"sppm"}


def _warm_device():
    import jax.numpy as jnp

    x = jnp.ones((256, 256))
    (x @ x).block_until_ready()


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--child":
        # child mode: run exactly one config in-process, rows to stdout
        os.environ["BENCH_CHILD"] = "1"
        _warm_device()
        dict(BENCHES)[sys.argv[2]]()
        return 0

    only = set(sys.argv[1:])
    try:
        os.remove(LOCAL_JSON)
    except OSError:
        pass
    _warm_device()
    rc = 0
    for name, fn in BENCHES:
        if only and name not in only:
            continue
        if name in SUBPROCESS_CONFIGS:
            run_config_subprocess(name)
        else:
            try:
                fn()
            except Exception as e:  # noqa: BLE001
                print(f"{name} bench failed: {type(e).__name__}: {e}",
                      file=sys.stderr)
                if name == "cornell":
                    rc = 1
        # re-print the accumulated rows after EVERY config, flagship last:
        # the driver parses the LAST JSON line, and an external timeout can
        # kill this process between configs (a slow later config must not
        # leave a non-flagship row as the stdout tail).
        _reemit_rows()
    # final act: the complete artifact as the last stdout lines, whatever
    # any config spewed before this point (BENCH_r04 post-mortem).
    _reemit_rows()
    return rc


def _reemit_rows():
    print("=== BENCH ROWS ===", flush=True)
    is_flagship = lambda r: r["metric"].startswith("camera_paths/s/chip (Cornell")
    for row in [r for r in ROWS if not is_flagship(r)] + \
               [r for r in ROWS if is_flagship(r)]:
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    sys.exit(main())
