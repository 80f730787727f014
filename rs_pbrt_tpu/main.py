"""Command-line renderer.

TPU-native replacement for reference src/bin/rs_pbrt.rs main() — the same
flag surface (--path, --integrator, --samples, --nthreads analogue is the
device count, --crop*) driving the .pbrt pipeline.

    python -m rs_pbrt_tpu.main --path scene.pbrt [--samples N]
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="rs_pbrt_tpu", description="Physically based rendering (PBR) on TPU"
    )
    p.add_argument("-p", "--path", required=True, help="path to the .pbrt file")
    p.add_argument(
        "-i", "--integrator", default=None,
        help="ao, directlighting, whitted, path, bdpt, mlt, sppm, volpath",
    )
    p.add_argument("-s", "--samples", type=int, default=0, help="pixel samples")
    p.add_argument("--cropx0", type=float, default=0.0)
    p.add_argument("--cropx1", type=float, default=1.0)
    p.add_argument("--cropy0", type=float, default=0.0)
    p.add_argument("--cropy1", type=float, default=1.0)
    p.add_argument("-o", "--out", default=None, help="override output filename")
    p.add_argument("--ndevices", type=int, default=0, help="0 = all devices")
    # .blend-only knobs (reference parse_blend_file.rs CLI -l / -c)
    p.add_argument("-l", "--light-scale", type=float, default=1.0,
                   help=".blend: scale all lamp emission")
    p.add_argument("-c", "--camera-name", default=None,
                   help=".blend: camera Object name to render from")
    args = p.parse_args(argv)

    import jax

    from rs_pbrt_tpu import __version__
    from rs_pbrt_tpu.io.image import write_png
    from rs_pbrt_tpu.models.integrators import render as rdr
    from rs_pbrt_tpu.scene.api import load_pbrt

    devices = jax.devices()
    print(f"rs_pbrt_tpu version {__version__} [Detected {len(devices)} device(s): "
          f"{devices[0].platform}]")
    print("Rust reference by Jan Douglas Bert Walter; "
          "based on C++ code by Matt Pharr, Greg Humphreys, and Wenzel Jakob.")

    overrides = {}
    if args.integrator:
        overrides["integrator"] = args.integrator
    if args.samples:
        overrides["samples"] = args.samples

    t0 = time.time()
    if str(args.path).endswith((".ass", ".blend")):
        # Arnold / Blender importers (reference examples/parse_ass_file.rs,
        # src/bin/parse_blend_file.rs) share the render pipeline
        from rs_pbrt_tpu.models import cameras as cammod
        from rs_pbrt_tpu.models import samplers as smplmod
        from rs_pbrt_tpu.ops import film as filmmod
        from rs_pbrt_tpu.utils import transform as trmod
        import numpy as np

        if str(args.path).endswith(".ass"):
            from rs_pbrt_tpu.io.assfile import load_ass as _load

            load_kw = {}
        else:
            from rs_pbrt_tpu.io.blendfile import load_blend as _load

            load_kw = dict(light_scale=args.light_scale,
                           camera_name=args.camera_name)

        builder, ci = _load(args.path, **load_kw)
        scene = builder.finalize()
        camera = cammod.make_perspective(
            trmod.from_matrix(np.asarray(ci["cam_to_world"], np.float32)),
            ci["resolution"], fov=ci["fov"],
            clipping_start=ci.get("clipping_start", 0.0),
        )
        cfg = rdr.RenderCfg(
            args.integrator or "path", args.samples or 8, 5, 1.0
        )
        sampler_cfg = smplmod.make_sampler(
            smplmod.SOBOL, cfg.spp, camera.resolution
        )
        filter_cfg = filmmod.make_filter(filmmod.FILTER_BOX)
        out_name = "pbrt.png"
    else:
        scene, camera, cfg, sampler_cfg, filter_cfg, out_name = load_pbrt(
            args.path, overrides
        )
    print(f"Parsed + built scene in {time.time() - t0:.2f}s: "
          f"{scene.n_tris} triangles, {scene.n_spheres} spheres, "
          f"{scene.n_lights} lights")
    print(f'Sampler spp {sampler_cfg.spp}; Integrator "{cfg.integrator}"')

    from rs_pbrt_tpu.ops.scene_intersect import build_accel

    accel = build_accel(scene, kind=getattr(cfg, "accelerator", "bvh"))

    n_dev = args.ndevices or len(devices)
    crop = None
    if (args.cropx0, args.cropx1, args.cropy0, args.cropy1) != (0.0, 1.0, 0.0, 1.0):
        crop = (args.cropx0, args.cropx1, args.cropy0, args.cropy1)
    t0 = time.time()
    # bdpt/mlt/sppm drive their own batch loops (light subpaths / chains /
    # photon passes) and do not shard over the lane mesh — route them
    # through render() at any device count (reference rs_pbrt.rs runs one
    # integrator loop regardless of --nthreads)
    if n_dev > 1 and cfg.integrator not in ("bdpt", "mlt", "sppm"):
        from rs_pbrt_tpu.parallel import mesh as pmesh

        mesh = pmesh.make_mesh(devices[:n_dev])
        img = pmesh.render_sharded(
            scene, camera, cfg, sampler_cfg, filter_cfg, mesh=mesh, accel=accel,
            crop=crop,
        )
    else:
        img = rdr.render(
            scene, camera, cfg, sampler_cfg, filter_cfg, accel=accel, crop=crop
        )
    jax.block_until_ready(img)
    dt = time.time() - t0
    w, h = camera.resolution
    print(f"Rendered {w}x{h} @ {cfg.spp}spp in {dt:.2f}s "
          f"({w * h * cfg.spp / dt / 1e6:.2f} Mpaths/s)")

    out = args.out or "pbrt.png"  # reference always writes pbrt.png (film.rs:481)
    write_png(out, img)
    print(f'Writing image "{out}" with bounds (0, 0) - ({w}, {h})')
    return 0


if __name__ == "__main__":
    sys.exit(main())
