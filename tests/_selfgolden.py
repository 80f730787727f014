"""Shared config for the self-regression goldens (tests/goldens/self/).

The reference ships renders only for its Cornell getting-started scene
(docs/source/getting_started.rst) — every other scene family there is a
README gallery image with no scene file.  For the showcase scenes WE ship
(assets/scenes/), the regression guard is therefore self-goldens: a
deterministic tiny-res CPU render committed once, re-rendered by the test
suite and compared.  They catch silent estimator/sampler/parser drift in
the families the Cornell golden cannot reach (BSSRDF volpath, SPPM photon
passes, curve shapes + hair BSDF).

Golden generation: python tools/gen_self_goldens.py  (re-run ONLY when an
intentional change alters these images; the generator double-renders to
prove determinism before overwriting).
"""

import os
import re

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
SCENES = os.path.join(HERE, "..", "assets", "scenes")
GOLD_DIR = os.path.join(HERE, "goldens", "self")

# name -> (scene file, resolution, spp or None=keep, extra text patches)
CONFIGS = {
    "sss_dragonette": ("sss_dragonette.pbrt", 48, 4, {}),
    "caustic_sppm": ("caustic_only.pbrt", 48, None,
                     {r'"integer numiterations" 16': '"integer numiterations" 4'}),
    "hair_patch": ("hair_patch.pbrt", 48, 4, {}),
}


def render_config(name):
    """Render one self-golden config at tiny res on the current backend."""
    from rs_pbrt_tpu.models.integrators import render as rdr
    from rs_pbrt_tpu.ops.scene_intersect import build_accel
    from rs_pbrt_tpu.scene.api import load_pbrt

    fname, res, spp, patches = CONFIGS[name]
    txt = open(os.path.join(SCENES, fname)).read()
    txt = re.sub(r'"integer xresolution" \d+', f'"integer xresolution" {res}', txt)
    txt = re.sub(r'"integer yresolution" \d+', f'"integer yresolution" {res}', txt)
    for old, new in patches.items():
        assert old in txt, f"{name}: patch target {old!r} missing"
        txt = txt.replace(old, new)
    tmp = f"/tmp/_selfgolden_{name}.pbrt"
    open(tmp, "w").write(txt)
    overrides = {"samples": spp} if spp else {}
    scene, camera, cfg, scfg, fcfg, _ = load_pbrt(tmp, overrides)
    accel = build_accel(scene, kind="bvh")
    img = rdr.render(scene, camera, cfg, scfg, fcfg, accel=accel)
    return np.asarray(img, np.float64)


def golden_path(name):
    return os.path.join(GOLD_DIR, f"{name}.npz")
