"""Ganesha-scale procedural scene (scene/bigscene.py) — geometry sanity
and render smoke at reduced subdivision (the bench runs n=8 -> 1.31M tris;
tests use n=4/5 for speed, same code path)."""

import numpy as np
import pytest

from rs_pbrt_tpu.models import samplers as smpl
from rs_pbrt_tpu.models.integrators import render as rdr
from rs_pbrt_tpu.ops.scene_intersect import build_accel
from rs_pbrt_tpu.scene import bigscene


def test_icosphere_counts_and_manifold():
    v, f = bigscene.icosphere(3)
    assert f.shape[0] == 20 * 4**3
    # closed manifold: every edge shared by exactly 2 faces
    e = np.sort(np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]]), axis=1)
    _, counts = np.unique(e, axis=0, return_counts=True)
    assert (counts == 2).all()
    # unit sphere before displacement
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, rtol=1e-6)


@pytest.mark.slow
def test_statue_scene_renders():
    scene, camera = bigscene.statue_scene(resolution=(24, 24), subdivisions=4)
    assert scene.n_tris == 20 * 4**4 + 4
    accel = build_accel(scene, kind="bvh")
    cfg = rdr.RenderCfg("path", spp=2, max_depth=3, rr_threshold=1.0)
    scfg = smpl.make_sampler(smpl.SOBOL, 2, (24, 24))
    img = np.asarray(rdr.render(scene, camera, cfg, scfg, accel=accel))
    assert np.isfinite(img).all()
    assert img.mean() > 0.005  # lit
    # statue silhouette darker sky: corners (no geometry) are black
    assert img[0, 0].max() == 0.0
