"""Bump-mapping test (reference core/material.rs bump :118)."""

import pytest
import numpy as np
import jax.numpy as jnp

from rs_pbrt_tpu.models import cameras as cam
from rs_pbrt_tpu.models import samplers as smpl
from rs_pbrt_tpu.models.integrators import render as rdr
from rs_pbrt_tpu.ops import texture as tx
from rs_pbrt_tpu.scene.builder import SceneBuilder
from rs_pbrt_tpu.scene import arrays as sa
from rs_pbrt_tpu.utils import transform as tr


def _plane_scene(bump_img=None):
    b = SceneBuilder()
    m = b.add_matte(kd=(0.6, 0.6, 0.6))
    if bump_img is not None:
        tid = b.add_texture(tx.TEX_IMAGEMAP, {tx.TP_GAMMA_SCALE: 1.0}, image=bump_img)
        b.set_material_texture(m, sa.TEX_SLOT_BUMP, tid)
    V = np.array([[-2, 0, -2], [2, 0, -2], [2, 0, 2], [-2, 0, 2]], np.float32)
    F = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    b.add_triangle_mesh(F, V, uvs=uv, material=m)
    b.add_point_light(p=(3.0, 1.0, 0.0), I=(20, 20, 20))  # grazing light
    return b.finalize()


def _render(scene):
    res = (24, 24)
    camera = cam.make_perspective(
        tr.look_at((0.0, 3.0, 3.0), (0.0, 0.0, 0.0), (0, 1, 0)), res, fov=50.0
    )
    cfg = rdr.RenderCfg("path", spp=4, max_depth=1, rr_threshold=1.0)
    scfg = smpl.make_sampler(smpl.SOBOL, 4, res)
    return np.asarray(rdr.render(scene, camera, cfg, scfg))


class TestBump:
    @pytest.mark.slow
    def test_bump_changes_shading(self):
        """A ramped displacement under grazing light shifts the shading;
        a constant displacement leaves it untouched."""
        yy = np.linspace(0, 1, 32)
        ramp = np.tile((0.3 * np.sin(yy * 20))[:, None, None], (1, 32, 3)).astype(np.float32)
        img_flat = _render(_plane_scene(None))
        img_bump = _render(_plane_scene(ramp))
        img_const = _render(_plane_scene(np.full((32, 32, 3), 0.5, np.float32)))
        assert np.all(np.isfinite(img_bump))
        # constant displacement: gradient is zero -> same image
        np.testing.assert_allclose(img_const, img_flat, atol=5e-3)
        # ripple displacement: visibly different shading
        assert np.abs(img_bump - img_flat).max() > 0.02
