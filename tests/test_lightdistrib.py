"""Spatial light distribution tests (reference core/lightdistrib.rs)."""

import pytest
import numpy as np
import jax.numpy as jnp

from rs_pbrt_tpu.models import lightdistrib as ld
from rs_pbrt_tpu.models import cameras as cam
from rs_pbrt_tpu.models import samplers as smpl
from rs_pbrt_tpu.models.integrators import render as rdr
from rs_pbrt_tpu.scene.builder import SceneBuilder
from rs_pbrt_tpu.utils import transform as tr


def _two_light_scene():
    b = SceneBuilder()
    m = b.add_matte(kd=(0.6, 0.6, 0.6))
    V = np.array([[-6, 0, -6], [6, 0, -6], [6, 0, 6], [-6, 0, 6]], np.float32)
    F = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    b.add_triangle_mesh(F, V, material=m)
    b.add_point_light(p=(-5.0, 1.0, 0.0), I=(20, 20, 20))
    b.add_point_light(p=(5.0, 1.0, 0.0), I=(20, 20, 20))
    return b.finalize()


class TestSpatialDistrib:
    def test_voxels_prefer_near_light(self):
        scene = _two_light_scene()
        sd = ld.build_spatial(scene, max_voxels=8, n_samples=32)
        # near light 0 (x=-5): weight of light 0 dominates; symmetric at +5
        pts = jnp.asarray([[-5.0, 0.1, 0.0], [5.0, 0.1, 0.0]], jnp.float32)
        d = ld.lookup(sd, pts)
        f = np.asarray(d.func)
        assert f[0, 0] > 3.0 * f[0, 1], f
        assert f[1, 1] > 3.0 * f[1, 0], f

    def test_distribution_rows_normalized(self):
        scene = _two_light_scene()
        sd = ld.build_spatial(scene, max_voxels=6, n_samples=16)
        cdf = np.asarray(sd.cdf)
        np.testing.assert_allclose(cdf[:, -1], 1.0, atol=1e-5)
        assert np.all(np.diff(cdf, axis=-1) >= -1e-6)

    @pytest.mark.slow
    def test_spatial_matches_power_in_expectation(self):
        """Light-selection strategy must not change the rendered mean
        (only the variance) — reference lightdistrib semantics."""
        scene = _two_light_scene()
        res = (16, 16)
        camera = cam.make_perspective(
            tr.look_at((0.0, 4.0, 8.0), (0.0, 0.0, 0.0), (0, 1, 0)), res, fov=60.0
        )
        scfg = smpl.make_sampler(smpl.SOBOL, 32, res)
        img_p = np.asarray(rdr.render(
            scene, camera, rdr.RenderCfg("path", 32, 2, 1.0, "power"), scfg))
        img_s = np.asarray(rdr.render(
            scene, camera, rdr.RenderCfg("path", 32, 2, 1.0, "spatial"), scfg))
        assert np.all(np.isfinite(img_s))
        # same estimator mean; MC noise at 32spp direct lighting is small
        np.testing.assert_allclose(img_s.mean(), img_p.mean(), rtol=0.05)
        # per-pixel only differs by selection-pdf variance
        np.testing.assert_allclose(img_s, img_p, atol=0.3)
