"""End-to-end render tests: analytic oracles + furnace + Cornell sanity."""

import jax.numpy as jnp
import numpy as np
import pytest

from rs_pbrt_tpu.models import cameras as cam
from rs_pbrt_tpu.models import samplers as smpl
from rs_pbrt_tpu.models.integrators import render as rdr
from rs_pbrt_tpu.scene import presets
from rs_pbrt_tpu.scene.builder import SceneBuilder
from rs_pbrt_tpu.utils import transform as tr


def _render(scene, camera, spp=16, max_depth=5, sampler=smpl.SOBOL):
    cfg = rdr.RenderCfg("path", spp=spp, max_depth=max_depth, rr_threshold=1.0)
    scfg = smpl.make_sampler(sampler, spp, camera.resolution)
    return np.asarray(rdr.render(scene, camera, cfg, scfg))


class TestAnalytic:
    def test_point_light_direct(self):
        """Matte floor + point light: closed-form direct illumination."""
        b = SceneBuilder()
        kd = 0.6
        m = b.add_matte(kd=(kd,) * 3)
        # floor z=0 plane (y up), large quad
        pos = [[-100, 0, -100], [100, 0, -100], [100, 0, 100], [-100, 0, 100]]
        b.add_triangle_mesh([[0, 1, 2], [0, 2, 3]], pos, material=m)
        I = 100.0
        b.add_point_light(p=(0.0, 10.0, 0.0), I=(I,) * 3)
        scene = b.finalize()
        camera = cam.make_perspective(
            tr.look_at([0, 5, -10], [0, 0, 0], [0, 1, 0]), (33, 33), fov=40.0
        )
        img = _render(scene, camera, spp=16, max_depth=1)
        # center pixel looks at origin: cos = 1, d = 10
        # L = kd/pi * I / d^2 * cos
        want = kd / np.pi * I / 100.0
        got = img[16, 16]
        np.testing.assert_allclose(got, want, rtol=0.05)

    def test_distant_light_direct(self):
        b = SceneBuilder()
        kd = 0.8
        m = b.add_matte(kd=(kd,) * 3)
        pos = [[-100, 0, -100], [100, 0, -100], [100, 0, 100], [-100, 0, 100]]
        b.add_triangle_mesh([[0, 1, 2], [0, 2, 3]], pos, material=m)
        L = 2.0
        b.add_distant_light(from_p=(0, 1, 0), to=(0, 0, 0), L=(L,) * 3)
        scene = b.finalize()
        camera = cam.make_perspective(
            tr.look_at([0, 5, -10], [0, 0, 0], [0, 1, 0]), (17, 17), fov=40.0
        )
        img = _render(scene, camera, spp=8, max_depth=1)
        want = kd / np.pi * L  # normal incidence
        np.testing.assert_allclose(img[8, 8], want, rtol=0.05)


class TestFurnace:
    @pytest.mark.slow
    def test_matte_sphere_furnace(self):
        scene, camera = presets.furnace_sphere(resolution=(17, 17), albedo=0.5)
        img = _render(scene, camera, spp=32, max_depth=8)
        np.testing.assert_allclose(img[8, 8], 0.5, rtol=0.05)
        np.testing.assert_allclose(img[1, 1], 1.0, rtol=1e-5)  # env direct

    @pytest.mark.slow
    def test_env_importance_matches_uniform(self):
        # non-uniform env: image under sobol must be finite and positive
        scene, camera = presets.furnace_sphere(resolution=(9, 9), albedo=0.3)
        img = _render(scene, camera, spp=16, max_depth=3)
        assert np.isfinite(img).all() and (img >= 0).all()


class TestCornell:
    @pytest.fixture(scope="class")
    def cornell_img(self):
        scene, camera = presets.cornell_box(resolution=(32, 32))
        return _render(scene, camera, spp=8, max_depth=5)

    def test_no_nans_nonnegative(self, cornell_img):
        assert np.isfinite(cornell_img).all()
        assert (cornell_img >= 0).all()

    def test_light_brightest(self, cornell_img):
        lum = cornell_img @ np.array([0.2126, 0.7152, 0.0722])
        # brightest pixel should be on the ceiling light (top rows, center)
        y, x = np.unravel_index(np.argmax(lum), lum.shape)
        assert y < 8 and 8 < x < 24

    def test_wall_tints(self, cornell_img):
        left = cornell_img[10:25, 1:5].reshape(-1, 3).mean(0)
        right = cornell_img[10:25, 27:31].reshape(-1, 3).mean(0)
        # reference layout: red left, green right
        assert left[0] > left[1] and right[1] > right[0]

    def test_gi_nonzero_in_shadow(self, cornell_img):
        # floor under the boxes still receives bounce light
        assert cornell_img[28:31, 8:24].mean() > 0.001


@pytest.mark.slow
class TestSamplerConvergence:
    def test_sobol_lower_error_than_random(self):
        scene, camera = presets.furnace_sphere(resolution=(9, 9), albedo=0.5)
        imgs = {}
        for kind in (smpl.SOBOL, smpl.RANDOM):
            imgs[kind] = _render(scene, camera, spp=16, max_depth=4, sampler=kind)
        err_s = abs(float(imgs[smpl.SOBOL][4, 4, 0]) - 0.5)
        err_r = abs(float(imgs[smpl.RANDOM][4, 4, 0]) - 0.5)
        # sobol should not be dramatically worse (both near 0.5)
        assert err_s < 0.1 and err_r < 0.2
