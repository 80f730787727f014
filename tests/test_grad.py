"""Differentiable rendering tests: AD vs finite differences on fixed seeds.

With detached sampling the estimator is a deterministic differentiable
function of the parameters for a fixed sample set, so reverse-mode AD and
central finite differences must agree tightly (BASELINE.md gradient metric).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rs_pbrt_tpu.diff import grad as dg
from rs_pbrt_tpu.models import cameras as cam
from rs_pbrt_tpu.models import samplers as smpl
from rs_pbrt_tpu.models.integrators import render as rdr
from rs_pbrt_tpu.scene import presets
from rs_pbrt_tpu.scene.builder import SceneBuilder
from rs_pbrt_tpu.utils import transform as tr

import pytest

pytestmark = pytest.mark.slow  # FD-gradient / BSSRDF renders: nightly profile


def _loss(img):
    return jnp.mean(img)


def _fd(scene, camera, cfg, scfg, params, leaf, index, h):
    def val(delta):
        arr = np.asarray(getattr(params, leaf))
        arr = arr.copy()
        arr[index] += delta
        p2 = params._replace(**{leaf: jnp.asarray(arr)})
        img = dg.render_image(scene, camera, cfg, scfg, p2)
        return float(_loss(img))

    return (val(h) - val(-h)) / (2 * h)


class TestGradients:
    @pytest.fixture(scope="class")
    def setup(self):
        scene, camera = presets.cornell_box(resolution=(16, 16))
        cfg = rdr.RenderCfg("path", spp=4, max_depth=3, rr_threshold=1.0)
        scfg = smpl.make_sampler(smpl.SOBOL, 4, camera.resolution)
        return scene, camera, cfg, scfg

    def test_ad_matches_fd_albedo(self, setup):
        scene, camera, cfg, scfg = setup
        params = dg.get_params(scene)
        loss, g = dg.grad_loss(scene, camera, cfg, scfg, _loss, params)
        assert np.isfinite(float(loss))
        # white wall material is index 0 (builder default) then 1.. check a
        # few kd components of the white walls (material id 1 in presets)
        from rs_pbrt_tpu.scene import arrays as sa

        idx = (1, sa.MP_KD)  # white kd red channel
        ad = float(g.mat_params[idx])
        fd = _fd(scene, camera, cfg, scfg, params, "mat_params", idx, 5e-3)
        assert ad != 0.0
        np.testing.assert_allclose(ad, fd, rtol=5e-2)

    def test_ad_matches_fd_emission(self, setup):
        scene, camera, cfg, scfg = setup
        params = dg.get_params(scene)
        _, g = dg.grad_loss(scene, camera, cfg, scfg, _loss, params)
        idx = (0, 0)  # light 0 red emission
        ad = float(g.light_emission[idx])
        fd = _fd(scene, camera, cfg, scfg, params, "light_emission", idx, 0.25)
        assert ad > 0.0  # more light -> brighter
        np.testing.assert_allclose(ad, fd, rtol=5e-2)

    def test_grad_zero_for_unused_material(self, setup):
        scene, camera, cfg, scfg = setup
        params = dg.get_params(scene)
        _, g = dg.grad_loss(scene, camera, cfg, scfg, _loss, params)
        from rs_pbrt_tpu.scene import arrays as sa

        # the black light-surface material (kd=0, last) gets ~0 gradient on
        # its specular slots which nothing uses
        assert float(jnp.abs(g.mat_params[:, sa.MP_ETA3]).sum()) == 0.0


class TestCameraGradients:
    def test_camera_translation_grad_matches_fd(self):
        """d(loss)/d(camera position) via AD vs central differences on the
        same fixed sample set (detached-sampling interior term).  The
        Cornell interior is smooth w.r.t. small camera translations for
        almost all lanes; silhouette lanes are a measure-~h set, so the
        aggregate loss derivative matches to a few percent."""
        from rs_pbrt_tpu.diff import grad as dg
        from rs_pbrt_tpu.utils import transform as tr

        scene, camera = presets.cornell_box(resolution=(12, 12))
        cfg = rdr.RenderCfg("path", spp=2, max_depth=2, rr_threshold=1.0)
        scfg = smpl.make_sampler(smpl.SOBOL, 2, camera.resolution)
        loss_fn = lambda img: jnp.mean(img)

        loss, g = dg.grad_loss_wrt_camera(scene, camera, cfg, scfg, loss_fn)
        assert np.isfinite(float(loss))
        # translation entries of cam_to_world: column 3, rows 0..2
        g_t = np.asarray(g.cam_to_world)[:3, 3]
        assert np.isfinite(g_t).all()

        h = 0.05  # cm in the 556-unit box
        fd = np.zeros(3)
        base = np.asarray(camera.cam_to_world)
        for k in range(3):
            for sgn in (+1.0, -1.0):
                m = base.copy()
                m[k, 3] += sgn * h
                cam2 = camera.replace(cam_to_world=jnp.asarray(m))
                img = rdr.render(scene, cam2, cfg, scfg)
                fd[k] += sgn * float(jnp.mean(img)) / (2 * h)
        # detached sampling yields the INTERIOR derivative only: the
        # world-y and world-z translations are dominated by smooth
        # dist^2/cos shading changes and must match FD; the world-x
        # translation slides the view sideways, so its FD is dominated by
        # silhouette (visibility-boundary) terms the estimator
        # deliberately does not model (diff/grad.py docstring)
        for k in (1, 2):
            scale = max(abs(fd[k]), 1e-6)
            assert abs(g_t[k] - fd[k]) / scale < 0.08, (k, g_t, fd)
