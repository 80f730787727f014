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
