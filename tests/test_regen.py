"""Wavefront path regeneration (models/integrators/regen.py).

The regeneration loop must be the SAME estimator as the fixed-depth
wavefront: every path consumes its own Sobol rows by path id, so per-path
radiance agrees with path.radiance to float-op identity (same ops, same
order per lane — only lane position differs).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rs_pbrt_tpu.models import cameras as cam
from rs_pbrt_tpu.models import samplers as smpl
from rs_pbrt_tpu.models.integrators import path as pathmod
from rs_pbrt_tpu.models.integrators import regen as regenmod
from rs_pbrt_tpu.ops.scene_intersect import build_accel
from rs_pbrt_tpu.scene import presets


@pytest.fixture(scope="module")
def accel_setup():
    scene, camera = presets.cornell_box(resolution=(32, 32))
    accel = build_accel(scene, kind="bvh")
    return scene, camera, accel


def _paths(scene, camera, accel, spp, lane_width, max_depth=4):
    w, h = camera.resolution
    scfg = smpl.make_sampler(smpl.SOBOL, spp, camera.resolution)
    xs, ys = np.meshgrid(np.arange(w, dtype=np.int32), np.arange(h, dtype=np.int32))
    pixels = np.stack([xs.ravel(), ys.ravel()], -1)
    pix = jnp.asarray(np.tile(pixels, (spp, 1)))
    snums = jnp.repeat(jnp.arange(spp, dtype=jnp.uint32), w * h)
    ctx = smpl.make_ctx(scfg, pix, snums, frame_lt_spp=True)
    u_film, u_time, u_lens = smpl.get_camera_dims(scfg, ctx, pix)
    p_film = pix.astype(jnp.float32) + u_film
    rays = cam.generate_rays(camera, p_film, u_lens, u_time)
    pcfg = pathmod.PathCfg(max_depth, 1.0)
    L_ref = pathmod.radiance(scene, pcfg, scfg, ctx, rays.o, rays.d, accel)
    L_reg = regenmod.radiance_regen(
        scene, pcfg, scfg, ctx, rays.o, rays.d, accel, lane_width=lane_width
    )
    return np.asarray(L_ref), np.asarray(L_reg)


class TestRegen:
    @pytest.mark.slow
    def test_matches_fixed_depth_exactly(self, accel_setup):
        """lane_width << n_paths forces many refill generations; per-path
        results must match the fixed-depth loop."""
        scene, camera, accel = accel_setup
        L_ref, L_reg = _paths(scene, camera, accel, spp=2, lane_width=256)
        assert np.isfinite(L_reg).all()
        np.testing.assert_allclose(L_reg, L_ref, rtol=1e-5, atol=1e-6)

    @pytest.mark.slow
    def test_lane_width_invariance(self, accel_setup):
        """The estimator must not depend on the lane pool width."""
        scene, camera, accel = accel_setup
        _, L_a = _paths(scene, camera, accel, spp=1, lane_width=128)
        _, L_b = _paths(scene, camera, accel, spp=1, lane_width=777)
        np.testing.assert_allclose(L_a, L_b, rtol=1e-6, atol=1e-7)

    @pytest.mark.slow
    def test_render_driver_engages_regen(self, accel_setup):
        """render(regen=True) on an accel scene must agree with
        render(regen=False) (identical estimator, different scheduling)."""
        from rs_pbrt_tpu.models.integrators import render as rdr

        scene, camera, accel = accel_setup
        cfg = rdr.RenderCfg("path", spp=2, max_depth=3, rr_threshold=1.0)
        scfg = smpl.make_sampler(smpl.SOBOL, 2, camera.resolution)
        img_on = np.asarray(rdr.render(
            scene, camera, cfg, scfg, accel=accel, regen=True))
        img_off = np.asarray(rdr.render(
            scene, camera, cfg, scfg, accel=accel, regen=False))
        np.testing.assert_allclose(img_on, img_off, rtol=1e-5, atol=1e-6)
