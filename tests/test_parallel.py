"""Multi-device sharding tests (8 virtual CPU devices via conftest).

The reference's parallelism is intra-process threads + atomics (SURVEY
§2.2); its correctness analogue here is DETERMINISM: the image must be
identical for any device count / batch split because samplers are
stateless in (pixel, sample) and the film reduction is a fixed-order sum.
"""

import jax
import numpy as np
import pytest

from rs_pbrt_tpu.models import samplers as smpl
from rs_pbrt_tpu.models.integrators import render as rdr
from rs_pbrt_tpu.parallel import mesh as pmesh
from rs_pbrt_tpu.scene import presets


@pytest.fixture(scope="module")
def cornell():
    scene, camera = presets.cornell_box(resolution=(24, 20))
    cfg = rdr.RenderCfg("path", spp=4, max_depth=3, rr_threshold=1.0)
    scfg = smpl.make_sampler(smpl.SOBOL, 4, camera.resolution)
    return scene, camera, cfg, scfg


class TestShardedRender:
    @pytest.mark.slow
    def test_sharded_matches_single_device(self, cornell):
        scene, camera, cfg, scfg = cornell
        img1 = np.asarray(rdr.render(scene, camera, cfg, scfg))
        mesh8 = pmesh.make_mesh(jax.devices()[:8])
        img8 = np.asarray(
            pmesh.render_sharded(scene, camera, cfg, scfg, mesh=mesh8)
        )
        assert img8.shape == img1.shape
        assert np.isfinite(img8).all()
        # same estimator, same samples; only the film-sum association
        # differs across the shard boundary
        assert np.allclose(img8, img1, rtol=1e-4, atol=1e-5)

    @pytest.mark.slow
    def test_device_count_invariance(self, cornell):
        scene, camera, cfg, scfg = cornell
        img2 = np.asarray(
            pmesh.render_sharded(
                scene, camera, cfg, scfg, mesh=pmesh.make_mesh(jax.devices()[:2])
            )
        )
        img4 = np.asarray(
            pmesh.render_sharded(
                scene, camera, cfg, scfg, mesh=pmesh.make_mesh(jax.devices()[:4])
            )
        )
        assert np.allclose(img2, img4, rtol=1e-5, atol=1e-6)

    @pytest.mark.slow
    def test_batch_split_invariance(self, cornell):
        scene, camera, cfg, scfg = cornell
        mesh = pmesh.make_mesh(jax.devices()[:4])
        whole = np.asarray(
            pmesh.render_sharded(scene, camera, cfg, scfg, mesh=mesh)
        )
        split = np.asarray(
            pmesh.render_sharded(
                scene, camera, cfg, scfg, mesh=mesh, spp_per_batch=1
            )
        )
        assert np.allclose(whole, split, rtol=1e-5, atol=1e-6)


class TestExoticSharded:
    """VERDICT r4 missing #1: BDPT/MLT/SPPM must run the mesh too.  Same
    determinism bar as the path family — device-count invariance up to
    splat-psum float reassociation."""

    @pytest.mark.slow
    def test_bdpt_sharded_matches_single(self, cornell):
        from rs_pbrt_tpu.models.integrators import bdpt as bdptmod

        scene, camera, cfg, scfg = cornell
        img1 = np.asarray(bdptmod.render_bdpt(
            scene, camera, spp=4, max_depth=3, sampler_cfg=scfg))
        img4 = np.asarray(pmesh.render_bdpt_sharded(
            scene, camera, spp=4, max_depth=3, sampler_cfg=scfg,
            mesh=pmesh.make_mesh(jax.devices()[:4])))
        assert np.isfinite(img4).all()
        assert np.allclose(img4, img1, rtol=1e-4, atol=1e-5)

    @pytest.mark.slow
    def test_bdpt_sharded_device_count_invariance(self, cornell):
        scene, camera, cfg, scfg = cornell
        img2 = np.asarray(pmesh.render_bdpt_sharded(
            scene, camera, spp=4, max_depth=3, sampler_cfg=scfg,
            mesh=pmesh.make_mesh(jax.devices()[:2])))
        img8 = np.asarray(pmesh.render_bdpt_sharded(
            scene, camera, spp=4, max_depth=3, sampler_cfg=scfg,
            mesh=pmesh.make_mesh(jax.devices()[:8])))
        assert np.allclose(img2, img8, rtol=1e-4, atol=1e-5)

    @pytest.mark.slow
    def test_sppm_sharded_device_count_invariance(self, cornell):
        scene, camera, cfg, scfg = cornell
        kw = dict(n_iterations=2, max_depth=3)
        img2 = np.asarray(pmesh.render_sppm_sharded(
            scene, camera, scfg, mesh=pmesh.make_mesh(jax.devices()[:2]), **kw))
        img4 = np.asarray(pmesh.render_sppm_sharded(
            scene, camera, scfg, mesh=pmesh.make_mesh(jax.devices()[:4]), **kw))
        assert np.isfinite(img2).all()
        assert img2.max() > 0
        # photon sets are identical (stateless counter RNG over the global
        # photon index); phi differs only by psum reassociation
        assert np.allclose(img2, img4, rtol=1e-3, atol=1e-4)

    @pytest.mark.slow
    def test_sppm_sharded_matches_single(self, cornell):
        from rs_pbrt_tpu.models.integrators import sppm as sp

        scene, camera, cfg, scfg = cornell
        kw = dict(n_iterations=2, max_depth=3)
        img1 = np.asarray(sp.render_sppm(scene, camera, scfg, **kw))
        # photons_per_iter pads to a device multiple; pixel count 24*20=480
        # divides 2 and 4 evenly, so the photon set matches exactly
        img2 = np.asarray(pmesh.render_sppm_sharded(
            scene, camera, scfg, mesh=pmesh.make_mesh(jax.devices()[:2]), **kw))
        assert np.allclose(img2, img1, rtol=1e-3, atol=1e-4)

    @pytest.mark.slow
    def test_mlt_sharded_runs_and_converges_roughly(self, cornell):
        scene, camera, cfg, scfg = cornell
        img = np.asarray(pmesh.render_mlt_sharded(
            scene, camera, mutations_per_pixel=8, max_depth=3,
            n_chains=512, n_bootstrap=2048,
            mesh=pmesh.make_mesh(jax.devices()[:4])))
        ref = np.asarray(rdr.render(scene, camera, cfg, scfg))
        assert np.isfinite(img).all()
        assert img.max() > 0
        # MLT is unbiased: overall brightness must agree loosely
        assert abs(img.mean() - ref.mean()) < 0.5 * ref.mean()

    @pytest.mark.slow
    def test_mlt_sharded_device_count_invariance(self, cornell):
        scene, camera, cfg, scfg = cornell
        kw = dict(mutations_per_pixel=4, max_depth=3, n_chains=256,
                  n_bootstrap=1024)
        img2 = np.asarray(pmesh.render_mlt_sharded(
            scene, camera, mesh=pmesh.make_mesh(jax.devices()[:2]), **kw))
        img4 = np.asarray(pmesh.render_mlt_sharded(
            scene, camera, mesh=pmesh.make_mesh(jax.devices()[:4]), **kw))
        # per-chain fold_in RNG: identical proposals regardless of layout
        assert np.allclose(img2, img4, rtol=1e-4, atol=1e-5)


class TestShardedRegen:
    @pytest.mark.slow
    def test_sharded_regen_matches_ladder(self):
        """Per-shard path regeneration is the same estimator: sharded
        render with regen on == off (accel scene, shard > lane width)."""
        from rs_pbrt_tpu.models.integrators import regen as regenmod
        from rs_pbrt_tpu.ops.scene_intersect import build_accel
        from rs_pbrt_tpu.scene import bigscene

        scene, camera = bigscene.statue_scene(resolution=(24, 16),
                                              subdivisions=4)
        accel = build_accel(scene)
        cfg = rdr.RenderCfg("path", spp=2, max_depth=3, rr_threshold=1.0)
        scfg = smpl.make_sampler(smpl.SOBOL, 2, camera.resolution)
        mesh = pmesh.make_mesh(jax.devices()[:2])
        # shard = 24*16*2/2 = 384 lanes; shrink the pool so regen engages
        old_w = regenmod.REGEN_LANE_WIDTH
        regenmod.REGEN_LANE_WIDTH = 128
        try:
            img_on = np.asarray(pmesh.render_sharded(
                scene, camera, cfg, scfg, mesh=mesh, accel=accel, regen=True))
        finally:
            regenmod.REGEN_LANE_WIDTH = old_w
        img_off = np.asarray(pmesh.render_sharded(
            scene, camera, cfg, scfg, mesh=mesh, accel=accel, regen=False))
        assert np.isfinite(img_on).all()
        np.testing.assert_allclose(img_on, img_off, rtol=1e-5, atol=1e-6)
