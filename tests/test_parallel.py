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
