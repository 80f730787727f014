"""Checkpoint/resume + determinism tests (SURVEY §5 aux subsystems).

The reference has neither; determinism across batch splits is the
pure-functional analogue of race-freedom (same seed => identical image
regardless of how the wavefront is partitioned)."""

import pytest
import numpy as np
import jax.numpy as jnp

from rs_pbrt_tpu.models import cameras as cam
from rs_pbrt_tpu.models import samplers as smpl
from rs_pbrt_tpu.models.integrators import render as rdr
from rs_pbrt_tpu.scene import presets
from rs_pbrt_tpu.utils import transform as tr


def _setup(res=(16, 16), spp=8):
    scene, camera = presets.cornell_box(resolution=res)
    cfg = rdr.RenderCfg("path", spp=spp, max_depth=3, rr_threshold=1.0)
    scfg = smpl.make_sampler(smpl.SOBOL, spp, res)
    return scene, camera, cfg, scfg


class TestDeterminism:
    @pytest.mark.slow
    def test_batch_split_invariance(self):
        """Identical image whether rendered in 1 batch or many."""
        scene, camera, cfg, scfg = _setup()
        img_big = np.asarray(rdr.render(scene, camera, cfg, scfg, max_lanes=1 << 20))
        img_small = np.asarray(rdr.render(scene, camera, cfg, scfg, max_lanes=512))
        np.testing.assert_allclose(img_big, img_small, atol=1e-6)

    @pytest.mark.slow
    def test_rerun_bit_identical(self):
        scene, camera, cfg, scfg = _setup()
        a = np.asarray(rdr.render(scene, camera, cfg, scfg))
        b = np.asarray(rdr.render(scene, camera, cfg, scfg))
        np.testing.assert_array_equal(a, b)


class TestCheckpoint:
    @pytest.mark.slow
    def test_resume_matches_uninterrupted(self, tmp_path):
        scene, camera, cfg, scfg = _setup(spp=8)
        ck = str(tmp_path / "ck.npz")
        # phase 1: render only 4 spp (simulate a kill by configuring fewer)
        cfg4 = cfg._replace(spp=4)
        rdr.render(scene, camera, cfg4, scfg, checkpoint_path=ck, checkpoint_every=2)
        st = rdr.load_checkpoint(ck)
        assert st is not None and st[1] == 4
        # phase 2: resume to the full 8 spp
        img_resumed = np.asarray(
            rdr.render(scene, camera, cfg, scfg, checkpoint_path=ck, checkpoint_every=4)
        )
        img_direct = np.asarray(rdr.render(scene, camera, cfg, scfg))
        np.testing.assert_allclose(img_resumed, img_direct, atol=1e-6)

    def test_stats_reported(self):
        scene, camera, cfg, scfg = _setup(spp=2)
        stats = {}
        rdr.render(scene, camera, cfg, scfg, stats=stats)
        assert stats["camera_rays"] == 16 * 16 * 2
        assert stats["paths_per_s"] > 0
