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
