"""Realistic (lens system) camera tests — reference cameras/realistic.rs.

Oracle: a thin biconvex singlet obeys the lensmaker equation; paraxial
rays from the film center must cross the optical axis at the focus
distance after thick-lens refocusing."""

import pytest
import numpy as np
import jax.numpy as jnp

from rs_pbrt_tpu.models import cameras as cam
from rs_pbrt_tpu.models import realistic as rl
from rs_pbrt_tpu.utils import transform as tr

# biconvex singlet: R=+-50mm, 5mm center thickness, n=1.5 -> f ~= 50mm
SINGLET = [50.0, 5.0, 1.5, 20.0, -50.0, 45.0, 1.0, 20.0]


class TestLensMath:
    def test_thick_lens_focus_matches_lensmaker(self):
        el = rl.parse_lens_data(SINGLET, 8.0)
        ft = rl.focus_thick_lens(el, 1.0, 0.010)
        # thin-lens: v = 1/(1/f - 1/u) = 52.6mm; principal-plane shift of a
        # 5mm biconvex lens moves the vertex distance ~1.7mm closer
        assert 0.050 < ft < 0.054

    def test_paraxial_rays_focus_at_target(self):
        el = rl.parse_lens_data(SINGLET, 8.0)
        el[-1, 1] = rl.focus_thick_lens(el, 1.0, 0.010)
        rear_z = el[-1, 1]
        o = np.zeros((1, 3))
        d = np.array([[0.0005, 0.0, rear_z]])
        ok, oo, dd = rl.trace_from_film_np(el, o, d)
        assert ok[0]
        t = -oo[0, 0] / dd[0, 0]
        z_cross = oo[0, 2] + t * dd[0, 2]
        assert abs(z_cross - 1.0) < 0.03  # paraxial focus within 3cm of 1m

    def test_aperture_vignettes(self):
        el = rl.parse_lens_data(SINGLET, 8.0)
        el[-1, 1] = rl.focus_thick_lens(el, 1.0, 0.010)
        rear_z = el[-1, 1]
        # ray aimed far outside the aperture must fail
        o = np.zeros((1, 3))
        d = np.array([[0.02, 0.0, rear_z]])
        ok, _, _ = rl.trace_from_film_np(el, o, d)
        assert not ok[0]

    def test_trace_roundtrip_scene_film(self):
        """film->scene then scene->film returns to the start (reciprocity)."""
        el = rl.parse_lens_data(SINGLET, 8.0)
        el[-1, 1] = rl.focus_thick_lens(el, 1.0, 0.010)
        o = np.array([[0.0002, 0.0001, 0.0]])
        d = np.array([[0.0008, -0.0004, el[-1, 1]]])
        ok, o1, d1 = rl.trace_from_film_np(el, o, d)
        assert ok[0]
        # reverse the exit ray back toward the lens
        ok2, o2, d2 = rl.trace_from_scene_np(el, o1, -d1)
        assert ok2[0]
        t = (0.0 - o2[0, 2]) / d2[0, 2]
        p_back = o2[0] + t * d2[0]
        np.testing.assert_allclose(p_back[:2], o[0, :2], atol=1e-5)


class TestRealisticCamera:
    def test_generate_rays_weight_and_exit(self):
        c = cam.make_realistic(
            tr.identity(), (64, 64), SINGLET, aperture_diameter=6.0,
            focus_distance=1.0, film_diag_mm=10.0,
        )
        n = 128
        rng = np.random.default_rng(0)
        pf = jnp.asarray(rng.uniform(8, 56, (n, 2)).astype(np.float32))
        ul = jnp.asarray(rng.random((n, 2)).astype(np.float32))
        rays = cam.generate_rays(c, pf, ul, jnp.zeros(n))
        w = np.asarray(rays.weight)
        d = np.asarray(rays.d)
        assert (w > 0).mean() > 0.3  # a healthy fraction exits the lens
        # exiting rays head into the scene (+z) and are normalized
        assert np.all(d[w > 0, 2] > 0.5)
        np.testing.assert_allclose(
            np.linalg.norm(d[w > 0], axis=-1), 1.0, atol=1e-5
        )

    @pytest.mark.slow
    def test_renders_scene(self):
        from rs_pbrt_tpu.models import samplers as smpl
        from rs_pbrt_tpu.models.integrators import render as rdr
        from rs_pbrt_tpu.scene.builder import SceneBuilder

        b = SceneBuilder()
        m = b.add_matte(kd=(0.7, 0.3, 0.3))
        V = np.array([[-2, -2, 1.0], [2, -2, 1.0], [2, 2, 1.0], [-2, 2, 1.0]], np.float32)
        F = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        b.add_triangle_mesh(F, V, material=m)
        b.add_point_light(p=(0.0, 0.0, 0.2), I=(10, 10, 10))
        scene = b.finalize()
        c = cam.make_realistic(
            tr.identity(), (16, 16), SINGLET, aperture_diameter=6.0,
            focus_distance=1.0, film_diag_mm=10.0,
        )
        cfg = rdr.RenderCfg("path", spp=4, max_depth=2, rr_threshold=1.0)
        scfg = smpl.make_sampler(smpl.SOBOL, 4, (16, 16))
        img = np.asarray(rdr.render(scene, c, cfg, scfg))
        assert np.all(np.isfinite(img)) and img.max() > 0


class TestClippingStart:
    """Near-clip extension (reference camera.rs:102-118 get_clipping_start /
    adjust_to_clipping_start; perspective.rs:450-469): ray origins move to
    the z=clipping_start camera plane along the film-point direction."""

    def test_origin_on_clip_plane_direction_unchanged(self):
        c2w = tr.translate([1.0, 2.0, 3.0])
        base = cam.make_perspective(c2w, (8, 8), fov=60.0)
        clip = cam.make_perspective(c2w, (8, 8), fov=60.0, clipping_start=0.5)
        p_film = jnp.asarray([[4.0, 4.0], [1.0, 6.5]], jnp.float32)
        u2 = jnp.zeros((2, 2), jnp.float32)
        u1 = jnp.zeros((2,), jnp.float32)
        r0 = cam.generate_rays(base, p_film, u2, u1)
        r1 = cam.generate_rays(clip, p_film, u2, u1)
        assert np.allclose(np.asarray(r1.d), np.asarray(r0.d), atol=1e-6)
        # origin in camera space lands on z = clipping_start along d
        w2c = np.linalg.inv(np.asarray(c2w.m))
        o_cam = (w2c[:3, :3] @ np.asarray(r1.o).T).T + w2c[:3, 3]
        assert np.allclose(o_cam[:, 2], 0.5, atol=1e-5)
        d_cam = (w2c[:3, :3] @ np.asarray(r1.d).T).T
        cross = np.cross(o_cam, d_cam)
        assert np.allclose(cross, 0.0, atol=1e-5)  # origin along the ray dir

    def test_zero_clip_is_identity(self):
        c2w = tr.translate([0.0, 0.0, 0.0])
        a = cam.make_perspective(c2w, (4, 4), fov=45.0)
        b = cam.make_perspective(c2w, (4, 4), fov=45.0, clipping_start=0.0)
        p_film = jnp.asarray([[2.0, 2.0]], jnp.float32)
        ra = cam.generate_rays(a, p_film, jnp.zeros((1, 2)), jnp.zeros((1,)))
        rb = cam.generate_rays(b, p_film, jnp.zeros((1, 2)), jnp.zeros((1,)))
        assert np.allclose(np.asarray(ra.o), np.asarray(rb.o))
