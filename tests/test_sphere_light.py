"""Sphere-shape diffuse area lights (reference shapes/sphere.rs:391-480
sample_with_ref_point cone sampling + lights/diffuse.rs).

VERDICT round-1 gap #5: ALG_SPHERE was buildable but sample_li had no
branch for it, silently producing wrong NEE.
"""

import pytest
import jax.numpy as jnp
import numpy as np

from rs_pbrt_tpu.models import cameras as cam
from rs_pbrt_tpu.models import lights as lt
from rs_pbrt_tpu.models import samplers as smpl
from rs_pbrt_tpu.models.integrators import render as rdr
from rs_pbrt_tpu.scene.builder import SceneBuilder
from rs_pbrt_tpu.utils import transform as tr


def _floor_builder(kd=0.8):
    b = SceneBuilder()
    m = b.add_matte(kd=(kd,) * 3)
    b.add_triangle_mesh(
        [[0, 1, 2], [0, 2, 3]],
        [[-50, 0, -50], [50, 0, -50], [50, 0, 50], [-50, 0, 50]],
        material=m,
    )
    return b


def _render(scene, spp=64, res=9, integrator="path", max_depth=1):
    camera = cam.make_perspective(
        tr.look_at([0, 3, -0.006], [0, 0, 0], [0, 1, 0]), (res, res), fov=30.0
    )
    cfg = rdr.RenderCfg(integrator, spp=spp, max_depth=max_depth, rr_threshold=1.0)
    return np.asarray(
        rdr.render(scene, camera, cfg, smpl.make_sampler(smpl.SOBOL, spp, (res, res)))
    )


class TestSphereLightAnalytic:
    @pytest.mark.slow
    def test_direct_irradiance_matches_closed_form(self):
        """Uniform sphere emitter (radius r, radiance L, center distance d
        straight above a matte floor): Lo = kd * L * (r/d)^2."""
        kd, L, r, d = 0.8, 5.0, 0.5, 4.0
        b = _floor_builder(kd)
        b.add_sphere(
            object_to_world=tr.translate([0.0, d, 0.0]),
            radius=r,
            material=b.add_matte(kd=(0,) * 3),
            area_light={"L": (L,) * 3},
        )
        img = _render(b.finalize(), spp=256)
        want = kd * L * (r / d) ** 2
        # center pixel looks at the origin (directly beneath the light)
        got = img[img.shape[0] // 2, img.shape[1] // 2, 0]
        np.testing.assert_allclose(got, want, rtol=0.05)

    def test_scaled_transform_matches_bigger_radius(self):
        """A radius-1 sphere under a uniform scale-2 o2w must light like a
        radius-2 sphere (world-radius folding in _sphere_light_geom)."""
        def render_with(o2w, radius):
            b = _floor_builder()
            b.add_sphere(
                object_to_world=o2w, radius=radius,
                material=b.add_matte(kd=(0,) * 3),
                area_light={"L": (4.0,) * 3},
            )
            return _render(b.finalize(), spp=128)

        up = tr.translate([0.0, 6.0, 0.0])
        img_scaled = render_with(tr.compose(up, tr.scale(2.0, 2.0, 2.0)), 1.0)
        img_big = render_with(up, 2.0)
        np.testing.assert_allclose(img_scaled, img_big, rtol=0.02, atol=1e-4)


class TestSphereLightSampling:
    def _scene(self):
        b = _floor_builder()
        b.add_sphere(
            object_to_world=tr.translate([1.0, 3.0, 2.0]),
            radius=0.7,
            material=b.add_matte(kd=(0,) * 3),
            area_light={"L": (6.0,) * 3},
        )
        return b.finalize()

    def test_sample_pdf_consistency(self):
        """pdf_li_area of the sampled direction equals the sample's pdf
        (outside the sphere: both are the uniform-cone pdf)."""
        scene = self._scene()
        n = 256
        rs = np.random.RandomState(0)
        ref_p = jnp.asarray(
            rs.uniform(-3, 3, (n, 3)).astype(np.float32) * np.array([1, 0, 1], np.float32)
        )
        u2 = jnp.asarray(rs.uniform(0, 1, (n, 2)).astype(np.float32))
        light_idx = jnp.zeros(n, jnp.int32)
        s = lt.sample_li(scene, light_idx, ref_p, u2)
        pdf2 = lt.pdf_li_area(scene, light_idx, ref_p, s.p_target, s.n_light)
        np.testing.assert_allclose(np.asarray(s.pdf), np.asarray(pdf2), rtol=1e-3)

    def test_samples_lie_on_sphere_facing_ref(self):
        scene = self._scene()
        n = 128
        rs = np.random.RandomState(1)
        ref_p = jnp.asarray(
            (rs.uniform(-3, 3, (n, 3)) * [1, 0, 1]).astype(np.float32)
        )
        u2 = jnp.asarray(rs.uniform(0, 1, (n, 2)).astype(np.float32))
        s = lt.sample_li(scene, jnp.zeros(n, jnp.int32), ref_p, u2)
        center = np.array([1.0, 3.0, 2.0])
        dist = np.linalg.norm(np.asarray(s.p_target) - center, axis=-1)
        np.testing.assert_allclose(dist, 0.7, rtol=1e-3)
        # emitted radiance is nonzero: the cone sample faces the shading point
        assert (np.asarray(s.li).max(-1) > 0).all()
        # normals point outward
        out = np.einsum(
            "nd,nd->n",
            np.asarray(s.n_light),
            (np.asarray(s.p_target) - center) / 0.7,
        )
        np.testing.assert_allclose(out, 1.0, rtol=1e-3)

    def test_sample_le_origin_on_surface(self):
        scene = self._scene()
        n = 64
        rs = np.random.RandomState(2)
        u_pos = jnp.asarray(rs.uniform(0, 1, (n, 2)).astype(np.float32))
        u_dir = jnp.asarray(rs.uniform(0, 1, (n, 2)).astype(np.float32))
        le = lt.sample_le(scene, jnp.zeros(n, jnp.int32), u_pos, u_dir)
        center = np.array([1.0, 3.0, 2.0])
        dist = np.linalg.norm(np.asarray(le.o) - center, axis=-1)
        np.testing.assert_allclose(dist, 0.7, rtol=1e-3)
        # emitted directions leave the surface
        assert (
            np.einsum("nd,nd->n", np.asarray(le.d), np.asarray(le.n_light)) > -1e-4
        ).all()


class TestSphereLightMIS:
    @pytest.mark.slow
    def test_nee_and_bsdf_sampling_agree(self):
        """Path integrator (NEE + BSDF MIS) must converge to the same image
        as direct lighting for a one-bounce setup — a biased cone pdf would
        split them apart."""
        b = _floor_builder()
        b.add_sphere(
            object_to_world=tr.translate([0.0, 4.0, 0.0]),
            radius=1.2,  # big: BSDF sampling hits it often, MIS matters
            material=b.add_matte(kd=(0,) * 3),
            area_light={"L": (3.0,) * 3},
        )
        scene = b.finalize()
        img_path = _render(scene, spp=512, integrator="path", max_depth=1)
        img_direct = _render(scene, spp=512, integrator="directlighting", max_depth=1)
        # mask out pixels that see the light disk itself (Le-only)
        np.testing.assert_allclose(
            img_path.mean(), img_direct.mean(), rtol=0.03
        )
