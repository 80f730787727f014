"""Analytic cylinder/disk primitives (reference shapes/cylinder.rs,
shapes/disk.rs) — VERDICT r1 gap #6: previously tessellated to triangles.
"""

import pytest
import jax.numpy as jnp
import numpy as np

from rs_pbrt_tpu.models import cameras as cam
from rs_pbrt_tpu.models import samplers as smpl
from rs_pbrt_tpu.models.integrators import render as rdr
from rs_pbrt_tpu.ops import scene_intersect as si
from rs_pbrt_tpu.scene import arrays as sa
from rs_pbrt_tpu.scene.builder import SceneBuilder
from rs_pbrt_tpu.utils import transform as tr


def _rays_toward_origin(n, seed, r=5.0):
    rs = np.random.RandomState(seed)
    o = rs.normal(size=(n, 3))
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * r
    jitter = rs.uniform(-0.3, 0.3, (n, 3))
    d = -o + jitter
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o.astype(np.float32)), jnp.asarray(d.astype(np.float32))


class TestAnalyticCylinder:
    def test_hit_points_on_surface(self):
        b = SceneBuilder()
        b.add_cylinder(radius=1.2, z_min=-0.5, z_max=0.8, material=b.add_matte())
        scene = b.finalize()
        assert scene.quad_kind_mask == 1 << sa.QK_CYLINDER
        o, d = _rays_toward_origin(512, 0)
        it = si.scene_intersect(scene, o, d, jnp.full(512, 1e30), None)
        v = np.asarray(it.valid)
        assert v.sum() > 100
        p = np.asarray(it.p)[v]
        rad = np.sqrt(p[:, 0] ** 2 + p[:, 1] ** 2)
        np.testing.assert_allclose(rad, 1.2, atol=2e-3)
        assert (p[:, 2] >= -0.501).all() and (p[:, 2] <= 0.801).all()
        # normals radial (no z component), unit length
        ng = np.asarray(it.ng)[v]
        np.testing.assert_allclose(np.abs(ng[:, 2]), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(ng, axis=-1), 1.0, rtol=1e-5)

    def test_phi_clip(self):
        b = SceneBuilder()
        b.add_cylinder(radius=1.0, phi_max=180.0, material=b.add_matte())
        scene = b.finalize()
        o, d = _rays_toward_origin(512, 1)
        it = si.scene_intersect(scene, o, d, jnp.full(512, 1e30), None)
        p = np.asarray(it.p)[np.asarray(it.valid)]
        phi = np.arctan2(p[:, 1], p[:, 0])
        phi = np.where(phi < 0, phi + 2 * np.pi, phi)
        assert (phi <= np.pi + 1e-3).all()


class TestAnalyticDisk:
    def test_annulus_hits(self):
        b = SceneBuilder()
        b.add_disk(height=0.25, radius=2.0, inner_radius=0.5, material=b.add_matte())
        scene = b.finalize()
        n = 512
        rs = np.random.RandomState(2)
        # vertical rays down onto the disk plane
        xy = rs.uniform(-2.5, 2.5, (n, 2)).astype(np.float32)
        o = jnp.asarray(np.concatenate([xy, np.full((n, 1), 5.0, np.float32)], -1))
        d = jnp.asarray(np.tile(np.array([[0, 0, -1]], np.float32), (n, 1)))
        it = si.scene_intersect(scene, o, d, jnp.full(n, 1e30), None)
        v = np.asarray(it.valid)
        r = np.linalg.norm(xy, axis=-1)
        inside = (r <= 2.0 - 1e-3) & (r >= 0.5 + 1e-3)
        outside = (r > 2.0 + 1e-3) | (r < 0.5 - 1e-3)
        assert (v[inside]).all()
        assert (~v[outside]).all()
        p = np.asarray(it.p)[v]
        np.testing.assert_allclose(p[:, 2], 0.25, atol=1e-5)
        ng = np.asarray(it.ng)[v]
        np.testing.assert_allclose(np.abs(ng[:, 2]), 1.0, rtol=1e-5)

    @pytest.mark.slow
    def test_render_matches_tessellated(self):
        """Analytic disk render ~= finely tessellated disk render (same
        lighting), validating uv/normal/shading wiring end to end."""

        def scene_with(analytic):
            b = SceneBuilder()
            m = b.add_matte(kd=(0.7, 0.7, 0.7))
            if analytic:
                b.add_disk(height=0.0, radius=1.5, material=m)
            else:
                n_u = 256
                phis = np.linspace(0, 2 * np.pi, n_u + 1)
                outer = np.stack(
                    [1.5 * np.cos(phis), 1.5 * np.sin(phis), np.zeros_like(phis)], -1
                )
                V = np.concatenate([[[0, 0, 0]], outer]).astype(np.float32)
                F = [[0, 1 + i, 2 + i] for i in range(n_u)]
                b.add_triangle_mesh(F, V, material=m)
            b.add_point_light(p=(1.0, 1.0, 4.0), I=(60.0,) * 3)
            return b.finalize()

        camera = cam.make_perspective(
            tr.look_at([0, -0.5, 4.0], [0, 0, 0], [0, 1, 0]), (24, 24), fov=50.0
        )
        cfg = rdr.RenderCfg("path", spp=16, max_depth=1, rr_threshold=1.0)
        scfg = smpl.make_sampler(smpl.SOBOL, 16, (24, 24))
        img_a = np.asarray(rdr.render(scene_with(True), camera, cfg, scfg))
        img_t = np.asarray(rdr.render(scene_with(False), camera, cfg, scfg))
        # interiors match; silhouette pixels may differ by a fraction of one
        # pixel footprint, so compare means + close fraction
        np.testing.assert_allclose(img_a.mean(), img_t.mean(), rtol=0.02)
        close = np.isclose(img_a, img_t, rtol=0.05, atol=5e-3).mean()
        assert close > 0.93


class TestMixedQuadrics:
    def test_sphere_cylinder_disk_coexist(self):
        b = SceneBuilder()
        m = b.add_matte()
        b.add_sphere(object_to_world=tr.translate([-3, 0, 0]), radius=1.0, material=m)
        b.add_cylinder(object_to_world=tr.translate([0, 0, 0]), radius=1.0, material=m)
        b.add_disk(object_to_world=tr.translate([3, 0, 0]), radius=1.0, material=m)
        scene = b.finalize()
        assert scene.quad_kind_mask == (
            (1 << sa.QK_SPHERE) | (1 << sa.QK_CYLINDER) | (1 << sa.QK_DISK)
        )
        n = 3
        # sphere: straight down onto the pole; cylinder: horizontal ray
        # (a ray ALONG the axis legitimately misses the open tube);
        # disk: straight down onto the plane
        o = jnp.asarray(np.array([[-3, 0, 5], [0, -5, 0.2], [3, 0.2, 5]], np.float32))
        d = jnp.asarray(np.array([[0, 0, -1], [0, 1, 0], [0, 0, -1]], np.float32))
        it = si.scene_intersect(scene, o, d, jnp.full(n, 1e30), None)
        assert np.asarray(it.valid).all()
        np.testing.assert_allclose(np.asarray(it.t), [4.0, 4.0, 5.0], rtol=1e-3)
