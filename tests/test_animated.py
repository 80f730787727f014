"""AnimatedTransform + camera motion blur tests (reference
src/core/transform.rs:894-2204)."""

import pytest
import numpy as np
import jax.numpy as jnp

from rs_pbrt_tpu.utils import animated as an
from rs_pbrt_tpu.utils import transform as tr


class TestDecompose:
    def test_roundtrip_rigid(self):
        m = np.asarray(tr.compose(
            tr.translate((1.0, 2.0, 3.0)), tr.rotate_y(35.0)
        ).m)
        T, q, S = an.decompose(m)
        np.testing.assert_allclose(T, [1, 2, 3], atol=1e-5)
        np.testing.assert_allclose(S, np.eye(3), atol=1e-4)
        # recompose at t=0 and t=1 reproduces the endpoints
        m0 = np.asarray(an.interpolate(jnp.zeros(1), T, q, S, T, q, S))[0]
        np.testing.assert_allclose(m0, m, atol=1e-4)

    def test_interpolation_midpoint_rotation(self):
        a = np.asarray(tr.identity().m)
        b = np.asarray(tr.rotate_y(90.0).m)
        Ta, qa, Sa = an.decompose(a)
        Tb, qb, Sb = an.decompose(b)
        mid = np.asarray(an.interpolate(jnp.asarray([0.5]), Ta, qa, Sa, Tb, qb, Sb))[0]
        expect = np.asarray(tr.rotate_y(45.0).m)
        np.testing.assert_allclose(mid, expect, atol=1e-4)

    def test_translation_lerp(self):
        a = np.asarray(tr.translate((0.0, 0.0, 0.0)).m)
        b = np.asarray(tr.translate((4.0, 0.0, 0.0)).m)
        Ta, qa, Sa = an.decompose(a)
        Tb, qb, Sb = an.decompose(b)
        ts = jnp.asarray([0.0, 0.25, 1.0])
        ms = np.asarray(an.interpolate(ts, Ta, qa, Sa, Tb, qb, Sb))
        np.testing.assert_allclose(ms[:, 0, 3], [0.0, 1.0, 4.0], atol=1e-5)


class TestMotionBlur:
    @pytest.mark.slow
    def test_moving_camera_smears(self):
        """A camera translating during the shutter blurs a bright spot
        along the motion axis; a static camera doesn't."""
        from rs_pbrt_tpu.models import cameras as cam
        from rs_pbrt_tpu.models import samplers as smpl
        from rs_pbrt_tpu.models.integrators import render as rdr
        from rs_pbrt_tpu.scene.builder import SceneBuilder

        b = SceneBuilder()
        em = b.add_matte(kd=(0, 0, 0))
        # small bright quad at the origin
        V = np.array(
            [[-0.1, -0.1, 0], [0.1, -0.1, 0], [0.1, 0.1, 0], [-0.1, 0.1, 0]],
            np.float32,
        )
        F = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        b.add_triangle_mesh(F, V, material=em,
                            area_light=dict(L=(30, 30, 30), two_sided=True))
        scene = b.finalize()
        res = (32, 32)
        c2w0 = tr.look_at((0.0, 0.0, 3.0), (0.0, 0.0, 0.0), (0, 1, 0))
        c2w1 = tr.look_at((1.2, 0.0, 3.0), (1.2, 0.0, 0.0), (0, 1, 0))
        cfg = rdr.RenderCfg("path", spp=16, max_depth=1, rr_threshold=1.0)
        scfg = smpl.make_sampler(smpl.RANDOM, 16, res)

        cam_static = cam.make_perspective(c2w0, res, fov=45.0)
        cam_moving = cam.make_perspective(c2w0, res, fov=45.0, cam_to_world_end=c2w1)
        img_s = np.asarray(rdr.render(scene, cam_static, cfg, scfg))
        img_m = np.asarray(rdr.render(scene, cam_moving, cfg, scfg))
        lit_s = (img_s.max(-1) > 0.5).sum()
        lit_m = (img_m.max(-1) > 0.05).sum()
        assert np.all(np.isfinite(img_m))
        # the smear covers noticeably more pixels than the static spot
        assert lit_m > 1.8 * lit_s, (lit_s, lit_m)
