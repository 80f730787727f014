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


class TestMotionBounds:
    """motion_bounds must contain the exact interpolated path at all t
    (reference transform.rs:2207-2281; here a chord + arc-deviation
    interval bound — see utils/animated.motion_bounds docstring)."""

    def _check(self, m0, m1, pts, tightness=None):
        T0, q0, S0 = an.decompose(m0)
        T1, q1, S1 = an.decompose(m1)
        lo, hi = an.motion_bounds(T0, q0, S0, T1, q1, S1, pts)
        ts = jnp.linspace(0.0, 1.0, 64)
        M = np.asarray(an.interpolate(
            ts, T0, q0, S0.reshape(3, 3), T1, q1, S1.reshape(3, 3)
        ))  # (64,4,4)
        x = np.einsum("tij,nj->tni", M[:, :3, :3], pts) + M[:, None, :3, 3]
        eps = 1e-4 * (1.0 + np.abs(x).max())
        assert (x >= lo - eps).all() and (x <= hi + eps).all(), (
            x.min((0, 1)), lo, x.max((0, 1)), hi
        )
        if tightness is not None:
            # the bound must not be absurdly loose either
            span = (hi - lo).max()
            true_span = (x.max((0, 1)) - x.min((0, 1))).max()
            assert span <= tightness * true_span + 1e-3, (span, true_span)

    def test_rotation_sweep_contained(self):
        # 170-degree rotation about z plus translation: the arc bulges far
        # outside the endpoint union — the pad must cover it
        pts = np.array([[1.0, 0, 0], [0.5, 0.5, 0.3], [0, 1.0, -0.2]])
        m0 = np.eye(4)
        c, s = np.cos(np.deg2rad(170)), np.sin(np.deg2rad(170))
        m1 = np.array([
            [c, -s, 0, 2.0], [s, c, 0, 0.0], [0, 0, 1, 0.5], [0, 0, 0, 1],
        ])
        self._check(m0, m1, pts, tightness=2.5)

    def test_endpoint_union_insufficient(self):
        # 180-degree flip: at t=0.5 the point is at y=+-1, the endpoints
        # both at x=+-1 — the old endpoint-union box missed the excursion
        pts = np.array([[1.0, 0.0, 0.0]])
        m0 = np.eye(4)
        m1 = np.diag([-1.0, -1.0, 1.0, 1.0])  # rot_z(pi)
        T0, q0, S0 = an.decompose(m0)
        T1, q1, S1 = an.decompose(m1)
        lo, hi = an.motion_bounds(T0, q0, S0, T1, q1, S1, pts)
        assert hi[1] >= 1.0 - 1e-5 and lo[1] <= -1.0 + 1e-5  # covers the arc
        self._check(m0, m1, pts)

    def test_scale_and_small_rotation(self):
        pts = np.random.RandomState(3).randn(16, 3).astype(np.float32)
        m0 = np.diag([1.0, 2.0, 0.5, 1.0])
        c, s = np.cos(0.2), np.sin(0.2)
        m1 = np.array([
            [c, 0, s, 0.3], [0, 1, 0, -0.1], [-s, 0, c, 0.0], [0, 0, 0, 1],
        ]) @ np.diag([1.5, 1.0, 1.0, 1.0])
        self._check(m0, m1, pts, tightness=1.5)

    def test_pure_translation_tight(self):
        pts = np.array([[0.3, -0.2, 1.0], [1.0, 1.0, 1.0]])
        m0 = np.eye(4)
        m1 = np.eye(4); m1[:3, 3] = [3.0, -1.0, 2.0]
        T0, q0, S0 = an.decompose(m0)
        T1, q1, S1 = an.decompose(m1)
        lo, hi = an.motion_bounds(T0, q0, S0, T1, q1, S1, pts)
        # no rotation -> zero pad -> exact endpoint hull
        np.testing.assert_allclose(lo, [0.3, -1.2, 1.0], atol=1e-6)
        np.testing.assert_allclose(hi, [4.0, 1.0, 3.0], atol=1e-6)
