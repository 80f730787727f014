"""NURBS tessellation tests (reference shapes/nurbs.rs).

Oracles: a bilinear NURBS patch is an exact plane; a quadratic rational
arc with the classic circle weights reproduces a quarter circle."""

import numpy as np

from rs_pbrt_tpu.io.nurbs import evaluate_surface, tessellate_nurbs


class TestNurbs:
    def test_bilinear_patch_is_plane(self):
        # order 2 (linear) in both dims, 2x2 control points = flat quad
        uk = [0, 0, 1, 1]
        vk = [0, 0, 1, 1]
        P = np.array(
            [[[0, 0, 0], [2, 0, 0]], [[0, 1, 3], [2, 1, 3]]], np.float64
        )
        w = np.ones((2, 2))
        us = np.linspace(0, 1, 7)
        vs = np.linspace(0, 1, 5)
        pts = evaluate_surface(2, uk, 2, 2, vk, 2, P, w, us, vs)
        for j, v in enumerate(vs):
            for i, u in enumerate(us):
                expect = (1 - v) * ((1 - u) * P[0, 0] + u * P[0, 1]) + v * (
                    (1 - u) * P[1, 0] + u * P[1, 1]
                )
                np.testing.assert_allclose(pts[j, i], expect, atol=1e-9)

    def test_rational_quarter_circle(self):
        """Quadratic NURBS with w = (1, 1/sqrt2, 1) is an exact circle arc."""
        uk = [0, 0, 0, 1, 1, 1]
        vk = [0, 0, 1, 1]
        s2 = 1.0 / np.sqrt(2.0)
        # arc in xz from (1,0,0) to (0,0,1); extruded linearly in y
        arc = np.array([[1, 0, 0], [1, 0, 1], [0, 0, 1]], np.float64)
        P = np.stack([arc, arc + [0, 1, 0]], 0)  # (vcp=2, ucp=3, 3)
        w = np.tile([1.0, s2, 1.0], (2, 1))
        us = np.linspace(0, 1, 33)
        pts = evaluate_surface(3, uk, 3, 2, vk, 2, P, w, us, np.array([0.0]))
        r = np.sqrt(pts[0, :, 0] ** 2 + pts[0, :, 2] ** 2)
        np.testing.assert_allclose(r, 1.0, atol=1e-9)

    def test_tessellation_topology(self):
        uk = [0, 0, 1, 1]
        vk = [0, 0, 1, 1]
        P = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float64)
        V, F, UV = tessellate_nurbs(2, uk, 2, 2, vk, 2, P, None, diceu=8, dicev=6)
        assert V.shape == (48, 3)
        assert F.shape == (2 * 7 * 5, 3)
        assert UV.min() >= 0 and UV.max() <= 1
        # all faces reference valid vertices
        assert F.min() >= 0 and F.max() < 48
