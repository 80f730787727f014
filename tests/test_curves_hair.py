"""Curve (hair geometry) intersection + hair BSDF tests.

Oracles: straight-fiber closed forms, dense point sampling of the Bézier,
and Monte-Carlo normalization checks on the hair BSDF (reference
shapes/curve.rs + materials/hair.rs have no unit tests; these are ours).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rs_pbrt_tpu.ops import bsdf as bx
from rs_pbrt_tpu.ops import curves as cv


def _straight_curve(width=0.2, splitdepth=2):
    cps = np.array([[[0, 0, 0], [4 / 3, 0, 0], [8 / 3, 0, 0], [4, 0, 0]]], np.float32)
    arrs = cv.flatten_curves(cps, [width], [width], [cv.CYLINDER], splitdepth=splitdepth)
    at = cv.pack_curve_attr(arrs, np.zeros(arrs["crv_cp"].shape[0], np.int32))
    return jnp.asarray(at)


class TestCurveIntersect:
    def test_straight_fiber_hit_miss(self):
        at = _straight_curve()
        o = jnp.asarray(
            [[2, 0, 5], [2, 0.07, 5], [2, 0.2, 5], [5, 0, 5], [-1, 0, 5]],
            jnp.float32,
        )
        d = jnp.asarray([[0, 0, -1]] * 5, jnp.float32)
        h = cv.intersect_curves_brute(o, d, jnp.full(5, 1e30, jnp.float32), at)
        ok = np.asarray(h.valid)
        # inside width/2=0.1 of the axis: hit; outside or past the ends: miss
        assert ok.tolist() == [True, True, False, False, False]
        np.testing.assert_allclose(np.asarray(h.t)[0], 5.0, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(h.u)[0], 0.5, atol=2e-3)
        np.testing.assert_allclose(np.asarray(h.v)[0], 0.5, atol=2e-3)

    def test_u_parameter_along_fiber(self):
        at = _straight_curve()
        xs = np.array([0.5, 1.0, 3.0], np.float32)
        o = jnp.asarray(np.stack([xs, 0 * xs, 0 * xs + 5], -1))
        d = jnp.asarray([[0, 0, -1]] * 3, jnp.float32)
        h = cv.intersect_curves_brute(o, d, jnp.full(3, 1e30, jnp.float32), at)
        assert bool(jnp.all(h.valid))
        np.testing.assert_allclose(np.asarray(h.u), xs / 4.0, atol=5e-3)

    def test_curved_bezier_vs_dense_oracle(self):
        # a bent curve; oracle = min perpendicular distance of the ray line
        # to densely-sampled curve points (valid because test rays are
        # orthogonal to the curve's plane)
        cp = np.array([[0, 0, 0], [1, 2, 0], [3, -2, 0], [4, 0, 0]], np.float32)
        width = 0.3
        arrs = cv.flatten_curves(cp[None], [width], [width], [cv.FLAT], splitdepth=2)
        at = jnp.asarray(cv.pack_curve_attr(arrs, np.zeros(arrs["crv_cp"].shape[0], np.int32)))

        t = np.linspace(0, 1, 4001)[:, None]
        b = (
            (1 - t) ** 3 * cp[0] + 3 * (1 - t) ** 2 * t * cp[1]
            + 3 * (1 - t) * t**2 * cp[2] + t**3 * cp[3]
        )
        rng = np.random.default_rng(3)
        origins = np.stack(
            [rng.uniform(0, 4, 200), rng.uniform(-1.5, 1.5, 200), np.full(200, 5.0)], -1
        ).astype(np.float32)
        dists = np.min(
            np.linalg.norm(b[None, :, :2] - origins[:, None, :2], axis=-1), axis=1
        )
        o = jnp.asarray(origins)
        d = jnp.asarray(np.tile([[0, 0, -1]], (200, 1)).astype(np.float32))
        h = cv.intersect_curves_brute(o, d, jnp.full(200, 1e30, jnp.float32), at)
        got = np.asarray(h.valid)
        # rays clearly inside/outside must agree; near-boundary rays skipped
        inside = dists < width / 2 * 0.85
        outside = dists > width / 2 * 1.15
        assert np.all(got[inside]), "missed a clearly-covered ray"
        assert not np.any(got[outside]), "hit a clearly-uncovered ray"

    def test_bvh_matches_brute(self):
        rng = np.random.default_rng(11)
        n = 80
        p0 = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
        cps = np.stack(
            [p0, p0 + rng.normal(0, 0.5, (n, 3)), p0 + rng.normal(0, 0.5, (n, 3)),
             p0 + rng.normal(0, 1.0, (n, 3))], 1
        ).astype(np.float32)
        arrs = cv.flatten_curves(
            cps, np.full(n, 0.2), np.full(n, 0.05), np.full(n, cv.CYLINDER), splitdepth=1
        )
        at = jnp.asarray(cv.pack_curve_attr(arrs, np.zeros(arrs["crv_cp"].shape[0], np.int32)))
        from rs_pbrt_tpu.ops import bvh as bvhmod

        a = np.asarray(at)
        cp = a[:, cv.CV_CP : cv.CV_CP + 12].reshape(-1, 4, 3)
        hw = np.maximum(a[:, cv.CV_W0], a[:, cv.CV_W1])[:, None] * 0.5
        tree = bvhmod.build_lbvh(cp.min(1) - hw, cp.max(1) + hw)

        m = 256
        o = jnp.asarray(rng.uniform(-4, 4, (m, 3)).astype(np.float32))
        dd = rng.normal(size=(m, 3)).astype(np.float32)
        dd /= np.linalg.norm(dd, axis=-1, keepdims=True)
        d = jnp.asarray(dd)
        tm = jnp.full(m, 1e30, jnp.float32)
        hb = cv.intersect_curves_brute(o, d, tm, at)
        ht = cv.bvh_intersect_curves(o, d, tm, tree, at)
        np.testing.assert_array_equal(np.asarray(hb.valid), np.asarray(ht.valid))
        sel = np.asarray(hb.valid)
        np.testing.assert_allclose(
            np.asarray(hb.t)[sel], np.asarray(ht.t)[sel], rtol=1e-5
        )


def _hair_bsdf(n, h=0.3, beta_m=0.3, beta_n=0.3, sigma_a=(0.0, 0.0, 0.0), alpha=0.0):
    n1 = jnp.ones(n, jnp.float32)
    c = lambda v: jnp.broadcast_to(jnp.asarray(v, jnp.float32), (n, 3))
    return bx.Bsdf(
        kind0=jnp.full(n, bx.LOBE_HAIR, jnp.int32),
        kind1=jnp.full(n, bx.LOBE_NONE, jnp.int32),
        r0=c(sigma_a), r1=c((0, 0, 0)), ax=n1 * beta_m, ay=n1 * beta_n,
        eta=n1 * 1.55, sigma=n1 * alpha, eta3=c((1, 1, 1)), k3=c((0, 0, 0)),
        kt=c((0, 0, 0)), h=n1 * h,
    )


def _uniform_sphere(n, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.random((n, 2))
    z = 1 - 2 * u[:, 0]
    r = np.sqrt(np.maximum(0, 1 - z * z))
    phi = 2 * np.pi * u[:, 1]
    return jnp.asarray(np.stack([z, r * np.cos(phi), r * np.sin(phi)], -1).astype(np.float32))


class TestHairBsdf:
    N = 50000

    def _wo(self):
        return jnp.asarray(
            np.tile([[0.2, 0.6, np.sqrt(1 - 0.04 - 0.36)]], (self.N, 1)).astype(np.float32)
        )

    def test_white_furnace(self):
        """sigma_a=0 hair conserves energy: ∫ f |cos| dω = 1 (hair.rs docs)."""
        b = _hair_bsdf(self.N)
        wi = _uniform_sphere(self.N)
        f = bx.hair_f(b, self._wo(), wi)
        integral = float(jnp.mean(f[:, 0] * jnp.abs(wi[:, 2]))) * 4 * np.pi
        assert abs(integral - 1.0) < 0.03

    def test_pdf_normalized(self):
        b = _hair_bsdf(self.N)
        wi = _uniform_sphere(self.N, seed=1)
        pdf = bx.hair_pdf(b, self._wo(), wi)
        integral = float(jnp.mean(pdf)) * 4 * np.pi
        assert abs(integral - 1.0) < 0.03

    def test_sample_pdf_matches_eval(self):
        b = _hair_bsdf(self.N)
        rng = np.random.default_rng(5)
        u2 = jnp.asarray(rng.random((self.N, 2)).astype(np.float32))
        wi_s, pdf_s = bx.hair_sample(b, self._wo(), u2)
        pdf_e = bx.hair_pdf(b, self._wo(), wi_s)
        rel = np.asarray(jnp.abs(pdf_s - pdf_e) / jnp.maximum(pdf_e, 1e-3))
        assert rel.max() < 1e-3

    def test_importance_furnace(self):
        """E[f |cos| / pdf] over hair-sampled directions == 1 exactly-ish."""
        b = _hair_bsdf(self.N)
        rng = np.random.default_rng(6)
        u2 = jnp.asarray(rng.random((self.N, 2)).astype(np.float32))
        wi_s, pdf_s = bx.hair_sample(b, self._wo(), u2)
        f_s = bx.hair_f(b, self._wo(), wi_s)
        est = jnp.where(
            pdf_s > 1e-7, f_s[:, 0] * jnp.abs(wi_s[:, 2]) / jnp.maximum(pdf_s, 1e-7), 0.0
        )
        assert abs(float(jnp.mean(est)) - 1.0) < 0.01

    def test_absorption_darkens(self):
        wi = _uniform_sphere(self.N, seed=2)
        f0 = bx.hair_f(_hair_bsdf(self.N), self._wo(), wi)
        f1 = bx.hair_f(_hair_bsdf(self.N, sigma_a=(0.8,) * 3), self._wo(), wi)
        i0 = float(jnp.mean(f0[:, 0] * jnp.abs(wi[:, 2])))
        i1 = float(jnp.mean(f1[:, 0] * jnp.abs(wi[:, 2])))
        assert i1 < 0.6 * i0


class TestHairRender:
    @pytest.mark.slow
    def test_hair_patch_renders(self):
        """End-to-end: a patch of hair fibers over a floor, point light."""
        from rs_pbrt_tpu.models import cameras as cam
        from rs_pbrt_tpu.models import samplers as smpl
        from rs_pbrt_tpu.models.integrators import render as rdr
        from rs_pbrt_tpu.scene.builder import SceneBuilder
        from rs_pbrt_tpu.utils import transform as tr

        b = SceneBuilder()
        hair_mat = b.add_hair(sigma_a=(0.06, 0.1, 0.2), beta_m=0.3, beta_n=0.3)
        rng = np.random.default_rng(0)
        n_fibers = 24
        x = rng.uniform(-0.5, 0.5, n_fibers)
        z = rng.uniform(-0.5, 0.5, n_fibers)
        cps = np.stack(
            [
                np.stack([x, np.zeros(n_fibers), z], -1),
                np.stack([x + 0.1, np.full(n_fibers, 0.33), z], -1),
                np.stack([x + 0.2, np.full(n_fibers, 0.66), z], -1),
                np.stack([x + 0.4, np.full(n_fibers, 1.0), z], -1),
            ],
            axis=1,
        ).astype(np.float32)
        b.add_curve(cps, width0=0.05, width1=0.02, curve_type="cylinder",
                    splitdepth=2, material=hair_mat)
        floor = b.add_matte(kd=(0.4, 0.4, 0.4))
        V = np.array([[-2, 0, -2], [2, 0, -2], [2, 0, 2], [-2, 0, 2]], np.float32)
        F = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        b.add_triangle_mesh(F, V, material=floor)
        b.add_point_light(p=(2.0, 3.0, 2.0), I=(30, 30, 30))
        scene = b.finalize()
        assert scene.n_curve_segs > 0 and scene.has_hair

        res = (32, 32)
        camera = cam.make_perspective(
            tr.look_at((0.0, 1.2, 3.0), (0.0, 0.5, 0.0), (0, 1, 0)), res, fov=45.0
        )
        cfg = rdr.RenderCfg("path", spp=4, max_depth=3, rr_threshold=1.0)
        scfg = smpl.make_sampler(smpl.SOBOL, 4, res)
        img = rdr.render(scene, camera, cfg, scfg)
        a = np.asarray(img)
        assert np.all(np.isfinite(a)) and np.all(a >= 0)
        assert a.max() > 1e-3  # something rendered
