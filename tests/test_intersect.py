import jax.numpy as jnp
import numpy as np
import pytest

from rs_pbrt_tpu.ops import bvh as bvhmod
from rs_pbrt_tpu.ops import intersect as isect


def random_tris(n, seed=0, scale=1.0):
    rs = np.random.default_rng(seed)
    base = rs.uniform(-1, 1, (n, 3)).astype(np.float32) * scale
    e1 = rs.uniform(-0.3, 0.3, (n, 3)).astype(np.float32) * scale
    e2 = rs.uniform(-0.3, 0.3, (n, 3)).astype(np.float32) * scale
    return base, base + e1, base + e2


def random_rays(n, seed=1):
    rs = np.random.default_rng(seed)
    o = rs.uniform(-2, 2, (n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def moller_oracle(o, d, t_max, p0, p1, p2):
    """NumPy float64 Möller–Trumbore closest-hit oracle."""
    o, d = o.astype(np.float64), d.astype(np.float64)
    p0, p1, p2 = [x.astype(np.float64) for x in (p0, p1, p2)]
    R, T = o.shape[0], p0.shape[0]
    e1 = p1 - p0
    e2 = p2 - p0
    best_t = np.full(R, np.inf)
    best_tri = np.full(R, -1)
    for ti in range(T):
        pvec = np.cross(d, e1[ti] * 0 + e2[ti])
        det = np.einsum("j,ij->i", e1[ti], pvec)
        ok = np.abs(det) > 1e-12
        inv = np.where(ok, 1.0 / np.where(ok, det, 1), 0)
        tvec = o - p0[ti]
        u = np.einsum("ij,ij->i", tvec, pvec) * inv
        qvec = np.cross(tvec, np.broadcast_to(e1[ti], tvec.shape))
        v = np.einsum("j,ij->i", d[0] * 0 + 1, qvec) * 0  # placeholder
        v = np.einsum("ij,ij->i", d, qvec) * inv
        t = np.einsum("j,ij->i", e2[ti], qvec) * inv
        hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-5) & (t < t_max)
        upd = hit & (t < best_t)
        best_t = np.where(upd, t, best_t)
        best_tri = np.where(upd, ti, best_tri)
    return best_t, best_tri


class TestTriangle:
    def test_simple_hit(self):
        p0 = jnp.asarray([[0.0, 0, 5]])
        p1 = jnp.asarray([[1.0, 0, 5]])
        p2 = jnp.asarray([[0.0, 1, 5]])
        o = jnp.asarray([[0.2, 0.2, 0.0], [2.0, 2.0, 0.0]])
        d = jnp.asarray([[0.0, 0, 1.0], [0.0, 0, 1.0]])
        h = isect.intersect_tris_brute(o, d, jnp.full(2, 100.0), p0, p1, p2)
        assert bool(h.valid[0]) and not bool(h.valid[1])
        np.testing.assert_allclose(h.t[0], 5.0, rtol=1e-5)
        # barycentric interpolation returns the hit point
        hp = (
            h.b0[0] * p0[0] + h.b1[0] * p1[0] + (1 - h.b0[0] - h.b1[0]) * p2[0]
        )
        np.testing.assert_allclose(hp[:2], [0.2, 0.2], atol=1e-5)

    def test_matches_oracle_random(self):
        p0, p1, p2 = random_tris(64)
        o, d = random_rays(256)
        t_max = np.full(256, 1e6, np.float32)
        h = isect.intersect_tris_brute(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_max),
            jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2),
        )
        bt, btri = moller_oracle(o, d, t_max, p0, p1, p2)
        got_valid = np.asarray(h.valid)
        want_valid = btri >= 0
        # watertight vs moller can disagree only on razor-edge cases
        agree = got_valid == want_valid
        assert agree.mean() > 0.99
        both = got_valid & want_valid & agree
        np.testing.assert_allclose(np.asarray(h.t)[both], bt[both], rtol=1e-3)

    def test_any_hit(self):
        p0, p1, p2 = random_tris(32)
        o, d = random_rays(128, 3)
        t_max = np.full(128, 1e6, np.float32)
        h = isect.intersect_tris_brute(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_max),
            jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2),
        )
        any_h = isect.intersect_tris_brute_p(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_max),
            jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2),
        )
        np.testing.assert_array_equal(np.asarray(any_h), np.asarray(h.valid))

    def test_t_max_respected(self):
        p0 = jnp.asarray([[0.0, 0, 5]]); p1 = jnp.asarray([[1.0, 0, 5]]); p2 = jnp.asarray([[0.0, 1, 5]])
        o = jnp.asarray([[0.2, 0.2, 0.0]]); d = jnp.asarray([[0.0, 0, 1.0]])
        h = isect.intersect_tris_brute(o, d, jnp.asarray([3.0]), p0, p1, p2)
        assert not bool(h.valid[0])


class TestSphere:
    def test_direct_hit(self):
        o = jnp.asarray([[0.0, 0, -5]])
        d = jnp.asarray([[0.0, 0, 1.0]])
        h = isect.intersect_sphere(o, d, jnp.asarray([100.0]), 1.0, -1.0, 1.0, 2 * np.pi)
        assert bool(h.valid[0])
        np.testing.assert_allclose(h.t[0], 4.0, rtol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(h.p_obj[0])), 1.0, rtol=1e-5)

    def test_from_inside(self):
        o = jnp.zeros((1, 3))
        d = jnp.asarray([[1.0, 0, 0.0]])
        h = isect.intersect_sphere(o, d, jnp.asarray([100.0]), 2.0, -2.0, 2.0, 2 * np.pi)
        assert bool(h.valid[0])
        np.testing.assert_allclose(h.t[0], 2.0, rtol=1e-5)

    def test_partial_z_clip(self):
        # clipped sphere: only z in [0.5, 1]; equator ray must miss
        o = jnp.asarray([[0.0, 0, -5], [0.0, 0, -5]])
        d = jnp.asarray([[0.0, 0, 1.0], [0.0, 0.195, 0.98]])
        h = isect.intersect_sphere(
            o, vm_norm(d), jnp.asarray([100.0, 100.0]), 1.0, 0.5, 0.9, 2 * np.pi
        )
        # axial ray crosses z=-1 and z=+1 only; both outside [0.5, 0.9]
        assert not bool(h.valid[0])

    def test_miss(self):
        o = jnp.asarray([[5.0, 5, -5]])
        d = jnp.asarray([[0.0, 0, 1.0]])
        h = isect.intersect_sphere(o, d, jnp.asarray([100.0]), 1.0, -1.0, 1.0, 2 * np.pi)
        assert not bool(h.valid[0])


def vm_norm(d):
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


class TestDiskCylinder:
    def test_disk(self):
        o = jnp.asarray([[0.3, 0.0, -2]])
        d = jnp.asarray([[0.0, 0, 1.0]])
        h = isect.intersect_disk(o, d, jnp.asarray([10.0]), 0.0, 1.0, 0.0, 2 * np.pi)
        assert bool(h.valid[0])
        np.testing.assert_allclose(h.t[0], 2.0, rtol=1e-6)
        # inner radius annulus miss
        h2 = isect.intersect_disk(o, d, jnp.asarray([10.0]), 0.0, 1.0, 0.5, 2 * np.pi)
        assert not bool(h2.valid[0])

    def test_cylinder(self):
        o = jnp.asarray([[-5.0, 0, 0.0]])
        d = jnp.asarray([[1.0, 0, 0.0]])
        h = isect.intersect_cylinder(o, d, jnp.asarray([100.0]), 1.0, -1.0, 1.0, 2 * np.pi)
        assert bool(h.valid[0])
        np.testing.assert_allclose(h.t[0], 4.0, rtol=1e-5)


class TestLBVH:
    @pytest.mark.parametrize("n_tris,n_rays", [(2, 64), (37, 256), (1000, 512)])
    def test_matches_brute_force(self, n_tris, n_rays):
        p0, p1, p2 = random_tris(n_tris, seed=n_tris)
        o, d = random_rays(n_rays, seed=n_rays)
        t_max = jnp.full(n_rays, 1e6, jnp.float32)
        bmin = np.minimum(np.minimum(p0, p1), p2)
        bmax = np.maximum(np.maximum(p0, p1), p2)
        bvh = bvhmod.build_lbvh(bmin, bmax)
        hb = isect.intersect_tris_brute(
            jnp.asarray(o), jnp.asarray(d), t_max,
            jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2),
        )
        hv = bvhmod.bvh_intersect_tris(
            jnp.asarray(o), jnp.asarray(d), t_max, bvh,
            jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2),
        )
        np.testing.assert_array_equal(np.asarray(hv.valid), np.asarray(hb.valid))
        v = np.asarray(hb.valid)
        np.testing.assert_array_equal(np.asarray(hv.tri)[v], np.asarray(hb.tri)[v])
        np.testing.assert_allclose(np.asarray(hv.t)[v], np.asarray(hb.t)[v], rtol=1e-6)

    def test_any_hit_mode(self):
        p0, p1, p2 = random_tris(100, seed=9)
        o, d = random_rays(256, seed=10)
        t_max = jnp.full(256, 1e6, jnp.float32)
        bmin = np.minimum(np.minimum(p0, p1), p2)
        bmax = np.maximum(np.maximum(p0, p1), p2)
        bvh = bvhmod.build_lbvh(bmin, bmax)
        hb = isect.intersect_tris_brute(
            jnp.asarray(o), jnp.asarray(d), t_max,
            jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2),
        )
        hv = bvhmod.bvh_intersect_tris(
            jnp.asarray(o), jnp.asarray(d), t_max, bvh,
            jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2), any_hit=True,
        )
        np.testing.assert_array_equal(np.asarray(hv.valid), np.asarray(hb.valid))

    @pytest.mark.parametrize("n_tris,n_rays", [(1, 32), (2, 64), (37, 256), (1000, 512)])
    def test_rope_stream_matches_brute_force(self, n_tris, n_rays):
        """Stackless escape-link traversal (bvh.build_stream) must agree
        with brute force — closest hit, winner ids, and any-hit mode."""
        p0, p1, p2 = random_tris(n_tris, seed=100 + n_tris)
        o, d = random_rays(n_rays, seed=200 + n_rays)
        t_max = jnp.full(n_rays, 1e6, jnp.float32)
        bmin = np.minimum(np.minimum(p0, p1), p2)
        bmax = np.maximum(np.maximum(p0, p1), p2)
        bvh = bvhmod.build_lbvh(bmin, bmax, tris=(p0, p1, p2))
        assert bvh.stream16 is not None
        hb = isect.intersect_tris_brute(
            jnp.asarray(o), jnp.asarray(d), t_max,
            jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2),
        )
        hv = bvhmod.bvh_intersect_tris_stream(
            jnp.asarray(o), jnp.asarray(d), t_max, bvh.stream16
        )
        np.testing.assert_array_equal(np.asarray(hv.valid), np.asarray(hb.valid))
        v = np.asarray(hb.valid)
        np.testing.assert_array_equal(np.asarray(hv.tri)[v], np.asarray(hb.tri)[v])
        np.testing.assert_allclose(np.asarray(hv.t)[v], np.asarray(hb.t)[v], rtol=1e-6)
        ha = bvhmod.bvh_intersect_tris_stream(
            jnp.asarray(o), jnp.asarray(d), t_max, bvh.stream16, any_hit=True
        )
        np.testing.assert_array_equal(np.asarray(ha.valid), np.asarray(hb.valid))

    def test_single_triangle(self):
        p0, p1, p2 = random_tris(1, seed=11)
        bmin = np.minimum(np.minimum(p0, p1), p2)
        bmax = np.maximum(np.maximum(p0, p1), p2)
        bvh = bvhmod.build_lbvh(bmin, bmax)
        o, d = random_rays(32, seed=12)
        t_max = jnp.full(32, 1e6, jnp.float32)
        hb = isect.intersect_tris_brute(
            jnp.asarray(o), jnp.asarray(d), t_max,
            jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2),
        )
        hv = bvhmod.bvh_intersect_tris(
            jnp.asarray(o), jnp.asarray(d), t_max, bvh,
            jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2),
        )
        np.testing.assert_array_equal(np.asarray(hv.valid), np.asarray(hb.valid))


class TestNativeLBVH:
    def test_native_matches_brute(self):
        from rs_pbrt_tpu.ops import bvh_native

        if not bvh_native.native_available():
            pytest.skip("native builder unavailable")
        p0, p1, p2 = random_tris(500, seed=21)
        bmin = np.minimum(np.minimum(p0, p1), p2)
        bmax = np.maximum(np.maximum(p0, p1), p2)
        bvh = bvh_native.build_lbvh_native(bmin, bmax)
        o, d = random_rays(256, seed=22)
        t_max = jnp.full(256, 1e6, jnp.float32)
        hb = isect.intersect_tris_brute(
            jnp.asarray(o), jnp.asarray(d), t_max,
            jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2),
        )
        hv = bvhmod.bvh_intersect_tris(
            jnp.asarray(o), jnp.asarray(d), t_max, bvh,
            jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2),
        )
        np.testing.assert_array_equal(np.asarray(hv.valid), np.asarray(hb.valid))
        v = np.asarray(hb.valid)
        np.testing.assert_array_equal(np.asarray(hv.tri)[v], np.asarray(hb.tri)[v])


class TestWideTraversals:
    """CPU parity for the TPU accel paths of record (ADVICE r3 medium):
    bvh4_intersect_tris / bvh12_intersect_tris are plain jnp and must
    agree with brute force on CPU, including single-triangle trees, trees
    that fit one leaf row, and wavefronts large enough to trigger the
    adaptive compaction stages (>= 4096 lanes)."""

    def _build(self, n, seed):
        from rs_pbrt_tpu.ops import bvh_native

        if not bvh_native.native_available():
            pytest.skip("native builder unavailable")
        p0, p1, p2 = random_tris(n, seed=seed)
        bmin = np.minimum(np.minimum(p0, p1), p2)
        bmax = np.maximum(np.maximum(p0, p1), p2)
        bvh = bvh_native.build_lbvh_native(
            bmin, bmax, tris=(p0, p1, p2), wide24=True
        )
        return bvh, (p0, p1, p2)

    def _check(self, bvh, tris, n_rays, seed, any_hit=False):
        p0, p1, p2 = tris
        o, d = random_rays(n_rays, seed=seed)
        t_max = jnp.full(n_rays, 1e6, jnp.float32)
        hb = isect.intersect_tris_brute(
            jnp.asarray(o), jnp.asarray(d), t_max,
            jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2),
        )
        assert bvh.wide64 is not None and bvh.wide128 is not None
        assert bvh.wide256 is not None
        h4 = bvhmod.bvh4_intersect_tris(
            jnp.asarray(o), jnp.asarray(d), t_max, bvh.wide64,
            bvh.wide_depth, any_hit=any_hit,
        )
        h12 = bvhmod.bvh12_intersect_tris(
            jnp.asarray(o), jnp.asarray(d), t_max, bvh.wide128,
            bvh.wide12_depth, any_hit=any_hit,
        )
        # the TPU production invocations of record (ADVICE r4 medium #2):
        # 24-wide with unroll=2 exactly as scene_intersect dispatches it,
        # plus the 12-wide ladder knobs (unroll, compact_factor)
        h24 = bvhmod.bvh24_intersect_tris(
            jnp.asarray(o), jnp.asarray(d), t_max, bvh.wide256,
            bvh.wide24_depth, any_hit=any_hit, unroll=2,
        )
        h12u = bvhmod.bvh12_intersect_tris(
            jnp.asarray(o), jnp.asarray(d), t_max, bvh.wide128,
            bvh.wide12_depth, any_hit=any_hit, unroll=2, compact_factor=2,
        )
        for h in (h4, h12, h24, h12u):
            np.testing.assert_array_equal(np.asarray(h.valid), np.asarray(hb.valid))
            if not any_hit:
                v = np.asarray(hb.valid)
                np.testing.assert_array_equal(
                    np.asarray(h.tri)[v], np.asarray(hb.tri)[v]
                )
                np.testing.assert_allclose(
                    np.asarray(h.t)[v], np.asarray(hb.t)[v], rtol=1e-4
                )

    @pytest.mark.parametrize("n_tris", [1, 3, 11, 500])
    def test_small_trees(self, n_tris):
        bvh, tris = self._build(n_tris, seed=31)
        self._check(bvh, tris, 256, seed=32)

    def test_compaction_lanes(self):
        # >= 4096 lanes exercises the argsort-compaction stages
        bvh, tris = self._build(800, seed=33)
        self._check(bvh, tris, 8192, seed=34)

    def test_any_hit(self):
        bvh, tris = self._build(300, seed=35)
        self._check(bvh, tris, 512, seed=36, any_hit=True)
