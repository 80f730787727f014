"""kd-tree accelerator tests: exact agreement with brute force
(reference src/accelerators/kdtreeaccel.rs has no tests; brute-force
intersection is the oracle, as for the LBVH)."""

import numpy as np
import jax.numpy as jnp

from rs_pbrt_tpu.ops import intersect as isect
from rs_pbrt_tpu.ops import kdtree as kd


def _random_tris(n, seed=0, spread=4.0):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.4, (n, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.4, (n, 3)).astype(np.float32)
    return c, c + e1, c + e2


def _random_rays(m, seed=1, spread=6.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-spread, spread, (m, 3)).astype(np.float32)
    d = rng.normal(size=(m, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


class TestKdTree:
    def test_build_structure(self):
        p0, p1, p2 = _random_tris(200)
        bmin = np.minimum(np.minimum(p0, p1), p2)
        bmax = np.maximum(np.maximum(p0, p1), p2)
        kt = kd.build_kdtree(bmin, bmax)
        ax = np.asarray(kt.axis)
        assert (ax == 3).any() and (ax < 3).any()  # leaves + interiors
        # every above-child pointer of an interior node is a valid node id
        above = np.asarray(kt.above)[ax < 3]
        assert np.all((above > 0) & (above < len(ax)))

    def test_matches_brute_force(self):
        p0, p1, p2 = _random_tris(300)
        bmin = np.minimum(np.minimum(p0, p1), p2)
        bmax = np.maximum(np.maximum(p0, p1), p2)
        kt = kd.build_kdtree(bmin, bmax)
        o, d = _random_rays(512)
        tm = jnp.full(512, 1e30, jnp.float32)
        jp0, jp1, jp2 = map(jnp.asarray, (p0, p1, p2))
        hb = isect.intersect_tris_brute(o, d, tm, jp0, jp1, jp2)
        hk = kd.kdtree_intersect_tris(o, d, tm, kt, jp0, jp1, jp2)
        np.testing.assert_array_equal(np.asarray(hb.valid), np.asarray(hk.valid))
        sel = np.asarray(hb.valid)
        np.testing.assert_allclose(
            np.asarray(hb.t)[sel], np.asarray(hk.t)[sel], rtol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(hb.tri)[sel], np.asarray(hk.tri)[sel]
        )

    def test_any_hit_matches(self):
        p0, p1, p2 = _random_tris(150, seed=3)
        bmin = np.minimum(np.minimum(p0, p1), p2)
        bmax = np.maximum(np.maximum(p0, p1), p2)
        kt = kd.build_kdtree(bmin, bmax)
        o, d = _random_rays(256, seed=4)
        tm = jnp.full(256, 1e30, jnp.float32)
        jp0, jp1, jp2 = map(jnp.asarray, (p0, p1, p2))
        hb = isect.intersect_tris_brute(o, d, tm, jp0, jp1, jp2)
        hk = kd.kdtree_intersect_tris(o, d, tm, kt, jp0, jp1, jp2, any_hit=True)
        np.testing.assert_array_equal(np.asarray(hb.valid), np.asarray(hk.valid))

    def test_tmax_clamp(self):
        """Hits beyond t_max must be rejected (shadow-ray semantics)."""
        p0, p1, p2 = _random_tris(100, seed=5)
        bmin = np.minimum(np.minimum(p0, p1), p2)
        bmax = np.maximum(np.maximum(p0, p1), p2)
        kt = kd.build_kdtree(bmin, bmax)
        o, d = _random_rays(256, seed=6)
        jp0, jp1, jp2 = map(jnp.asarray, (p0, p1, p2))
        far = kd.kdtree_intersect_tris(o, d, jnp.full(256, 1e30, jnp.float32), kt, jp0, jp1, jp2)
        t_half = jnp.where(far.valid, far.t * 0.5, 1e30)
        near = kd.kdtree_intersect_tris(o, d, t_half, kt, jp0, jp1, jp2)
        # with t_max halved, the original closest hit is out of reach;
        # any remaining hit must be strictly closer
        v = np.asarray(near.valid) & np.asarray(far.valid)
        assert np.all(np.asarray(near.t)[v] <= np.asarray(t_half)[v] + 1e-5)
