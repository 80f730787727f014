import jax.numpy as jnp
import numpy as np

from rs_pbrt_tpu.ops import lowdiscrepancy as ld
from rs_pbrt_tpu.ops import sampling as smp
from rs_pbrt_tpu.utils import u64
from rs_pbrt_tpu.utils import vecmath as vm


def _uniform2(n, seed=0):
    rs = np.random.default_rng(seed)
    return jnp.asarray(rs.random((n, 2)), jnp.float32)


class TestWarps:
    def test_concentric_disk_in_disk(self):
        d = smp.concentric_sample_disk(_uniform2(4096))
        r2 = np.asarray(d[..., 0] ** 2 + d[..., 1] ** 2)
        assert r2.max() <= 1.0 + 1e-6
        # area-uniform: mean radius^2 should be ~1/2
        assert abs(r2.mean() - 0.5) < 0.02

    def test_cosine_hemisphere(self):
        v = smp.cosine_sample_hemisphere(_uniform2(8192))
        assert float(jnp.min(v[..., 2])) >= 0.0
        np.testing.assert_allclose(np.asarray(vm.length(v)), 1.0, atol=1e-3)
        # E[cos theta] under pdf cos/pi is 2/3
        assert abs(float(jnp.mean(v[..., 2])) - 2.0 / 3.0) < 0.01

    def test_uniform_sphere(self):
        v = smp.uniform_sample_sphere(_uniform2(8192))
        np.testing.assert_allclose(np.asarray(vm.length(v)), 1.0, atol=1e-3)
        assert abs(float(jnp.mean(v[..., 2]))) < 0.03

    def test_uniform_cone(self):
        ct_max = 0.8
        v = smp.uniform_sample_cone(_uniform2(4096), ct_max)
        assert float(jnp.min(v[..., 2])) >= ct_max - 1e-5

    def test_uniform_triangle_barycentric(self):
        b = smp.uniform_sample_triangle(_uniform2(4096))
        b = np.asarray(b)
        assert (b >= 0).all() and (b.sum(-1) <= 1.0 + 1e-6).all()
        # uniform on triangle: E[b0] = 1/3
        assert abs(b[:, 0].mean() - 1 / 3) < 0.02

    def test_power_heuristic(self):
        w = smp.power_heuristic(1.0, jnp.asarray(2.0), 1.0, jnp.asarray(1.0))
        np.testing.assert_allclose(w, 4.0 / 5.0, rtol=1e-6)
        assert float(smp.power_heuristic(1.0, jnp.asarray(0.0), 1.0, jnp.asarray(0.0))) == 0.0


class TestDistribution1D:
    def test_cdf_matches_reference_shape(self):
        d = smp.make_distribution_1d(jnp.asarray([1.0, 2.0, 3.0, 2.0]))
        assert d.cdf.shape == (5,)
        np.testing.assert_allclose(d.cdf[-1], 1.0, rtol=1e-6)
        np.testing.assert_allclose(d.func_int, 2.0, rtol=1e-6)

    def test_sample_continuous_histogram(self):
        f = jnp.asarray([1.0, 3.0, 0.0, 4.0])
        d = smp.make_distribution_1d(f)
        u = jnp.asarray(np.random.default_rng(2).random(200000), jnp.float32)
        x, pdf, o = smp.sample_distribution_1d_continuous(d, u)
        hist, _ = np.histogram(np.asarray(x), bins=4, range=(0, 1))
        frac = hist / hist.sum()
        np.testing.assert_allclose(frac, [1 / 8, 3 / 8, 0, 4 / 8], atol=0.01)
        # pdf at sampled points
        np.testing.assert_allclose(
            np.asarray(pdf), np.asarray(d.func)[np.asarray(o)] / 2.0, rtol=1e-5
        )

    def test_sample_discrete(self):
        d = smp.make_distribution_1d(jnp.asarray([1.0, 0.0, 3.0]))
        u = jnp.asarray(np.random.default_rng(3).random(100000), jnp.float32)
        o, pdf, ur = smp.sample_distribution_1d_discrete(d, u)
        counts = np.bincount(np.asarray(o), minlength=3) / len(u)
        np.testing.assert_allclose(counts, [0.25, 0.0, 0.75], atol=0.01)
        ur = np.asarray(ur)
        assert ur.min() >= 0.0 and ur.max() <= 1.0

    def test_degenerate_uniform_fallback(self):
        d = smp.make_distribution_1d(jnp.zeros(4))
        x, pdf, o = smp.sample_distribution_1d_continuous(d, jnp.asarray([0.1, 0.9]))
        np.testing.assert_allclose(np.asarray(x), [0.1, 0.9], atol=1e-6)


class TestDistribution2D:
    def test_sample_marginals(self):
        func = jnp.asarray([[1.0, 1.0], [3.0, 3.0]])  # rows: v; bottom row 3x
        d = smp.make_distribution_2d(func)
        u = _uniform2(100000, 5)
        p, pdf = smp.sample_distribution_2d(d, u)
        p = np.asarray(p)
        frac_hi = (p[:, 1] > 0.5).mean()
        np.testing.assert_allclose(frac_hi, 0.75, atol=0.01)
        # pdf is 4*normalized density: check integral ~ 1 by MC over samples
        np.testing.assert_allclose(
            np.asarray(smp.distribution_2d_pdf(d, jnp.asarray(p))), np.asarray(pdf), rtol=1e-4
        )


class PySobol:
    """Slow python oracle using the extracted tables directly."""

    def __init__(self):
        self.m = np.asarray(ld.SOBOL_MATRICES_32)

    def sample(self, a, dim, scramble=0):
        v = scramble
        i = 0
        while a:
            if a & 1:
                v ^= int(self.m[dim, i])
            a >>= 1
            i += 1
        return min(v * 2.3283064365386963e-10, float(ld.FLOAT_ONE_MINUS_EPSILON))


class TestSobol:
    def test_matches_python_oracle(self):
        py = PySobol()
        idx = np.array([0, 1, 2, 3, 17, 255, 1 << 20, (1 << 33) + 5], np.uint64)
        for dim in [0, 1, 2, 5, 100, 1023]:
            want = [py.sample(int(a), dim) for a in idx]
            got = ld.sobol_sample(
                u64.make((idx >> 32).astype(np.uint32), idx.astype(np.uint32)),
                dim,
            )
            np.testing.assert_allclose(np.asarray(got), want, atol=1e-7)

    def test_first_dim_is_van_der_corput(self):
        idx = jnp.arange(16, dtype=jnp.uint32)
        s = ld.sobol_sample(u64.from_u32(idx), 0)
        vdc = ld.van_der_corput_sample(idx)
        np.testing.assert_allclose(np.asarray(s), np.asarray(vdc), atol=1e-7)

    def test_interval_to_index_lands_in_pixel(self):
        # property from the reference sampler (sobol.rs:110-140): remapped
        # dims 0/1 of the returned index land inside the requesting pixel.
        m = 4  # 16x16 resolution
        res = 1 << m
        rs = np.random.default_rng(7)
        px = rs.integers(0, res, 64).astype(np.int32)
        py_ = rs.integers(0, res, 64).astype(np.int32)
        for frame in [0, 1, 2, 3, 7]:
            frames = jnp.full((64,), frame, jnp.uint32)
            p = jnp.stack([jnp.asarray(px), jnp.asarray(py_)], axis=-1)
            idx = ld.sobol_interval_to_index(m, frames, p)
            sx = np.asarray(ld.sobol_sample(idx, 0)) * res
            sy = np.asarray(ld.sobol_sample(idx, 1)) * res
            np.testing.assert_array_equal(np.floor(sx).astype(np.int32), px)
            np.testing.assert_array_equal(np.floor(sy).astype(np.int32), py_)

    def test_interval_to_index_unique(self):
        # distinct pixels must get distinct global indices for a given frame
        m = 3
        res = 1 << m
        xs, ys = np.meshgrid(np.arange(res), np.arange(res))
        p = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1), jnp.int32)
        idx = ld.sobol_interval_to_index(m, jnp.zeros(res * res, jnp.uint32), p)
        vals = (np.asarray(idx.hi).astype(np.uint64) << np.uint64(32)) | np.asarray(
            idx.lo
        ).astype(np.uint64)
        assert len(np.unique(vals)) == res * res


class TestRadicalInverse:
    def _oracle(self, base, a):
        inv_base = 1.0 / base
        rd, ibn = 0, 1.0
        while a:
            nxt = a // base
            rd = rd * base + (a - nxt * base)
            ibn *= inv_base
            a = nxt
        return min(rd * ibn, float(ld.FLOAT_ONE_MINUS_EPSILON))

    def test_matches_oracle(self):
        for bi in [0, 1, 2, 10, 100]:
            base = 2 if bi == 0 else int(ld.PRIMES[bi])
            a = np.array([0, 1, 2, 3, 100, 12345, 999999], np.uint32)
            got = np.asarray(ld.radical_inverse(bi, jnp.asarray(a)))
            want = [self._oracle(base, int(x)) for x in a]
            np.testing.assert_allclose(got, want, atol=2e-7)

    def test_scrambled_identity_perm(self):
        bi = 1  # base 3
        perm = jnp.arange(3, dtype=jnp.uint32)
        a = jnp.asarray([1, 5, 17], jnp.uint32)
        got = np.asarray(ld.scrambled_radical_inverse(bi, a, perm))
        want = np.asarray(ld.radical_inverse(bi, a))
        # identity perm with perm[0]=0 tail term reduces to plain r.i.
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_permutation_tables(self):
        perms = ld.compute_radical_inverse_permutations(n_bases=16)
        # each base's slice is a permutation of 0..base-1
        for bi in [0, 1, 5]:
            off = int(ld.PRIME_SUMS[bi])
            base = int(ld.PRIMES[bi])
            assert sorted(perms[off : off + base].tolist()) == list(range(base))
