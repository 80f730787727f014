"""Halton + MaxMinDist sampler tests vs NumPy oracles.

Covers VERDICT round-1 gaps: `halton`/`maxmindist` used to silently fall
back to the random sampler; these tests pin the real index math
(reference src/samplers/halton.rs:32-227, src/samplers/maxmin.rs:12-160).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rs_pbrt_tpu.models import samplers as smpl
from rs_pbrt_tpu.ops import lowdiscrepancy as ld


def np_radical_inverse(base: int, a: int) -> float:
    """Plain NumPy/Python radical inverse oracle."""
    inv_base = 1.0 / base
    reversed_digits = 0
    inv_base_n = 1.0
    while a:
        a, digit = divmod(a, base)
        reversed_digits = reversed_digits * base + digit
        inv_base_n *= inv_base
    return min(reversed_digits * inv_base_n, 1.0 - 2**-24)


def np_scrambled_radical_inverse(base: int, a: int, perm) -> float:
    inv_base = 1.0 / base
    reversed_digits = 0
    inv_base_n = 1.0
    while a:
        a, digit = divmod(a, base)
        reversed_digits = reversed_digits * base + int(perm[digit])
        inv_base_n *= inv_base
    tail = inv_base * int(perm[0]) / (1.0 - inv_base)
    return min(inv_base_n * (reversed_digits + tail), 1.0 - 2**-24)


class TestHaltonOps:
    def test_radical_inverse_matches_oracle(self):
        idx = np.array([0, 1, 2, 3, 17, 100, 12345, 999999], np.uint32)
        for dim in [1, 2, 5, 10]:
            base = int(ld.PRIMES[dim])
            got = np.asarray(ld.radical_inverse(dim, jnp.asarray(idx)))
            want = np.array([np_radical_inverse(base, int(a)) for a in idx], np.float32)
            np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_scrambled_radical_inverse_matches_oracle(self):
        perms = ld.halton_permutations(16)
        host = np.asarray(perms)
        idx = np.array([0, 1, 7, 255, 54321], np.uint32)
        for dim in [2, 3, 7]:
            base = int(ld.PRIMES[dim])
            off = int(ld.PRIME_SUMS[dim])
            perm = host[off : off + base]
            got = np.asarray(
                ld.scrambled_radical_inverse(dim, jnp.asarray(idx), perms[off : off + base])
            )
            want = np.array(
                [np_scrambled_radical_inverse(base, int(a), perm) for a in idx],
                np.float32,
            )
            np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_halton_dyn_matches_static(self):
        idx = jnp.asarray(np.arange(1, 400, 13, dtype=np.uint32))
        for dim in [2, 5, 9, 30]:
            stat = np.asarray(ld.halton_sample(idx, dim, 7, 81))
            dyn = np.asarray(ld.halton_sample_dyn(idx, jnp.full(idx.shape, dim)))
            np.testing.assert_allclose(stat, dyn, rtol=1e-6)

    def test_inverse_radical_inverse_roundtrip(self):
        # base 2: reversing ex digits twice is the identity on [0, 2^ex)
        v = jnp.asarray(np.arange(128, dtype=np.uint32))
        r = ld.inverse_radical_inverse_2(ld.inverse_radical_inverse_2(v, 7), 7)
        np.testing.assert_array_equal(np.asarray(r), np.arange(128))
        # base 3
        v3 = jnp.asarray(np.arange(81, dtype=np.uint32))
        r3 = ld.inverse_radical_inverse_3(ld.inverse_radical_inverse_3(v3, 4), 4)
        np.testing.assert_array_equal(np.asarray(r3), np.arange(81))


class TestHaltonSampler:
    def test_index_lands_in_pixel(self):
        """The defining GlobalSampler invariant (halton.rs:173-215): the
        first two radical inverses of the per-pixel index, scaled by the
        base scales, recover the pixel (mod 128)."""
        cfg = smpl.make_sampler(smpl.HALTON, 8, resolution=(100, 100))
        sx, sy, ex, ey, stride, _, _ = cfg.halton
        rs = np.random.RandomState(3)
        pix = rs.randint(0, 100, size=(64, 2)).astype(np.int32)
        for snum in [0, 1, 5]:
            ctx = smpl.make_ctx(cfg, jnp.asarray(pix), jnp.full(64, snum, jnp.uint32))
            idx = np.asarray(ctx.global_index.lo)
            for k in range(64):
                x = int(np.floor(np_radical_inverse(2, int(idx[k])) * sx))
                y = int(np.floor(np_radical_inverse(3, int(idx[k])) * sy))
                assert x == pix[k, 0] % 128, (pix[k], idx[k])
                assert y == pix[k, 1] % 128, (pix[k], idx[k])

    def test_unique_indices_within_pixel(self):
        cfg = smpl.make_sampler(smpl.HALTON, 16, resolution=(64, 64))
        pix = jnp.tile(jnp.asarray([[13, 27]], jnp.int32), (16, 1))
        ctx = smpl.make_ctx(cfg, pix, jnp.arange(16, dtype=jnp.uint32))
        idx = np.asarray(ctx.global_index.lo)
        assert len(set(idx.tolist())) == 16
        stride = cfg.halton[4]
        assert np.all(np.diff(np.sort(idx)) == stride)

    def test_film_dims_in_unit_square(self):
        cfg = smpl.make_sampler(smpl.HALTON, 8, resolution=(100, 80))
        pix = jnp.asarray([[0, 0], [99, 79], [50, 40], [3, 77]], jnp.int32)
        ctx = smpl.make_ctx(cfg, pix, jnp.zeros(4, jnp.uint32))
        for dim in (0, 1):
            v = np.asarray(smpl.get_1d(cfg, ctx, dim))
            assert np.all((v >= 0) & (v < 1))

    def test_integrator_dim_matches_scrambled_oracle(self):
        cfg = smpl.make_sampler(smpl.HALTON, 4, resolution=(16, 16))
        pix = jnp.asarray([[5, 9]] * 4, jnp.int32)
        ctx = smpl.make_ctx(cfg, pix, jnp.arange(4, dtype=jnp.uint32))
        idx = np.asarray(ctx.global_index.lo)
        perms_host = np.asarray(ld.halton_permutations(8))
        for dim in [2, 5, 7]:
            base = int(ld.PRIMES[dim])
            off = int(ld.PRIME_SUMS[dim])
            got = np.asarray(smpl.get_1d(cfg, ctx, dim))
            want = np.array(
                [
                    np_scrambled_radical_inverse(
                        base, int(a), perms_host[off : off + base]
                    )
                    for a in idx
                ],
                np.float32,
            )
            np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_get_dims_table_matches_get_1d(self):
        cfg = smpl.make_sampler(smpl.HALTON, 4, resolution=(32, 32))
        pix = jnp.asarray([[1, 2], [30, 31], [7, 7]], jnp.int32)
        ctx = smpl.make_ctx(cfg, pix, jnp.asarray([0, 1, 3], jnp.uint32))
        tab = smpl.get_dims(cfg, ctx, 5, 7)
        assert tab is not None
        for k in range(7):
            np.testing.assert_allclose(
                np.asarray(tab[:, k]), np.asarray(smpl.get_1d(cfg, ctx, 5 + k)),
                rtol=1e-6,
            )

    def test_stratification_first_dims(self):
        # 256 samples of dim 2 (base 5) at one pixel should cover [0,1)
        # with low-discrepancy gaps, not random clumps
        cfg = smpl.make_sampler(smpl.HALTON, 256, resolution=(8, 8))
        pix = jnp.tile(jnp.asarray([[2, 3]], jnp.int32), (256, 1))
        ctx = smpl.make_ctx(cfg, pix, jnp.arange(256, dtype=jnp.uint32))
        v = np.sort(np.asarray(smpl.get_1d(cfg, ctx, 2)))
        assert v.max() - v.min() > 0.9
        assert np.max(np.diff(v)) < 0.05  # halton gaps ~ 1/n


class TestMaxMinSampler:
    def test_film_pair_is_generator_matrix_set(self):
        spp = 16
        cfg = smpl.make_sampler(smpl.MAXMIN, spp, resolution=(32, 32))
        pix = jnp.tile(jnp.asarray([[4, 4]], jnp.int32), (spp, 1))
        ctx = smpl.make_ctx(cfg, pix, jnp.arange(spp, dtype=jnp.uint32))
        pt = np.asarray(smpl.get_2d(cfg, ctx, 0))
        # the sample SET must be {(i/spp, C.i)} for i in [0,spp): reference
        # maxmin.rs:117-126 (the shuffle only permutes assignment order)
        order = np.argsort(pt[:, 0])
        xs = pt[order, 0]
        np.testing.assert_allclose(xs, np.arange(spp) / spp, atol=1e-6)
        c = np.asarray(ld.C_MAX_MIN_DIST[int(np.log2(spp))])
        want_y = []
        for i in range(spp):
            v = 0
            for b in range(32):
                if (i >> b) & 1:
                    v ^= int(c[b])
            want_y.append(min(v * 2.0**-32, 1 - 2**-24))
        np.testing.assert_allclose(pt[order, 1], want_y, rtol=1e-5)

    def test_shuffle_differs_between_pixels(self):
        spp = 16
        cfg = smpl.make_sampler(smpl.MAXMIN, spp, resolution=(32, 32))
        snums = jnp.arange(spp, dtype=jnp.uint32)
        p1 = np.asarray(
            smpl.get_2d(cfg, smpl.make_ctx(cfg, jnp.tile(jnp.asarray([[1, 1]], jnp.int32), (spp, 1)), snums), 0)
        )
        p2 = np.asarray(
            smpl.get_2d(cfg, smpl.make_ctx(cfg, jnp.tile(jnp.asarray([[9, 2]], jnp.int32), (spp, 1)), snums), 0)
        )
        assert not np.allclose(p1, p2)  # different shuffles
        np.testing.assert_allclose(np.sort(p1[:, 0]), np.sort(p2[:, 0]), atol=1e-6)

    def test_higher_dims_are_02_family(self):
        spp = 8
        cfg = smpl.make_sampler(smpl.MAXMIN, spp, resolution=(16, 16))
        cfg02 = cfg._replace(kind=smpl.ZEROTWO)
        pix = jnp.tile(jnp.asarray([[3, 5]], jnp.int32), (spp, 1))
        ctx = smpl.make_ctx(cfg, pix, jnp.arange(spp, dtype=jnp.uint32))
        np.testing.assert_allclose(
            np.asarray(smpl.get_2d(cfg, ctx, 5)),
            np.asarray(smpl.get_2d(cfg02, ctx, 5)),
        )

    def test_spp_cap(self):
        with pytest.raises(ValueError):
            smpl.make_sampler(smpl.MAXMIN, 1 << 17, resolution=(4, 4))


def test_unknown_kind_raises():
    cfg = smpl.SamplerCfg(99, 4, 2, 0)
    ctx = smpl.make_ctx(cfg, jnp.zeros((2, 2), jnp.int32), jnp.zeros(2, jnp.uint32))
    with pytest.raises(ValueError):
        smpl.get_1d(cfg, ctx, 3)


@pytest.mark.slow
def test_render_smoke_halton_maxmin():
    """End-to-end: a tiny scene renders (non-black, finite) with both new
    samplers through the full path-integrator pipeline."""
    from rs_pbrt_tpu.scene import presets
    from rs_pbrt_tpu.models.integrators import render as rdr

    scene, camera = presets.cornell_box(resolution=(24, 24))
    for kind in (smpl.HALTON, smpl.MAXMIN):
        scfg = smpl.make_sampler(kind, 4, camera.resolution)
        cfg = rdr.RenderCfg("path", 4, 3, 1.0)
        img = np.asarray(rdr.render(scene, camera, cfg, scfg))
        assert np.isfinite(img).all()
        assert img.mean() > 0.01
