"""MicrofacetTransmission / SpecularTransmission / Beckmann / 4-lobe tests.

VERDICT round-1 gap #4: rough glass had reflection only, uber lacked
opacity + kr/kt specular lobes, translucent lacked microfacet lobes.
References: reflection.rs:1211 (MicrofacetTransmission), uber.rs:142-257,
translucent.rs:82-185, microfacet.rs:23 (Beckmann).
"""

import numpy as np
import jax
import jax.numpy as jnp

from rs_pbrt_tpu.ops import bsdf as bx
from rs_pbrt_tpu.scene import arrays as sa


def _params(n, **kw):
    p = np.zeros((n, sa.N_MAT_PARAMS), np.float32)
    p[:, sa.MP_KD : sa.MP_KD + 3] = kw.get("kd", (0, 0, 0))
    p[:, sa.MP_KS : sa.MP_KS + 3] = kw.get("ks", (0, 0, 0))
    p[:, sa.MP_KR : sa.MP_KR + 3] = kw.get("kr", (0, 0, 0))
    p[:, sa.MP_KT : sa.MP_KT + 3] = kw.get("kt", (0, 0, 0))
    p[:, sa.MP_ROUGH_U] = kw.get("rough", 0.0)
    p[:, sa.MP_ROUGH_V] = kw.get("rough", 0.0)
    p[:, sa.MP_ETA] = kw.get("eta", 1.5)
    p[:, sa.MP_OPACITY : sa.MP_OPACITY + 3] = kw.get("opacity", (1, 1, 1))
    return jnp.asarray(p)


def _rand_dirs(n, seed, hemi=None):
    rs = np.random.RandomState(seed)
    v = rs.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    if hemi == "up":
        v[:, 2] = np.abs(v[:, 2])
    return jnp.asarray(v.astype(np.float32))


class TestMicrofacetTransmission:
    def _glass(self, n, rough=0.2, eta=1.5):
        mt = jnp.full(n, sa.GLASS, jnp.int32)
        return bx.make_bsdf(
            mt, _params(n, kr=(1, 1, 1), kt=(1, 1, 1), rough=rough, eta=eta),
            mat_mask=1 << sa.GLASS,
        )

    def test_rough_glass_has_transmission_lobe(self):
        b = self._glass(4)
        kinds = {int(k) for k in np.asarray(b.kind0)} | {
            int(k) for k in np.asarray(b.kind1)
        }
        assert bx.LOBE_MICROFACET_REFL in kinds
        assert bx.LOBE_MICROFACET_TRANS in kinds

    def test_f_zero_same_hemisphere(self):
        n = 64
        b = self._glass(n)
        wo = _rand_dirs(n, 1, "up")
        wi = _rand_dirs(n, 2, "up")
        ft = bx._microfacet_trans_f(
            jnp.ones((n, 3)), b, wo, wi, b.ax, b.ay, b.eta
        )
        # helper itself allows same-hemi wh math; the lobe masks it:
        f = bx._lobe_f(
            jnp.full(n, bx.LOBE_MICROFACET_TRANS), jnp.ones((n, 3)), b, wo, wi,
            reflect=jnp.ones(n, bool),
        )
        assert np.allclose(np.asarray(f), 0.0)

    def test_sample_refracts_and_pdf_consistent(self):
        """E[f cos / pdf] from bsdf_sample must equal the MC integral of
        f cos over the sphere (estimator self-consistency)."""
        n = 200_000
        b = self._glass(n, rough=0.35)
        wo1 = jnp.asarray([0.3, 0.1, 0.9449], jnp.float32)
        wo1 = wo1 / jnp.linalg.norm(wo1)
        wo = jnp.broadcast_to(wo1, (n, 3))
        rs = np.random.RandomState(7)
        u2 = jnp.asarray(rs.rand(n, 2).astype(np.float32))
        uc = jnp.asarray(rs.rand(n).astype(np.float32))
        s = bx.bsdf_sample(b, wo, u2, uc)
        ok = np.asarray(s.pdf) > 1e-8
        est = np.where(
            ok,
            np.asarray(s.f[:, 0]) * np.abs(np.asarray(s.wi[:, 2]))
            / np.maximum(np.asarray(s.pdf), 1e-8),
            0.0,
        ).mean()
        # brute-force: uniform sphere MC of f*cos (both hemispheres)
        d = _rand_dirs(n, 8)
        refl = np.asarray(bx.same_hemisphere(wo, d))
        fall = bx.bsdf_f(b, wo, d, jnp.asarray(refl))
        brute = float(
            (np.asarray(fall[:, 0]) * np.abs(np.asarray(d[:, 2]))).mean()
            * 4.0 * np.pi
        )
        assert abs(est - brute) < 0.08 * max(brute, 0.2), (est, brute)

    def test_energy_conservation_near_eta_one(self):
        """eta -> 1, R=T=1 rough interface: total scattered energy ~ 1."""
        n = 400_000
        b = self._glass(n, rough=0.3, eta=1.02)
        wo = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (n, 3))
        rs = np.random.RandomState(3)
        s = bx.bsdf_sample(
            b, wo, jnp.asarray(rs.rand(n, 2), jnp.float32),
            jnp.asarray(rs.rand(n), jnp.float32),
        )
        ok = np.asarray(s.pdf) > 1e-8
        thru = np.where(
            ok,
            np.asarray(s.f).sum(-1) / 3.0 * np.abs(np.asarray(s.wi[:, 2]))
            / np.maximum(np.asarray(s.pdf), 1e-8),
            0.0,
        ).mean()
        assert 0.85 < thru < 1.1, thru


class TestUber:
    def _uber(self, n, **kw):
        mt = jnp.full(n, sa.UBER, jnp.int32)
        return bx.make_bsdf(mt, _params(n, **kw), mat_mask=1 << sa.UBER)

    def test_opacity_zero_is_passthrough(self):
        n = 16
        b = self._uber(n, kd=(0.5,) * 3, ks=(0.25,) * 3, opacity=(0, 0, 0))
        # only the pass-through lobe remains
        assert int(np.asarray(bx.num_components(b))[0]) == 1
        wo = jnp.broadcast_to(jnp.asarray([0.3, 0.2, 0.933], jnp.float32), (n, 3))
        wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
        rs = np.random.RandomState(0)
        s = bx.bsdf_sample(
            b, wo, jnp.asarray(rs.rand(n, 2), jnp.float32),
            jnp.asarray(rs.rand(n), jnp.float32),
        )
        np.testing.assert_allclose(np.asarray(s.wi), -np.asarray(wo), atol=1e-6)
        # f*cos/pdf == 1 (perfect passthrough)
        w = np.asarray(s.f)[:, 0] * np.abs(np.asarray(s.wi)[:, 2]) / np.asarray(s.pdf)
        np.testing.assert_allclose(w, 1.0, rtol=1e-5)
        assert bool(np.all(np.asarray(s.is_transmission)))

    def test_full_opacity_has_no_passthrough(self):
        b = self._uber(4, kd=(0.5,) * 3, ks=(0.25,) * 3, opacity=(1, 1, 1))
        kinds = set(np.asarray(b.kind4).tolist())
        assert kinds == {bx.LOBE_NONE}

    def test_kr_specular_lobe(self):
        b = self._uber(4, kd=(0.5,) * 3, kr=(1, 1, 1))
        assert set(np.asarray(b.kind2).tolist()) == {bx.LOBE_SPEC_REFL_FR}

    def test_full_uber_five_lobes(self):
        """The FULL uber (kd+ks+kr+kt+partial opacity) carries all FIVE
        simultaneous lobes (reference uber.rs:142-257 with every texture
        bound; formerly kr/kt shared one slot and dropped a lobe —
        VERDICT r2 missing #9)."""
        n = 64
        b = self._uber(
            n, kd=(0.3,) * 3, ks=(0.2,) * 3, kr=(0.2,) * 3, kt=(0.2,) * 3,
            eta=1.5, opacity=(0.7, 0.7, 0.7), roughness=0.2,
        )
        assert int(np.asarray(bx.num_components(b))[0]) == 5
        assert set(np.asarray(b.kind0).tolist()) == {bx.LOBE_LAMBERT}
        assert set(np.asarray(b.kind1).tolist()) == {bx.LOBE_MICROFACET_REFL}
        assert set(np.asarray(b.kind2).tolist()) == {bx.LOBE_SPEC_REFL_FR}
        assert set(np.asarray(b.kind3).tolist()) == {bx.LOBE_SPEC_TRANS}
        assert set(np.asarray(b.kind4).tolist()) == {bx.LOBE_SPEC_TRANS_PASS}

        # non-specular f == brute-force lobe sum oracle: opacity-scaled
        # lambert + microfacet (the three specular lobes contribute 0 to f)
        wo = jnp.broadcast_to(jnp.asarray([0.2, 0.1, 0.975], jnp.float32), (n, 3))
        wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
        wi = jnp.broadcast_to(jnp.asarray([-0.3, 0.2, 0.933], jnp.float32), (n, 3))
        wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
        reflect = jnp.ones(n, bool)
        f = np.asarray(bx.bsdf_f(b, wo, wi, reflect))
        lam = 0.7 * 0.3 / np.pi
        b_mf = self._uber(n, ks=(0.2,) * 3, opacity=(1.0,) * 3, roughness=0.2)
        f_mf = np.asarray(bx.bsdf_f(b_mf, wo, wi, reflect)) * 0.7
        np.testing.assert_allclose(f, lam + f_mf, rtol=1e-5, atol=1e-7)

        # energy sanity through sampling: all five lobes reachable
        rs = np.random.RandomState(7)
        s = bx.bsdf_sample(
            b, wo, jnp.asarray(rs.rand(n, 2), jnp.float32),
            jnp.asarray(rs.rand(n), jnp.float32),
        )
        assert bool(np.any(np.asarray(s.is_specular)))
        assert bool(np.any(~np.asarray(s.is_specular)))
        assert np.isfinite(np.asarray(s.f)).all()

    def test_kt_specular_transmission(self):
        n = 4096
        b = self._uber(n, kt=(1, 1, 1), eta=1.5, opacity=(1, 1, 1))
        # slot layout: kr -> slot 2, kt -> slot 3, opacity pass -> slot 4
        assert set(np.asarray(b.kind3).tolist()) == {bx.LOBE_SPEC_TRANS}
        wo = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (n, 3))
        rs = np.random.RandomState(1)
        s = bx.bsdf_sample(
            b, wo, jnp.asarray(rs.rand(n, 2), jnp.float32),
            jnp.asarray(rs.rand(n), jnp.float32),
        )
        # refraction at normal incidence: wi = (0,0,-1), T = 1 - fresnel
        np.testing.assert_allclose(
            np.asarray(s.wi), np.asarray([[0.0, 0.0, -1.0]] * n), atol=1e-5
        )
        fr = float(np.asarray(bx.fr_dielectric(jnp.asarray([1.0]), 1.0, jnp.asarray([1.5])))[0])
        w = np.asarray(s.f)[:, 0] * 1.0 / np.asarray(s.pdf)
        # E[f cos/pdf] over the single delta lobe = (1-F) * (1/eta^2) radiance scale
        np.testing.assert_allclose(w.mean(), (1 - fr) / 1.5**2, rtol=1e-3)


class TestTranslucent:
    def test_four_lobes(self):
        n = 4
        mt = jnp.full(n, sa.TRANSLUCENT, jnp.int32)
        b = bx.make_bsdf(
            mt,
            _params(n, kd=(0.4,) * 3, ks=(0.3,) * 3, kr=(0.5,) * 3,
                    kt=(0.5,) * 3, rough=0.2),
            mat_mask=1 << sa.TRANSLUCENT,
        )
        assert int(np.asarray(bx.num_components(b))[0]) == 4
        kinds = {
            int(np.asarray(k)[0]) for k in (b.kind0, b.kind1, b.kind2, b.kind3)
        }
        assert kinds == {
            bx.LOBE_LAMBERT, bx.LOBE_LAMBERT_TRANS,
            bx.LOBE_MICROFACET_REFL, bx.LOBE_MICROFACET_TRANS,
        }

    def test_reflect_and_transmit_energy(self):
        n = 100_000
        mt = jnp.full(n, sa.TRANSLUCENT, jnp.int32)
        b = bx.make_bsdf(
            mt,
            _params(n, kd=(0.6,) * 3, ks=(0.2,) * 3, kr=(0.5,) * 3,
                    kt=(0.5,) * 3, rough=0.15),
            mat_mask=1 << sa.TRANSLUCENT,
        )
        wo = jnp.broadcast_to(jnp.asarray([0.2, 0.0, 0.98], jnp.float32), (n, 3))
        wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
        rs = np.random.RandomState(5)
        s = bx.bsdf_sample(
            b, wo, jnp.asarray(rs.rand(n, 2), jnp.float32),
            jnp.asarray(rs.rand(n), jnp.float32),
        )
        wi_z = np.asarray(s.wi)[:, 2]
        ok = np.asarray(s.pdf) > 1e-8
        w = np.where(ok, np.asarray(s.f)[:, 0] * np.abs(wi_z) / np.maximum(np.asarray(s.pdf), 1e-8), 0.0)
        up = w[wi_z > 0].sum() / n
        dn = w[wi_z < 0].sum() / n
        assert up > 0.05 and dn > 0.05  # both sides carry energy
        assert up + dn < 1.0  # and conserve


class TestBeckmann:
    def test_d_integrates_to_one_projected(self):
        """∫ D(wh) cosθ dω = 1 for any NDF."""
        n = 500_000
        rs = np.random.RandomState(11)
        # uniform hemisphere
        u = rs.rand(n, 2)
        z = u[:, 0]
        r = np.sqrt(1 - z * z)
        phi = 2 * np.pi * u[:, 1]
        wh = jnp.asarray(
            np.stack([r * np.cos(phi), r * np.sin(phi), z], -1), jnp.float32
        )
        for ax, ay in [(0.3, 0.3), (0.15, 0.4)]:
            d = np.asarray(bx.bk_d(wh, jnp.float32(ax), jnp.float32(ay)))
            est = (d * z).mean() * 2 * np.pi
            assert abs(est - 1.0) < 0.05, (ax, ay, est)

    def test_sample_pdf_consistency(self):
        """E[ D cos / pdf ] = 1 when wh ~ bk_sample_wh."""
        n = 200_000
        rs = np.random.RandomState(13)
        wo = jnp.broadcast_to(jnp.asarray([0.4, 0.1, 0.91], jnp.float32), (n, 3))
        wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
        u2 = jnp.asarray(rs.rand(n, 2), jnp.float32)
        ax = jnp.full(n, 0.3, jnp.float32)
        wh = bx.bk_sample_wh(wo, u2, ax, ax)
        pdf = np.asarray(bx.bk_pdf_wh(wo, wh, ax, ax))
        d = np.asarray(bx.bk_d(wh, ax, ax))
        ok = pdf > 1e-9
        est = np.where(ok, d * np.abs(np.asarray(wh[:, 2])) / np.maximum(pdf, 1e-9), 0).mean()
        assert abs(est - 1.0) < 0.05, est

    def test_lambda_monotone_in_roughness(self):
        # grazing direction so a = 1/(alpha tan) < 1.6 at high roughness
        w = jnp.asarray([[0.98, 0.0, 0.199]], jnp.float32)
        w = w / jnp.linalg.norm(w)
        l1 = float(np.asarray(bx.bk_lambda(w, jnp.float32(0.1), jnp.float32(0.1)))[0])
        l2 = float(np.asarray(bx.bk_lambda(w, jnp.float32(0.5), jnp.float32(0.5)))[0])
        assert l2 > 0.0
        assert l2 >= l1 >= 0.0

    def test_beckmann_bsdf_differs_from_tr(self):
        n = 128
        mt = jnp.full(n, sa.PLASTIC, jnp.int32)
        p = _params(n, kd=(0.2,) * 3, ks=(0.8,) * 3, rough=0.25)
        b_tr = bx.make_bsdf(mt, p, mat_mask=1 << sa.PLASTIC)
        b_bk = b_tr.replace(use_beckmann=True)
        wo = _rand_dirs(n, 21, "up")
        wi = _rand_dirs(n, 22, "up")
        f1 = np.asarray(bx.bsdf_f(b_tr, wo, wi, jnp.ones(n, bool)))
        f2 = np.asarray(bx.bsdf_f(b_bk, wo, wi, jnp.ones(n, bool)))
        assert np.isfinite(f1).all() and np.isfinite(f2).all()
        assert not np.allclose(f1, f2)
