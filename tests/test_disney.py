"""Full Disney lobe set (reference materials/disney.rs:640) — VERDICT r1
gap #10: sheen, clearcoat, spec-tint, anisotropic, specular transmission;
r2 #9: THIN-surface mode (flatness fake-SS blend + diffuse transmission
lobe, disney.rs thin branch)."""

import jax
import jax.numpy as jnp
import numpy as np

from rs_pbrt_tpu.ops import bsdf as bx
from rs_pbrt_tpu.scene import arrays as sa


def _disney_bsdf(n=4, **kw):
    from rs_pbrt_tpu.scene.builder import SceneBuilder

    b = SceneBuilder()
    mid = b.add_disney(**kw)
    p = jnp.asarray(np.tile(b.mats[mid][1], (n, 1)))
    mt = jnp.full(n, sa.DISNEY, jnp.int32)
    return bx.make_bsdf(mt, p, mat_mask=1 << sa.DISNEY)


def _kinds(b):
    ks = set(np.asarray(b.kind0).tolist()) | set(np.asarray(b.kind1).tolist())
    if b.kind2 is not None:
        ks |= set(np.asarray(b.kind2).tolist()) | set(np.asarray(b.kind3).tolist())
    return ks


class TestLobeActivation:
    def test_base_two_lobes(self):
        b = _disney_bsdf(color=(0.5, 0.5, 0.5), roughness=0.4)
        ks = _kinds(b)
        assert bx.LOBE_DISNEY_DIFFUSE in ks and bx.LOBE_DISNEY_GLOSS in ks
        assert bx.LOBE_DISNEY_CLEARCOAT not in ks
        assert bx.LOBE_DISNEY_SHEEN not in ks

    def test_clearcoat_and_sheen(self):
        b = _disney_bsdf(color=(0.5, 0.2, 0.1), clearcoat=1.0, sheen=0.8)
        ks = _kinds(b)
        assert bx.LOBE_DISNEY_CLEARCOAT in ks
        assert bx.LOBE_DISNEY_SHEEN in ks

    def test_spec_trans_beats_sheen(self):
        b = _disney_bsdf(color=(0.8,) * 3, spec_trans=0.9, sheen=0.5)
        ks = _kinds(b)
        assert bx.LOBE_MICROFACET_TRANS in ks
        assert bx.LOBE_DISNEY_SHEEN not in ks

    def test_anisotropy_splits_alphas(self):
        b = _disney_bsdf(roughness=0.5, anisotropic=0.8)
        ax = float(np.asarray(b.ax)[0])
        ay = float(np.asarray(b.ay)[0])
        assert ax > ay  # aspect < 1: ax = a/aspect, ay = a*aspect
        b0 = _disney_bsdf(roughness=0.5, anisotropic=0.0)
        np.testing.assert_allclose(np.asarray(b0.ax), np.asarray(b0.ay))


def _hemi_integral(b, wo, n_samples=40000, seed=0):
    """MC estimate of int f |cos| dw over the sphere via uniform sphere."""
    rs = np.random.RandomState(seed)
    u = rs.uniform(size=(n_samples, 2)).astype(np.float32)
    z = 1 - 2 * u[:, 0]
    r = np.sqrt(np.maximum(0, 1 - z * z))
    phi = 2 * np.pi * u[:, 1]
    wi = jnp.asarray(np.stack([r * np.cos(phi), r * np.sin(phi), z], -1))
    wo_t = jnp.tile(jnp.asarray(wo, jnp.float32)[None], (n_samples, 1))
    bb = jax.tree_util.tree_map(
        lambda a: jnp.tile(a, (n_samples,) + (1,) * (a.ndim - 1))
        if hasattr(a, "ndim") and a.ndim >= 1 else a,
        b,
    )
    reflect = wi[:, 2] * wo_t[:, 2] > 0
    f = bx.bsdf_f(bb, wo_t, wi, reflect)
    cos = jnp.abs(wi[:, 2])
    return np.asarray((f * cos[:, None]).mean(0) * 4 * np.pi)


class TestEnergy:
    def test_white_furnace_bounded(self):
        """Albedo of every configuration stays <= ~1 (no energy creation)."""
        for kw in (
            dict(color=(1.0,) * 3, roughness=0.3),
            dict(color=(1.0,) * 3, metallic=1.0, roughness=0.2),
            dict(color=(1.0,) * 3, clearcoat=1.0, sheen=1.0, roughness=0.5),
            dict(color=(1.0,) * 3, spec_trans=1.0, roughness=0.3),
        ):
            b = _disney_bsdf(n=1, **kw)
            alb = _hemi_integral(b, [0.3, 0.1, 0.95])
            assert (alb < 1.15).all(), (kw, alb)  # MC noise margin
            assert (alb > 0.01).all(), (kw, alb)

    def test_sheen_adds_grazing_energy(self):
        b0 = _disney_bsdf(n=1, color=(0.5,) * 3, roughness=0.5, sheen=0.0)
        b1 = _disney_bsdf(n=1, color=(0.5,) * 3, roughness=0.5, sheen=1.0)
        wo = [0.95, 0.0, 0.31]  # grazing
        a0 = _hemi_integral(b0, wo)
        a1 = _hemi_integral(b1, wo)
        assert (a1 > a0 + 1e-3).all()

    def test_sample_pdf_consistency(self):
        """bsdf_sample's reported pdf matches bsdf_pdf for sampled dirs."""
        b = _disney_bsdf(n=512, color=(0.6, 0.4, 0.3), clearcoat=1.0,
                         sheen=0.5, roughness=0.4)
        rs = np.random.RandomState(1)
        u2 = jnp.asarray(rs.uniform(size=(512, 2)).astype(np.float32))
        uc = jnp.asarray(rs.uniform(size=512).astype(np.float32))
        wo = jnp.asarray(
            np.tile(np.array([0.3, -0.2, 0.93], np.float32) / np.linalg.norm([0.3, -0.2, 0.93]), (512, 1))
        )
        s = bx.bsdf_sample(b, wo, u2, uc)
        pdf2 = bx.bsdf_pdf(b, wo, s.wi)
        m = np.asarray(s.pdf) > 1e-5
        np.testing.assert_allclose(
            np.asarray(s.pdf)[m], np.asarray(pdf2)[m], rtol=1e-3
        )


class TestThinMode:
    def test_thin_defaults_match_non_thin(self):
        """thin=False leaves every lobe exactly as before."""
        a = _disney_bsdf(color=(0.5, 0.3, 0.2), roughness=0.4)
        b = _disney_bsdf(color=(0.5, 0.3, 0.2), roughness=0.4, thin=False,
                         flatness=0.7, diff_trans=0.9)  # ignored when not thin
        for f in ("kind0", "kind1", "r0", "r1"):
            np.testing.assert_array_equal(np.asarray(getattr(a, f)),
                                          np.asarray(getattr(b, f)))
        if b.kind4 is not None:
            assert set(np.asarray(b.kind4).tolist()) == {bx.LOBE_NONE}

    def test_diff_trans_splits_energy(self):
        """diffTrans=1 -> dt=0.5: half the diffuse energy moves to the
        LambertianTransmission lobe (disney.rs thin branch)."""
        full = _disney_bsdf(color=(0.6,) * 3, roughness=0.3)
        thin = _disney_bsdf(color=(0.6,) * 3, roughness=0.3, thin=True,
                            diff_trans=1.0)
        assert thin.kind4 is not None
        assert set(np.asarray(thin.kind4).tolist()) == {bx.LOBE_LAMBERT_TRANS}
        # reflection lobe color halves; transmission lobe carries the rest
        np.testing.assert_allclose(np.asarray(thin.r0), np.asarray(full.r0) * 0.5,
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(thin.r4), np.asarray(full.r0) * 0.5,
                                   rtol=1e-6)
        # transmission side actually scatters below the surface
        n = thin.kind0.shape[0]
        wo = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (n, 3))
        wi_t = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, -1.0], jnp.float32), (n, 3))
        f_t = np.asarray(bx.bsdf_f(thin, wo, wi_t, jnp.zeros(n, bool)))
        assert (f_t > 0).all()
        f_t_full = np.asarray(bx.bsdf_f(full, wo, wi_t, jnp.zeros(n, bool)))
        np.testing.assert_allclose(f_t_full, 0.0, atol=1e-7)

    def test_thin_furnace_bounded(self):
        """Hemispherical reflect+transmit albedo of a thin flat surface
        stays <= base color (energy conservation with flatness + dt)."""
        rs = np.random.RandomState(5)
        n = 60000
        b1 = _disney_bsdf(n=n, color=(0.8,) * 3, roughness=0.5, thin=True,
                          flatness=1.0, diff_trans=0.8)
        wo = jnp.broadcast_to(jnp.asarray([0.3, 0.1, 0.949], jnp.float32), (n, 3))
        wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
        s = bx.bsdf_sample(
            b1, wo, jnp.asarray(rs.rand(n, 2), jnp.float32),
            jnp.asarray(rs.rand(n), jnp.float32),
        )
        ok = np.asarray(s.pdf) > 1e-9
        thru = np.where(
            ok,
            np.asarray(s.f).mean(-1) * np.abs(np.asarray(s.wi)[:, 2])
            / np.maximum(np.asarray(s.pdf), 1e-9),
            0.0,
        ).mean()
        assert 0.05 < thru < 1.0, thru
        assert bool(np.any(np.asarray(s.is_transmission)))

    def test_flatness_changes_shape_not_sign(self):
        flat = _disney_bsdf(color=(0.5,) * 3, roughness=0.6, thin=True,
                            flatness=1.0)
        base = _disney_bsdf(color=(0.5,) * 3, roughness=0.6)
        n = flat.kind0.shape[0]
        wo = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (n, 3))
        # grazing wi: fake-SS term redistributes energy toward grazing
        wi = jnp.asarray([[0.0, 0.98, 0.199]] * n, jnp.float32)
        wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
        f_flat = np.asarray(bx.bsdf_f(flat, wo, wi, jnp.ones(n, bool)))
        f_base = np.asarray(bx.bsdf_f(base, wo, wi, jnp.ones(n, bool)))
        assert (f_flat > 0).all() and (f_base > 0).all()
        assert not np.allclose(f_flat, f_base)
