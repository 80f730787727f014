"""Per-BxDF white-furnace tests (VERDICT r3 weak #4: analytic-absolute
tier).  For each material family, the sampling-weighted albedo

    A = E[ f(wo, wi) |cos wi| / pdf(wi) ]

must stay <= 1 (+MC noise) with white parameters — no BSDF may create
energy — and must equal 1 for lossless configurations (ideal mirror with
kr=1, smooth glass with kr=kt=1, Lambertian kd=1).  Complements the
existing matte/disney/hair/translucent furnace tests with the remaining
families (reference reflection.rs rho() machinery; we estimate rho by the
same importance sampling the integrators use, so this also guards the
sample/pdf/f consistency of every lobe)."""

import numpy as np
import jax.numpy as jnp
import pytest

from rs_pbrt_tpu.ops import bsdf as bx
from rs_pbrt_tpu.scene.builder import SceneBuilder


def _albedo(add_fn, wo=(0.3, 0.1, 0.95), n=8192, seed=0, **kw):
    """Build a one-material scene, estimate rho(wo) by BSDF sampling."""
    b = SceneBuilder()
    mat = add_fn(b, **kw)
    # a dummy shape so finalize() has geometry
    b.add_sphere(radius=1.0, material=mat)
    scene = b.finalize()
    rs = np.random.RandomState(seed)
    bb = bx.make_bsdf_from_mat(scene, jnp.full((n,), mat, jnp.int32))
    wo = np.asarray(wo, np.float32)
    wo = wo / np.linalg.norm(wo)
    wo_t = jnp.tile(jnp.asarray(wo), (n, 1))
    u2 = jnp.asarray(rs.uniform(size=(n, 2)).astype(np.float32))
    uc = jnp.asarray(rs.uniform(size=n).astype(np.float32))
    s = bx.bsdf_sample(bb, wo_t, u2, uc)
    w = s.f * jnp.abs(s.wi[:, 2:3]) / jnp.maximum(s.pdf, 1e-12)[:, None]
    w = jnp.where((s.pdf > 0)[:, None], w, 0.0)
    return np.asarray(jnp.mean(w, axis=0))


class TestWhiteFurnace:
    def test_matte_lambert_exact(self):
        a = _albedo(lambda b: b.add_matte(kd=(1.0,) * 3))
        np.testing.assert_allclose(a, 1.0, atol=0.02)

    def test_matte_oren_nayar_bounded(self):
        a = _albedo(lambda b: b.add_matte(kd=(1.0,) * 3, sigma=20.0))
        assert (a < 1.05).all() and (a > 0.8).all(), a

    def test_mirror_exact(self):
        a = _albedo(lambda b: b.add_mirror(kr=(1.0,) * 3))
        np.testing.assert_allclose(a, 1.0, atol=1e-4)

    def test_glass_smooth_exact(self):
        # FresnelSpecular under RADIANCE transport: the transmitted share
        # carries the (eta_i/eta_t)^2 radiance-compression factor
        # (reflection.rs SpecularTransmission::sample_f), so
        # rho = F + (1-F)/eta^2 exactly — not 1
        eta = 1.5
        wo = np.asarray([0.3, 0.1, 0.95], np.float32)
        cos_i = float(wo[2] / np.linalg.norm(wo))
        F = float(bx.fr_dielectric(jnp.asarray(cos_i), 1.0, eta))
        a = _albedo(lambda b: b.add_glass(kr=(1, 1, 1), kt=(1, 1, 1), eta=eta))
        np.testing.assert_allclose(a, F + (1.0 - F) / eta**2, atol=0.02)

    def test_glass_rough_bounded(self):
        # same radiance convention: upper bound 1, lower bound ~1/eta^2
        # minus microfacet shadowing losses
        a = _albedo(
            lambda b: b.add_glass(kr=(1, 1, 1), kt=(1, 1, 1), eta=1.5,
                                  roughness=0.2)
        )
        assert (a < 1.1).all() and (a > 0.3).all(), a

    def test_plastic_bounded(self):
        a = _albedo(lambda b: b.add_plastic(kd=(0.5,) * 3, ks=(0.5,) * 3,
                                            roughness=0.1))
        assert (a < 1.1).all() and (a > 0.3).all(), a

    def test_metal_bounded(self):
        a = _albedo(lambda b: b.add_metal(roughness=0.05))
        assert (a < 1.1).all() and (a > 0.2).all(), a

    def test_substrate_bounded(self):
        # FresnelBlend couples diffuse+specular without energy creation
        a = _albedo(lambda b: b.add_substrate(kd=(1.0,) * 3, ks=(0.5,) * 3,
                                              roughness=0.2))
        assert (a < 1.1).all() and (a > 0.4).all(), a

    def test_uber_bounded(self):
        a = _albedo(lambda b: b.add_uber(kd=(0.5,) * 3, ks=(0.25,) * 3,
                                         kr=(0.25,) * 3, roughness=0.1))
        assert (a < 1.1).all() and (a > 0.3).all(), a

    def test_grazing_angles_bounded(self):
        # grazing wo is where microfacet energy errors blow up first
        for add in (
            lambda b: b.add_plastic(kd=(1.0,) * 3, ks=(1.0,) * 3, roughness=0.3),
            lambda b: b.add_substrate(kd=(1.0,) * 3, ks=(1.0,) * 3, roughness=0.3),
            lambda b: b.add_metal(roughness=0.3),
        ):
            a = _albedo(add, wo=(0.98, 0.0, 0.2))
            assert (a < 1.25).all(), a  # extra MC margin at grazing
