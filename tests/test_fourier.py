"""FourierBSDF tests against a synthetic Lambertian table
(reference reflection.rs:1480-1790; no .bsdf assets ship with the
reference, so the oracle is a table we construct whose exact BSDF is
rho/pi)."""

import pytest
import numpy as np
import jax.numpy as jnp

from rs_pbrt_tpu.ops import fourier_bsdf as fb

RHO = 0.6


def _dirs(n, seed, up=True):
    rng = np.random.default_rng(seed)
    u = rng.random((n, 2))
    z = u[:, 0] if up else -u[:, 0]
    r = np.sqrt(np.maximum(0, 1 - z * z))
    phi = 2 * np.pi * u[:, 1]
    return jnp.asarray(
        np.stack([r * np.cos(phi), r * np.sin(phi), z], -1).astype(np.float32)
    )


class TestFourierLambertian:
    def setup_method(self):
        self.ft = fb.to_device(fb.synth_lambertian_table(RHO, n_mu=32))

    def test_f_matches_rho_over_pi(self):
        n = 4096
        wo = _dirs(n, 0, up=True)
        wi = _dirs(n, 1, up=True)  # reflection: wo.z>0, wi.z>0 (mu_i<0)
        f = np.asarray(fb.fourier_f(self.ft, wo, wi))
        # away from the mu-grid edges the spline reproduces the constant
        mask = (np.asarray(wo[:, 2]) > 0.15) & (np.asarray(wi[:, 2]) > 0.15)
        np.testing.assert_allclose(f[mask], RHO / np.pi, rtol=0.08)

    def test_f_zero_without_table_transmission(self):
        n = 1024
        wo = _dirs(n, 2, up=True)
        wi = _dirs(n, 3, up=False)  # transmission cells are empty
        f = np.asarray(fb.fourier_f(self.ft, wo, wi))
        # away from the mu=0 spline boundary (grazing wi OR wo) where the
        # synthetic table's reflection cells leak through interpolation
        mask = (np.asarray(wi[:, 2]) < -0.2) & (np.asarray(wo[:, 2]) > 0.2)
        assert f[mask].max() < 1e-3

    def test_pdf_normalized(self):
        """∫ pdf dω over the sphere == 1 (per fixed wo)."""
        n = 100000
        rng = np.random.default_rng(4)
        u = rng.random((n, 2))
        z = 1 - 2 * u[:, 0]
        r = np.sqrt(np.maximum(0, 1 - z * z))
        ph = 2 * np.pi * u[:, 1]
        wi = jnp.asarray(np.stack([r * np.cos(ph), r * np.sin(ph), z], -1).astype(np.float32))
        wo = jnp.broadcast_to(jnp.asarray([0.3, 0.1, np.sqrt(1 - 0.1)], jnp.float32), (n, 3))
        pdf = np.asarray(fb.fourier_pdf(self.ft, wo, wi))
        integral = pdf.mean() * 4 * np.pi
        assert abs(integral - 1.0) < 0.05

    def test_sample_consistency(self):
        """sampled pdf == eval pdf, and E[f cos / pdf] == rho."""
        n = 50000
        rng = np.random.default_rng(5)
        u2 = jnp.asarray(rng.random((n, 2)).astype(np.float32))
        wo = jnp.broadcast_to(jnp.asarray([0.2, -0.3, np.sqrt(1 - 0.13)], jnp.float32), (n, 3))
        wi, pdf_s, f_s = fb.fourier_sample(self.ft, wo, u2)
        pdf_e = np.asarray(fb.fourier_pdf(self.ft, wo, wi))
        ok = pdf_e > 1e-4
        rel = np.abs(np.asarray(pdf_s)[ok] - pdf_e[ok]) / pdf_e[ok]
        assert np.quantile(rel, 0.95) < 0.05
        est = np.where(
            np.asarray(pdf_s) > 1e-6,
            np.asarray(f_s)[:, 0] * np.abs(np.asarray(wi)[:, 2]) / np.maximum(np.asarray(pdf_s), 1e-6),
            0.0,
        )
        assert abs(est.mean() - RHO) < 0.05 * RHO

    @pytest.mark.slow
    def test_scene_integration(self):
        """Fourier material renders through the path integrator."""
        from rs_pbrt_tpu.models import cameras as cam
        from rs_pbrt_tpu.models import samplers as smpl
        from rs_pbrt_tpu.models.integrators import render as rdr
        from rs_pbrt_tpu.scene.builder import SceneBuilder
        from rs_pbrt_tpu.utils import transform as tr

        b = SceneBuilder()
        m = b.add_fourier(table=fb.synth_lambertian_table(RHO, n_mu=32))
        V = np.array([[-2, 0, -2], [2, 0, -2], [2, 0, 2], [-2, 0, 2]], np.float32)
        F = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        b.add_triangle_mesh(F, V, material=m)
        b.add_point_light(p=(0.0, 3.0, 0.0), I=(10, 10, 10))
        scene = b.finalize()
        assert scene.has_fourier
        camera = cam.make_perspective(
            tr.look_at((0.0, 2.0, 3.0), (0.0, 0.0, 0.0), (0, 1, 0)), (16, 16), fov=60.0
        )
        cfg = rdr.RenderCfg("path", spp=4, max_depth=2, rr_threshold=1.0)
        scfg = smpl.make_sampler(smpl.SOBOL, 4, (16, 16))
        img = np.asarray(rdr.render(scene, camera, cfg, scfg))
        assert np.all(np.isfinite(img)) and img.max() > 1e-3
