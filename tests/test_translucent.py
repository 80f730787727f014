"""Translucent material (LambertianTransmission) tests
(reference materials/translucent.rs + reflection.rs LambertianTransmission)."""

import numpy as np
import jax.numpy as jnp

from rs_pbrt_tpu.ops import bsdf as bx
from rs_pbrt_tpu.scene import arrays as sa


def _translucent_bsdf(n, kd=1.0, refl=0.5, trans=0.5):
    params = np.zeros((n, sa.N_MAT_PARAMS), np.float32)
    params[:, sa.MP_KD : sa.MP_KD + 3] = kd
    params[:, sa.MP_KR : sa.MP_KR + 3] = refl
    params[:, sa.MP_KT : sa.MP_KT + 3] = trans
    params[:, sa.MP_BSSRDF] = -1
    return bx.make_bsdf(
        jnp.full(n, sa.TRANSLUCENT, jnp.int32), jnp.asarray(params)
    )


def _sphere_dirs(n, seed):
    rng = np.random.default_rng(seed)
    u = rng.random((n, 2))
    z = 1 - 2 * u[:, 0]
    r = np.sqrt(np.maximum(0, 1 - z * z))
    ph = 2 * np.pi * u[:, 1]
    return jnp.asarray(np.stack([r * np.cos(ph), r * np.sin(ph), z], -1).astype(np.float32))


class TestTranslucent:
    N = 50000

    def test_energy_split(self):
        """∫ f |cos| over the sphere = refl + trans (white furnace split)."""
        b = _translucent_bsdf(self.N)
        wo = jnp.broadcast_to(jnp.asarray([0.0, 0.6, 0.8], jnp.float32), (self.N, 3))
        wi = _sphere_dirs(self.N, 0)
        same = np.asarray(wi[:, 2]) > 0
        f = bx.bsdf_f(b, wo, wi, jnp.asarray(same))
        total = float(jnp.mean(f[:, 0] * jnp.abs(wi[:, 2]))) * 4 * np.pi
        assert abs(total - 1.0) < 0.03
        # half the energy goes through
        f_up = np.asarray(f[:, 0])[same]
        f_dn = np.asarray(f[:, 0])[~same]
        assert abs(f_up.mean() - f_dn.mean()) < 0.02

    def test_sample_reaches_both_hemispheres(self):
        b = _translucent_bsdf(self.N)
        wo = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (self.N, 3))
        rng = np.random.default_rng(1)
        u2 = jnp.asarray(rng.random((self.N, 2)).astype(np.float32))
        uc = jnp.asarray(rng.random(self.N).astype(np.float32))
        bs = bx.bsdf_sample(b, wo, u2, uc)
        z = np.asarray(bs.wi[:, 2])
        frac_down = (z < 0).mean()
        assert 0.4 < frac_down < 0.6  # two equal-weight lobes
        # estimator: E[f cos / pdf] = refl + trans = 1
        est = np.where(
            np.asarray(bs.pdf) > 1e-6,
            np.asarray(bs.f[:, 0]) * np.abs(z) / np.maximum(np.asarray(bs.pdf), 1e-6),
            0.0,
        )
        assert abs(est.mean() - 1.0) < 0.03
