"""Per-bxdf mix materials (reference materials/mixmat.rs) — VERDICT r1
gap: mix was approximated by build-time parameter blending; it now scales
the two children's lobes through the 4-slot stack at shade time."""

import pytest
import jax.numpy as jnp
import numpy as np

from rs_pbrt_tpu.models import cameras as cam
from rs_pbrt_tpu.models import samplers as smpl
from rs_pbrt_tpu.models.integrators import render as rdr
from rs_pbrt_tpu.ops import bsdf as bx
from rs_pbrt_tpu.scene import arrays as sa
from rs_pbrt_tpu.scene.builder import SceneBuilder
from rs_pbrt_tpu.utils import transform as tr


def test_mix_lobes_resolved():
    b = SceneBuilder()
    ma = b.add_matte(kd=(0.8, 0.2, 0.2))
    mb = b.add_metal(roughness=0.1)
    mm = b.add_mix(ma, mb, amount=(0.25,) * 3)
    b.add_sphere(material=mm)
    scene = b.finalize()

    class FakeIt:
        mat = jnp.full(4, mm, jnp.int32)
        uv = jnp.zeros((4, 2), jnp.float32)
        p = jnp.zeros((4, 3), jnp.float32)

    bs = bx.make_bsdf_at(scene, FakeIt)
    k = set(np.asarray(bs.kind0).tolist()) | set(np.asarray(bs.kind2).tolist())
    assert bx.LOBE_LAMBERT in k  # child A (matte), slot 0
    assert bx.LOBE_MICROFACET_REFL_COND in k  # child B (metal), slot 2
    # child A scaled by amount
    np.testing.assert_allclose(
        np.asarray(bs.r0)[0], np.array([0.8, 0.2, 0.2]) * 0.25, rtol=1e-5
    )


@pytest.mark.slow
def test_mix_render_is_lobewise_blend():
    """A mix(matte, mirror, a) render must show BOTH diffuse shading and
    the mirror reflection, and equal the a-blend of the pure renders (the
    estimator is linear in the BSDF)."""

    def scene_with(mat_fn):
        b = SceneBuilder()
        floor = b.add_matte(kd=(0.3, 0.5, 0.3))
        b.add_triangle_mesh(
            [[0, 1, 2], [0, 2, 3]],
            [[-10, 0, -10], [-10, 0, 10], [10, 0, 10], [10, 0, -10]],
            material=floor,
        )
        m = mat_fn(b)
        b.add_sphere(object_to_world=tr.translate([0, 1.2, 0]), radius=1.0, material=m)
        b.add_point_light(p=(3, 6, -3), I=(120.0,) * 3)
        return b.finalize()

    camera = cam.make_perspective(
        tr.look_at([0, 2.5, -5.5], [0, 1, 0], [0, 1, 0]), (20, 20), fov=40.0
    )
    cfg = rdr.RenderCfg("path", spp=16, max_depth=3, rr_threshold=1.0)
    scfg = smpl.make_sampler(smpl.SOBOL, 16, (20, 20))

    a = 0.6
    img_mix = np.asarray(rdr.render(
        scene_with(lambda b: b.add_mix(
            b.add_matte(kd=(0.7, 0.1, 0.1)), b.add_mirror(kr=(0.9,) * 3),
            amount=(a,) * 3,
        )), camera, cfg, scfg,
    ))
    img_matte = np.asarray(rdr.render(
        scene_with(lambda b: b.add_matte(kd=(0.7, 0.1, 0.1))), camera, cfg, scfg,
    ))
    img_mirr = np.asarray(rdr.render(
        scene_with(lambda b: b.add_mirror(kr=(0.9,) * 3)), camera, cfg, scfg,
    ))
    blend = a * img_matte + (1 - a) * img_mirr
    assert np.isfinite(img_mix).all()
    np.testing.assert_allclose(img_mix.mean(), blend.mean(), rtol=0.04)
    close = np.isclose(img_mix, blend, rtol=0.08, atol=0.01).mean()
    assert close > 0.9, close
