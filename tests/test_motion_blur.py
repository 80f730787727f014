"""Object-level motion blur (reference TransformedPrimitive with
AnimatedTransform, primitive.rs:198-265 + transform.rs:894): animated
triangle meshes keep object-space geometry; rays are carried into object
space by the inverse interpolated transform at RAY TIME."""

import numpy as np
import pytest

from rs_pbrt_tpu.models import cameras as cam
from rs_pbrt_tpu.models import samplers as smpl
from rs_pbrt_tpu.models.integrators import render as rdr
from rs_pbrt_tpu.scene.builder import SceneBuilder
from rs_pbrt_tpu.utils import transform as tr

QUAD_IDX = [[0, 1, 2], [0, 2, 3]]


def _render(scene, camera, spp=16, max_depth=1, sampler=smpl.RANDOM):
    cfg = rdr.RenderCfg("path", spp=spp, max_depth=max_depth, rr_threshold=1.0)
    scfg = smpl.make_sampler(sampler, spp, camera.resolution)
    return np.asarray(rdr.render(scene, camera, cfg, scfg))


def _scene(translate_end=None, static_offset=(0.0, 0.0, 0.0)):
    """Unit quad at z=0 facing +z, lit head-on by a distant light; ortho-ish
    narrow-fov camera on the +z axis."""
    b = SceneBuilder()
    m = b.add_matte(kd=(0.8, 0.8, 0.8))
    pos = np.array(
        [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32
    )
    t0 = tr.translate(static_offset)
    if translate_end is None:
        b.add_triangle_mesh(QUAD_IDX, pos, material=m, object_to_world=t0)
    else:
        b.add_animated_triangle_mesh(
            QUAD_IDX, pos, t0, tr.translate(translate_end), material=m
        )
    b.add_distant_light(from_p=(0, 0, 1), to=(0, 0, 0), L=(2.0, 2.0, 2.0))
    scene = b.finalize()
    camera = cam.make_perspective(
        tr.look_at([0, 0, 8], [0, 0, 0], [0, 1, 0]), (33, 33), fov=30.0
    )
    return scene, camera


class TestAnimatedMesh:
    @pytest.mark.slow
    def test_static_pair_matches_regular_mesh(self):
        """Identical start/end transforms must reproduce the static render
        (up to the path through object space, which is exact here)."""
        s_ref, camera = _scene()
        s_anim, _ = _scene(translate_end=(0.0, 0.0, 0.0))
        a = _render(s_ref, camera, spp=4)
        b = _render(s_anim, camera, spp=4)
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)

    def test_shutter_coverage_halves_brightness(self):
        """A quad sliding fully out of a pixel's line of sight over the
        shutter leaves ~(coverage fraction) of the static radiance: a
        pixel at the quad's trailing edge is covered for half the shutter
        when the quad moves by its own width."""
        s_anim, camera = _scene(translate_end=(2.0, 0.0, 0.0))
        s_static, _ = _scene()
        img_a = _render(s_anim, camera, spp=256)
        img_s = _render(s_static, camera, spp=16)
        c = 16  # center pixel: starts covered (quad spans x in [-1,1]),
        # covered while x_offset(t) = 2t < 1 -> half the shutter
        val_s = img_s[c, c, 0]
        val_a = img_a[c, c, 0]
        assert val_s > 0.1
        np.testing.assert_allclose(val_a, 0.5 * val_s, rtol=0.15)

    @pytest.mark.slow
    def test_blur_is_directional(self):
        """The quad sweeps +x: a pixel just beyond the leading edge gains
        partial coverage; the mirrored pixel behind the trailing edge
        (never covered — the quad moves away from it) stays black."""
        s_anim, camera = _scene(translate_end=(2.0, 0.0, 0.0))
        img_a = _render(s_anim, camera, spp=256)
        # this camera maps world +x to DECREASING pixel column:
        # pixel 6 -> world x ~ +1.3 (covered for ~85% of the shutter);
        # pixel 26 -> world x ~ -1.3 (never covered: the quad moves away)
        leading = img_a[16, 6, 0]
        behind = img_a[16, 26, 0]
        assert leading > 0.05
        assert behind < 1e-3

    @pytest.mark.slow
    def test_shadow_rays_see_motion(self):
        """Occluder sweeping across a light path: ground point shadowed
        for the fraction of shutter the quad blocks the (vertical) light.
        The camera grazes UNDER the occluder so primary rays only see the
        ground; target pixels are located by projecting primary rays."""
        import jax.numpy as jnp

        b = SceneBuilder()
        m = b.add_matte(kd=(0.8,) * 3)
        g = 6.0
        b.add_triangle_mesh(
            QUAD_IDX,
            [[-g, 0, -g], [g, 0, -g], [g, 0, g], [-g, 0, g]],
            material=m,
        )
        occ = np.array(
            [[-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1]], np.float32
        )
        b.add_animated_triangle_mesh(
            QUAD_IDX, occ, tr.translate((0.0, 2.0, 0.0)),
            tr.translate((2.0, 2.0, 0.0)), material=m,
        )
        b.add_distant_light(from_p=(0, 1, 0), to=(0, 0, 0), L=(2.0,) * 3)
        scene = b.finalize()
        res = 33
        camera = cam.make_perspective(
            tr.look_at([0, 1.0, 8.0], [0, 0, 0], [0, 1, 0]), (res, res), fov=30.0
        )
        # locate the pixels whose primary rays hit the ground nearest
        # (0,0,0) (50% shutter occlusion) and (2.5,0,0)/(−2.5,0,0) (never)
        ys, xs = np.mgrid[0:res, 0:res]
        pf = np.stack([xs.ravel() + 0.5, ys.ravel() + 0.5], -1).astype(np.float32)
        rays = cam.generate_rays(
            camera, jnp.asarray(pf), jnp.zeros((res * res, 2), jnp.float32),
            jnp.zeros((res * res,), jnp.float32),
        )
        o = np.asarray(rays.o)
        d = np.asarray(rays.d)
        t_ground = -o[:, 1] / d[:, 1]
        hitp = o + t_ground[:, None] * d

        def pixel_near(target):
            i = np.argmin(np.linalg.norm(hitp - np.asarray(target), axis=1))
            return i // res, i % res

        py0, px0 = pixel_near((0.0, 0.0, 0.0))
        py1, px1 = pixel_near((-2.5, 0.0, 0.0))  # behind the sweep: never
        img = _render(scene, camera, spp=256)
        center = img[py0, px0, 0]
        clear = img[py1, px1, 0]
        assert clear > 0.1
        np.testing.assert_allclose(center, 0.5 * clear, rtol=0.2)


class TestPbrtActiveTransform:
    def test_parser_builds_animated_mesh(self, tmp_path):
        scene_txt = """
Film "image" "integer xresolution" [17] "integer yresolution" [17]
Sampler "random" "integer pixelsamples" [4]
Integrator "path" "integer maxdepth" [1]
LookAt 0 0 8  0 0 0  0 1 0
Camera "perspective" "float fov" [30]
WorldBegin
LightSource "distant" "point from" [0 0 1] "point to" [0 0 0] "rgb L" [2 2 2]
ActiveTransform StartTime
Identity
ActiveTransform EndTime
Translate 2 0 0
ActiveTransform All
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point P" [-1 -1 0  1 -1 0  1 1 0  -1 1 0]
WorldEnd
"""
        f = tmp_path / "anim.pbrt"
        f.write_text(scene_txt)
        from rs_pbrt_tpu.scene.api import load_pbrt

        scene, camera, cfg, scfg, fcfg, _ = load_pbrt(str(f), {})
        assert scene.n_anim_tris == 2
        assert scene.n_anim_groups == 1
