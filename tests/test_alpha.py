"""Alpha / shadow-alpha mask cutouts on triangle meshes.

Reference semantics: a hit whose alpha texture evaluates to 0 is skipped
entirely (triangle.rs:313-327); shadow queries additionally apply the
shadow-alpha mask (triangle.rs:593-650); the "alpha"/"shadowalpha" shape
parameters bind a float texture or the literal 0.0 (api.rs:1920-1940).
"""

import pytest
import jax.numpy as jnp
import numpy as np

from rs_pbrt_tpu.ops import scene_intersect as si
from rs_pbrt_tpu.ops import texture as tx
from rs_pbrt_tpu.scene.builder import SceneBuilder


def _quad(b, z, material, **kw):
    # unit quad [-1,1]^2 at depth z, uv spanning [0,1]^2
    pos = [[-1, -1, z], [1, -1, z], [1, 1, z], [-1, 1, z]]
    uv = [[0, 0], [1, 0], [1, 1], [0, 1]]
    b.add_triangle_mesh([[0, 1, 2], [0, 2, 3]], pos, uvs=uv, material=material, **kw)


def _checker_alpha(b):
    """2x2 checkerboard float texture: 1 in even cells, 0 in odd cells."""
    t_one = b.add_texture(tx.TEX_CONSTANT, {tx.TP_VALUE: (1.0, 1.0, 1.0)})
    t_zero = b.add_texture(tx.TEX_CONSTANT, {tx.TP_VALUE: (0.0, 0.0, 0.0)})
    return b.add_texture(
        tx.TEX_CHECKER, {tx.TP_SU: 2.0, tx.TP_SV: 2.0}, children=(t_one, t_zero)
    )


def _rays():
    # one ray through each checker cell of the front quad, +z direction
    # cell centers in uv: (.25,.25) even->alpha 1, (.75,.25) odd->alpha 0
    xy = np.array([[-0.5, -0.5], [0.5, -0.5], [0.5, 0.5], [-0.5, 0.5]], np.float32)
    o = np.concatenate([xy, np.full((4, 1), -1.0, np.float32)], axis=1)
    d = np.tile(np.array([[0, 0, 1.0]], np.float32), (4, 1))
    return jnp.asarray(o), jnp.asarray(d)


class TestAlphaMask:
    def test_closest_hit_skips_zero_alpha(self):
        b = SceneBuilder()
        m = b.add_matte()
        alpha = _checker_alpha(b)
        _quad(b, 1.0, m, alpha_tex=alpha)
        _quad(b, 2.0, m)
        scene = b.finalize()
        assert scene.has_alpha
        o, d = _rays()
        it = si.scene_intersect(scene, o, d, jnp.full(4, 100.0))
        t = np.asarray(it.t)
        assert np.asarray(it.valid).all()
        # even cells (rays 0,2) hit the front quad, odd cells see through
        np.testing.assert_allclose(t[[0, 2]], 2.0, atol=1e-3)
        np.testing.assert_allclose(t[[1, 3]], 3.0, atol=1e-3)

    def test_full_mask_sees_through_everything(self):
        b = SceneBuilder()
        m = b.add_matte()
        zero = b.add_texture(tx.TEX_CONSTANT, {tx.TP_VALUE: (0.0, 0.0, 0.0)})
        _quad(b, 1.0, m, alpha_tex=zero)
        scene = b.finalize()
        o, d = _rays()
        it = si.scene_intersect(scene, o, d, jnp.full(4, 100.0))
        assert not np.asarray(it.valid).any()

    @pytest.mark.slow
    def test_shadow_honors_both_masks(self):
        b = SceneBuilder()
        m = b.add_matte()
        alpha = _checker_alpha(b)
        _quad(b, 1.0, m, alpha_tex=alpha)
        scene = b.finalize()
        o, d = _rays()
        occ = np.asarray(si.scene_intersect_p(scene, o, d, jnp.full(4, 100.0)))
        assert occ[0] and occ[2] and not occ[1] and not occ[3]

        # shadow-alpha only: primary rays still hit, shadow rays pass
        b2 = SceneBuilder()
        m2 = b2.add_matte()
        zero = b2.add_texture(tx.TEX_CONSTANT, {tx.TP_VALUE: (0.0,) * 3})
        _quad(b2, 1.0, m2, shadow_alpha_tex=zero)
        s2 = b2.finalize()
        it = si.scene_intersect(s2, o, d, jnp.full(4, 100.0))
        assert np.asarray(it.valid).all()
        occ2 = np.asarray(si.scene_intersect_p(s2, o, d, jnp.full(4, 100.0)))
        assert not occ2.any()

    def test_no_alpha_flag_when_absent(self):
        b = SceneBuilder()
        _quad(b, 1.0, b.add_matte())
        scene = b.finalize()
        assert not scene.has_alpha

    def test_parser_binds_alpha(self):
        from rs_pbrt_tpu.scene.api import PbrtAPI
        from rs_pbrt_tpu.scene.parser import parse_statements

        txt = """
        Camera "perspective" "float fov" [60]
        Film "image" "integer xresolution" [8] "integer yresolution" [8]
        WorldBegin
        Texture "cut" "float" "constant" "float value" [0]
        Shape "trianglemesh" "integer indices" [0 1 2]
            "point P" [-1 -1 1  1 -1 1  0 1 1]
            "texture alpha" "cut"
        WorldEnd
        """
        api = PbrtAPI()
        for st in parse_statements(txt):
            api.do_statement(st)
        scene = api.builder.finalize()
        assert scene.has_alpha
        assert int(np.asarray(scene.tri_alpha)[0]) >= 0
