"""Parser + API state machine tests."""

import numpy as np
import pytest

from rs_pbrt_tpu.scene import parser as ps
from rs_pbrt_tpu.scene.api import PbrtAPI, load_pbrt


class TestTokenizer:
    def test_statements_and_params(self):
        txt = '''
        # a comment
        LookAt 0 0 -5  0 0 0  0 1 0
        Camera "perspective" "float fov" [45]
        Film "image" "integer xresolution" [64] "integer yresolution" [32]
        WorldBegin
        Material "matte" "rgb Kd" [.5 .6 .7]
        Shape "sphere" "float radius" 2.5
        WorldEnd
        '''
        sts = list(ps.parse_statements(txt))
        names = [s.name for s in sts]
        assert names == ["LookAt", "Camera", "Film", "WorldBegin", "Material", "Shape", "WorldEnd"]
        assert sts[0].args == [0, 0, -5, 0, 0, 0, 0, 1, 0]
        assert ps.find_one(sts[1].params, "fov", 90.0) == 45
        assert ps.find_one(sts[2].params, "xresolution", 0) == 64
        assert ps.find_spectrum(sts[4].params, "Kd", None) == (0.5, 0.6, 0.7)
        assert ps.find_one(sts[5].params, "radius", 1.0) == 2.5

    def test_unbracketed_and_bool(self):
        sts = list(ps.parse_statements(
            'AreaLightSource "diffuse" "bool twosided" ["true"] "rgb L" [1 2 3]'
        ))
        assert ps.find_one(sts[0].params, "twosided", False) is True

    def test_bad_statement_raises(self):
        with pytest.raises(SyntaxError):
            list(ps.parse_statements("Bogus 1 2 3"))


class TestAPI:
    def test_cornell_file_builds(self):
        scene, camera, cfg, scfg, fcfg, out = load_pbrt(
            "assets/scenes/cornell_box.pbrt"
        )
        assert scene.n_tris == 32
        assert scene.n_lights == 1
        assert camera.resolution == (500, 500)
        assert cfg.integrator == "path" and cfg.max_depth == 5
        assert scfg.spp == 8

    def test_attribute_stack(self):
        api = PbrtAPI()
        for st in ps.parse_statements('''
            WorldBegin
            AttributeBegin
              Translate 5 0 0
              Material "mirror"
            AttributeEnd
            Shape "sphere" "float radius" 1
            WorldEnd
        '''):
            api.do_statement(st)
        # material + CTM restored: sphere gets the default material at origin
        scene = api.builder.finalize()
        assert scene.n_spheres == 1
        np.testing.assert_allclose(np.asarray(scene.sph_o2w)[0, :3, 3], 0.0)

    def test_instancing_flattens(self):
        api = PbrtAPI()
        for st in ps.parse_statements('''
            WorldBegin
            ObjectBegin "thing"
              Shape "trianglemesh" "integer indices" [0 1 2]
                "point P" [0 0 0  1 0 0  0 1 0]
            ObjectEnd
            ObjectInstance "thing"
            Translate 10 0 0
            ObjectInstance "thing"
            WorldEnd
        '''):
            api.do_statement(st)
        scene = api.builder.finalize()
        assert scene.n_tris == 2
        p0 = np.asarray(scene.tri_p0)
        assert abs(p0[1, 0] - p0[0, 0] - 10.0) < 1e-5

    def test_overrides(self):
        scene, camera, cfg, scfg, fcfg, out = load_pbrt(
            "assets/scenes/cornell_box.pbrt",
            overrides={"integrator": "ao", "samples": 4},
        )
        assert cfg.integrator == "ao"
        assert scfg.spp == 4

    def test_named_materials(self):
        api = PbrtAPI()
        for st in ps.parse_statements('''
            WorldBegin
            MakeNamedMaterial "shiny" "string type" "mirror" "rgb Kr" [.9 .9 .9]
            NamedMaterial "shiny"
            Shape "sphere" "float radius" 1
            WorldEnd
        '''):
            api.do_statement(st)
        scene = api.builder.finalize()
        from rs_pbrt_tpu.scene import arrays as sa
        assert int(scene.mat_type[int(scene.sph_mat[0])]) == sa.MIRROR

    def test_disk_is_analytic(self):
        from rs_pbrt_tpu.scene import arrays as sa

        api = PbrtAPI()
        for st in ps.parse_statements('''
            WorldBegin
            Shape "disk" "float radius" 2 "float height" 1
            WorldEnd
        '''):
            api.do_statement(st)
        scene = api.builder.finalize()
        # analytic quadric, not a tessellation (shapes/disk.rs parity)
        assert scene.n_tris == 0
        assert scene.n_spheres == 1
        assert int(np.asarray(scene.sph_kind)[0]) == sa.QK_DISK
        prm = np.asarray(scene.sph_params)[0]
        np.testing.assert_allclose(prm[:3], [2.0, 0.0, 1.0], atol=1e-6)

    def test_cone_still_tessellates(self):
        api = PbrtAPI()
        for st in ps.parse_statements('''
            WorldBegin
            Shape "cone" "float radius" 1 "float height" 2
            WorldEnd
        '''):
            api.do_statement(st)
        scene = api.builder.finalize()
        assert scene.n_tris > 32
