"""Front-end parity wiring: named media, projection/gonio lights,
heightfield, cropwindow, ActiveTransform motion blur, integrator params
(reference api.rs pbrt_make_named_medium/pbrt_medium_interface :953,
make_light :769-952, get_shapes_and_materials :2016, make_integrator
:205-473, TransformSet :163)."""

import pytest
import numpy as np

from rs_pbrt_tpu.scene import arrays as sa
from rs_pbrt_tpu.scene import parser as ps
from rs_pbrt_tpu.scene.api import PbrtAPI


def _run(txt, overrides=None):
    api = PbrtAPI()
    for st in ps.parse_statements(txt):
        api.do_statement(st)
    return api.finish(overrides), api


class TestNamedMedia:
    def test_homogeneous_medium_interface(self):
        (scene, camera, cfg, scfg, fcfg, out), api = _run('''
            MakeNamedMedium "fog" "string type" "homogeneous"
                "rgb sigma_a" [0.1 0.2 0.3] "rgb sigma_s" [1 2 3] "float g" 0.4
            MediumInterface "" "fog"
            Camera "perspective" "float fov" 45
            WorldBegin
            MakeNamedMedium "goo" "string type" "homogeneous"
                "float scale" 2.0 "rgb sigma_s" [0.5 0.5 0.5]
            MediumInterface "goo" ""
            Shape "sphere" "float radius" 1
            WorldEnd
        ''')
        assert len(api.named_media) == 2
        # camera sits in "fog" (exterior at Camera statement)
        assert int(scene.camera_medium) == api.named_media["fog"]
        gid = api.named_media["goo"]
        assert np.allclose(np.asarray(scene.med_g)[api.named_media["fog"]], 0.4)
        assert np.allclose(np.asarray(scene.med_sigma_s)[gid], [1.0, 1.0, 1.0])
        # the sphere's interface: inside=goo, outside=vacuum
        assert np.asarray(scene.sph_med)[0].tolist() == [gid, -1]

    def test_heterogeneous_density_grid(self):
        (scene, *_), api = _run('''
            Camera "perspective"
            WorldBegin
            MakeNamedMedium "smoke" "string type" "heterogeneous"
                "integer nx" 2 "integer ny" 2 "integer nz" 2
                "point p0" [0 0 0] "point p1" [2 2 2]
                "float density" [1 2 3 4 5 6 7 8]
            MediumInterface "smoke" ""
            Shape "trianglemesh" "integer indices" [0 1 2]
                "point P" [0 0 0  1 0 0  0 1 0]
            WorldEnd
        ''')
        mid = api.named_media["smoke"]
        g = np.asarray(scene.med_grid)
        assert g.shape[1:] == (2, 2, 2)
        # index order (z*ny+y)*nx+x
        assert np.allclose(g[mid][0, 0, :], [1, 2])
        assert np.allclose(g[mid][1, 1, 1], 8)
        assert np.asarray(scene.tri_med)[0].tolist() == [mid, -1]
        # world->medium maps p1 corner to unit-cube corner
        w2m = np.asarray(scene.med_w2m)[mid]
        assert np.allclose(w2m @ np.array([2, 2, 2, 1.0]), [1, 1, 1, 1], atol=1e-5)

    def test_attribute_stack_restores_medium(self):
        _, api = _run('''
            Camera "perspective"
            WorldBegin
            MakeNamedMedium "fog" "string type" "homogeneous"
            AttributeBegin
            MediumInterface "fog" ""
            AttributeEnd
            WorldEnd
        ''')
        assert api.gs.medium_interface == (-1, -1)


class TestMediumRendering:
    @pytest.mark.slow
    def test_camera_in_fog_attenuates(self):
        """Beer-Lambert attenuation of an emitter seen through an absorbing
        camera medium wired via MediumInterface (reference volpath.rs:96 +
        homogeneous.rs tr :33)."""
        from rs_pbrt_tpu.models.integrators import render as rdr
        from rs_pbrt_tpu.ops.scene_intersect import build_accel

        def run(sig_a):
            (scene, camera, cfg, scfg, fcfg, out), _ = _run(f'''
                MakeNamedMedium "fog" "string type" "homogeneous"
                    "rgb sigma_a" [{sig_a} {sig_a} {sig_a}] "rgb sigma_s" [0 0 0]
                MediumInterface "" "fog"
                LookAt 0 0 -4  0 0 0  0 1 0
                Camera "perspective" "float fov" 60
                Film "image" "integer xresolution" 8 "integer yresolution" 8
                Sampler "random" "integer pixelsamples" 64
                Integrator "volpath" "integer maxdepth" 4
                WorldBegin
                AttributeBegin
                  AreaLightSource "diffuse" "rgb L" [10 10 10]
                  Shape "sphere" "float radius" 1
                AttributeEnd
                WorldEnd
            ''')
            assert int(scene.camera_medium) == 0
            accel = build_accel(scene)
            img = np.asarray(rdr.render(scene, camera, cfg, scfg, fcfg, accel=accel))
            return float(img.mean())

        clear, foggy = run(0.0), run(0.5)
        assert clear > 1.0
        ratio = foggy / clear
        # front face is ~3 fog units away: exp(-0.5*3) = 0.223; oblique
        # view rays traverse more fog, so the image-mean ratio sits below
        assert 0.1 < ratio < 0.3


class TestLights:
    def test_projection_and_gonio(self):
        (scene, *_), api = _run('''
            Camera "perspective"
            WorldBegin
            LightSource "projection" "rgb I" [1 2 3] "float fov" 30
            LightSource "goniometric" "rgb I" [4 5 6]
            WorldEnd
        ''')
        kinds = np.asarray(scene.light_type)[: scene.n_lights].tolist()
        assert sa.LIGHT_PROJECTION in kinds
        assert sa.LIGHT_GONIO in kinds


class TestShapes:
    def test_heightfield(self):
        (scene, *_), _ = _run('''
            Camera "perspective"
            WorldBegin
            Shape "heightfield" "integer nu" 3 "integer nv" 3
                "float Pz" [0 0 0  0 1 0  0 0 0]
            WorldEnd
        ''')
        assert scene.n_tris == 8

    def test_multisegment_curve(self):
        (scene, *_), _ = _run('''
            Camera "perspective"
            WorldBegin
            Shape "curve" "string type" "cylinder" "float width" 0.1
                "point P" [0 0 0  1 0 0  2 0 0  3 0 0
                           4 0 0  5 0 0  6 0 0]
            WorldEnd
        ''')
        # 2 bezier segments flattened to >0 leaf segments
        assert scene.n_curve_segs >= 2


class TestRenderOptions:
    def test_cropwindow_rr_lightstrategy(self):
        (scene, camera, cfg, *_), _ = _run('''
            Film "image" "integer xresolution" 64 "integer yresolution" 64
                "float cropwindow" [0.25 0.75 0.0 0.5]
            Integrator "path" "integer maxdepth" 3 "float rrthreshold" 0.5
                "string lightsamplestrategy" "uniform"
            Camera "perspective"
            WorldBegin
            WorldEnd
        ''')
        assert cfg.crop == (0.25, 0.75, 0.0, 0.5)
        assert cfg.rr_threshold == 0.5
        assert cfg.light_strategy == "uniform"
        assert cfg.max_depth == 3

    def test_integrator_extras(self):
        (_, _, cfg, *_), _ = _run('''
            Integrator "sppm" "integer numiterations" 4
                "integer photonsperiteration" 512 "float radius" 0.25
            Camera "perspective"
            WorldBegin
            WorldEnd
        ''')
        assert cfg.extra["n_iterations"] == 4
        assert cfg.extra["photons_per_iteration"] == 512
        assert cfg.extra["initial_radius"] == 0.25

    def test_accelerator_statement(self):
        (_, _, cfg, *_), _ = _run('''
            Accelerator "kdtree"
            Camera "perspective"
            WorldBegin
            WorldEnd
        ''')
        assert cfg.accelerator == "kdtree"

    def test_halton_maxmin_sampler_kinds(self):
        from rs_pbrt_tpu.models import samplers as smpl

        (_, _, _, scfg, *_), _ = _run('''
            Sampler "halton" "integer pixelsamples" 4
            Camera "perspective"
            WorldBegin
            WorldEnd
        ''')
        assert scfg.kind == smpl.HALTON
        (_, _, _, scfg2, *_), _ = _run('''
            Sampler "maxmindist" "integer pixelsamples" 4
            Camera "perspective"
            WorldBegin
            WorldEnd
        ''')
        assert scfg2.kind == smpl.MAXMIN


class TestMotionBlur:
    def test_active_transform_camera_anim(self):
        (scene, camera, *_), _ = _run('''
            TransformTimes 0 1
            ActiveTransform EndTime
            Translate 1 0 0
            ActiveTransform All
            Camera "perspective" "float shutteropen" 0.0
                "float shutterclose" 0.8
            WorldBegin
            WorldEnd
        ''')
        assert camera.anim  # animated transform attached
        assert float(camera.shutter_close) == np.float32(0.8)

    def test_static_camera_no_anim(self):
        (scene, camera, *_), _ = _run('''
            LookAt 0 0 -5 0 0 0 0 1 0
            Camera "perspective"
            WorldBegin
            WorldEnd
        ''')
        assert not camera.anim
