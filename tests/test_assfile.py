"""Arnold .ass importer tests (reference examples/parse_ass_file.rs)."""

import numpy as np
import pytest

from rs_pbrt_tpu.io.assfile import load_ass, parse_nodes

ASS = """
### exported: test
options
{
 xres 320
 yres 240
 camera "/obj/cam1"
}

persp_camera
{
 name "/obj/cam1"
 fov 1 1 FLOAT
  54.432224
 matrix
  1 0 0 0
  0 1 0 0
  0 0 1 0
  0 2 8 1
}

standard_surface
{
 name "/shop/red"
 base_color 1 1 RGB
  0.8 0.1 0.1
}

standard_surface
{
 name "/shop/steel"
 metalness 1 1 FLOAT
  1.0
 specular_roughness 1 1 FLOAT
  0.05
}

polymesh
{
 name "/obj/quad"
 nsides 1 1 UINT
  4
 vidxs 4 1 UINT
  0 1 2 3
 vlist 4 1 VECTOR
  -1 0 -1  1 0 -1  1 0 1  -1 0 1
 shader "/shop/red"
}

sphere
{
 name "/obj/ball"
 center 1 1 POINT
  0 1 0
 radius 1 1 FLOAT
  0.5
 shader "/shop/steel"
}

point_light
{
 name "/obj/lamp"
 position 1 1 POINT
  2 4 2
 color 1 1 RGB
  1 0.9 0.8
 intensity 1 1 FLOAT
  10
 exposure 1 1 FLOAT
  1
}
"""


class TestParse:
    def test_nodes_and_arrays(self):
        nodes = parse_nodes(ASS)
        kinds = [k for k, _ in nodes]
        assert kinds.count("standard_surface") == 2
        poly = dict(nodes)["polymesh"]
        assert poly["vlist"].shape == (12,)
        assert poly["vidxs"].tolist() == [0, 1, 2, 3]


class TestImport:
    def test_scene_builds(self):
        b, cam_info = load_ass(ASS)
        scene = b.finalize()
        assert cam_info["resolution"] == (320, 240)
        assert abs(cam_info["fov"] - 54.432224) < 1e-4
        np.testing.assert_allclose(cam_info["cam_to_world"][:3, 3], [0, 2, 8])
        # quad fan-triangulated into 2 tris; sphere + point light present
        assert scene.n_tris == 2
        assert scene.n_spheres == 1
        assert scene.n_lights == 1
        # exposure: I = color * intensity * 2^exposure = 0.9*10*2 for G
        lp = np.asarray(scene.light_params)[0]
        np.testing.assert_allclose(lp[3:6], [20.0, 18.0, 16.0], rtol=1e-5)
        # materials mapped: red matte + metallic steel
        mt = np.asarray(scene.mat_type)
        from rs_pbrt_tpu.scene import arrays as sa

        assert (mt == sa.MATTE).sum() >= 2  # default + red
        assert (mt == sa.METAL).sum() == 1

    @pytest.mark.slow
    def test_renders(self):
        from rs_pbrt_tpu.models import cameras as cam
        from rs_pbrt_tpu.models import samplers as smpl
        from rs_pbrt_tpu.models.integrators import render as rdr
        from rs_pbrt_tpu.utils import transform as tr

        b, ci = load_ass(ASS)
        scene = b.finalize()
        res = (16, 12)
        camera = cam.make_perspective(
            tr.from_matrix(np.asarray(ci["cam_to_world"], np.float32)),
            res, fov=ci["fov"],
        )
        cfg = rdr.RenderCfg("path", spp=2, max_depth=2, rr_threshold=1.0)
        scfg = smpl.make_sampler(smpl.SOBOL, 2, res)
        img = np.asarray(rdr.render(scene, camera, cfg, scfg))
        assert np.all(np.isfinite(img))


class TestAssQuadrics:
    def test_disk_and_cylinder(self):
        """Analytic disk/cylinder nodes (reference parse_ass_file.rs:995,
        1055: disk height 0 + hole, cylinder z in [0, radius])."""
        from rs_pbrt_tpu.io.assfile import load_ass
        from rs_pbrt_tpu.scene import arrays as sa

        b, cam = load_ass('''
options { xres 64 yres 64 }
disk { name d1 radius 0.7 hole 0.2 }
cylinder { name c1 radius 0.4 }
distant_light { name sun color 1 1 1 intensity 2 }
''')
        scene = b.finalize()
        assert scene.n_spheres == 2
        kinds = set(np.asarray(scene.sph_kind).tolist())
        assert kinds == {sa.QK_DISK, sa.QK_CYLINDER}
        prm = np.asarray(scene.sph_params)
        dsk = prm[np.asarray(scene.sph_kind) == sa.QK_DISK][0]
        np.testing.assert_allclose(dsk[0], 0.7)  # radius
        np.testing.assert_allclose(dsk[1], 0.2)  # inner (hole)
        cyl = prm[np.asarray(scene.sph_kind) == sa.QK_CYLINDER][0]
        np.testing.assert_allclose(cyl[0], 0.4)
        np.testing.assert_allclose(cyl[2], 0.4)  # z_max = radius


class TestAssPoints:
    def test_points_become_spheres(self):
        """points node -> one sphere per point with per-point radius
        (reference parse_ass_file.rs points handling)."""
        from rs_pbrt_tpu.io.assfile import load_ass
        from rs_pbrt_tpu.scene import arrays as sa

        b, cam = load_ass('''
options { xres 32 yres 32 }
points {
 name pts
 points 3 1 POINT 0 0 0  1 0 0  0 2 0
 radius 3 1 FLOAT 0.1 0.2 0.3
}
point_light { name l position 0 3 0 intensity 5 }
''')
        scene = b.finalize()
        assert scene.n_spheres == 3
        kinds = np.asarray(scene.sph_kind)
        assert (kinds == sa.QK_SPHERE).all()
        radii = np.sort(np.asarray(scene.sph_params)[:, 0])
        np.testing.assert_allclose(radii, [0.1, 0.2, 0.3], atol=1e-6)
