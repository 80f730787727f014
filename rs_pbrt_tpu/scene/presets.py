"""Built-in test scenes (host-side constructors).

cornell_box mirrors the classic Cornell data set (the scene the reference's
docs benchmark against, docs/source/getting_started.rst:152-200): white
floor/ceiling/back, red left wall, green right wall, two boxes, ceiling
area light.
"""

from __future__ import annotations

import numpy as np

from ..models import cameras as cam
from ..utils import transform as tr
from .builder import SceneBuilder


def _quad(b, p0, p1, p2, p3, material, area_light=None, **kw):
    """Two triangles for quad p0..p3 (counter-clockwise)."""
    pos = np.asarray([p0, p1, p2, p3], np.float32)
    idx = [[0, 1, 2], [0, 2, 3]]
    return b.add_triangle_mesh(idx, pos, material=material, area_light=area_light, **kw)


def cornell_box(resolution=(256, 256), light_scale=1.0, boxes=True):
    """Returns (scene, camera).  Classic Cornell geometry in cm units."""
    b = SceneBuilder()
    white = b.add_matte(kd=(0.73, 0.73, 0.73))
    red = b.add_matte(kd=(0.65, 0.05, 0.05))
    green = b.add_matte(kd=(0.12, 0.45, 0.15))
    light_mat = b.add_matte(kd=(0.0, 0.0, 0.0))

    # floor / ceiling / back wall / right x=556 (green) / left x=0 (red)
    # (layout matches the reference docs render: red left, green right,
    # tall block left)
    _quad(b, [552.8, 0, 0], [0, 0, 0], [0, 0, 559.2], [549.6, 0, 559.2], white)
    _quad(b, [556, 548.8, 0], [556, 548.8, 559.2], [0, 548.8, 559.2], [0, 548.8, 0], white)
    _quad(b, [549.6, 0, 559.2], [0, 0, 559.2], [0, 548.8, 559.2], [556, 548.8, 559.2], white)
    _quad(b, [556, 0, 0], [556, 0, 559.2], [556, 548.8, 559.2], [556, 548.8, 0], green)
    _quad(b, [0, 0, 559.2], [0, 0, 0], [0, 548.8, 0], [0, 548.8, 559.2], red)

    if boxes:
        # short block (image right-front)
        for q in _box_quads(
            [[426, 165, 65], [474, 165, 225], [316, 165, 272], [266, 165, 114]],
            0.0, 165.0,
        ):
            _quad(b, *q, white)
        # tall block (image left-behind)
        for q in _box_quads(
            [[133, 330, 247], [291, 330, 296], [242, 330, 456], [84, 330, 406]],
            0.0, 330.0,
        ):
            _quad(b, *q, white)

    # ceiling light (classic: 343..213 x, 227..332 z at y=548.8)
    L = np.asarray([50.0, 50.0, 50.0], np.float32) * light_scale
    _quad(
        b,
        [343, 548.75, 227], [343, 548.75, 332], [213, 548.75, 332], [213, 548.75, 227],
        light_mat,
        area_light=dict(L=tuple(L), two_sided=False),
    )

    scene = b.finalize()
    camera = cam.make_perspective(
        tr.look_at([278, 273, -800], [278, 273, 0], [0, 1, 0]),
        resolution,
        fov=39.3077,
    )
    return scene, camera


def _box_quads(top, y0, y1):
    """Quads for a box given its 4 top corners (at y1) and base y0."""
    t = [np.asarray(p, np.float32) for p in top]
    bo = [np.asarray([p[0], y0, p[2]], np.float32) for p in top]
    quads = [tuple(t)]  # top
    for i in range(4):
        j = (i + 1) % 4
        quads.append((t[i], bo[i], bo[j], t[j]))  # sides
    return quads


def spheres_direct(resolution=(256, 256)):
    """BASELINE config 2 scene: matte + mirror spheres on a floor lit by
    a quad area light AND a sphere area light, for the directlighting /
    whitted integrators (reference README.md gallery spheres scenes)."""
    b = SceneBuilder()
    floor = b.add_matte(kd=(0.6, 0.6, 0.6))
    matte = b.add_matte(kd=(0.5, 0.2, 0.2))
    mirror = b.add_mirror(kr=(0.9, 0.9, 0.9))
    dark = b.add_matte(kd=(0.0, 0.0, 0.0))
    _quad(b, [-6, 0, -6], [6, 0, -6], [6, 0, 6], [-6, 0, 6], floor)
    b.add_sphere(tr.translate([-1.1, 1.0, 0]), radius=1.0, material=matte)
    b.add_sphere(tr.translate([1.1, 1.0, 0.4]), radius=1.0, material=mirror)
    # quad area light overhead
    _quad(
        b, [-1.5, 4.0, -1.0], [-0.5, 4.0, -1.0], [-0.5, 4.0, 0.0], [-1.5, 4.0, 0.0],
        dark, area_light=dict(L=(18.0, 18.0, 18.0), two_sided=False),
    )
    # sphere area light to the side
    b.add_sphere(
        tr.translate([2.5, 2.5, -2.0]), radius=0.3, material=dark,
        area_light=dict(L=(40.0, 40.0, 40.0)),
    )
    scene = b.finalize()
    camera = cam.make_perspective(
        tr.look_at([0, 2.2, 6.5], [0, 1.0, 0], [0, 1, 0]), resolution, fov=45.0
    )
    return scene, camera


def furnace_sphere(resolution=(64, 64), albedo=0.5, env_l=1.0):
    """Furnace test: matte sphere of given albedo inside a constant env.
    Every pixel on the sphere must converge to env_l (energy conservation)."""
    b = SceneBuilder()
    m = b.add_matte(kd=(albedo,) * 3)
    b.add_sphere(tr.translate([0, 0, 0]), radius=1.0, material=m)
    b.add_infinite_light(radiance_map=np.full((4, 8, 3), env_l, np.float32))
    scene = b.finalize()
    camera = cam.make_perspective(
        tr.look_at([0, 0, -4], [0, 0, 0], [0, 1, 0]), resolution, fov=30.0
    )
    return scene, camera
