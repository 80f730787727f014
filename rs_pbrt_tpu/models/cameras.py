"""Cameras as batched ray generators.

TPU-native replacement for reference src/core/camera.rs + src/cameras/*.
A Camera is a small pytree (tag + transforms + scalars); ``generate_rays``
maps (N,) film samples -> (N,) world rays entirely on the VPU.  Realistic
lens tracing comes later (cameras/realistic.rs).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops.sampling import concentric_sample_disk
from ..utils import transform as tr
from ..utils import vecmath as vm

PERSPECTIVE = 0
ORTHOGRAPHIC = 1
ENVIRONMENT = 2
REALISTIC = 3

_NO_LENS = np.zeros((0, 4), np.float32)


@struct.dataclass
class Camera:
    cam_to_world: jnp.ndarray  # (4,4)
    raster_to_camera: jnp.ndarray  # (4,4)
    lens_radius: jnp.ndarray
    focal_distance: jnp.ndarray
    shutter_open: jnp.ndarray
    shutter_close: jnp.ndarray
    cam_type: int = struct.field(pytree_node=False, default=PERSPECTIVE)
    resolution: tuple = struct.field(pytree_node=False, default=(1, 1))
    # ---- realistic-lens data (cameras/realistic.rs); static host arrays so
    # the element loop unrolls at trace time (tuple-of-tuples: hashable for
    # jit static args) ----
    lens: tuple = struct.field(pytree_node=False, default=())
    pupil_bounds: tuple = struct.field(pytree_node=False, default=())
    film_diag: float = struct.field(pytree_node=False, default=0.035)
    simple_weighting: bool = struct.field(pytree_node=False, default=True)
    # camera motion blur (reference AnimatedTransform transform.rs:894):
    # decomposed endpoint transforms ((T,q,S) tuples) or () when static
    anim: tuple = struct.field(pytree_node=False, default=())
    # near-clip extension (reference camera.rs:102-118 get_clipping_start /
    # adjust_to_clipping_start; perspective only, set by the .blend importer
    # from the Blender camera's clipsta): ray origins are pushed forward to
    # the z = clipping_start plane along the film-point direction
    clipping_start: float = struct.field(pytree_node=False, default=0.0)


def _screen_window(resolution, frame_aspect=None, screen_window=None):
    sx, sy = resolution
    frame = frame_aspect if frame_aspect is not None else sx / sy
    if screen_window is not None:
        x0, x1, y0, y1 = screen_window
    elif frame > 1.0:
        x0, x1, y0, y1 = -frame, frame, -1.0, 1.0
    else:
        x0, x1, y0, y1 = -1.0, 1.0, -1.0 / frame, 1.0 / frame
    return x0, x1, y0, y1


def _screen_to_raster(resolution, window):
    x0, x1, y0, y1 = window
    sx, sy = resolution
    s1 = tr.scale(sx, sy, 1.0)
    s2 = tr.scale(1.0 / (x1 - x0), 1.0 / (y0 - y1), 1.0)
    t = tr.translate([-x0, -y1, 0.0])
    return tr.compose(s1, tr.compose(s2, t))


def _anim_tuple(cam_to_world, cam_to_world_end):
    if cam_to_world_end is None:
        return ()
    from ..utils import animated as anim

    a = anim.decompose(np.asarray(cam_to_world.m))
    b = anim.decompose(np.asarray(cam_to_world_end.m))
    tt = lambda x: tuple(np.asarray(x).ravel().tolist())
    return (tuple(map(tt, a)), tuple(map(tt, b)))


def make_perspective(
    cam_to_world: tr.Transform,
    resolution,
    fov=90.0,
    lens_radius=0.0,
    focal_distance=1e6,
    shutter_open=0.0,
    shutter_close=1.0,
    frame_aspect=None,
    screen_window=None,
    cam_to_world_end: tr.Transform = None,
    clipping_start=0.0,
) -> Camera:
    """reference cameras/perspective.rs:46-135.  cam_to_world_end enables
    shutter motion blur (AnimatedTransform, transform.rs:894).
    clipping_start: near-clip ray-origin offset (rs_pbrt extension,
    camera.rs:102-118; set from the Blender camera's clipsta)."""
    cam_to_screen = tr.perspective(fov, 1e-2, 1000.0)
    s2r = _screen_to_raster(resolution, _screen_window(resolution, frame_aspect, screen_window))
    raster_to_camera = tr.compose(tr.inverse(cam_to_screen), tr.inverse(s2r))
    return Camera(
        cam_to_world.m,
        raster_to_camera.m,
        jnp.float32(lens_radius),
        jnp.float32(focal_distance),
        jnp.float32(shutter_open),
        jnp.float32(shutter_close),
        cam_type=PERSPECTIVE,
        resolution=tuple(resolution),
        anim=_anim_tuple(cam_to_world, cam_to_world_end),
        clipping_start=float(clipping_start),
    )


def make_orthographic(
    cam_to_world: tr.Transform,
    resolution,
    lens_radius=0.0,
    focal_distance=1e6,
    shutter_open=0.0,
    shutter_close=1.0,
    frame_aspect=None,
    screen_window=None,
) -> Camera:
    cam_to_screen = tr.orthographic(0.0, 1.0)
    s2r = _screen_to_raster(resolution, _screen_window(resolution, frame_aspect, screen_window))
    raster_to_camera = tr.compose(tr.inverse(cam_to_screen), tr.inverse(s2r))
    return Camera(
        cam_to_world.m,
        raster_to_camera.m,
        jnp.float32(lens_radius),
        jnp.float32(focal_distance),
        jnp.float32(shutter_open),
        jnp.float32(shutter_close),
        cam_type=ORTHOGRAPHIC,
        resolution=tuple(resolution),
    )


def make_realistic(
    cam_to_world: tr.Transform,
    resolution,
    lens_data,
    aperture_diameter=1.0,
    focus_distance=10.0,
    film_diag_mm=35.0,
    simple_weighting=True,
    shutter_open=0.0,
    shutter_close=1.0,
) -> Camera:
    """Lens-system camera (reference cameras/realistic.rs:50-197).
    lens_data: flat list of (radius, thickness, eta, aperture-diameter) rows
    in mm, scene-front-to-rear (a pbrt .dat lens file's contents)."""
    from . import realistic as rl

    elements = rl.parse_lens_data(lens_data, aperture_diameter)
    film_diag = film_diag_mm * 0.001
    elements[-1, 1] = rl.focus_thick_lens(elements, focus_distance, film_diag)
    pupil = rl.build_exit_pupil_bounds(elements, film_diag)
    return Camera(
        cam_to_world.m,
        jnp.eye(4, dtype=jnp.float32),
        jnp.float32(0.0),
        jnp.float32(focus_distance),
        jnp.float32(shutter_open),
        jnp.float32(shutter_close),
        cam_type=REALISTIC,
        resolution=tuple(resolution),
        lens=tuple(map(tuple, elements.astype(np.float32).tolist())),
        pupil_bounds=tuple(map(tuple, pupil.tolist())),
        film_diag=float(film_diag),
        simple_weighting=bool(simple_weighting),
    )


def make_environment(
    cam_to_world: tr.Transform, resolution, shutter_open=0.0, shutter_close=1.0
) -> Camera:
    return Camera(
        cam_to_world.m,
        jnp.eye(4, dtype=jnp.float32),
        jnp.float32(0.0),
        jnp.float32(1e6),
        jnp.float32(shutter_open),
        jnp.float32(shutter_close),
        cam_type=ENVIRONMENT,
        resolution=tuple(resolution),
    )


class CameraRays(NamedTuple):
    o: jnp.ndarray  # (N,3)
    d: jnp.ndarray  # (N,3)
    time: jnp.ndarray  # (N,)
    weight: jnp.ndarray  # (N,) importance weight (1 for these cameras)


def generate_rays(cam: Camera, p_film, u_lens, u_time) -> CameraRays:
    """p_film: (N,2) raster coords; u_lens: (N,2); u_time: (N,).

    reference camera dispatch src/core/camera.rs:28 + per-camera
    generate_ray_differential.
    """
    n = p_film.shape[0]
    time = vm.lerp(u_time, cam.shutter_open, cam.shutter_close)

    if cam.cam_type == REALISTIC:
        from . import realistic as rl

        lens_np = np.asarray(cam.lens, np.float32)
        pupil_np = np.asarray(cam.pupil_bounds, np.float32)
        sx, sy = cam.resolution
        aspect = sy / sx
        x_ext = float(np.sqrt(cam.film_diag**2 / (1.0 + aspect * aspect)))
        y_ext = aspect * x_ext
        s = p_film / jnp.asarray([float(sx), float(sy)], jnp.float32)
        p2x = -x_ext / 2.0 + s[..., 0] * x_ext
        p2y = -y_ext / 2.0 + s[..., 1] * y_ext
        # pbrt film point: (-p2.x, p2.y, 0) (realistic.rs:206-211)
        fx = -p2x
        fy = p2y
        r_film = jnp.sqrt(fx * fx + fy * fy)
        n_bins = pupil_np.shape[0]
        bin_i = jnp.clip(
            (r_film / (cam.film_diag / 2.0) * n_bins).astype(jnp.int32), 0, n_bins - 1
        )
        pb = jnp.asarray(pupil_np)[bin_i]  # (N,4): x0 y0 x1 y1
        area = jnp.maximum((pb[:, 2] - pb[:, 0]) * (pb[:, 3] - pb[:, 1]), 0.0)
        lx = vm.lerp(u_lens[..., 0], pb[:, 0], pb[:, 2])
        ly = vm.lerp(u_lens[..., 1], pb[:, 1], pb[:, 3])
        sin_t = jnp.where(r_film > 0, fy / jnp.maximum(r_film, 1e-20), 0.0)
        cos_t = jnp.where(r_film > 0, fx / jnp.maximum(r_film, 1e-20), 1.0)
        rear_z = float(lens_np[-1, 1])
        p_rear = jnp.stack(
            [cos_t * lx - sin_t * ly, sin_t * lx + cos_t * ly, jnp.full_like(lx, rear_z)],
            axis=-1,
        )
        o_film = jnp.stack([fx, fy, jnp.zeros_like(fx)], axis=-1)
        d_film = p_rear - o_film
        ok, o_out, d_out = rl.trace_from_film_jnp(lens_np, o_film, d_film)
        o = tr.xform_point(cam.cam_to_world, o_out)
        d = vm.normalize(tr.xform_vector(cam.cam_to_world, d_out))
        cos_theta = vm.normalize(d_film)[..., 2]
        cos4 = (cos_theta * cos_theta) ** 2
        if cam.simple_weighting:
            area0 = float(
                max(
                    (pupil_np[0, 2] - pupil_np[0, 0])
                    * (pupil_np[0, 3] - pupil_np[0, 1]),
                    1e-20,
                )
            )
            w = cos4 * area / area0
        else:
            w = (cam.shutter_close - cam.shutter_open) * cos4 * area / (rear_z * rear_z)
        w = jnp.where(ok, w, 0.0)
        return CameraRays(o, d, time, w)

    if cam.cam_type == ENVIRONMENT:
        sx, sy = cam.resolution
        theta = vm.PI * p_film[..., 1] / sy
        phi = 2.0 * vm.PI * p_film[..., 0] / sx
        d_cam = jnp.stack(
            [jnp.sin(theta) * jnp.cos(phi), jnp.cos(theta), jnp.sin(theta) * jnp.sin(phi)],
            axis=-1,
        )
        o = jnp.broadcast_to(cam.cam_to_world[:3, 3], (n, 3))
        d = tr.xform_vector(cam.cam_to_world, d_cam)
        return CameraRays(o, d, time, jnp.ones(n, jnp.float32))

    p_cam = tr.xform_point(
        cam.raster_to_camera,
        jnp.concatenate([p_film, jnp.zeros((n, 1), p_film.dtype)], axis=-1),
    )
    if cam.cam_type == PERSPECTIVE:
        o_cam = jnp.zeros((n, 3), jnp.float32)
        d_cam = vm.normalize(p_cam)
    else:  # ORTHOGRAPHIC
        o_cam = p_cam
        d_cam = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (n, 3))

    # depth of field (reference perspective.rs:230-260)
    def with_dof(o_cam, d_cam):
        p_lens = cam.lens_radius * concentric_sample_disk(u_lens)
        ft = cam.focal_distance / jnp.maximum(d_cam[..., 2], 1e-8)
        p_focus = o_cam + ft[..., None] * d_cam
        o2 = jnp.stack(
            [p_lens[..., 0], p_lens[..., 1], jnp.zeros_like(p_lens[..., 0])], axis=-1
        )
        d2 = vm.normalize(p_focus - o2)
        return o2, d2

    use_dof = cam.lens_radius > 0.0
    o_dof, d_dof = with_dof(o_cam, d_cam)
    o_cam = jnp.where(use_dof, o_dof, o_cam)
    d_cam = jnp.where(use_dof, d_dof, d_cam)

    if cam.cam_type == PERSPECTIVE and cam.clipping_start > 0.0:
        # adjust_to_clipping_start (reference perspective.rs:450-469): the
        # origin moves to the near-clip plane along the film-point direction
        dir0 = vm.normalize(p_cam)
        o_cam = dir0 * (cam.clipping_start / jnp.maximum(dir0[..., 2:3], 1e-9))

    if cam.anim:
        from ..utils import animated as anim

        (T0, q0, S0), (T1, q1, S1) = cam.anim
        m = anim.interpolate(
            u_time,
            np.asarray(T0, np.float32), np.asarray(q0, np.float32),
            np.asarray(S0, np.float32).reshape(3, 3),
            np.asarray(T1, np.float32), np.asarray(q1, np.float32),
            np.asarray(S1, np.float32).reshape(3, 3),
        )  # (N,4,4) per-lane camera-to-world at the lane's shutter time
        o = tr.xform_point(m, o_cam)
        d = vm.normalize(tr.xform_vector(m, d_cam))
        return CameraRays(o, d, time, jnp.ones(n, jnp.float32))
    o = tr.xform_point(cam.cam_to_world, o_cam)
    d = vm.normalize(tr.xform_vector(cam.cam_to_world, d_cam))
    return CameraRays(o, d, time, jnp.ones(n, jnp.float32))


# ---- light-transport importance interface (reference camera.rs:36-76 +
# cameras/perspective.rs we/pdf_we/sample_wi) ----

def _image_plane_area(cam: Camera):
    """Area of the image plane at z=1 in camera space (the `a` constant of
    reference perspective.rs:114-133)."""
    sx, sy = cam.resolution
    r2c = cam.raster_to_camera
    p_min = tr.xform_point(r2c, jnp.asarray([0.0, 0.0, 0.0]))
    p_max = tr.xform_point(r2c, jnp.asarray([float(sx), float(sy), 0.0]))
    p_min = p_min / p_min[2]
    p_max = p_max / p_max[2]
    return jnp.abs((p_max[0] - p_min[0]) * (p_max[1] - p_min[1]))


def camera_we(cam: Camera, o, d):
    """Importance carried by ray (o,d) + raster coords; zero outside the
    frustum (reference perspective.rs we)."""
    w2c = jnp.linalg.inv(cam.cam_to_world)
    d_cam = tr.xform_vector(w2c, d)
    cos_theta = d_cam[..., 2]
    # project to raster
    p_focus = d_cam / jnp.maximum(cos_theta[..., None], 1e-9)
    c2r = jnp.linalg.inv(cam.raster_to_camera)
    p_raster = tr.xform_point(c2r, p_focus)
    sx, sy = cam.resolution
    inside = (
        (cos_theta > 0)
        & (p_raster[..., 0] >= 0) & (p_raster[..., 0] < sx)
        & (p_raster[..., 1] >= 0) & (p_raster[..., 1] < sy)
    )
    a = _image_plane_area(cam)
    cos2 = cos_theta * cos_theta
    we = jnp.where(inside, 1.0 / jnp.maximum(a * cos2 * cos2, 1e-12), 0.0)
    return we, p_raster[..., :2], inside


def camera_pdf_we(cam: Camera, o, d):
    """(pdf_pos, pdf_dir) of generate_ray producing (o,d)
    (reference perspective.rs pdf_we)."""
    we, p_raster, inside = camera_we(cam, o, d)
    w2c = jnp.linalg.inv(cam.cam_to_world)
    cos_theta = tr.xform_vector(w2c, d)[..., 2]
    a = _image_plane_area(cam)
    pdf_dir = jnp.where(
        inside, 1.0 / jnp.maximum(a * cos_theta**3, 1e-12), 0.0
    )
    return jnp.ones_like(pdf_dir), pdf_dir


def camera_sample_wi(cam: Camera, ref_p):
    """Sample a direction from ref_p to the (pinhole) camera
    (reference perspective.rs sample_wi).  Returns
    (wi, we_value, pdf, p_raster, cam_p)."""
    cam_p = cam.cam_to_world[:3, 3]
    to_cam = cam_p - ref_p
    dist = jnp.sqrt(jnp.maximum(jnp.sum(to_cam * to_cam, axis=-1), 1e-20))
    wi = to_cam / dist[..., None]
    # lens area = 1 for pinhole (reference convention)
    w2c = jnp.linalg.inv(cam.cam_to_world)
    cos_theta = tr.xform_vector(w2c, -wi)[..., 2]
    pdf = jnp.where(cos_theta > 1e-6, (dist * dist) / jnp.maximum(cos_theta, 1e-6), 0.0)
    we, p_raster, inside = camera_we(cam, jnp.broadcast_to(cam_p, ref_p.shape), -wi)
    we = jnp.where(inside, we, 0.0)
    return wi, we, pdf, p_raster, jnp.broadcast_to(cam_p, ref_p.shape)
