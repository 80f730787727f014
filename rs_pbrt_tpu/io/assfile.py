"""Arnold .ass scene importer — reference examples/parse_ass_file.rs.

Same scope as the reference importer: polymesh / sphere / disk / cylinder /
points geometry,
persp_camera, point / distant / quad / skydome lights, and a
standard_surface -> (matte | metal | glass | mirror) material mapping.
The token format is whitespace-separated per node block; array parameters
are `<count> <mb_keys> <TYPE> <values...>` (parse_ass_file.rs:527-560).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

_ARRAY_TYPES = {"VECTOR", "POINT", "UINT", "FLOAT", "BYTE", "POINT2", "RGB", "VECTOR2"}
_COMP = {"VECTOR": 3, "POINT": 3, "UINT": 1, "FLOAT": 1, "BYTE": 1, "POINT2": 2,
         "RGB": 3, "VECTOR2": 2}


def _tokenize(text):
    out = []
    for line in text.splitlines():
        line = line.split("#", 1)[0]
        out.extend(line.replace("{", " { ").replace("}", " } ").split())
    return out


def parse_nodes(text):
    """-> list of (node_type, params dict).  Array params become numpy
    arrays; scalars stay token lists."""
    toks = _tokenize(text)
    nodes = []
    i = 0
    n = len(toks)
    while i < n:
        ntype = toks[i]
        i += 1
        if i >= n or toks[i] != "{":
            continue
        i += 1
        params = {}
        while i < n and toks[i] != "}":
            key = toks[i]
            i += 1
            vals = []
            # array syntax: <count> <mbkeys> <TYPE> data...
            if (
                i + 2 < n
                and toks[i].isdigit()
                and toks[i + 1].isdigit()
                and toks[i + 2].upper() in _ARRAY_TYPES
            ):
                count = int(toks[i])
                mb = int(toks[i + 1])
                dtype = toks[i + 2].upper()
                i += 3
                total = count * mb * _COMP[dtype]
                data = toks[i : i + total]
                i += total
                if dtype in ("UINT", "BYTE"):
                    params[key] = np.asarray([int(float(x)) for x in data], np.int64)
                else:
                    params[key] = np.asarray([float(x) for x in data], np.float64)
                continue
            while i < n and toks[i] != "}" and not _looks_like_key(toks, i, n):
                vals.append(toks[i])
                i += 1
            params[key] = vals
        i += 1  # consume '}'
        nodes.append((ntype, params))
    return nodes


def _looks_like_key(toks, i, n):
    """Heuristic: a bare identifier starting a new parameter."""
    t = toks[i]
    if t in ("{", "}"):
        return False
    try:
        float(t)
        return False
    except ValueError:
        pass
    if t.startswith('"'):
        return False
    # known value keywords are not keys
    if t in ("on", "off", "true", "false"):
        return False
    return True


def _floats(params, key, default=None):
    v = params.get(key)
    if v is None:
        return default
    if isinstance(v, np.ndarray):
        return v.astype(np.float64)
    try:
        return np.asarray([float(x) for x in v], np.float64)
    except ValueError:
        return default


def _f1(params, key, default=0.0):
    v = _floats(params, key)
    return float(v[0]) if v is not None and len(v) else default


def _str1(params, key, default=""):
    v = params.get(key)
    if not v or isinstance(v, np.ndarray):
        return default
    return v[0].strip('"')


def load_ass(path_or_text, builder=None):
    """Parse an .ass file (or raw text) into a SceneBuilder + camera info.

    Returns (builder, cam_info dict) — the caller finalizes, mirroring how
    the reference importer drives the same api.rs factories (SURVEY §3.5)."""
    from ..scene.builder import SceneBuilder
    from ..utils import transform as tr

    text = path_or_text
    p = Path(str(path_or_text))
    if "\n" not in str(path_or_text) and p.exists():
        text = p.read_text()
    nodes = parse_nodes(text)
    b = builder or SceneBuilder()
    cam_info = dict(fov=90.0, cam_to_world=np.eye(4, dtype=np.float32),
                    resolution=(640, 480))

    # pass 1: shaders by name
    shaders = {}
    for ntype, prm in nodes:
        if ntype in ("standard_surface", "lambert", "utility", "flat"):
            name = _str1(prm, "name")
            base = _floats(prm, "base_color", np.asarray([0.5, 0.5, 0.5]))
            metal = _f1(prm, "metalness", 0.0)
            rough = _f1(prm, "specular_roughness", 0.1)
            trans = _f1(prm, "transmission", 0.0)
            if trans > 0.5:
                mid = b.add_glass(kr=(1, 1, 1), kt=tuple(base[:3]), roughness=0.0)
            elif metal > 0.5:
                mid = b.add_metal(roughness=max(rough, 1e-3))
            elif rough < 0.01 and metal > 0.0:
                mid = b.add_mirror(kr=tuple(base[:3]))
            else:
                mid = b.add_matte(kd=tuple(base[:3]))
            shaders[name] = mid

    def xform_of(prm):
        m = _floats(prm, "matrix")
        if m is None or len(m) < 16:
            return None
        # Arnold matrices are row-vector convention: transpose to ours
        return np.asarray(m, np.float32).reshape(4, 4).T

    for ntype, prm in nodes:
        if ntype == "options":
            xr = int(_f1(prm, "xres", 640))
            yr = int(_f1(prm, "yres", 480))
            cam_info["resolution"] = (xr, yr)
        elif ntype == "persp_camera":
            cam_info["fov"] = _f1(prm, "fov", 90.0)
            m = xform_of(prm)
            if m is not None:
                cam_info["cam_to_world"] = m
        elif ntype == "polymesh":
            v = _floats(prm, "vlist")
            vidxs = prm.get("vidxs")
            nsides = prm.get("nsides")
            if v is None or vidxs is None:
                continue
            V = v.reshape(-1, 3).astype(np.float32)
            idx = np.asarray(vidxs, np.int64)
            faces = []
            if nsides is None or len(np.atleast_1d(nsides)) == 0:
                faces = idx.reshape(-1, 3)
            else:
                k = 0
                for ns in np.atleast_1d(nsides):
                    ns = int(ns)
                    poly = idx[k : k + ns]
                    for t in range(1, ns - 1):  # fan triangulation
                        faces.append((poly[0], poly[t], poly[t + 1]))
                    k += ns
                faces = np.asarray(faces, np.int64)
            m = xform_of(prm)
            o2w = tr.from_matrix(m) if m is not None else None
            mat = shaders.get(_str1(prm, "shader"), 0)
            b.add_triangle_mesh(
                np.asarray(faces, np.int32), V, material=mat, object_to_world=o2w
            )
        elif ntype == "sphere":
            c = _floats(prm, "center", np.zeros(3))
            r = _f1(prm, "radius", 1.0)
            m = xform_of(prm)
            o2w = tr.from_matrix(m) if m is not None else tr.identity()
            o2w = tr.compose(o2w, tr.translate(tuple(c[:3])))
            mat = shaders.get(_str1(prm, "shader"), 0)
            b.add_sphere(o2w, radius=r, material=mat)
        elif ntype == "disk":
            # parse_ass_file.rs:995-1023: height 0, hole -> inner radius,
            # full phi
            r = _f1(prm, "radius", 0.5)
            hole = _f1(prm, "hole", 0.0)
            m = xform_of(prm)
            o2w = tr.from_matrix(m) if m is not None else tr.identity()
            mat = shaders.get(_str1(prm, "shader"), 0)
            b.add_disk(o2w, height=0.0, radius=r, inner_radius=hole,
                       material=mat)
        elif ntype == "cylinder":
            # parse_ass_file.rs:1055-1086: z in [0, radius] (the reference's
            # own assumption), full phi
            r = _f1(prm, "radius", 0.5)
            m = xform_of(prm)
            o2w = tr.from_matrix(m) if m is not None else tr.identity()
            mat = shaders.get(_str1(prm, "shader"), 0)
            b.add_cylinder(o2w, radius=r, z_min=0.0, z_max=r, material=mat)
        elif ntype == "points":
            # parse_ass_file.rs points node: one sphere per point, radius
            # from the (per-point or scalar) radius array
            pts = _floats(prm, "points")
            if pts is None:
                continue
            P = pts.reshape(-1, 3).astype(np.float32)
            rad = _floats(prm, "radius", np.asarray([0.5]))
            rad = np.broadcast_to(
                np.atleast_1d(np.asarray(rad, np.float64)), (len(P),)
            ) if np.atleast_1d(rad).size in (1, len(P)) else np.full(len(P), 0.5)
            m = xform_of(prm)
            base = tr.from_matrix(m) if m is not None else tr.identity()
            mat = shaders.get(_str1(prm, "shader"), 0)
            for p, r in zip(P, rad):
                b.add_sphere(
                    tr.compose(base, tr.translate(tuple(p))), radius=float(r),
                    material=mat,
                )
        elif ntype == "point_light":
            pos = _floats(prm, "position", np.zeros(3))
            color = _floats(prm, "color", np.ones(3))
            inten = _f1(prm, "intensity", 1.0) * (2.0 ** _f1(prm, "exposure", 0.0))
            m = xform_of(prm)
            if m is not None:
                pos = (m[:3, :3] @ pos[:3]) + m[:3, 3]
            b.add_point_light(p=tuple(pos[:3]), I=tuple(color[:3] * inten))
        elif ntype == "distant_light":
            color = _floats(prm, "color", np.ones(3))
            inten = _f1(prm, "intensity", 1.0) * (2.0 ** _f1(prm, "exposure", 0.0))
            m = xform_of(prm)
            d = np.asarray([0.0, 0.0, -1.0])
            if m is not None:
                d = m[:3, :3] @ d
            b.add_distant_light(from_p=(0, 0, 0), to=tuple(d), L=tuple(color[:3] * inten))
        elif ntype == "quad_light":
            vs = _floats(prm, "vertices")
            color = _floats(prm, "color", np.ones(3))
            inten = _f1(prm, "intensity", 1.0) * (2.0 ** _f1(prm, "exposure", 0.0))
            if vs is not None and len(vs) >= 12:
                V = vs.reshape(-1, 3).astype(np.float32)[:4]
                m = xform_of(prm)
                if m is not None:
                    V = V @ m[:3, :3].T + m[:3, 3]
                b.add_triangle_mesh(
                    np.asarray([[0, 1, 2], [0, 2, 3]], np.int32), V,
                    area_light=dict(L=tuple(color[:3] * inten), two_sided=True),
                )
        elif ntype == "skydome_light":
            color = _floats(prm, "color", np.ones(3))
            inten = _f1(prm, "intensity", 1.0) * (2.0 ** _f1(prm, "exposure", 0.0))
            b.add_infinite_light(L=tuple(color[:3] * inten))
    return b, cam_info
