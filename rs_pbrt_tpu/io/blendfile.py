"""Blender .blend importer — reference src/bin/parse_blend_file.rs (3549 LoC).

The .blend format is self-describing: a DNA1 block carries every struct
layout (names/types/lengths/field lists), and data blocks reference each
other by memory address.  This module implements
- a generic DNA reader (parse_dna / BlendFile.field) equivalent to the
  reference's blend_info helpers (read_dna/get_float3/get_pointer/...),
- scene extraction for the same node set the reference supports: Mesh
  (MVert/MPoly/MLoop), Object transforms, Camera (lens/sensor/clip), Lamp
  (point/sun/spot/area), Material (base color + metallic/roughness/
  specular -> metal/plastic/matte mapping), World horizon color -> IBL.
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np


class Sdna:
    def __init__(self, names, types, tlens, structs):
        self.names = names  # field names, may have '*' and '[n]'
        self.types = types
        self.tlens = tlens
        self.structs = structs  # list of (type_idx, [(ftype_idx, fname_idx)])
        self.by_name = {types[s[0]]: i for i, s in enumerate(structs)}

    def name_is_pointer(self, name_idx):
        return self.names[name_idx].startswith("*")

    def name_array_len(self, name_idx):
        n = self.names[name_idx]
        total = 1
        while "[" in n:
            a = n.index("[")
            b = n.index("]")
            total *= int(n[a + 1 : b])
            n = n[:a] + n[b + 1 :]
        return total

    def field_size(self, ftype_idx, fname_idx, psize):
        base = psize if self.name_is_pointer(fname_idx) else self.tlens[ftype_idx]
        return base * self.name_array_len(fname_idx)

    def layout(self, struct_idx, psize):
        """-> dict base_field_name -> (offset, type_name, count, is_ptr)."""
        out = {}
        off = 0
        t_idx, fields = self.structs[struct_idx]
        for ftype, fname in fields:
            raw = self.names[fname]
            base = raw.lstrip("*").split("[")[0]
            size = self.field_size(ftype, fname, psize)
            out[base] = (off, self.types[ftype], self.name_array_len(fname),
                         self.name_is_pointer(fname))
            off += size
        return out


def parse_dna(data, le=True):
    e = "<" if le else ">"
    assert data[:4] == b"SDNA"
    p = 4

    def tag(t):
        nonlocal p
        assert data[p : p + 4] == t, (data[p : p + 4], t)
        p += 4

    def u4():
        nonlocal p
        v = struct.unpack_from(e + "i", data, p)[0]
        p += 4
        return v

    def strings(n):
        nonlocal p
        out = []
        for _ in range(n):
            q = data.index(b"\0", p)
            out.append(data[p:q].decode("ascii"))
            p = q + 1
        p = (p + 3) & ~3
        return out

    tag(b"NAME")
    names = strings(u4())
    tag(b"TYPE")
    types = strings(u4())
    tag(b"TLEN")
    tlens = list(struct.unpack_from(e + f"{len(types)}h", data, p))
    p += 2 * len(types)
    p = (p + 3) & ~3
    tag(b"STRC")
    n_str = u4()
    structs = []
    for _ in range(n_str):
        t_idx, n_f = struct.unpack_from(e + "HH", data, p)
        p += 4
        fields = []
        for _ in range(n_f):
            ft, fn = struct.unpack_from(e + "HH", data, p)
            p += 4
            fields.append((ft, fn))
        structs.append((t_idx, fields))
    return Sdna(names, types, tlens, structs)


class BlendFile:
    def __init__(self, raw):
        assert raw[:7] == b"BLENDER", "not a .blend file"
        self.psize = 8 if raw[7:8] == b"-" else 4
        self.le = raw[8:9] == b"v"
        self.version = raw[9:12].decode("ascii")
        e = "<" if self.le else ">"
        pfmt = "Q" if self.psize == 8 else "I"
        p = 12
        self.blocks = []  # (code, sdna_idx, count, data, old_ptr)
        self.by_ptr = {}
        dna = None
        while p < len(raw):
            code = raw[p : p + 4]
            size, = struct.unpack_from(e + "i", raw, p + 4)
            old, = struct.unpack_from(e + pfmt, raw, p + 8)
            sdna_i, count = struct.unpack_from(
                e + "ii", raw, p + 8 + self.psize
            )
            head = 16 + self.psize
            data = raw[p + head : p + head + size]
            p += head + size
            if code == b"ENDB":
                break
            if code == b"DNA1":
                dna = parse_dna(data, self.le)
                continue
            blk = (code, sdna_i, count, data, old)
            self.blocks.append(blk)
            self.by_ptr[old] = blk
        assert dna is not None, "no DNA1 block"
        self.dna = dna

    @classmethod
    def open(cls, path):
        raw = Path(path).read_bytes()
        if raw[:2] == b"\x1f\x8b":
            import gzip

            raw = gzip.decompress(raw)
        return cls(raw)

    # ---- generic field access (blend_info get_* equivalents) ----

    def _layout(self, sdna_idx):
        return self.dna.layout(sdna_idx, self.psize)

    def field(self, blk, name, index=0):
        """Raw (offset, type, count, is_ptr) + element base for blk[index]."""
        code, sdna_i, count, data, old = blk
        lay = self._layout(sdna_i)
        t_idx, _ = self.dna.structs[sdna_i]
        ssize = self.dna.tlens[t_idx]
        off, tname, cnt, is_ptr = lay[name]
        return data, index * ssize + off, tname, cnt, is_ptr

    def _e(self):
        return "<" if self.le else ">"

    def f32(self, blk, name, index=0, n=1):
        data, off, _, _, _ = self.field(blk, name, index)
        v = struct.unpack_from(self._e() + f"{n}f", data, off)
        return v[0] if n == 1 else np.asarray(v, np.float32)

    def i32(self, blk, name, index=0):
        data, off, _, _, _ = self.field(blk, name, index)
        return struct.unpack_from(self._e() + "i", data, off)[0]

    def i16(self, blk, name, index=0):
        data, off, _, _, _ = self.field(blk, name, index)
        return struct.unpack_from(self._e() + "h", data, off)[0]

    def u8(self, blk, name, index=0):
        data, off, _, _, _ = self.field(blk, name, index)
        return data[off]

    def ptr(self, blk, name, index=0):
        data, off, _, _, _ = self.field(blk, name, index)
        fmt = "Q" if self.psize == 8 else "I"
        return struct.unpack_from(self._e() + fmt, data, off)[0]

    def string(self, blk, name):
        """NUL-terminated char-array field (e.g. Image.name[1024])."""
        data, off, _, _, _ = self.field(blk, name)
        q = data.index(b"\0", off)
        return data[off:q].decode("utf-8", "replace")

    def id_name(self, blk):
        """ID.name (first field of ID-carrying structs): 'OBxxx', 'MExxx'."""
        code, sdna_i, count, data, old = blk
        q = data.index(b"\0", self.psize)  # ID struct: next(ptr), name[66]...
        # ID layout: first field is *next? actually name comes after two ptrs
        # -> use the DNA to be exact:
        lay = self._layout(sdna_i)
        if "id" in lay:
            off = lay["id"][0]
            # ID struct: *next *prev then name[66]
            id_struct = self.dna.structs[self.dna.by_name["ID"]]
            id_lay = self.dna.layout(self.dna.by_name["ID"], self.psize)
            noff = off + id_lay["name"][0]
            q = data.index(b"\0", noff)
            return data[noff:q].decode("ascii", "replace")
        return ""

    def struct_name(self, blk):
        t_idx, _ = self.dna.structs[blk[1]]
        return self.dna.types[t_idx]

    def sub_field(self, blk, name, sub_name):
        """(data, offset, type) of a field of an EMBEDDED struct member —
        e.g. Scene.r.xsch where 'r' is an inline RenderData (the reference
        walks Scene's 'r' member the same way, parse_blend_file.rs:1913-1950)."""
        data, off, tname, _, is_ptr = self.field(blk, name)
        if is_ptr or tname not in self.dna.by_name:
            raise KeyError(f"{name}.{sub_name}: not an embedded struct")
        sub_lay = self.dna.layout(self.dna.by_name[tname], self.psize)
        soff, stname, _, _ = sub_lay[sub_name]
        return data, off + soff, stname

    def sub_i32(self, blk, name, sub_name):
        data, off, _ = self.sub_field(blk, name, sub_name)
        return struct.unpack_from(self._e() + "i", data, off)[0]

    def sub_f32(self, blk, name, sub_name):
        data, off, _ = self.sub_field(blk, name, sub_name)
        return struct.unpack_from(self._e() + "f", data, off)[0]

    def sub_i16(self, blk, name, sub_name):
        data, off, _ = self.sub_field(blk, name, sub_name)
        return struct.unpack_from(self._e() + "h", data, off)[0]

    def ptr_array(self, old_ptr, count):
        """Read a pointer array from the DATA block at old_ptr (e.g.
        Mesh.mat, which is Material** — a block of totcol pointers)."""
        blk = self.by_ptr.get(old_ptr)
        if blk is None:
            return []
        data = blk[3]
        fmt = "Q" if self.psize == 8 else "I"
        n = min(count, len(data) // self.psize)
        return list(struct.unpack_from(self._e() + f"{n}{fmt}", data, 0))


def load_blend(path, builder=None, light_scale=1.0, camera_name=None):
    """Extract meshes/camera/lamps/materials into a SceneBuilder.

    light_scale multiplies every lamp emission (reference CLI -l,
    parse_blend_file.rs:82-83,376-426); camera_name selects which camera
    Object supplies the view when a file has several (reference CLI -c).
    Returns (builder, cam_info) like io/assfile.load_ass."""
    from ..scene.builder import SceneBuilder
    from ..utils import transform as tr

    bf = BlendFile.open(path)
    b = builder or SceneBuilder()
    cam_info = dict(fov=50.0, clipping_start=0.0, cam_to_world=np.eye(4, dtype=np.float32),
                    resolution=(640, 480))

    # Scene.r (inline RenderData) carries the render resolution: xsch x
    # ysch scaled by the percentage 'size' (reference
    # parse_blend_file.rs:1748-1750,1913-1950,3470-3471).  The UNSCALED
    # xsch/ysch set the film aspect that divides the camera fov below.
    res_x, res_y = 640, 480
    scale_length = 1.0  # Scene.unit.scale_length scales all object
    # translations and mesh vertices (parse_blend_file.rs:1747,2023,3176)
    for blk in bf.blocks:
        if bf.struct_name(blk) != "Scene":
            continue
        try:
            xsch = bf.sub_i32(blk, "r", "xsch")
            ysch = bf.sub_i32(blk, "r", "ysch")
            try:
                pct = bf.sub_i16(blk, "r", "size")
            except KeyError:
                pct = 100
            if xsch > 0 and ysch > 0:
                res_x, res_y = xsch, ysch
                pct = pct if 0 < pct <= 100 else 100
                cam_info["resolution"] = (max(xsch * pct // 100, 1),
                                          max(ysch * pct // 100, 1))
        except KeyError:
            pass
        try:
            sl = bf.sub_f32(blk, "unit", "scale_length")
            if sl > 0.0:
                scale_length = sl
        except KeyError:
            pass
        break
    aspect = res_x / res_y

    # material blocks (MA) mapped the way the reference importer decides
    # (parse_blend_file.rs:490-603): emit>0 -> area light; ang (IOR) != 1
    # -> glass (kt = spec rgb); ray_mirror>0 -> metal if roughness>0 else
    # mirror (kr = mir rgb * ray_mirror); else matte.  Blender 2.8 files
    # lack the legacy fields — fall back to metallic/spec heuristics.
    mats = {}  # old_ptr -> builder material id
    mat_emit = {}  # old_ptr -> (r,g,b) emitted radiance (area-light meshes)
    mat_nonmatte = set()  # ptrs whose branch is NOT plain matte: vertex
    # paint only overrides the matte branch (parse_blend_file.rs:1231-1253
    # sits inside the MatteMaterial else; mirror/glass/translucent keep
    # their materials)
    for blk in bf.blocks:
        if bf.struct_name(blk) == "Material":
            lay = bf._layout(blk[1])
            g = lambda name, dflt=0.0: (bf.f32(blk, name)
                                        if name in lay else dflt)
            rgb = (g("r"), g("g"), g("b"))
            rough = g("roughness", 0.5)
            emit = g("emit")
            ang = g("ang", 1.0)
            ray_mirror = g("ray_mirror")
            if emit > 0.0:
                mats[blk[4]] = b.add_matte(kd=(0.0, 0.0, 0.0))
                mat_emit[blk[4]] = tuple(c * emit for c in rgb)
                mat_nonmatte.add(blk[4])
            elif "ang" in lay and ang != 1.0:
                spec = (g("specr"), g("specg"), g("specb"))
                mats[blk[4]] = b.add_glass(kr=(1, 1, 1), kt=spec, eta=ang)
                mat_nonmatte.add(blk[4])
            elif ray_mirror > 0.0:
                if rough > 0.0:
                    mats[blk[4]] = b.add_metal(roughness=rough)
                else:
                    mir = (g("mirr"), g("mirg"), g("mirb"))
                    mats[blk[4]] = b.add_mirror(
                        kr=tuple(c * ray_mirror for c in mir)
                    )
                mat_nonmatte.add(blk[4])
            elif g("translucency") > 0.0:
                # reference parse_blend_file.rs:1132-1152: translucency t
                # -> TranslucentMaterial(kd=rgb, reflect=1-t, transmit=t)
                t = g("translucency")
                mats[blk[4]] = b.add_translucent(
                    kd=rgb, reflect=(1.0 - t,) * 3, transmit=(t,) * 3
                )
                mat_nonmatte.add(blk[4])
            else:
                metallic = g("metallic")
                specular = g("spec", 0.5)
                if metallic > 0.5:
                    mats[blk[4]] = b.add_metal(roughness=max(rough, 1e-3))
                    mat_nonmatte.add(blk[4])
                elif specular > 0.6 and rough < 0.35:
                    mats[blk[4]] = b.add_plastic(
                        kd=rgb, ks=(specular * 0.5,) * 3,
                        roughness=max(rough, 1e-3),
                    )
                    mat_nonmatte.add(blk[4])
                else:
                    mats[blk[4]] = b.add_matte(kd=rgb)

    # image datablocks: base name -> file path (reference
    # parse_blend_file.rs:2525-2560 Image blocks feeding ImageTexture kd)
    images = {}
    for blk in bf.blocks:
        if bf.struct_name(blk) != "Image":
            continue
        base = bf.id_name(blk)[2:]  # strip the "IM" ID prefix
        lay = bf._layout(blk[1])
        fname = None
        for field in ("name", "filepath"):
            if field in lay:
                try:
                    fname = bf.string(blk, field)
                except (ValueError, KeyError):
                    fname = None
                if fname:
                    break
        if base and fname:
            images[base] = fname

    # mesh datablocks keyed by pointer
    meshes = {}
    for blk in bf.blocks:
        if bf.struct_name(blk) != "Mesh":
            continue
        totvert = bf.i32(blk, "totvert")
        totpoly = bf.i32(blk, "totpoly")
        mvert_p = bf.ptr(blk, "mvert")
        mpoly_p = bf.ptr(blk, "mpoly")
        mloop_p = bf.ptr(blk, "mloop")
        lay = bf._layout(blk[1])
        mloopuv_p = bf.ptr(blk, "mloopuv") if "mloopuv" in lay else 0
        mloopcol_p = bf.ptr(blk, "mloopcol") if "mloopcol" in lay else 0
        # Mesh.mat is Material** — a DATA block of totcol pointers
        # (reference parse_blend_file.rs walks Mesh.mat the same way);
        # per-poly mat_nr indexes into it (multi-material meshes)
        mat_p = bf.ptr(blk, "mat") if "mat" in lay else 0
        totcol = bf.i16(blk, "totcol") if "totcol" in lay else 0
        mat_ptrs = bf.ptr_array(mat_p, totcol) if mat_p and totcol else []
        if not (mvert_p and mpoly_p and mloop_p):
            continue
        vb = bf.by_ptr.get(mvert_p)
        pb = bf.by_ptr.get(mpoly_p)
        lb = bf.by_ptr.get(mloop_p)
        if not (vb and pb and lb):
            continue
        has_matnr = "mat_nr" in bf._layout(pb[1])
        V = np.stack(
            [bf.f32(vb, "co", i, 3) for i in range(totvert)], 0
        ).astype(np.float32) * scale_length  # parse_blend_file.rs:3176-3178
        loops = [bf.i32(lb, "v", i) for i in range(lb[2])]
        uvb = bf.by_ptr.get(mloopuv_p) if mloopuv_p else None
        # MLoopCol vertex paint: the reference keeps the FIRST loop's rgb
        # per polygon as a flat per-triangle matte color, overriding
        # textures/materials (parse_blend_file.rs:1332-1357)
        colb = bf.by_ptr.get(mloopcol_p) if mloopcol_p else None
        poly_col = (
            None if colb is None else lambda start: (
                bf.u8(colb, "r", start), bf.u8(colb, "g", start),
                bf.u8(colb, "b", start))
        )
        UV = None
        faces = []
        face_mat = []  # per-triangle material slot (mat_nr)
        face_col = [] if colb is not None else None  # per-tri rgb u8
        if uvb is not None:
            # per-loop UVs: split vertices per loop like the reference
            # (parse_blend_file.rs:1395-1440 rebuilds vertex arrays so each
            # face-corner owns its own uv)
            uv_loop = np.stack(
                [bf.f32(uvb, "uv", i, 2) for i in range(len(loops))], 0
            ).astype(np.float32)
            V = V[np.asarray(loops, np.int64)]
            UV = uv_loop
            for i in range(totpoly):
                start = bf.i32(pb, "loopstart", i)
                n = bf.i32(pb, "totloop", i)
                nr = bf.i16(pb, "mat_nr", i) if has_matnr else 0
                col = poly_col(start) if poly_col else None
                for t in range(1, n - 1):
                    faces.append((start, start + t, start + t + 1))
                    face_mat.append(nr)
                    if face_col is not None:
                        face_col.append(col)
        else:
            for i in range(totpoly):
                start = bf.i32(pb, "loopstart", i)
                n = bf.i32(pb, "totloop", i)
                nr = bf.i16(pb, "mat_nr", i) if has_matnr else 0
                col = poly_col(start) if poly_col else None
                poly = loops[start : start + n]
                for t in range(1, n - 1):
                    faces.append((poly[0], poly[t], poly[t + 1]))
                    face_mat.append(nr)
                    if face_col is not None:
                        face_col.append(col)
        meshes[blk[4]] = (
            V, np.asarray(faces, np.int32),
            np.asarray(face_mat, np.int32), mat_ptrs, UV, bf.id_name(blk),
            None if face_col is None else np.asarray(face_col, np.uint8),
        )

    # objects place data blocks in the world
    for blk in bf.blocks:
        if bf.struct_name(blk) != "Object":
            continue
        data_p = bf.ptr(blk, "data")
        m = bf.f32(blk, "obmat", 0, 16).reshape(4, 4).T  # blender row-major
        m = np.array(m, np.float32)
        m[:3, 3] *= scale_length  # unit system (parse_blend_file.rs:2023-2031)
        target = bf.by_ptr.get(data_p)
        if target is None:
            continue
        kind = bf.struct_name(target)
        o2w = tr.from_matrix(np.asarray(m, np.float32))
        if data_p in meshes:
            V, F, face_mat, mat_ptrs, UV, mesh_name, face_col = meshes[data_p]
            painted = None  # per-tri mask of faces consumed by vertex paint
            if face_col is not None and len(face_col):
                # vertex-painted faces: per-triangle flat matte colors beat
                # textures on MATTE slots only (parse_blend_file.rs:
                # 1231-1253 "ignore textures, use triangle colors" lives in
                # the MatteMaterial branch; mirror/glass/translucent/
                # emissive slots keep their materials).  Distinct colors
                # dedupe into shared material rows — the SoA analogue of
                # the reference's per-triangle matte Arc.
                def _paintable(nr):
                    mp = mat_ptrs[nr] if 0 <= nr < len(mat_ptrs) else 0
                    return mp not in mat_nonmatte
                painted = (np.array([_paintable(nr) for nr in face_mat.tolist()],
                                    bool) if len(face_mat)
                           else np.ones(len(F), bool))
                uniq, inv = np.unique(face_col[painted], axis=0,
                                      return_inverse=True)
                Fp = F[painted]
                for k in range(len(uniq)):
                    Fs = Fp[inv == k]
                    mat_id = b.add_matte(kd=tuple(uniq[k] / 255.0))
                    b.add_triangle_mesh(
                        Fs, V, uvs=UV, material=mat_id, object_to_world=o2w
                    )
                if bool(painted.all()):
                    continue
                F = F[~painted]
                face_mat = face_mat[~painted] if len(face_mat) else face_mat
            # kd image texture by name match (reference tries a texture
            # named exactly like the mesh, parse_blend_file.rs:583-603)
            tex_mat = None
            img_path = (images.get(mesh_name[2:])
                        or images.get(bf.id_name(blk)[2:]))
            if img_path is not None and UV is not None:
                from pathlib import Path as _P

                from ..ops import texture as txm
                from .image import read_image

                ipath = _P(img_path.lstrip("/"))
                if not ipath.is_absolute():
                    ipath = _P(path).parent / ipath
                try:
                    tex_img = read_image(ipath)
                    tid = b.add_texture(
                        txm.TEX_IMAGEMAP, {txm.TP_GAMMA_SCALE: 1.0},
                        image=np.asarray(tex_img, np.float32),
                    )
                    tex_mat = b.add_matte()
                    b.set_material_texture(tex_mat, 0, tid)
                except (OSError, ValueError):
                    pass
            # one mesh per material slot (multi-material meshes: per-poly
            # mat_nr selects from Mesh.mat; emissive slots become area
            # lights, reference parse_blend_file.rs:490-496)
            slots = sorted(set(face_mat.tolist())) if len(face_mat) else [0]
            for nr in slots:
                Fs = F[face_mat == nr] if len(face_mat) else F
                if len(Fs) == 0:
                    continue
                mp = mat_ptrs[nr] if 0 <= nr < len(mat_ptrs) else 0
                # the name-matched kd texture also lives in the reference's
                # matte branch (parse_blend_file.rs:1156-1190): mirror/
                # glass/translucent/emissive slots keep their materials
                use_tex = tex_mat is not None and mp not in mat_nonmatte
                mat_id = tex_mat if use_tex else mats.get(mp, 0)
                al = None
                if mp in mat_emit:
                    al = dict(L=mat_emit[mp], two_sided=True)
                b.add_triangle_mesh(
                    Fs, V, uvs=UV, material=mat_id, object_to_world=o2w,
                    area_light=al,
                )
        elif kind == "Camera":
            if camera_name and bf.id_name(blk)[2:] != camera_name:
                continue  # reference -c camera_name object filter
            lay_c = bf._layout(target[1])
            lens_mm = bf.f32(target, "lens")
            sensor_x = bf.f32(target, "sensor_x") if "sensor_x" in lay_c else 32.0
            sensor_y = bf.f32(target, "sensor_y") if "sensor_y" in lay_c else 18.0
            sensor_fit = bf.i16(target, "sensor_fit") if "sensor_fit" in lay_c else 0
            # reference parse_blend_file.rs:3437-3456: sensor_fit==2
            # (VERTICAL) -> fov from sensor_y; otherwise fov from sensor_x
            # divided by the film aspect (xsch/ysch)
            if sensor_fit == 2:
                fov = np.degrees(2.0 * np.arctan(sensor_y / (2.0 * lens_mm)))
            else:
                fov = np.degrees(2.0 * np.arctan(sensor_x / (2.0 * lens_mm))) / aspect
            cam_info["fov"] = float(fov)
            cam_info["cam_to_world"] = np.asarray(m, np.float32)
            # near-clip start (reference parse_blend_file.rs:182 clipsta ->
            # perspective camera clipping_start, camera.rs:102-118)
            if "clipsta" in bf._layout(target[1]):
                cam_info["clipping_start"] = float(bf.f32(target, "clipsta"))
        elif kind in ("Lamp", "Light"):
            lay = bf._layout(target[1])
            la_type = bf.i16(target, "type")
            rgb = np.asarray(
                [bf.f32(target, "r"), bf.f32(target, "g"), bf.f32(target, "b")]
            )
            energy = bf.f32(target, "energy") if "energy" in lay else 1.0
            energy *= float(light_scale)
            if la_type == 1:  # LA_SUN
                d = -m[:3, 2]  # lamp -z axis
                b.add_distant_light(from_p=(0, 0, 0), to=tuple(d), L=tuple(rgb * energy))
            elif la_type == 2:  # LA_SPOT (parse_blend_file.rs spot branch)
                spotsize = bf.f32(target, "spotsize") if "spotsize" in lay else 0.785
                blend = bf.f32(target, "spotblend") if "spotblend" in lay else 0.15
                cone = float(np.degrees(spotsize * 0.5))
                p = m[:3, 3]
                to = p - m[:3, 2]  # lamp looks down its -z axis
                b.add_spot_light(
                    p=tuple(p), to=tuple(to), I=tuple(rgb * energy),
                    cone_angle=cone, cone_delta=cone * float(blend),
                )
            elif la_type == 4:  # LA_AREA -> emissive quad (reference
                # parse_blend_file.rs area-lamp branch: Lamp.area_size/_sizey)
                sx = bf.f32(target, "area_size") if "area_size" in lay else 1.0
                shape = bf.i16(target, "area_shape") if "area_shape" in lay else 0
                sy = (bf.f32(target, "area_sizey")
                      if shape == 1 and "area_sizey" in lay else sx)
                hx, hy = 0.5 * sx, 0.5 * sy
                quad = np.array(
                    [[-hx, -hy, 0], [hx, -hy, 0], [hx, hy, 0], [-hx, hy, 0]],
                    np.float32,
                )
                area = max(sx * sy, 1e-6)
                black = b.add_matte(kd=(0.0, 0.0, 0.0))
                # radiance from lamp power: L = P / (area * pi)
                b.add_triangle_mesh(
                    [[0, 2, 1], [0, 3, 2]], quad, material=black,
                    object_to_world=o2w,
                    area_light=dict(
                        L=tuple(rgb * energy / (area * np.pi)), two_sided=False
                    ),
                )
            else:
                # LA_LOCAL point lamp.  The reference keys off Lamp.dist
                # (parse_blend_file.rs:2193-2230): the Blender default
                # dist==25.0 maps to a point light with I = energy * rgb;
                # any other dist becomes an emitting SPHERE of radius dist
                # with emitted radiance rgb * energy / dist (the lamp's
                # falloff-distance control re-expressed as a soft area
                # light).
                dist = bf.f32(target, "dist") if "dist" in lay else 25.0
                if dist <= 0.0 or abs(dist - 25.0) < 1e-6:
                    b.add_point_light(p=tuple(m[:3, 3]), I=tuple(rgb * energy))
                else:
                    black = b.add_matte(kd=(0.0, 0.0, 0.0))
                    b.add_sphere(
                        object_to_world=o2w, radius=float(dist),
                        material=black,
                        area_light=dict(
                            L=tuple(rgb * (energy / dist)), two_sided=False
                        ),
                    )

    # world background -> constant-color IBL (reference reads World horr/
    # horg/horb into an infinite light)
    for blk in bf.blocks:
        if bf.struct_name(blk) == "World":
            lay = bf._layout(blk[1])
            if "horr" in lay:
                hor = (bf.f32(blk, "horr"), bf.f32(blk, "horg"), bf.f32(blk, "horb"))
                if any(c > 0 for c in hor) and b.env is None:
                    b.add_infinite_light(L=hor)
            break
    return b, cam_info
