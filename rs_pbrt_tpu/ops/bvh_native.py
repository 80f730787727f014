"""ctypes bridge to the native C++ LBVH builder (native/lbvh.cpp).

Drop-in replacement for ops/bvh.build_lbvh at large primitive counts: same
Karras construction, same flat SoA node layout, ~60x faster at 4.3M prims
(the numpy build's sparse-table AABB phase is memory-bound).  Auto-builds
the shared library on first use if g++ is available.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from .bvh import LBVH

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "liblbvh.so"
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True, capture_output=True)
    lib = ctypes.CDLL(str(_LIB_PATH))
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    sig = [f32p, f32p, ctypes.c_int, i32p, i32p, f32p, f32p, f32p, f32p, i32p]
    lib.lbvh_build.argtypes = sig
    lib.lbvh_build.restype = ctypes.c_int
    lib.sah_build.argtypes = sig
    lib.sah_build.restype = ctypes.c_int
    wide_sig = [
        i32p, i32p, f32p, f32p, f32p, f32p, i32p, f32p, f32p, f32p,
        ctypes.c_int, f32p, ctypes.c_long, i32p,
    ]
    lib.wide4_build.argtypes = wide_sig
    lib.wide4_build.restype = ctypes.c_long
    lib.wide12_build.argtypes = wide_sig
    lib.wide12_build.restype = ctypes.c_long
    lib.wide24_build.argtypes = wide_sig
    lib.wide24_build.restype = ctypes.c_long
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def _build_wide(fn_name, width, child_l, child_r, bmin_l, bmax_l, bmin_r,
                bmax_r, prim_ids, p0, p1, p2):
    lib = _load()
    n = len(prim_ids)
    assert n < (1 << 24), "wide ids exceed exact-f32 range"
    cl = np.ascontiguousarray(child_l, np.int32)
    cr = np.ascontiguousarray(child_r, np.int32)
    args = [
        cl, cr,
        np.ascontiguousarray(bmin_l, np.float32),
        np.ascontiguousarray(bmax_l, np.float32),
        np.ascontiguousarray(bmin_r, np.float32),
        np.ascontiguousarray(bmax_r, np.float32),
        np.ascontiguousarray(prim_ids, np.int32),
        np.ascontiguousarray(p0, np.float32),
        np.ascontiguousarray(p1, np.float32),
        np.ascontiguousarray(p2, np.float32),
    ]
    build = getattr(lib, fn_name)
    cap_rows = 2 * n + 8
    rows = np.empty((cap_rows, width), np.float32)
    depth = np.zeros(1, np.int32)
    ret = build(*args, n, rows, rows.size, depth)
    if ret < 0:
        rows = np.empty((-ret, width), np.float32)
        ret = build(*args, n, rows, rows.size, depth)
    if ret <= 0:
        raise RuntimeError(f"{fn_name} failed ret={ret}")
    # stored links (child-group base, col 24/72) are row ids and must stay
    # exact as f32; worst-case row count exceeds the primitive count, so
    # assert the RETURNED count (ADVICE r3: the n-based assert above is
    # not sufficient near 2^24)
    assert ret < (1 << 24), "wide row ids exceed exact-f32 range"
    return np.ascontiguousarray(rows[:ret]), int(depth[0])


def build_wide4(*args):
    """Collapse a binary BVH into the unified 4-wide 256B-row array (see
    native/lbvh.cpp wide4_build).  Returns (rows (M,64) np.float32,
    max_depth int)."""
    return _build_wide("wide4_build", 64, *args)


def build_wide12(*args):
    """Collapse a binary BVH into the unified 12-wide 512B-row array (see
    native/lbvh.cpp wide12_build; round-4 probe economics in
    ops/bvh.bvh12_intersect_tris).  Returns (rows (M,128), max_depth)."""
    return _build_wide("wide12_build", 128, *args)


def build_wide24(*args):
    """24-wide 1024B-row variant (native wide24_build).  Returns
    (rows (M,256), max_depth)."""
    return _build_wide("wide24_build", 256, *args)


def build_lbvh_native(bmin, bmax, tris=None, sah: bool = True,
                      lean: bool = False, wide24: bool = False) -> LBVH:
    """bmin/bmax: (N,3) float32 numpy arrays -> device LBVH pytree.
    tris: optional (p0, p1, p2) — also packs leaf triangle rows and the
    rope-traversal node stream (see bvh.build_stream).
    sah: binned-SAH construction (reference bvh.rs default; ~3x fewer
    traversal visits/ray than morton LBVH on mixed-scale scenes);
    False = Karras morton LBVH.
    lean: keep ONLY the wide12 rows the TPU traversal consumes (plus
    binary child arrays for CPU fallback) — the full pytree's auxiliary
    encodings (stream/leaf/node/wide4 rows) cost ~0.7GB HBM per 1.3M
    triangles and ride every dispatch; at Ganesha scale that's the
    difference between fitting and not."""
    bmin = np.ascontiguousarray(bmin, np.float32)
    bmax = np.ascontiguousarray(bmax, np.float32)
    n = bmin.shape[0]
    if n == 1:
        # degenerate single-primitive tree: the native builder emits a fake
        # root with a duplicated leaf child, which build_stream would give a
        # self-referencing miss link (device hang); the numpy path has the
        # _stream_single guard — delegate to it (ADVICE r2 #1)
        from .bvh import build_lbvh

        lb = build_lbvh(bmin, bmax, tris=tris)
        if tris is not None:
            z1 = np.zeros(1, np.int32)
            z3 = np.zeros((1, 3), np.float32)
            wide, depth = build_wide4(z1, z1, z3, z3, z3, z3, z1, *tris)
            wide12, depth12 = build_wide12(z1, z1, z3, z3, z3, z3, z1, *tris)
            lb = lb._replace(
                wide64=jnp.asarray(wide),
                wide_dflag=jnp.zeros((depth, 0), jnp.float32),
                wide128=jnp.asarray(wide12),
                wide128_dflag=jnp.zeros((depth12, 0), jnp.float32),
            )
            if wide24:
                w24, depth24 = build_wide24(z1, z1, z3, z3, z3, z3, z1, *tris)
                lb = lb._replace(
                    wide256=jnp.asarray(w24),
                    wide256_dflag=jnp.zeros((depth24, 0), jnp.float32),
                )
        return lb
    lib = _load()
    m = max(n - 1, 1)
    child_l = np.empty(m, np.int32)
    child_r = np.empty(m, np.int32)
    bmin_l = np.empty((m, 3), np.float32)
    bmax_l = np.empty((m, 3), np.float32)
    bmin_r = np.empty((m, 3), np.float32)
    bmax_r = np.empty((m, 3), np.float32)
    prim_ids = np.empty(n, np.int32)
    build_fn = lib.sah_build if sah else lib.lbvh_build
    rc = build_fn(
        bmin, bmax, n, child_l, child_r, bmin_l, bmax_l, bmin_r, bmax_r, prim_ids
    )
    if rc != 0:
        raise RuntimeError(f"lbvh_build failed rc={rc}")
    from .bvh import build_stream, pack_leaf_tris, pack_nodes

    wide = wide12 = wide24_rows = None
    depth = depth12 = depth24 = 0
    if tris is not None:
        if not lean:
            wide, depth = build_wide4(
                child_l, child_r, bmin_l, bmax_l, bmin_r, bmax_r, prim_ids, *tris
            )
        wide12, depth12 = build_wide12(
            child_l, child_r, bmin_l, bmax_l, bmin_r, bmax_r, prim_ids, *tris
        )
        if wide24:
            wide24_rows, depth24 = build_wide24(
                child_l, child_r, bmin_l, bmax_l, bmin_r, bmax_r, prim_ids, *tris
            )
    return LBVH(
        jnp.asarray(child_l), jnp.asarray(child_r),
        jnp.asarray(bmin_l), jnp.asarray(bmax_l),
        jnp.asarray(bmin_r), jnp.asarray(bmax_r),
        jnp.asarray(prim_ids),
        None if lean else jnp.asarray(
            pack_nodes(child_l, child_r, bmin_l, bmax_l, bmin_r, bmax_r)
        ),
        None if tris is None or lean else jnp.asarray(
            pack_leaf_tris(prim_ids, *tris)
        ),
        None if tris is None or lean else jnp.asarray(build_stream(
            (child_l, child_r), bmin_l, bmax_l, bmin_r, bmax_r, prim_ids, *tris
        )),
        None if wide is None else jnp.asarray(wide),
        None if wide is None else jnp.zeros((depth, 0), jnp.float32),
        None if wide12 is None else jnp.asarray(wide12),
        None if wide12 is None else jnp.zeros((depth12, 0), jnp.float32),
        None if wide24_rows is None else jnp.asarray(wide24_rows),
        None if wide24_rows is None else jnp.zeros((depth24, 0), jnp.float32),
    )
