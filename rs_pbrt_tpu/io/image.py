"""Image IO (host-side).

Replaces reference src/core/film.rs write_image (:438-528, PNG with sRGB
gamma + dither-free u8 quantization) and the image loading used by
textures/imagemap.rs and lights/infinite.rs (PNG/TGA/HDR/EXR via crates).
PNG through PIL; .hdr via a small radiance-format reader; EXR written as
float32 zip EXR when available, else .npy sidecar fallback.
"""

from __future__ import annotations

import struct as _struct
import zlib
from pathlib import Path

import numpy as np


def _to_srgb_u8(img):
    img = np.asarray(img, np.float32)
    srgb = np.where(
        img <= 0.0031308,
        12.92 * img,
        1.055 * np.power(np.maximum(img, 1e-8), 1.0 / 2.4) - 0.055,
    )
    return np.clip(srgb * 255.0 + 0.5, 0, 255).astype(np.uint8)


def write_png(path, img):
    """img: (H,W,3) linear float -> sRGB PNG (reference film.rs:481)."""
    from PIL import Image

    Image.fromarray(_to_srgb_u8(img), "RGB").save(str(path))


def read_image(path):
    """Returns (H,W,3) linear float32 RGB."""
    path = str(path)
    if path.lower().endswith(".hdr"):
        return read_hdr(path)
    if path.lower().endswith((".pfm",)):
        return read_pfm(path)
    if path.lower().endswith(".exr"):
        return read_exr(path)
    if path.lower().endswith(".npy"):
        return np.load(path).astype(np.float32)
    from PIL import Image

    im = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    # sRGB -> linear (reference inverse_gamma_correct on LDR loads)
    return np.where(im <= 0.04045, im / 12.92, np.power((im + 0.055) / 1.055, 2.4)).astype(
        np.float32
    )


def read_hdr(path):
    """Radiance RGBE .hdr reader (reference uses image crate HdrDecoder,
    lights/infinite.rs:174)."""
    with open(path, "rb") as f:
        data = f.read()
    # header
    pos = data.index(b"\n\n") if b"\n\n" in data else data.index(b"\r\n\r\n")
    header = data[:pos].decode("ascii", "ignore")
    rest = data[pos:].lstrip(b"\r\n")
    dim_end = rest.index(b"\n")
    dims = rest[:dim_end].decode().split()
    assert dims[0] == "-Y" and dims[2] == "+X", f"unsupported orientation {dims}"
    h, w = int(dims[1]), int(dims[3])
    raw = rest[dim_end + 1 :]
    img = np.zeros((h, w, 4), np.uint8)
    off = 0
    for y in range(h):
        if raw[off : off + 2] == b"\x02\x02" and (raw[off + 2] << 8 | raw[off + 3]) == w:
            off += 4
            row = np.zeros((4, w), np.uint8)
            for c in range(4):
                x = 0
                while x < w:
                    n = raw[off]
                    off += 1
                    if n > 128:
                        row[c, x : x + n - 128] = raw[off]
                        off += 1
                        x += n - 128
                    else:
                        row[c, x : x + n] = np.frombuffer(raw[off : off + n], np.uint8)
                        off += n
                        x += n
            img[y] = row.T
        else:  # flat RGBE
            row = np.frombuffer(raw[off : off + 4 * w], np.uint8).reshape(w, 4)
            img[y] = row
            off += 4 * w
    rgbe = img.astype(np.float32)
    e = rgbe[..., 3]
    scale = np.where(e > 0, np.ldexp(1.0, e.astype(np.int32) - 136), 0.0)
    return (rgbe[..., :3] * scale[..., None]).astype(np.float32)


def read_pfm(path):
    with open(path, "rb") as f:
        kind = f.readline().strip()
        w, h = map(int, f.readline().split())
        scale = float(f.readline())
        n_chan = 3 if kind == b"PF" else 1
        data = np.frombuffer(f.read(4 * w * h * n_chan), "<f4" if scale < 0 else ">f4")
    img = data.reshape(h, w, n_chan)[::-1]
    if n_chan == 1:
        img = np.repeat(img, 3, axis=-1)
    return np.ascontiguousarray(img, np.float32)


def read_exr(path):
    try:
        import imageio.v3 as iio

        return np.asarray(iio.imread(path), np.float32)[..., :3]
    except Exception as e:  # pragma: no cover
        raise IOError(f"EXR read unavailable: {e}")


def write_exr(path, img):
    """Write float EXR if imageio supports it, else .npy sidecar."""
    try:
        import imageio.v3 as iio

        iio.imwrite(str(path), np.asarray(img, np.float32))
    except Exception:
        np.save(str(Path(path).with_suffix(".npy")), np.asarray(img, np.float32))
