"""Golden-image comparison against reference renders.

The reference ships two of its own Cornell-box renders in its docs
(docs/source/cornell_box_{8,256}_pixelsamples.png, produced by
`rs_pbrt --path cornell_box.pbrt` per docs/source/getting_started.rst:150-215)
— real golden data from the reference renderer without needing the Rust
toolchain.  This tool quantifies how close one of our renders is.

Metrics are computed in display (sRGB-encoded, [0,1]) space, the space both
PNGs live in (reference film.rs:438-528 gamma path):
  mae      — mean |ours - golden|
  rmse     — root mean squared error
  p95      — 95th percentile abs error
  frac_close(t) — fraction of pixels with max-channel error <= t

Usage: python tools/golden_compare.py OURS.png GOLDEN.png [--diff OUT.png]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def load_png(path):
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), np.float64) / 255.0


def compare(ours: np.ndarray, golden: np.ndarray) -> dict:
    if ours.shape != golden.shape:
        raise ValueError(f"shape mismatch: {ours.shape} vs {golden.shape}")
    err = np.abs(ours - golden)
    per_pix = err.max(axis=-1)
    mse = float((err * err).mean())
    return {
        "mae": float(err.mean()),
        "rmse": float(np.sqrt(mse)),
        "psnr": float(10.0 * np.log10(1.0 / max(mse, 1e-12))),
        "p95": float(np.percentile(per_pix, 95)),
        "p99": float(np.percentile(per_pix, 99)),
        "frac_within_2_256": float((per_pix <= 2.0 / 255.0).mean()),
        "frac_within_5_256": float((per_pix <= 5.0 / 255.0).mean()),
        "frac_within_10_256": float((per_pix <= 10.0 / 255.0).mean()),
    }


def diff_image(ours, golden, path, scale=4.0):
    from PIL import Image

    d = np.clip(np.abs(ours - golden) * scale, 0, 1)
    Image.fromarray((d * 255).astype(np.uint8)).save(path)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("ours")
    ap.add_argument("golden")
    ap.add_argument("--diff", default=None)
    args = ap.parse_args(argv)
    ours, golden = load_png(args.ours), load_png(args.golden)
    m = compare(ours, golden)
    for k, v in m.items():
        print(f"{k:>18s}: {v:.5f}")
    if args.diff:
        diff_image(ours, golden, args.diff)
        print(f"diff image -> {args.diff}")
    return m


if __name__ == "__main__":
    main(sys.argv[1:])
