#!/usr/bin/env python
"""Extract constant *data tables* from the reference implementation into .npz.

The reference (rs_pbrt) embeds several large numeric tables as Rust const
arrays.  These are pure data (Sobol' direction numbers from Joe/Kuo via
pbrt-v3, CIE 1931 color matching curves, prime tables) — not code.  We parse
them once into ``rs_pbrt_tpu/data/tables.npz`` so the TPU framework can load
them as device constants.

Sources (reference file:line):
  - src/core/sobolmatrices.rs:5-7   SOBOL_MATRICES_32 (1024 dims x 52 bits)
  - src/core/sobolmatrices.rs:53463 VD_C_SOBOL_MATRICES   (ragged u64)
  - src/core/sobolmatrices.rs:54155 VD_C_SOBOL_MATRICES_INV (ragged u64)
  - src/core/spectrum.rs:16-1480    CIE_X/Y/Z/LAMBDA (471 samples)
  - src/core/lowdiscrepancy.rs:20,84,187 PRIMES, PRIME_SUMS, C_MAX_MIN_DIST
"""

import re
import sys
from pathlib import Path

import numpy as np

REF = Path("/root/reference/src/core")
OUT = Path(__file__).resolve().parent.parent / "rs_pbrt_tpu" / "data" / "tables.npz"

NUM_RE = re.compile(r"0x[0-9a-fA-F_]+|\d[\d_]*\.?[\d_]*(?:[eE][+-]?\d+)?")


def _numbers(text, dtype):
    toks = NUM_RE.findall(text)
    vals = []
    for t in toks:
        t = t.replace("_", "")
        if t.startswith("0x"):
            vals.append(int(t, 16))
        elif "." in t or "e" in t or "E" in t:
            vals.append(float(t))
        else:
            vals.append(int(t))
    return np.array(vals, dtype=dtype)


def extract_const(path, name, dtype):
    src = path.read_text()
    m = re.search(rf"const {name}:[^=]+=\s*\[", src)
    if not m:
        raise KeyError(name)
    start = m.end()
    depth = 1
    i = start
    while depth:
        c = src[i]
        if c == "[":
            depth += 1
        elif c == "]":
            depth -= 1
        i += 1
    body = src[start : i - 1]
    # strip suffixes like _u64, _f32 so they don't parse as numbers
    body = re.sub(r"_?[uif](?:8|16|32|64)\b", "", body)
    body = re.sub(r"as\s+\w+", "", body)
    return _numbers(body, dtype)


def main():
    out = {}
    sm = REF / "sobolmatrices.rs"
    out["sobol_matrices_32"] = extract_const(sm, "SOBOL_MATRICES_32", np.uint32).reshape(1024, 52)

    # VdC matrices: M1..M25 (len 2m) and MI1..MI26 (len 2m), stored as u64;
    # split into hi/lo u32 planes, padded to max length.
    def ragged(prefix, count):
        rows = [extract_const(sm, rf"{prefix}{k}", np.uint64) for k in range(1, count + 1)]
        width = max(len(r) for r in rows)
        lo = np.zeros((count, width), np.uint32)
        hi = np.zeros((count, width), np.uint32)
        for k, r in enumerate(rows):
            lo[k, : len(r)] = (r & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            hi[k, : len(r)] = (r >> np.uint64(32)).astype(np.uint32)
        return lo, hi

    out["vdc_lo"], out["vdc_hi"] = ragged("M", 25)
    out["vdc_inv_lo"], out["vdc_inv_hi"] = ragged("MI", 26)

    sp = REF / "spectrum.rs"
    for name in ["CIE_X", "CIE_Y", "CIE_Z", "CIE_LAMBDA"]:
        arr = extract_const(sp, name, np.float64).astype(np.float32)
        assert arr.shape == (471,), (name, arr.shape)
        out[name.lower()] = arr

    tx = REF / "texture.rs"
    out["noise_perm"] = extract_const(tx, "NOISE_PERM", np.int32)
    assert out["noise_perm"].shape == (512,)

    ld = REF / "lowdiscrepancy.rs"
    out["primes"] = extract_const(ld, "PRIMES", np.uint32)
    out["prime_sums"] = extract_const(ld, "PRIME_SUMS", np.uint32)
    out["c_max_min_dist"] = extract_const(ld, "C_MAX_MIN_DIST", np.uint32).reshape(17, 32)

    # measured conductor spectra (physical data: CRC/Palik measurements
    # shipped by pbrt; reference src/materials/metal.rs:12-117)
    mt = REF.parent / "materials" / "metal.rs"
    for name in ["COPPER_WAVELENGTHS", "COPPER_N", "COPPER_K"]:
        arr = extract_const(mt, name, np.float64).astype(np.float32)
        assert arr.shape == (56,), (name, arr.shape)
        out[name.lower()] = arr

    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **out)
    for k, v in out.items():
        print(f"{k}: shape={v.shape} dtype={v.dtype}")
    print(f"wrote {OUT} ({OUT.stat().st_size/1e6:.2f} MB)")


if __name__ == "__main__":
    sys.exit(main())
