"""Whitespace/comment-tolerant float file reader
(reference src/core/floatfile.rs)."""

from __future__ import annotations

from pathlib import Path


def read_float_file(path):
    vals = []
    for line in Path(path).read_text().splitlines():
        line = line.split("#", 1)[0]
        for tok in line.split():
            vals.append(float(tok))
    return vals
