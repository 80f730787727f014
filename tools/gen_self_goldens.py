#!/usr/bin/env python
"""Generate the self-regression goldens (tests/goldens/self/*.npz).

Run on CPU (the backend the test suite uses):
    JAX_PLATFORMS=cpu python tools/gen_self_goldens.py

Each config is rendered TWICE; a non-deterministic pair aborts generation
(a golden that can't reproduce itself would only produce flaky tests).
See tests/_selfgolden.py for the config table and rationale.
"""

import os
import sys
import time

# mirror tests/conftest.py exactly: goldens must be produced under the
# same XLA flags/platform the test suite renders with.  In this
# environment sitecustomize pre-imports jax and registers the TPU
# backend, so the JAX_PLATFORMS env var (shell or in-Python) is TOO LATE
# — only jax.config.update actually switches platforms (conftest.py
# learned the same lesson).  XLA_FLAGS appended in-Python still works
# because the CPU client initializes lazily.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))

import _selfgolden as sg  # noqa: E402


def main():
    # goldens MUST be produced on the same virtual mesh the suite uses:
    # 8-device CPU numerics differ deterministically from 1-device/TPU
    # (thread-pool partitioning changes reduction order)
    assert jax.default_backend() == "cpu" and jax.device_count() == 8, (
        f"expected the conftest 8-device CPU mesh, got "
        f"{jax.device_count()}x {jax.default_backend()}"
    )
    os.makedirs(sg.GOLD_DIR, exist_ok=True)
    for name in sg.CONFIGS:
        t0 = time.time()
        a = sg.render_config(name)
        b = sg.render_config(name)
        dmax = float(np.abs(a - b).max())
        print(f"{name}: {a.shape} render {time.time()-t0:.1f}s  "
              f"repeat-max-delta {dmax:.2e}")
        if dmax > 1e-5:
            print(f"  ABORT: {name} is not deterministic on this backend")
            return 1
        np.savez_compressed(sg.golden_path(name), img=a.astype(np.float32))
        print(f"  wrote {sg.golden_path(name)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
