"""Test config: force an 8-virtual-device CPU mesh so multi-chip sharding
logic is exercised without TPU hardware (the 'fake backend' strategy —
see SURVEY.md §4).

NOTE: this environment pre-registers a TPU backend via sitecustomize before
pytest loads conftest, so plain env vars are too late; we must override
through jax.config after import.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
