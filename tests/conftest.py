"""Test env: force CPU with 8 virtual devices BEFORE the backend initializes.

Multi-chip sharding tests run on this virtual mesh (SURVEY.md §4 item 4);
real-TPU benchmarking lives in bench.py, not the test suite.

Note: this image's sitecustomize force-registers a TPU PJRT plugin and sets
``JAX_PLATFORMS`` in the environment, so plain env vars are not enough —
``jax.config.update`` after import (but before backend init) is what sticks.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
