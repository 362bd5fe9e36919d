"""Test config: force CPU platform with an 8-device virtual mesh.

This replaces the reference's untestable-without-2-GPUs DDP setup
(reference tests/test_cli.py:108-122): all sharding paths run on a simulated
8-device CPU mesh, so SPMD code is exercised in every CI run.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["SARYOLO_VERBOSE"] = "0"
# this XLA CPU build runs f32 dots at bf16 precision by default (~7e-2 error on
# a 64-dim matmul) — force true f32 so numeric/parity assertions are meaningful
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent XLA compilation cache: the suite is compile-dominated (whole-model
# jits for every family), so re-runs on the same machine skip nearly all of it.
_cache = os.path.join(os.path.dirname(__file__), "..", ".jax_test_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(0)
