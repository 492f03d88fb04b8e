"""Test harness: 8 virtual CPU devices (the TPU-world stand-in for
multi-chip, per SURVEY.md §4) and deterministic seeds.

Note: in this environment the axon TPU plugin ignores the
`JAX_PLATFORMS` env var, so the backend is forced via
`jax.config.update` before any device query.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_backend_optimization_level" not in _flags:
    # compile speed over runtime speed for the CPU test mesh: halves the
    # train-step compile times that dominate the suite; numerics are
    # unchanged (all parity tests pass at this level)
    _flags = (_flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = _flags

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the suite is compile-bound on CPU; repeat
# runs (the common reviewer/dev case) skip recompiles entirely.
jax.config.update("jax_compilation_cache_dir", "/tmp/fashionern_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
# Parity tests compare fp32 numerics; keep matmuls at fp32 everywhere in
# tests (TPU-default bf16 matmul precision is a production-path choice).
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)
