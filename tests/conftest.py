"""Test harness: force CPU with 8 virtual devices so multi-chip sharding
paths compile and execute without TPU hardware.

The environment pre-registers an 'axon' TPU platform that overrides
JAX_PLATFORMS, so we must force the platform via jax.config after import.
"""

import os
import sys

os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# float32 parity against the torch oracle needs exact f32 matmuls on CPU
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compilation cache: the session program is expensive to compile
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)


REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


@pytest.fixture
def reference_path():
    if not reference_available():
        pytest.skip("reference repo not mounted")
    return REFERENCE_ROOT
