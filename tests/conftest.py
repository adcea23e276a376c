"""Test environment: force an 8-device virtual CPU mesh before JAX inits.

Mirrors the reference's device parametrization strategy (see SURVEY.md §4):
instead of cpu/cuda/flashfftconv, we parametrize cpu-jax with a virtual
multi-device mesh for sharding tests; TPU runs are exercised by bench.py.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The tunneled TPU plugin ('axon') registers itself regardless of
# JAX_PLATFORMS; force the CPU backend explicitly for the test suite.
jax.config.update("jax_platforms", "cpu")
