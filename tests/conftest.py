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

# ---------------------------------------------------------------------------
# Fast/slow test tiers.  The heavy sweeps (exact-backend parameter grids,
# long-signal gradient checks) are marked "slow" from the checked-in list
# below; the smoke tier
#     pytest tests/ -m "not slow" -q
# still imports and exercises every module in a few minutes, while the
# default (full) run is unchanged.  Regenerate the list with
#     pytest tests/ -q --durations=0   (mark anything over ~5 s, keeping
#     the fastest test of each file in the smoke tier)
# ---------------------------------------------------------------------------

import pytest  # noqa: E402

_SLOW_LIST = os.path.join(os.path.dirname(__file__), "slow_tests.txt")
with open(_SLOW_LIST) as f:
    _SLOW_TESTS = frozenset(line.strip() for line in f if line.strip())


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavy sweep excluded from the smoke tier (-m 'not slow')"
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.nodeid in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
