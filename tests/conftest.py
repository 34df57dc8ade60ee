"""Test configuration: force the CPU backend with 8 virtual devices so the
whole suite (kernel logic via interpret mode, multi-chip sharding via
shard_map) runs without TPU hardware — the strategy SURVEY.md §4 derives
from the reference's differential-testing approach.
"""

import os
import sys

# The JAX_PLATFORMS env var is ignored when a TPU plugin self-registers
# (observed with the tunneled-TPU plugin), so force CPU through the
# config API instead — otherwise "CPU" tests silently round-trip the
# TPU at ~25ms per dispatch.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


@pytest.fixture(scope="session")
def golden_dir():
    return GOLDEN
