"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on CPU with 8 virtual devices so multi-chip sharding logic
(pjit/shard_map over a Mesh) is exercised without TPU hardware, per the
project test strategy (SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# jax may already be imported by an interpreter-startup hook that binds the
# TPU backend; the config update overrides it even post-import.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"
FIXTURE_DIR = os.path.join(REFERENCE_DIR, "result", "rgbd")


@pytest.fixture(scope="session")
def fixture_dir():
    if not os.path.isdir(FIXTURE_DIR):
        pytest.skip("reference fixtures not available")
    return FIXTURE_DIR


@pytest.fixture()
def rng():
    # function-scoped: every test sees the same deterministic stream
    # regardless of which other tests ran before it.
    return np.random.default_rng(0)
