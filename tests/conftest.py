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


_TESTS_SINCE_CLEAR = {"n": 0}


@pytest.fixture(autouse=True)
def _bounded_compile_state():
    """Periodically drop jit caches so in-process XLA-CPU compile state
    stays bounded across the whole suite.

    The suite compiles hundreds of programs in one process; past ~95 tests
    the NEXT heavy compile reproducibly died inside LLVM
    (backend_compile_and_load: SIGSEGV, and after shuffling compiles
    SIGABRT — position-deterministic, fine in isolation, so cumulative
    compiler state, not any single program). clear_caches() frees the
    executables (measured: /proc/self/maps 1127 -> 531 after 200 compiles);
    clearing every 30 tests keeps the process far from the cliff at the
    cost of recompiling shared programs a handful of times per run."""
    yield
    _TESTS_SINCE_CLEAR["n"] += 1
    if _TESTS_SINCE_CLEAR["n"] >= 30:
        _TESTS_SINCE_CLEAR["n"] = 0
        import gc

        jax.clear_caches()
        gc.collect()


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
