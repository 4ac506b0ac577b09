"""Test bootstrap.

Forces JAX onto the CPU platform with 8 virtual devices so multi-chip
sharding paths can be exercised without TPU hardware. Must run before any
``import jax`` anywhere in the test session.
"""

import os
import sys

# This image preloads jax via a site hook and pins the platform to the
# axon TPU plugin regardless of the JAX_PLATFORMS env var; the TPU is also
# process-exclusive, so tests must never touch it. Backend creation is
# lazy, so forcing the platform through jax.config before any device use
# reliably lands tests on 8 virtual CPU devices.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"  # honored by vanilla jax installs

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

# Modules quick enough for the default developer gate (`make test-fast`,
# target < 3 min): control plane, containers, unit-level codec pieces.
# Everything else (jit-heavy encode/decode e2e, oracle conformance) is
# auto-marked `slow` and runs in `make test` / CI.
FAST_MODULES = {
    "test_args", "test_cli", "test_config", "test_fs", "test_queue",
    "test_pipeline", "test_multinode", "test_robustness", "test_mp4",
    "test_mkv", "test_quality", "test_ratecontrol", "test_color_scale",
    "test_transform", "test_h265_headers", "test_cavlc", "test_cabac",
    "test_h265_residual", "test_audio",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ not in FAST_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def miniredis():
    """A live embedded redis server, one per test session."""
    from vcp_tpu.queue.miniredis import MiniRedisServer
    srv = MiniRedisServer()
    srv.start()
    yield srv
    srv.stop()


@pytest.fixture()
def redis_address(miniredis):
    """Fresh-db address for a test (flushes everything first)."""
    miniredis.engine.dbs.clear()
    return miniredis.address


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_between_modules():
    """XLA:CPU's in-process compiler state grows with every distinct jit
    program; past a few hundred compilations in one long process it has
    segfaulted inside backend_compile (LLVM JIT state). Dropping the
    executable caches between test modules keeps the state bounded —
    modules re-compile what they share, which is cheap on CPU."""
    yield
    import jax
    try:
        jax.clear_caches()
    except Exception:
        pass
