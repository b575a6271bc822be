"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated on CPU (the reference had no
multi-device tests at all — see SURVEY.md section 4); real-TPU numbers come
from bench.py.

Note: this environment injects an `axon` TPU plugin via sitecustomize that
overrides JAX_PLATFORMS, so the env var alone is not enough — we must also
update jax.config after import.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# persistent compile cache: identical XLA programs (re-created jit wrappers
# across Engine instances / test runs) hit disk instead of recompiling —
# big wall-clock win on this single-core box
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache_cpu_tests")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def cpu_mesh_devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs


def pytest_collection_modifyitems(config, items):
    """QUICK_TPU_TEST_SHARD=k/n: deterministically keep every n-th test
    (by stable hash of its nodeid) so the 19-minute suite can run as n
    parallel single-process shards:

        QUICK_TPU_TEST_SHARD=0/4 python -m pytest tests/ -q &
        QUICK_TPU_TEST_SHARD=1/4 python -m pytest tests/ -q &
        ...

    Hash-based (not round-robin) so adding a test reshuffles almost
    nothing and shards stay balanced regardless of file ordering."""
    shard = os.environ.get("QUICK_TPU_TEST_SHARD", "")
    if not shard:
        return
    import zlib

    k, n = (int(p) for p in shard.split("/"))
    keep, drop = [], []
    for item in items:
        h = zlib.crc32(item.nodeid.encode()) % n
        (keep if h == k else drop).append(item)
    items[:] = keep
    config.hook.pytest_deselected(items=drop)
