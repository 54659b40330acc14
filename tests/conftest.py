"""Test harness config: force the LOCAL CPU backend with 8 virtual devices.

The image's sitecustomize registers an `axon` remote-TPU backend and sets
jax_platforms="axon,cpu" with terminal-side (remote) compilation — fine for
bench.py, but every test compile would ride the tunnel.  JAX backends
initialize lazily, so overriding the config here (before any op runs) pins
tests to the in-process CPU backend; the 8 virtual devices let the multi-chip
sharding paths compile and execute without TPU hardware.
"""

import os

# read lazily at backend init — still effective here
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)

import jax  # noqa: E402  (likely already imported by sitecustomize)
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compile cache: the tier's cost is dominated by CPU XLA compiles
# of the big staged graphs (bootstrap/eval pipelines); re-runs hit the cache
# and the review loop drops from ~tens of minutes to minutes
_cache = os.path.join(os.path.dirname(__file__), "..", "_build", "jaxcache_cpu")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


# ---------------------------------------------------------------------------
# Two test tiers: the DEFAULT tier (`pytest -q`) stays under ~10 min on the
# 4-core CPU backend; tests marked @pytest.mark.slow (long end-to-end
# pipelines whose features also have fast coverage) only run with --slow.
# Full suite: `python -m pytest tests/ -q --slow`.
# ---------------------------------------------------------------------------

def pytest_addoption(parser):
    parser.addoption("--slow", action="store_true", default=False,
                     help="also run tests marked slow (full tier)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long end-to-end test, excluded unless --slow")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--slow"):
        return
    skip = pytest.mark.skip(reason="slow tier: run with --slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
