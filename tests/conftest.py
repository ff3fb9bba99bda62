"""Test environment: force an 8-device virtual CPU mesh.

This is the TPU-world analogue of testing multi-node code without a cluster
(SURVEY.md §4): all sharding/collective paths run on
xla_force_host_platform_device_count virtual devices.

NOTE: the environment's sitecustomize imports jax and registers the real
TPU-tunnel PJRT plugin before pytest starts, so setting JAX_PLATFORMS in
os.environ here is too late — ``jax.config.update`` is the reliable switch
(it takes effect any time before backend initialization).
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compile cache: the suite is compile-dominated (~10 min cold);
# warm reruns drop to a fraction
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "..", ".jax_test_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# Test tiers (round-4 verdict #7): the default selection must stay fast
# (<10 min CPU); the slowest ~20% — med-res compiles, 8-device mesh BA,
# multi-process launches — carry @pytest.mark.full and run only with
# TCSFM_FULL=1 (the verify skill's full tier) or an explicit -m full.
# ---------------------------------------------------------------------------


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "full: slow tier — skipped unless TCSFM_FULL=1 or "
                   "-m full is passed")


def pytest_collection_modifyitems(config, items):
    if os.environ.get("TCSFM_FULL") == "1":
        return
    if config.getoption("-m", default=""):
        return                      # explicit marker selection wins
    skip_full = pytest.mark.skip(
        reason="full tier (slow): set TCSFM_FULL=1")
    for item in items:
        if "full" in item.keywords:
            item.add_marker(skip_full)
