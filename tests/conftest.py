"""Test configuration: force an 8-device virtual CPU mesh and x64 mode.

Multi-chip sharding tests run on CPU with
--xla_force_host_platform_device_count=8 (no TPU hardware needed);
numerical tests require x64.  Both must be configured before jax imports.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


import gc

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_solver_caches():
    """Free compiled-executable memory between test modules: dozens of
    distinct problem structures otherwise accumulate compiled programs
    and can push the XLA CPU compiler into OOM segfaults."""
    yield
    from clarabel_tpu.api import _SOLVE_CACHE

    _SOLVE_CACHE.clear()
    jax.clear_caches()
    gc.collect()
