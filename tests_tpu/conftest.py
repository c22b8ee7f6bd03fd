"""On-TPU test tier (VERDICT r1 item #7).

Run on real hardware with:  python -m pytest tests_tpu -q
Unlike tests/ (which forces an 8-device virtual CPU mesh), this tier
keeps the session's real platform and skips everything if no TPU is
attached.  Covers every TPU-specific hazard found by hand in round 1
(STATUS.md): f64 dot_general emulation, batched-eigvalsh NaN, Mosaic
legalization of the Pallas kernel, mixed-precision schedules.
"""

import os

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import jax
import pytest

if os.environ.get("TPU_TIER_ON_CPU"):
    # CPU logic check: the JAX_PLATFORMS env var alone does not reliably
    # keep jax off the tunneled TPU platform in this image
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def pytest_collection_modifyitems(config, items):
    try:
        on_tpu = jax.default_backend() not in ("cpu",)
    except Exception:
        on_tpu = False
    if os.environ.get("TPU_TIER_ON_CPU"):  # logic check without hardware
        on_tpu = True
    if not on_tpu:
        skip = pytest.mark.skip(reason="no TPU attached (tests_tpu tier)")
        for item in items:
            item.add_marker(skip)
