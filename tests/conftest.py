"""Test configuration: force an 8-virtual-device CPU platform.

Multi-chip sharding logic is tested without TPU hardware via
``--xla_force_host_platform_device_count=8`` (SURVEY.md §4.5).  The axon TPU
plugin force-selects itself at registration time, so ``jax.config.update``
(which wins over the env var) is required in addition to ``JAX_PLATFORMS``.

This file must run before any test imports jax — pytest imports conftest
first, and XLA_FLAGS must be in the environment before backends initialize.
"""

import os
from pathlib import Path

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags += " --xla_force_host_platform_device_count=8"
# The suite is COMPILE-bound (interpret-mode Pallas lowers each kernel to a
# large HLO; a stream-substep jit is ~13 s trace + ~22 s compile vs 0.2 s
# run).  Opt level 0 cuts XLA CPU compile ~30% with no measurable effect on
# the 1e-3..1e-5 equivalence tolerances (golden suite verified).
if "xla_backend_optimization_level" not in _flags:
    _flags += " --xla_backend_optimization_level=0"
os.environ["XLA_FLAGS"] = _flags.strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: repeat suite runs skip XLA compiles
# entirely (the cache keys on optimized HLO, so code changes invalidate
# exactly the affected entries).  Trace time is still paid per process.
_cache = Path(__file__).parent / ".jax_cache"
jax.config.update("jax_compilation_cache_dir", str(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


# ---- slow-marker plumbing (VERDICT r2 #9: default suite < 360 s) ----------
# The suite is interpret-mode TRACE-bound (measured: a sharded stream frame
# is ~22 s of jit trace regardless of substep count), so wall time only
# drops by running fewer heavyweight traces.  Tests whose coverage overlaps
# a cheaper test are marked @pytest.mark.slow and skipped by default; run
# the full matrix with `pytest tests/ --runslow`.
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (full interpret-mode matrix)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavyweight interpret-mode trace; needs --runslow"
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow interpret-mode trace (use --runslow)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
