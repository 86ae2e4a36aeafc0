"""Test configuration: force an 8-virtual-device CPU platform.

Multi-chip sharding logic is tested without TPU hardware via
``--xla_force_host_platform_device_count=8`` (SURVEY.md §4.5).  The axon TPU
plugin force-selects itself at registration time, so ``jax.config.update``
(which wins over the env var) is required in addition to ``JAX_PLATFORMS``.

This file must run before any test imports jax — pytest imports conftest
first, and XLA_FLAGS must be in the environment before backends initialize.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
