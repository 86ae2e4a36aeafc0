"""Platform selection helpers.

The axon TPU plugin (this environment's TPU tunnel) force-selects itself when
registered, overriding ``JAX_PLATFORMS`` from the environment; only
``jax.config.update("jax_platforms", ...)`` after import wins.  These helpers
centralize that so tests/benchmarks can pin a platform deterministically.
"""

from __future__ import annotations

import os


def force_cpu(n_devices: int = 1) -> None:
    """Pin JAX to the host CPU with ``n_devices`` virtual devices.

    Must be called before any JAX backend is initialized if ``n_devices > 1``
    (the XLA flag is read at backend init).
    """
    if n_devices > 1:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n_devices}"
            ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")


def has_tpu() -> bool:
    import jax

    try:
        return any(d.platform != "cpu" for d in jax.devices())
    except RuntimeError:
        return False


def device_alive(timeout_s: float = 480.0) -> bool:
    """Probe the default jax platform in a SUBPROCESS with a hard timeout.

    The axon tunnel's known failure modes include HANGING inside backend
    init (not erroring), which turns any process that merely imports jax
    and touches a device into a wedged process.  A subprocess with a kill
    timeout is the only reliable way to bound that.  Returns True when the
    default platform can run a trivial reduction end to end.
    """
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp; x = jnp.ones((8, 128)); "
             "print(float(x.sum()))"],
            timeout=timeout_s, capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False
