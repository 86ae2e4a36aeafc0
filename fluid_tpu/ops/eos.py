"""Equation of state and stress assembly.

Tait/Cole-style weakly-compressible pressure — the WCSPH ingredient of the
reference (``2d_multi.rs:211-214`` / ``3d_multi.rs:217-220``):

    p = max(floor, k * ((rho / rho0)^gamma - 1))

with per-dim floors (-0.0 in 2D, -0.1 in 3D — slight cohesion allowed in 3D).

Stress (``2d_multi.rs:216-218``): sigma = -p * I + mu * (C + C^T), where C is
the APIC affine-momentum matrix (its symmetrization approximates the velocity
gradient's strain rate under MLS-MPM).

The fused MLS-MPM momentum term (Hu et al. 2018, eq. 16; the reference's
``eg_16_term_0``, ``2d_multi.rs:219``): term = -4 * V_p * sigma * dt, with
M_p^{-1} = 4 for quadratic B-splines at cell size 1.
"""

from __future__ import annotations

import jax.numpy as jnp


def tait_pressure(
    density: jnp.ndarray,
    rest_density: float,
    stiffness: float,
    power: float,
    floor: float,
) -> jnp.ndarray:
    """Tait EOS pressure with floor (``2d_multi.rs:211-214``)."""
    return jnp.maximum(
        jnp.float32(floor),
        stiffness * ((density / rest_density) ** power - 1.0),
    )


def stress_tensor(
    C: jnp.ndarray,
    pressure: jnp.ndarray,
    dynamic_viscosity: float,
) -> jnp.ndarray:
    """sigma = -p I + mu (C + C^T)  (``2d_multi.rs:216-218``).

    Args:
      C: [..., D, D] affine-momentum matrices.
      pressure: [...] pressures.
    Returns:
      [..., D, D] stress tensors.
    """
    dim = C.shape[-1]
    strain = C + jnp.swapaxes(C, -1, -2)
    eye = jnp.eye(dim, dtype=C.dtype)
    return -pressure[..., None, None] * eye + dynamic_viscosity * strain
