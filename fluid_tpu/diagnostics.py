"""Scalar diagnostics — the optional observability layer (SURVEY.md §5.5).

The reference's only observability is the ASCII density render and the
per-phase timing lines (``2d_multi.rs:438-489``); these scalar metrics
(max speed, mean density, kinetic energy, ...) are the cheap extras the
survey recommends.  Everything is computed on device in one jitted call.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .state import ParticleState


@jax.jit
def metrics(p: ParticleState) -> Dict[str, jnp.ndarray]:
    """Per-frame scalar metrics (device scalars; convert with float())."""
    speed = jnp.linalg.norm(p.vel, axis=-1)
    return {
        "n": jnp.asarray(p.n),
        "max_speed": speed.max(),
        "mean_speed": speed.mean(),
        "kinetic_energy": 0.5 * jnp.sum(p.mass * speed * speed),
        "mean_density": p.density.mean(),
        "max_density": p.density.max(),
        "mean_pressure": p.pressure.mean(),
        "max_pressure": p.pressure.max(),
        "total_mass": p.mass.sum(),
        "momentum": jnp.sum(p.mass[:, None] * p.vel, axis=0),
        "center_of_mass": jnp.sum(p.mass[:, None] * p.pos, axis=0) / p.mass.sum(),
    }


def format_metrics(m) -> str:
    """One-line human-readable summary for the app/bench overlays."""
    return (
        f"n={int(m['n'])} |v|max={float(m['max_speed']):.3f} "
        f"KE={float(m['kinetic_energy']):.2f} "
        f"rho={float(m['mean_density']):.3f} p={float(m['mean_pressure']):.3f}"
    )
