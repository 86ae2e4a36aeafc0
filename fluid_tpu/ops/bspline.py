"""Quadratic B-spline interpolation weights and stencil machinery.

Closed form identical to the reference's ``quadratic_weights``
(``2d_multi.rs:368-374`` / ``3d_multi.rs:390-396``):

    w[0] = 0.5 * (0.5 - d)^2
    w[1] = 0.75 - d^2
    w[2] = 0.5 * (0.5 + d)^2

for ``d = pos - (floor(pos) + 0.5)`` in [-0.5, 0.5).  Tensor-product
combination across axes happens at the use sites via ``stencil_weights``
(reference: ``ws[n.x].x * ws[n.y].y``, ``2d_multi.rs:160``).

Vectorized: one call computes weights for all N particles and all 3^D stencil
taps at once — the reference's per-particle 3^D loops become broadcasting over
a static ``[3^D, D]`` offset table, which XLA fuses into the surrounding
transfer kernels (no materialized intermediates beyond [N, 3^D]).
"""

from __future__ import annotations

import itertools
from functools import lru_cache

import jax.numpy as jnp
import numpy as np


def quadratic_weights(cell_diff: jnp.ndarray) -> jnp.ndarray:
    """Per-axis quadratic B-spline weights.

    Args:
      cell_diff: [..., D] offset from cell center, in [-0.5, 0.5).
    Returns:
      [..., 3, D] weights; sums to 1 along the 3-axis.
    """
    d = cell_diff
    return jnp.stack(
        [
            0.5 * (0.5 - d) * (0.5 - d),
            0.75 - d * d,
            0.5 * (0.5 + d) * (0.5 + d),
        ],
        axis=-2,
    )


@lru_cache(maxsize=None)
def _stencil_offsets_np(dim: int) -> np.ndarray:
    """Static [3^dim, dim] table of stencil offsets in {0,1,2}^dim.

    Row-major iteration order matches the reference's ``grid_search(0, 3)``
    (``2d_multi.rs:381-385``): the LAST axis listed varies slowest, i.e. the
    x coordinate varies fastest.
    """
    # grid_search iterates y (then z) outermost, x innermost.
    combos = list(itertools.product(*[range(3)] * dim))
    # itertools.product varies the last element fastest; grid_search varies x
    # (the first coordinate) fastest — so reverse each tuple.
    offs = np.array([c[::-1] for c in combos], dtype=np.int32)
    return offs


def stencil_offsets(dim: int) -> jnp.ndarray:
    """[3^dim, dim] int32 stencil offsets (0..2 per axis)."""
    return jnp.asarray(_stencil_offsets_np(dim))


def stencil_weights(ws: jnp.ndarray) -> jnp.ndarray:
    """Tensor-product stencil weights.

    Args:
      ws: [..., 3, D] per-axis weights from ``quadratic_weights``.
    Returns:
      [..., 3^D] combined weights, ordered like ``stencil_offsets``.
    """
    dim = ws.shape[-1]
    offs = _stencil_offsets_np(dim)  # [K, D] host constants
    # w[..., k] = prod_d ws[..., offs[k, d], d]
    parts = [ws[..., offs[:, d], d] for d in range(dim)]  # each [..., K]
    out = parts[0]
    for p in parts[1:]:
        out = out * p
    return out
