"""Unit tests for the dense tile-block assembly/extraction (ops/tiling.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fluid_tpu.ops import tiling


def _naive_assemble(blocks, tshape, T):
    D = len(tshape)
    E = T + 2
    chan = blocks.shape[1 + D :]
    grid = np.zeros(tuple(t * T for t in tshape) + chan, np.float32)
    b = np.asarray(blocks).reshape(*tshape, *(E,) * D, *chan)
    for t in np.ndindex(*tshape):
        for e in np.ndindex(*(E,) * D):
            g = tuple(t[d] * T + e[d] - 1 for d in range(D))
            if all(0 <= g[d] < tshape[d] * T for d in range(D)):
                grid[g] += b[t + e]
    return grid


def _naive_extract(grid, tshape, T):
    D = len(tshape)
    E = T + 2
    chan = grid.shape[D:]
    n = int(np.prod(tshape))
    out = np.zeros((n, *(E,) * D, *chan), np.float32)
    g = np.asarray(grid)
    for i, t in enumerate(np.ndindex(*tshape)):
        for e in np.ndindex(*(E,) * D):
            gc = tuple(t[d] * T + e[d] - 1 for d in range(D))
            if all(0 <= gc[d] < tshape[d] * T for d in range(D)):
                out[(i,) + e] = g[gc]
    return out


@pytest.mark.parametrize(
    "tshape,T,chan",
    [((3,), 4, ()), ((3, 2), 4, ()), ((3, 2), 4, (2,)), ((2, 2, 2), 4, (3,)), ((2, 3), 2, ())],
)
def test_assemble_matches_naive(tshape, T, chan):
    rng = np.random.default_rng(0)
    D = len(tshape)
    E = T + 2
    n = int(np.prod(tshape))
    blocks = rng.normal(size=(n, *(E,) * D, *chan)).astype(np.float32)
    got = np.asarray(tiling.assemble(jnp.asarray(blocks), tshape, T))
    want = _naive_assemble(blocks, tshape, T)
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize(
    "tshape,T,chan",
    [((3,), 4, ()), ((3, 2), 4, (2,)), ((2, 2, 2), 4, (3,))],
)
def test_extract_matches_naive(tshape, T, chan):
    rng = np.random.default_rng(1)
    D = len(tshape)
    grid = rng.normal(size=tuple(t * T for t in tshape) + chan).astype(np.float32)
    got = np.asarray(tiling.extract(jnp.asarray(grid), tshape, T))
    want = _naive_extract(grid, tshape, T)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_assemble_extract_adjoint():
    # <assemble(B), G> == <B, extract(G)> — they are transposes of each other.
    rng = np.random.default_rng(2)
    tshape, T = (3, 2), 4
    E = T + 2
    B = rng.normal(size=(6, E, E)).astype(np.float32)
    G = rng.normal(size=(12, 8)).astype(np.float32)
    lhs = float((tiling.assemble(jnp.asarray(B), tshape, T) * G).sum())
    rhs = float((jnp.asarray(B) * tiling.extract(jnp.asarray(G), tshape, T)).sum())
    np.testing.assert_allclose(lhs, rhs, rtol=1e-5)


# slow: tiled-backend internals; the end-to-end tiled path stays covered
# by test_tiled (2D) and test_backends fused-frame dispatch.
@pytest.mark.slow
def test_halo_sum_matches_assemble_extract():
    # halo_sum + edge_mask must equal the dense round trip: for every tile
    # block, extract(assemble(blocks)) == edge_mask * halo_sum(blocks).
    rng = np.random.default_rng(3)
    for tshape, T in [((3, 2), 4), ((2, 2, 2), 4), ((4,), 4)]:
        D = len(tshape)
        E = T + 2
        n = int(np.prod(tshape))
        blocks = rng.normal(size=(n, *(E,) * D, 2)).astype(np.float32)
        want = tiling.extract(tiling.assemble(jnp.asarray(blocks), tshape, T), tshape, T)
        got = tiling.halo_sum(jnp.asarray(blocks), tshape, T)
        mask = tiling.edge_mask(tshape, T)[..., None]
        np.testing.assert_allclose(np.asarray(got * mask), np.asarray(want), atol=1e-5)
