"""Unit tests for the quadratic B-spline weights (SURVEY.md §4.1)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fluid_tpu.ops.bspline import quadratic_weights, stencil_offsets, stencil_weights


@pytest.mark.parametrize("dim", [2, 3])
def test_partition_of_unity(dim):
    rng = np.random.default_rng(0)
    d = rng.uniform(-0.5, 0.5, size=(64, dim)).astype(np.float32)
    ws = quadratic_weights(jnp.asarray(d))
    np.testing.assert_allclose(np.asarray(ws.sum(axis=-2)), 1.0, atol=1e-6)
    # combined stencil weights also partition unity
    w = stencil_weights(ws)
    assert w.shape == (64, 3**dim)
    np.testing.assert_allclose(np.asarray(w.sum(axis=-1)), 1.0, atol=1e-6)


def test_closed_form_values():
    # w(d) at d=0: [1/8, 3/4, 1/8]; at d=0.5: [0, 1/2, 1/2]  (2d_multi.rs:368-374)
    ws = np.asarray(quadratic_weights(jnp.asarray([[0.0], [0.5], [-0.5]], jnp.float32)))
    np.testing.assert_allclose(ws[0, :, 0], [0.125, 0.75, 0.125], atol=1e-7)
    np.testing.assert_allclose(ws[1, :, 0], [0.0, 0.5, 0.5], atol=1e-7)
    np.testing.assert_allclose(ws[2, :, 0], [0.5, 0.5, 0.0], atol=1e-7)


def test_offsets_order_matches_grid_search():
    # grid_search(0,3) iterates x fastest (2d_multi.rs:381-385)
    offs = np.asarray(stencil_offsets(2))
    assert offs.shape == (9, 2)
    expect = [(x, y) for y in range(3) for x in range(3)]
    assert [tuple(o) for o in offs] == expect
    offs3 = np.asarray(stencil_offsets(3))
    assert offs3.shape == (27, 3)
    expect3 = [(x, y, z) for z in range(3) for y in range(3) for x in range(3)]
    assert [tuple(o) for o in offs3] == expect3


def test_stencil_weights_are_tensor_products():
    rng = np.random.default_rng(1)
    d = rng.uniform(-0.5, 0.5, size=(8, 2)).astype(np.float32)
    ws = np.asarray(quadratic_weights(jnp.asarray(d)))
    w = np.asarray(stencil_weights(jnp.asarray(ws)))
    offs = np.asarray(stencil_offsets(2))
    for k, (ox, oy) in enumerate(offs):
        np.testing.assert_allclose(w[:, k], ws[:, ox, 0] * ws[:, oy, 1], rtol=1e-6)
