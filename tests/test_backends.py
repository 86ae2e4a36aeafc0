"""Backend equivalence: sorted segment-sum (and later Pallas) vs dense
scatter on random states (SURVEY.md §4.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluid_tpu import scene, step
from fluid_tpu.config import default_2d, default_3d
from fluid_tpu.domain import make_domain


def _rand_state(cfg, n, seed):
    key = jax.random.key(seed)
    p, dom = scene.dam_break(key, cfg, n=n)
    k1, k2 = jax.random.split(key)
    p.vel = jax.random.normal(k1, p.vel.shape) * 0.4
    p.C = jax.random.normal(k2, p.C.shape) * 0.05
    return p, dom


@pytest.mark.parametrize("make", [default_2d, default_3d], ids=["2d", "3d"])
@pytest.mark.parametrize("backend", ["sorted"])
def test_backend_matches_dense_one_substep(make, backend):
    cfg = make()
    p, dom = _rand_state(cfg, 512, seed=0)
    mp, ma = step.no_mouse()

    def run(backend):
        return jax.jit(lambda p: step.substep(p, cfg, dom, mp, ma, backend=backend))(p)

    a, ga = run("dense")
    b, gb = run(backend)
    np.testing.assert_allclose(np.asarray(a.pos), np.asarray(b.pos), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.vel), np.asarray(b.vel), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.C), np.asarray(b.C), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.density), np.asarray(b.density), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.pressure), np.asarray(b.pressure), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ga.mass), np.asarray(gb.mass), atol=1e-5)


@pytest.mark.parametrize("backend", ["sorted"])
def test_backend_matches_dense_full_frame(backend):
    cfg = default_2d()
    p, dom = _rand_state(cfg, 1024, seed=3)
    # step.frame donates its input buffers — copy for the second run.
    p2 = jax.tree.map(jnp.copy, p)
    a = step.frame(p, cfg, dom, *step.no_mouse(), "dense")
    b = step.frame(p2, cfg, dom, *step.no_mouse(), backend)
    np.testing.assert_allclose(np.asarray(a.pos), np.asarray(b.pos), atol=1e-3)
    np.testing.assert_allclose(np.asarray(a.vel), np.asarray(b.vel), atol=1e-3)


@pytest.mark.parametrize("backend", ["tiled", "pallas", "stream"])
def test_fused_backend_through_step_frame(backend):
    """The public step.frame dispatch path (the one the app and driver use)
    must route to the backend-fused frames and match dense (VERDICT r2 #8).
    Reduced iterations + a compact domain keep interpret-mode kernels
    affordable on CPU."""
    from fluid_tpu.domain import make_domain

    cfg = default_2d().replace(
        iterations=3, boundary_clip=((0.0, 0.0), (32.0, 32.0)), grid_res=16
    )
    p, _ = scene.dam_break(
        jax.random.key(7), cfg, n=512, box=((8.0, 8.0), (24.0, 24.0))
    )
    k1, k2 = jax.random.split(jax.random.key(8))
    p.vel = jax.random.normal(k1, p.vel.shape) * 0.4
    p.C = jax.random.normal(k2, p.C.shape) * 0.05
    dom = make_domain(cfg, halo_cells=4)
    p2 = jax.tree.map(jnp.copy, p)
    a = step.frame(p, cfg, dom, *step.no_mouse(), "dense")
    b = step.frame(p2, cfg, dom, *step.no_mouse(), backend)
    np.testing.assert_allclose(np.asarray(a.pos), np.asarray(b.pos), atol=1e-3)
    np.testing.assert_allclose(np.asarray(a.vel), np.asarray(b.vel), atol=1e-3)


@pytest.mark.parametrize("backend", ["sorted"])
def test_backend_with_mouse(backend):
    cfg = default_2d()
    p, dom = _rand_state(cfg, 256, seed=5)
    mp, ma = step.mouse((30.0, 30.0))
    a, _ = jax.jit(lambda p: step.substep(p, cfg, dom, mp, ma, backend="dense"))(p)
    b, _ = jax.jit(lambda p: step.substep(p, cfg, dom, mp, ma, backend=backend))(p)
    np.testing.assert_allclose(np.asarray(a.vel), np.asarray(b.vel), atol=1e-5)
