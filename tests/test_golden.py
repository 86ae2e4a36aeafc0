"""Golden-state regression: the jitted JAX step must match the scalar NumPy
oracle (an independent transcription of the reference semantics) on
pos/vel/C/density/pressure to the 1e-3 north-star tolerance (SURVEY.md §4.2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluid_tpu import step
from fluid_tpu.config import default_2d, default_3d
from fluid_tpu.domain import make_domain
from fluid_tpu.state import ParticleState

from .oracle import OracleSim


def _random_state(cfg, n, seed=0):
    rng = np.random.default_rng(seed)
    lo = 18.0, 18.0, 18.0
    hi = 46.0, 46.0, 30.0
    pos = np.stack(
        [rng.uniform(lo[d], hi[d], n) for d in range(cfg.dim)], axis=-1
    ).astype(np.float32)
    vel = rng.normal(0, 0.3, (n, cfg.dim)).astype(np.float32)
    C = rng.normal(0, 0.05, (n, cfg.dim, cfg.dim)).astype(np.float32)
    return pos, vel, C


def _run_jax(cfg, pos, vel, C, substeps, mouse=None):
    dom = make_domain(cfg)
    p = ParticleState.create(pos, vel=vel, C=C)
    if mouse is None:
        mp, ma = step.no_mouse()
    else:
        mp, ma = step.mouse(mouse)

    @jax.jit
    def run(p):
        def body(_, p):
            new_p, _ = step.substep(p, cfg, dom, mp, ma)
            return new_p

        return jax.lax.fori_loop(0, substeps, body, p)

    return run(p)


@pytest.mark.parametrize(
    "cfg,substeps,tol",
    [
        (default_2d(), 1, 2e-5),
        (default_2d(), 8, 1e-3),
        (default_3d(), 1, 2e-5),
        (default_3d(), 5, 1e-3),
    ],
    ids=["2d-1step", "2d-8steps", "3d-1step", "3d-5steps"],
)
def test_matches_oracle(cfg, substeps, tol):
    n = 192
    pos, vel, C = _random_state(cfg, n, seed=7)
    oracle = OracleSim(cfg, pos, vel, C)
    for _ in range(substeps):
        oracle.substep()
    got = _run_jax(cfg, pos, vel, C, substeps)
    np.testing.assert_allclose(np.asarray(got.pos), oracle.pos, atol=tol, rtol=0)
    np.testing.assert_allclose(np.asarray(got.vel), oracle.vel, atol=tol, rtol=0)
    np.testing.assert_allclose(np.asarray(got.C), oracle.C, atol=tol, rtol=0)
    np.testing.assert_allclose(np.asarray(got.density), oracle.density, atol=tol, rtol=0)
    np.testing.assert_allclose(np.asarray(got.pressure), oracle.pressure, atol=tol, rtol=0)


@pytest.mark.parametrize("cfg", [default_2d(), default_3d()], ids=["2d", "3d"])
def test_mouse_interaction_matches_oracle(cfg):
    n = 128
    pos, vel, C = _random_state(cfg, n, seed=11)
    mouse = (30.0, 30.0)
    oracle = OracleSim(cfg, pos, vel, C)
    for _ in range(3):
        oracle.substep(mouse=mouse)
    got = _run_jax(cfg, pos, vel, C, 3, mouse=mouse)
    np.testing.assert_allclose(np.asarray(got.pos), oracle.pos, atol=1e-4, rtol=0)
    np.testing.assert_allclose(np.asarray(got.vel), oracle.vel, atol=1e-4, rtol=0)


def test_frame_equals_manual_substeps():
    cfg = default_2d()
    n = 128
    pos, vel, C = _random_state(cfg, n, seed=3)
    got = _run_jax(cfg, pos, vel, C, cfg.iterations)
    framed = step.frame(
        ParticleState.create(pos, vel=vel, C=C), cfg, make_domain(cfg), *step.no_mouse()
    )
    np.testing.assert_array_equal(np.asarray(got.pos), np.asarray(framed.pos))
    np.testing.assert_array_equal(np.asarray(got.vel), np.asarray(framed.vel))


@pytest.mark.parametrize("name,make", [("golden_2d", default_2d), ("golden_3d", default_3d)])
def test_frozen_golden_fixture(name, make):
    """Frozen .npz golden trajectories (SURVEY.md §4.2) — regression-stable
    across refactors, independent of the live oracle."""
    import pathlib

    z = np.load(pathlib.Path(__file__).parent / "data" / f"{name}.npz")
    cfg = make()
    got = _run_jax(cfg, z["pos0"], z["vel0"], z["C0"], int(z["substeps"]))
    np.testing.assert_allclose(np.asarray(got.pos), z["pos"], atol=1e-3, rtol=0)
    np.testing.assert_allclose(np.asarray(got.vel), z["vel"], atol=1e-3, rtol=0)
    np.testing.assert_allclose(np.asarray(got.C), z["C"], atol=1e-3, rtol=0)
    np.testing.assert_allclose(np.asarray(got.density), z["density"], atol=1e-3, rtol=0)
    np.testing.assert_allclose(np.asarray(got.pressure), z["pressure"], atol=1e-3, rtol=0)


@pytest.mark.parametrize(
    "name,make", [("golden_2d_100", default_2d), ("golden_3d_100", default_3d)]
)
def test_long_horizon_golden(name, make):
    """SURVEY.md §7.3-4: the 1e-3 tolerance must hold over >= 100 substeps —
    f32 reduction-order drift GROWS with horizon, so one frame is not enough.
    Fixtures frozen from the oracle by tests/gen_golden.py (seed 13)."""
    import pathlib

    z = np.load(pathlib.Path(__file__).parent / "data" / f"{name}.npz")
    cfg = make()
    got = _run_jax(cfg, z["pos0"], z["vel0"], z["C0"], int(z["substeps"]))
    np.testing.assert_allclose(np.asarray(got.pos), z["pos"], atol=1e-3, rtol=0)
    np.testing.assert_allclose(np.asarray(got.vel), z["vel"], atol=1e-3, rtol=0)
    np.testing.assert_allclose(np.asarray(got.density), z["density"], atol=1e-3, rtol=0)
    np.testing.assert_allclose(np.asarray(got.pressure), z["pressure"], atol=1e-3, rtol=0)
