"""Physical-invariant tests (SURVEY.md §4.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluid_tpu import scene, step
from fluid_tpu.config import default_2d, default_3d
from fluid_tpu.domain import make_domain
from fluid_tpu.ops import transfer


@pytest.mark.parametrize("make", [default_2d, default_3d], ids=["2d", "3d"])
def test_p2g_conserves_mass_and_momentum(make):
    cfg = make()
    p, dom = scene.dam_break(jax.random.key(0), cfg, n=512)
    # give particles some motion so momentum is nontrivial
    p.vel = jax.random.normal(jax.random.key(1), p.vel.shape) * 0.5
    grid = jax.jit(transfer.p2g_1, static_argnums=(1, 2))(p, cfg, dom)
    # All stencil taps land inside the padded halo => exact conservation
    np.testing.assert_allclose(float(grid.mass.sum()), float(p.mass.sum()), rtol=1e-5)
    mom_p = np.asarray((p.mass[:, None] * p.vel).sum(axis=0))
    mom_g = np.asarray(grid.vel.reshape(-1, cfg.dim).sum(axis=0))
    # APIC term contributes zero net momentum (sum_i w dpos pattern is affine)
    np.testing.assert_allclose(mom_g, mom_p, atol=1e-3)


@pytest.mark.parametrize("make", [default_2d, default_3d], ids=["2d", "3d"])
def test_positions_stay_clamped_and_count_constant(make):
    cfg = make()
    p, dom = scene.dam_break(jax.random.key(2), cfg, n=512)
    for _ in range(3):
        p = step.frame(p, cfg, dom, *step.no_mouse())
    pos = np.asarray(p.pos)
    lo = np.asarray(cfg.boundary_clip[0])
    hi = np.asarray(cfg.boundary_clip[1])
    assert (pos >= lo).all() and (pos <= hi).all()  # 2d_multi.rs:302-306
    assert pos.shape[0] == 512  # quirk Q6: particles never deleted
    assert np.isfinite(pos).all()
    assert np.isfinite(np.asarray(p.vel)).all()


def test_determinism_same_seed_same_trajectory():
    cfg = default_2d()
    outs = []
    for _ in range(2):
        p, dom = scene.dam_break(jax.random.key(5), cfg, n=256)
        p = step.frame(p, cfg, dom, *step.no_mouse())
        outs.append(np.asarray(p.pos))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_density_approaches_rest_density():
    # 4096 particles in 32^2 at rest_density 4/cell (2d) — after settling the
    # mean density should be within ~25% of rest (weak compressibility).
    cfg = default_2d()
    p, dom = scene.dam_break(jax.random.key(0), cfg, n=4096)
    for _ in range(5):
        p = step.frame(p, cfg, dom, *step.no_mouse())
    mean_rho = float(p.density.mean())
    assert 0.5 * cfg.rest_density < mean_rho < 1.5 * cfg.rest_density
