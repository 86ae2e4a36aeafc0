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


def test_tight_domain_identical_physics():
    # A tight halo (domain.make_domain(halo_cells=4)) must give the exact
    # same trajectory as the reference chunk-padded domain: clamped
    # particles' stencils never reach beyond 1 halo cell.
    from fluid_tpu.domain import make_domain

    cfg = default_3d()
    p, dom_ref = scene.dam_break(jax.random.key(3), cfg, n=512)
    dom_tight = make_domain(cfg, halo_cells=4)
    assert dom_tight.shape == (72, 72, 72)
    a = step.frame(jax.tree.map(jnp.copy, p), cfg, dom_ref, *step.no_mouse())
    b = step.frame(p, cfg, dom_tight, *step.no_mouse())
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))
    np.testing.assert_array_equal(np.asarray(a.vel), np.asarray(b.vel))


def test_diagnostics_metrics():
    from fluid_tpu import diagnostics

    cfg = default_2d()
    p, dom = scene.dam_break(jax.random.key(4), cfg, n=256)
    p = step.frame(p, cfg, dom, *step.no_mouse())
    m = diagnostics.metrics(p)
    assert float(m["total_mass"]) == 256.0
    assert float(m["max_speed"]) >= float(m["mean_speed"]) >= 0.0
    assert float(m["kinetic_energy"]) > 0.0
    assert np.isfinite(float(m["mean_density"]))
    assert "KE=" in diagnostics.format_metrics(m)


def test_add_particles():
    cfg = default_2d()
    p, dom = scene.dam_break(jax.random.key(5), cfg, n=128)
    p2 = scene.add_particles(p, jnp.asarray([[10.0, 10.0], [50.0, 50.0]]))
    assert p2.n == 130
    assert float(p2.mass.sum()) == 130.0
    out = step.frame(p2, cfg, dom, *step.no_mouse())
    assert np.isfinite(np.asarray(out.pos)).all()
