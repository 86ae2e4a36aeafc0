"""Pallas kernel equivalence vs the dense backend (SURVEY.md §4.4).

Runs in interpreter mode so the full kernel logic (DMA slicing, profile
construction, MXU contractions, masked outputs) is exercised on CPU; the
same kernels compile and run bit-equivalently on TPU (verified on hardware —
see the module docstring of ops/pallas_transfer.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluid_tpu import step
from fluid_tpu.config import default_2d, default_3d
from fluid_tpu.domain import make_domain
from fluid_tpu.ops import pallas_transfer as pt
from fluid_tpu.ops import tiled_transfer as tt
from fluid_tpu.state import ParticleState


def _case(dim, n, seed):
    base = default_2d() if dim == 2 else default_3d()
    # interpret-mode kernels cost ~tiles x stages: small boxes keep the
    # suite fast (3D: 130 -> ~35 -> ~15 s) with identical kernel coverage
    world = 24.0 if dim == 2 else 16.0
    cfg = base.replace(
        boundary_clip=(tuple(0.0 for _ in range(dim)), tuple(world for _ in range(dim))),
        grid_res=16 if dim == 2 else 12,
    )
    # tight halo: identical physics on ~2x fewer grid cells/tiles — the 3D
    # interpret kernels scale with the tile count (suite budget)
    dom = make_domain(cfg, halo_cells=4)
    k1, k2, k3 = jax.random.split(jax.random.key(seed), 3)
    pos = jax.random.uniform(k1, (n, dim), jnp.float32, world / 4, world * 3 / 4)
    p = ParticleState.create(pos)
    p.vel = jax.random.normal(k2, p.vel.shape) * 0.4
    p.C = jax.random.normal(k3, p.C.shape) * 0.05
    return cfg, p, dom


# slow: the pallas (round-1) backend is an oracle, not a hot path; its
# frame-level equivalence stays covered by test_backends.py::
# test_fused_backend_through_step_frame[pallas] (VERDICT r2 #7/#9).
@pytest.mark.slow
@pytest.mark.parametrize("dim", [2, 3])
def test_pallas_matches_dense(dim):
    cfg, p, dom = _case(dim, 384, seed=0)
    spec = tt.TileSpec(tile=4, cap=64)
    mp, ma = step.no_mouse()
    a, ga = step.substep(p, cfg, dom, mp, ma, backend="dense")
    b, gb = pt.substep(p, cfg, dom, mp, ma, spec, interpret=True)
    np.testing.assert_allclose(np.asarray(a.pos), np.asarray(b.pos), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.vel), np.asarray(b.vel), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.C), np.asarray(b.C), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.density), np.asarray(b.density), atol=1e-4)
    np.testing.assert_allclose(np.asarray(a.pressure), np.asarray(b.pressure), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ga.mass), np.asarray(gb.mass), atol=1e-4)


@pytest.mark.slow
def test_pallas_with_mouse():
    cfg, p, dom = _case(2, 256, seed=1)
    spec = tt.TileSpec(tile=4, cap=64)
    mp, ma = step.mouse((12.0, 12.0))
    a, _ = step.substep(p, cfg, dom, mp, ma, backend="dense")
    b, _ = pt.substep(p, cfg, dom, mp, ma, spec, interpret=True)
    np.testing.assert_allclose(np.asarray(a.vel), np.asarray(b.vel), atol=1e-5)


@pytest.mark.slow
def test_pallas_multi_substep():
    cfg, p, dom = _case(2, 384, seed=2)
    spec = tt.TileSpec(tile=4, cap=96)
    mp, ma = step.no_mouse()
    a, b = p, p
    for _ in range(4):
        a, _ = step.substep(a, cfg, dom, mp, ma, backend="dense")
        b, _ = pt.substep(b, cfg, dom, mp, ma, spec, interpret=True)
    np.testing.assert_allclose(np.asarray(a.pos), np.asarray(b.pos), atol=1e-4)
    np.testing.assert_allclose(np.asarray(a.vel), np.asarray(b.vel), atol=1e-4)


@pytest.mark.slow  # pallas option path (preserve_order/strict); the default
# suite covers only frame-level dispatch with default options
# (test_backends.py) plus the tiled variant's option path (test_tiled.py)
def test_pallas_preserve_order_false_strict():
    cfg, p, dom = _case(2, 384, seed=3)
    spec = tt.TileSpec(tile=4, cap=64, strict=True)
    assert int(tt.overflow_count(p.pos, dom, spec)) == 0
    mp, ma = step.no_mouse()
    a, _ = step.substep(p, cfg, dom, mp, ma, backend="dense")
    b, _ = pt.substep(p, cfg, dom, mp, ma, spec, interpret=True, preserve_order=False)
    ka = np.lexsort(np.asarray(a.pos).T)
    kb = np.lexsort(np.asarray(b.pos).T)
    np.testing.assert_allclose(np.asarray(a.pos)[ka], np.asarray(b.pos)[kb], atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.vel)[ka], np.asarray(b.vel)[kb], atol=1e-5)
    assert float(b.mass.sum()) == p.n
