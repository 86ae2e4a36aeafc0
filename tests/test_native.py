"""Native C++ engine equivalence vs the JAX dense path (SURVEY.md §4.4).

The native engine (native/fluid_native.cpp) is both the measured CPU baseline
and a host-fallback engine; it must track the JAX semantics exactly.
"""

import jax
import numpy as np
import pytest

from fluid_tpu import native, scene, step
from fluid_tpu.config import default_2d, default_3d

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native engine not built (make -C native)"
)


@pytest.mark.parametrize("make", [default_2d, default_3d], ids=["2d", "3d"])
def test_native_matches_jax(make):
    cfg = make()
    p, dom = scene.dam_break(jax.random.key(0), cfg, n=512)
    sim = native.NativeSim(cfg, p, dom)
    sim.step(substeps=4)
    mp, ma = step.no_mouse()
    want = jax.jit(
        lambda q: jax.lax.fori_loop(
            0, 4, lambda _, s: step.substep(s, cfg, dom, mp, ma)[0], q
        )
    )(p)
    np.testing.assert_allclose(np.asarray(want.pos), sim.pos, atol=1e-5)
    np.testing.assert_allclose(np.asarray(want.vel), sim.vel, atol=1e-5)
    np.testing.assert_allclose(np.asarray(want.density), sim.density, atol=1e-4)
    np.testing.assert_allclose(np.asarray(want.pressure), sim.pressure, atol=1e-4)


def test_native_does_not_alias_jax_buffers():
    # regression: np.asarray on CPU jax arrays can be a zero-copy view; the
    # engine must own its state (mutating a jit input corrupts later traces).
    cfg = default_2d()
    p, dom = scene.dam_break(jax.random.key(1), cfg, n=64)
    before = np.array(p.pos, copy=True)
    sim = native.NativeSim(cfg, p, dom)
    sim.step(substeps=2)
    np.testing.assert_array_equal(np.asarray(p.pos), before)


def test_native_mouse():
    cfg = default_2d()
    p, dom = scene.dam_break(jax.random.key(2), cfg, n=256)
    sim = native.NativeSim(cfg, p, dom)
    sim.step(substeps=3, mouse=(30.0, 30.0))
    mp, ma = step.mouse((30.0, 30.0))
    want = jax.jit(
        lambda q: jax.lax.fori_loop(
            0, 3, lambda _, s: step.substep(s, cfg, dom, mp, ma)[0], q
        )
    )(p)
    np.testing.assert_allclose(np.asarray(want.vel), sim.vel, atol=1e-5)
