"""Unit tests for Tait EOS pressure and stress assembly (SURVEY.md §4.1)."""

import jax.numpy as jnp
import numpy as np

from fluid_tpu.config import default_2d, default_3d
from fluid_tpu.ops.eos import stress_tensor, tait_pressure


def test_pressure_at_rest_density_is_floor_clamped():
    cfg = default_2d()
    p = tait_pressure(jnp.asarray([cfg.rest_density]), cfg.rest_density,
                      cfg.eos_stiffness, cfg.eos_power, cfg.pressure_floor)
    np.testing.assert_allclose(np.asarray(p), [0.0], atol=1e-7)


def test_pressure_values_match_reference_formula():
    # p = k((rho/rho0)^gamma - 1)  (2d_multi.rs:211-214)
    cfg = default_2d()
    rho = jnp.asarray([8.0], jnp.float32)  # 2x rest
    p = tait_pressure(rho, cfg.rest_density, cfg.eos_stiffness, cfg.eos_power,
                      cfg.pressure_floor)
    np.testing.assert_allclose(np.asarray(p), [10.0 * (2.0**4 - 1.0)], rtol=1e-6)


def test_pressure_floor_differs_2d_3d():
    # -0.0 in 2D (2d_multi.rs:211) vs -0.1 in 3D (3d_multi.rs:217)
    c2, c3 = default_2d(), default_3d()
    assert c2.pressure_floor == 0.0
    assert c3.pressure_floor == -0.1
    low = jnp.asarray([0.5], jnp.float32)
    p2 = tait_pressure(low * c2.rest_density, c2.rest_density, c2.eos_stiffness,
                       c2.eos_power, c2.pressure_floor)
    p3 = tait_pressure(low * c3.rest_density, c3.rest_density, c3.eos_stiffness,
                       c3.eos_power, c3.pressure_floor)
    assert float(p2[0]) == 0.0
    np.testing.assert_allclose(float(p3[0]), -0.1, atol=1e-7)


def test_stress_assembly():
    # sigma = -p I + mu (C + C^T)  (2d_multi.rs:216-218)
    C = jnp.asarray([[[1.0, 2.0], [3.0, 4.0]]], jnp.float32)
    p = jnp.asarray([5.0], jnp.float32)
    mu = 0.1
    s = np.asarray(stress_tensor(C, p, mu))[0]
    expect = -5.0 * np.eye(2) + 0.1 * np.array([[2.0, 5.0], [5.0, 8.0]])
    np.testing.assert_allclose(s, expect, rtol=1e-6)
