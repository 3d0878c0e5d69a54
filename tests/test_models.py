"""Model + rollout tests: physical sanity (energy conservation, equilibria),
linearization correctness vs finite differences, batched rollout shapes."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from strided_tpu.models import (
    simple_pendulum,
    double_pendulum,
    cartpole,
    quadrotor,
    hover_state,
    hover_input,
    linearize,
)
from strided_tpu.mpc import rollout, rollout_final


def test_simple_pendulum_equilibrium():
    m = simple_pendulum()
    x = jnp.zeros(2)
    u = jnp.zeros(1)
    np.testing.assert_allclose(np.asarray(m.dynamics(x, u)), 0.0, atol=1e-12)


def test_double_pendulum_energy_conservation():
    """Passive double pendulum conserves energy under small-dt RK4."""
    m = double_pendulum()
    x0 = jnp.array([0.5, -0.3, 0.0, 0.0])
    us = jnp.zeros((2000, 2))
    xs = rollout(m, x0, us, dt=1e-3)

    def energy(x):
        th1, th2, w1, w2 = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
        # m1=m2=l1=l2=1, g=9.81
        v1sq = w1**2
        v2sq = w1**2 + w2**2 + 2 * w1 * w2 * jnp.cos(th1 - th2)
        T = 0.5 * v1sq + 0.5 * v2sq
        V = -9.81 * (2 * jnp.cos(th1) + jnp.cos(th2))
        return T + V

    e = np.asarray(energy(xs))
    assert abs(e[-1] - e[0]) < 1e-4 * max(1.0, abs(e[0]))


def test_cartpole_down_equilibrium():
    m = cartpole()
    x = jnp.zeros(4)  # hanging down
    np.testing.assert_allclose(np.asarray(m.dynamics(x, jnp.zeros(1))), 0.0, atol=1e-12)


def test_quadrotor_hover_equilibrium():
    m = quadrotor()
    xd = m.dynamics(hover_state(), hover_input())
    np.testing.assert_allclose(np.asarray(xd), 0.0, atol=1e-6)


def test_linearize_matches_finite_difference():
    m = quadrotor()
    dt = 0.02
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(12) * 0.1)
    u = hover_input() + jnp.asarray(rng.standard_normal(4) * 0.1)
    A, B = m.linearize(x, u, dt)
    eps = 1e-6
    fd_A = np.zeros((12, 12))
    base = np.asarray(m.step(x, u, dt))
    for i in range(12):
        dx = np.zeros(12)
        dx[i] = eps
        fd_A[:, i] = (np.asarray(m.step(x + dx, u, dt)) - base) / eps
    np.testing.assert_allclose(np.asarray(A), fd_A, atol=1e-5)
    fd_B = np.zeros((12, 4))
    for i in range(4):
        du = np.zeros(4)
        du[i] = eps
        fd_B[:, i] = (np.asarray(m.step(x, u + du, dt)) - base) / eps
    np.testing.assert_allclose(np.asarray(B), fd_B, atol=1e-5)


def test_batched_rollout_shapes_and_consistency():
    m = double_pendulum()
    B, T = 64, 50
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.standard_normal((B, 4)) * 0.1)
    us = jnp.asarray(rng.standard_normal((B, T, 2)) * 0.01)
    xs = rollout(m, x0, us, dt=0.01)
    assert xs.shape == (B, T + 1, 4)
    # batched result row 0 == unbatched rollout of row 0
    xs0 = rollout(m, x0[0], us[0], dt=0.01)
    np.testing.assert_allclose(np.asarray(xs[0]), np.asarray(xs0), rtol=1e-6, atol=1e-8)
    # final-state-only path agrees
    xT = rollout_final(m, x0, us, dt=0.01)
    np.testing.assert_allclose(np.asarray(xT), np.asarray(xs[:, -1]), rtol=1e-6, atol=1e-8)


def test_batched_linearize_shapes():
    m = cartpole()
    xs = jnp.zeros((8, 10, 4))
    us = jnp.zeros((8, 10, 1))
    A, B = linearize(m, xs, us, 0.02)
    assert A.shape == (8, 10, 4, 4)
    assert B.shape == (8, 10, 4, 1)


def test_unicycle_ilqr_tracks_goal():
    """Vehicle-family iLQR: drive a unicycle to a pose goal."""
    from strided_tpu.models import unicycle
    from strided_tpu.mpc import QuadCost, ilqr

    model = unicycle()
    dt = 0.1
    T = 40
    cost = QuadCost(
        Q=jnp.diag(jnp.array([1.0, 1.0, 0.1])),
        R=jnp.eye(2) * 0.01,
        Qf=jnp.diag(jnp.array([100.0, 100.0, 10.0])),
        x_goal=jnp.array([2.0, 1.0, 0.0]),
    )
    x0 = jnp.zeros(3)
    us0 = jnp.full((T, 2), 0.1)
    res = ilqr(model, cost, x0, us0, dt, iters=40, mu=1e-2)
    final = np.asarray(res.xs[-1])
    assert np.linalg.norm(final[:2] - np.array([2.0, 1.0])) < 0.1


def test_bicycle_rollout_straight_line():
    from strided_tpu.models import bicycle
    from strided_tpu.mpc import rollout

    m = bicycle()
    x0 = jnp.array([0.0, 0.0, 0.0, 1.0])  # moving at 1 m/s
    us = jnp.zeros((100, 2))
    xs = rollout(m, x0, us, dt=0.01)
    np.testing.assert_allclose(float(xs[-1, 0]), 1.0, rtol=1e-5)  # x advanced 1m
    np.testing.assert_allclose(float(xs[-1, 1]), 0.0, atol=1e-9)
