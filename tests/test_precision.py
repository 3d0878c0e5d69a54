"""f32-vs-f64 tolerance story (SURVEY.md §7 "hard parts", BASELINE.md
"bit-tolerant control-trajectory match"): the reference's baselines are
Float64 CPU; TPU work runs f32. These tests pin the contract that the f32
stack reproduces the f64 control trajectories within engineering tolerance
at the same horizon."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from strided_tpu.models import quadrotor, hover_state, hover_input
from strided_tpu.mpc import make_hover_mpc, closed_loop


def _run(dtype, steps=40):
    dt = 0.05
    model = quadrotor()
    Q = jnp.diag(jnp.array([10, 10, 10, 1, 1, 1, 5, 5, 5, 1, 1, 1], dtype))
    R = jnp.eye(4, dtype=dtype) * 0.1
    ctrl = make_hover_mpc(
        model, hover_state(dtype), hover_input(dtype=dtype), Q, R, Q,
        horizon=12, dt=dt,
        u_min=jnp.array([-5.0, -0.5, -0.5, -0.5], dtype),
        u_max=jnp.array([10.0, 0.5, 0.5, 0.5], dtype),
        admm_iters=30,
    )
    x0 = jnp.asarray(
        np.concatenate([[0.3, -0.2, 0.25], np.zeros(9)]), dtype
    )
    xs, us = closed_loop(ctrl, model, x0, steps=steps, dt=dt)
    return np.asarray(xs, np.float64), np.asarray(us, np.float64)


def test_f32_trajectory_matches_f64_within_tolerance():
    xs64, us64 = _run(jnp.float64)
    xs32, us32 = _run(jnp.float32)
    # position trajectory within mm-scale of the f64 run; controls within 1e-2
    assert np.max(np.abs(xs32[:, :3] - xs64[:, :3])) < 5e-3
    assert np.max(np.abs(us32 - us64)) < 2e-2
    # both runs regulate to hover
    assert np.linalg.norm(xs64[-1, :6]) < 5e-2
    assert np.linalg.norm(xs32[-1, :6]) < 5e-2


def test_f32_qp_solution_close_to_f64():
    from strided_tpu.mpc import build_condensed, qp_solve

    dt = 0.05
    model = quadrotor()

    def solve(dtype):
        A, B = model.linearize(hover_state(dtype), hover_input(dtype=dtype), dt)
        Q = jnp.diag(jnp.array([10, 10, 10, 1, 1, 1, 5, 5, 5, 1, 1, 1], dtype))
        R = jnp.eye(4, dtype=dtype) * 0.1
        qp = build_condensed(A, B, Q, R, Q, 15, rho=5.0)
        x0 = jnp.asarray(np.concatenate([[0.4, -0.3, 0.2], np.zeros(9)]), dtype)
        lim = jnp.asarray([3.0, 0.1, 0.1, 0.1], dtype)
        return np.asarray(qp_solve(qp, x0, -lim, lim, iters=80), np.float64)

    U64 = solve(jnp.float64)
    U32 = solve(jnp.float32)
    assert np.max(np.abs(U32 - U64)) < 5e-3
