"""Multi-chip layer tests on the virtual 8-device CPU mesh — the analog of
the reference running its whole suite under 4 threads
(`/root/reference/test/runtests.jl:17-20`): identical value-level assertions
under real concurrency/sharding (SURVEY.md §4 transfer rule 2)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from strided_tpu.models import double_pendulum, quadrotor, hover_state, hover_input
from strided_tpu.mpc import rollout, make_hover_mpc
from strided_tpu.parallel import (
    make_mesh,
    shard_batch,
    sharded_rollout,
    sharded_mpc_step,
    scenario_consensus_control,
    data_sharding,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must force 8 virtual CPU devices"
    return make_mesh()


def test_mesh_shape(mesh):
    assert mesh.devices.shape == (8,)
    assert mesh.axis_names == ("data",)


def test_sharded_rollout_matches_local(mesh):
    m = double_pendulum()
    B, T = 64, 20
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((B, 4)) * 0.1)
    us = jnp.asarray(rng.standard_normal((B, T, 2)) * 0.01)
    local = rollout(m, x0, us, dt=0.01)
    f = jax.jit(sharded_rollout(m, mesh, dt=0.01))
    x0s = jax.device_put(x0, data_sharding(mesh, 2))
    uss = jax.device_put(us, data_sharding(mesh, 3))
    sharded = f(x0s, uss)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(local), rtol=1e-12)


def test_shard_batch_generic(mesh):
    f = lambda x: jnp.sin(x) * 2.0
    g = jax.jit(shard_batch(f, mesh))
    x = jnp.arange(32.0).reshape(32, 1)
    np.testing.assert_allclose(np.asarray(g(x)), np.sin(np.arange(32.0))[:, None] * 2)


def test_sharded_mpc_step_matches_local(mesh):
    dt = 0.05
    model = quadrotor()
    Q = jnp.diag(jnp.array([10, 10, 10, 1, 1, 1, 5, 5, 5, 1, 1, 1], jnp.float64))
    R = jnp.eye(4, dtype=jnp.float64) * 0.1
    ctrl = make_hover_mpc(
        model, hover_state(jnp.float64), hover_input(dtype=jnp.float64),
        Q, R, Q, horizon=8, dt=dt,
        u_min=jnp.array([-5.0, -0.2, -0.2, -0.2]),
        u_max=jnp.array([10.0, 0.2, 0.2, 0.2]),
    )
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-0.2, 0.2, (16, 12)))
    # local
    u_local, _ = ctrl.control(x)
    xn_local = model.step(x, u_local, dt)
    # sharded
    step = jax.jit(sharded_mpc_step(ctrl, model, mesh, dt))
    xs = jax.device_put(x, data_sharding(mesh, 2))
    xn, u = step(xs)
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_local), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(xn), np.asarray(xn_local), rtol=1e-9)


def test_consensus_control_is_global_mean(mesh):
    dt = 0.05
    model = quadrotor()
    Q = jnp.diag(jnp.array([10, 10, 10, 1, 1, 1, 5, 5, 5, 1, 1, 1], jnp.float64))
    R = jnp.eye(4, dtype=jnp.float64) * 0.1
    ctrl = make_hover_mpc(
        model, hover_state(jnp.float64), hover_input(dtype=jnp.float64),
        Q, R, Q, horizon=8, dt=dt,
    )
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(-0.2, 0.2, (32, 12)))
    u_all, _ = ctrl.control(x)
    expect = np.asarray(u_all).mean(axis=0)
    f = jax.jit(scenario_consensus_control(ctrl, mesh))
    xs = jax.device_put(x, data_sharding(mesh, 2))
    u_cons, _ = f(xs)
    np.testing.assert_allclose(np.asarray(u_cons), expect, rtol=1e-9)


# ---- tensor-parallel matmul (the D&C threaded gemm analog) ----


@pytest.mark.parametrize("split", ["n", "m", "k"])
def test_tp_matmul_matches_dense(mesh, split):
    from strided_tpu.parallel import matmul_nsplit, matmul_msplit, matmul_ksplit

    rng = np.random.default_rng(7)
    A = jnp.asarray(rng.standard_normal((48, 64)))
    B = jnp.asarray(rng.standard_normal((64, 56)))
    fn = {"n": matmul_nsplit, "m": matmul_msplit, "k": matmul_ksplit}[split]
    C = jax.jit(lambda a, b: fn(a, b, mesh))(A, B)
    np.testing.assert_allclose(np.asarray(C), np.asarray(A) @ np.asarray(B), rtol=1e-10)
