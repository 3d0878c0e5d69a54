"""Round benchmark: quadrotor condensed-QP MPC solves/s on the local chip(s).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "solves/s/chip", "vs_baseline": N}

Baseline (BASELINE.md): >= 10,000 solves/s on a v5e-8 for the 12-state,
horizon-50, box-constrained quadrotor MPC => 1250 solves/s/chip.
``vs_baseline`` is value / 1250 (>1 means beating the per-chip target).

Extra diagnostic metrics (fused permute+reduce bandwidth vs HBM roofline,
batched rollout throughput) go to stderr so the one-line contract holds.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

PER_CHIP_TARGET = 10_000 / 8  # BASELINE.md: 10k solves/s on v5e-8


from strided_tpu.utils.timing import time_fn, time_chained, time_slope  # noqa: E402


def bench_mpc_solves(batch=32768, horizon=50, admm_iters=20):
    from strided_tpu.models import quadrotor, hover_state, hover_input
    from strided_tpu.mpc import make_hover_mpc

    dt = 0.02
    dtype = jnp.float32
    model = quadrotor()
    Q = jnp.diag(jnp.array([10, 10, 10, 1, 1, 1, 5, 5, 5, 1, 1, 1], dtype))
    R = jnp.eye(4, dtype=dtype) * 0.1
    ctrl = make_hover_mpc(
        model, hover_state(dtype), hover_input(dtype=dtype), Q, R, Q,
        horizon=horizon, dt=dt,
        u_min=jnp.array([-5.0, -0.5, -0.5, -0.5], dtype),
        u_max=jnp.array([10.0, 0.5, 0.5, 0.5], dtype),
        admm_iters=admm_iters,
    )

    @jax.jit
    def step(x):
        u, _ = ctrl.control(x)
        return model.step(x, u, dt)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-0.3, 0.3, (batch, 12)), dtype)
    # slope timing: closed-loop steps chained inside one program at two loop
    # lengths; the difference cancels the ~25 ms/dispatch tunnel overhead
    sec = time_slope(step, x, k1=8, k2=40)
    solves_per_s = batch / sec
    # sanity: controller regulates (finite outputs)
    assert np.isfinite(np.asarray(step(x))).all()
    return solves_per_s, sec


def bench_symmetrize_bandwidth(n=8192):
    """Fused symmetrize B = (A + A')/2 — benchmark #1 family; reports GB/s
    for BOTH paths: the dedicated tile-pair Pallas kernel
    (``symmetrize_kernel_gbs``) and the generic fused engine via the lazy
    expression ``(A + A.T) * 0.5`` (``engine_gbs``) — the number the
    reference's flagship workload actually measures."""
    import strided_tpu as st

    a = jnp.asarray(np.random.default_rng(1).standard_normal((n, n)), jnp.float32)
    nbytes = a.size * 4 * 2  # one fused read of A + one write
    sec_k = time_slope(lambda x: st.symmetrize(x, tile=512), a, k1=8, k2=40)

    def engine(x):
        v = st.strided(x)
        return st.to_array((v + st.transpose(v)) * 0.5)

    sec_e = time_slope(engine, a, k1=8, k2=40)
    return nbytes / sec_k / 1e9, nbytes / sec_e / 1e9


def bench_mpc_accuracy(batch=64, horizon=50, admm_iters=20):
    """Accuracy of the EXACT bench configuration (ADMM-``admm_iters``, f32,
    rho=1) against a converged f64 numpy ADMM oracle on the same QP — the
    tolerance attached to the solves/s headline. Pinned by
    ``tests/test_mpc.py::test_bench_config_accuracy``.

    Returns ``(max_abs_dev, u_scale)``: worst |U_20 - U*| over the horizon
    plan and the input magnitude scale for context."""
    from strided_tpu.models import quadrotor, hover_state, hover_input
    from strided_tpu.mpc import make_hover_mpc

    dt = 0.02
    dtype = jnp.float32
    model = quadrotor()
    Q = jnp.diag(jnp.array([10, 10, 10, 1, 1, 1, 5, 5, 5, 1, 1, 1], dtype))
    R = jnp.eye(4, dtype=dtype) * 0.1
    u_min = jnp.array([-5.0, -0.5, -0.5, -0.5], dtype)
    u_max = jnp.array([10.0, 0.5, 0.5, 0.5], dtype)
    ctrl = make_hover_mpc(
        model, hover_state(dtype), hover_input(dtype=dtype), Q, R, Q,
        horizon=horizon, dt=dt, u_min=u_min, u_max=u_max,
        admm_iters=admm_iters,
    )
    x = jnp.asarray(np.random.default_rng(0).uniform(-0.3, 0.3, (batch, 12)), dtype)
    U20 = np.asarray(jax.jit(ctrl.plan)(x), np.float64)  # (batch, N, m)

    # numpy f64 oracle: the same over-relaxed ADMM run to convergence on the
    # same QP data (mpc/qp.py::qp_solve), all in float64
    qp = ctrl.qp
    dx = np.asarray(x, np.float64) - np.asarray(ctrl.x_eq, np.float64)
    H = np.asarray(qp.H, np.float64)
    Mm = np.asarray(qp.M, np.float64)
    K = np.asarray(qp.K_lqr, np.float64)
    rho, alpha = qp.rho, 1.6
    Hinv = np.linalg.inv(H + rho * np.eye(H.shape[0]))
    lo = np.tile(np.asarray(u_min, np.float64), qp.N)
    hi = np.tile(np.asarray(u_max, np.float64), qp.N)
    g = dx @ Mm.T
    z = np.clip(-dx @ K.T, lo, hi)
    y = np.zeros_like(z)
    for _ in range(2000):
        u = (rho * (z - y) - g) @ Hinv
        u_rel = alpha * u + (1 - alpha) * z
        z = np.clip(u_rel + y, lo, hi)
        y = y + u_rel - z
    U_star = z.reshape(batch, qp.N, qp.m)
    dev_first = float(np.max(np.abs(U20[:, 0] - U_star[:, 0])))
    dev_plan = float(np.max(np.abs(U20 - U_star)))
    return dev_first, dev_plan, float(np.max(np.abs(U_star)))


def bench_rollouts(batch=4096, T=100):
    from strided_tpu.models import double_pendulum
    from strided_tpu.mpc import rollout_final

    m = double_pendulum()
    rng = np.random.default_rng(2)
    x0 = jnp.asarray(rng.standard_normal((batch, 4)) * 0.1, jnp.float32)
    us = jnp.asarray(rng.standard_normal((batch, T, 2)) * 0.01, jnp.float32)
    f = jax.jit(lambda x0: rollout_final(m, x0, us, 0.01))
    sec = time_chained(f, x0, inner=10)
    return batch * T / sec, sec  # dynamics steps / s


def main():
    solves, sec = bench_mpc_solves()
    print(
        f"[bench] quadrotor MPC (N=50, ADMM20, batch 32768): "
        f"{solves:,.0f} solves/s ({sec*1e3:.2f} ms/batch)",
        file=sys.stderr,
    )
    try:
        dev1, devp, uscale = bench_mpc_accuracy()
        print(
            f"[bench] accuracy at the operating point (ADMM-20 f32 vs f64 "
            f"converged oracle, input scale {uscale:.2f}): first applied "
            f"input max|du| = {dev1:.1e}; full horizon plan max|dU| = "
            f"{devp:.1e} (pinned by tests/test_mpc.py::test_bench_config_accuracy)",
            file=sys.stderr,
        )
        kgbs, egbs = bench_symmetrize_bandwidth()
        print(
            f"[bench] symmetrize 8192^2 f32: kernel {kgbs:.1f} GB/s "
            f"(symmetrize_kernel_gbs), generic engine {egbs:.1f} GB/s",
            file=sys.stderr,
        )
        steps, _ = bench_rollouts()
        print(f"[bench] double-pendulum rollouts: {steps:,.0f} steps/s", file=sys.stderr)
    except Exception as e:  # diagnostics must not break the contract line
        print(f"[bench] diagnostics failed: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "quadrotor MPC solves/s/chip (12-state, N=50, condensed QP, ADMM-20)",
                "value": round(solves, 1),
                "unit": "solves/s/chip",
                "vs_baseline": round(solves / PER_CHIP_TARGET, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
