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


def bench_permute_bandwidth(n=8192):
    """Fused symmetrize B = (A + A')/2 — benchmark #1 family; reports GB/s.

    Uses the two-pass tile-pair Pallas kernel (``st.symmetrize``), the
    package's fast path for this workload; the generic ``strided_jit``
    engine path is the fallback it degrades to on non-square/odd shapes.
    """
    import strided_tpu as st

    a = jnp.asarray(np.random.default_rng(1).standard_normal((n, n)), jnp.float32)
    sec = time_slope(lambda x: st.symmetrize(x, tile=512), a, k1=8, k2=40)
    nbytes = a.size * 4 * 2  # one fused read of A + one write
    return nbytes / sec / 1e9, sec


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
        gbs, _ = bench_permute_bandwidth()
        print(f"[bench] fused symmetrize 8192^2 f32: {gbs:.1f} GB/s", file=sys.stderr)
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
