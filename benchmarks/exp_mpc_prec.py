"""Round-3 probe: MPC solver precision/speed frontier + batch scaling.

The gated headline runs the ADMM solver at f32-HIGHEST (bf16x6 MXU passes,
exact-f32-grade; on-device first-input accuracy 2.4e-5). HIGH (bf16x3) and
DEFAULT (single bf16 pass) trade accuracy for MXU throughput — this probe
measures both sides on the chip so the choice is data, not folklore:
the r2 failure mode was DEFAULT sneaking in silently at 4.1e-1 error.

Usage: python benchmarks/exp_mpc_prec.py [precision,...|batches]
"""
import os, sys, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from strided_tpu.utils.timing import time_slope
from strided_tpu.config import set_config


def build(admm_iters=20, horizon=50):
    from strided_tpu.models import quadrotor, hover_state, hover_input
    from strided_tpu.mpc import make_hover_mpc

    dtype = jnp.float32
    model = quadrotor()
    Q = jnp.diag(jnp.array([10, 10, 10, 1, 1, 1, 5, 5, 5, 1, 1, 1], dtype))
    R = jnp.eye(4, dtype=dtype) * 0.1
    u_min = jnp.array([-5.0, -0.5, -0.5, -0.5], dtype)
    u_max = jnp.array([10.0, 0.5, 0.5, 0.5], dtype)
    ctrl = make_hover_mpc(
        model, hover_state(dtype), hover_input(dtype=dtype), Q, R, Q,
        horizon=horizon, dt=0.02, u_min=u_min, u_max=u_max,
        admm_iters=admm_iters,
    )
    return model, ctrl, (u_min, u_max)


def accuracy(ctrl, u_min, u_max, batch=64):
    x = jnp.asarray(np.random.default_rng(0).uniform(-0.3, 0.3, (batch, 12)),
                    jnp.float32)
    U20 = np.asarray(jax.jit(ctrl.plan)(x), np.float64)
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
    return (float(np.max(np.abs(U20[:, 0] - U_star[:, 0]))),
            float(np.max(np.abs(U20 - U_star))))


def rate(model, ctrl, batch):
    @jax.jit
    def step(x):
        u, _ = ctrl.control(x)
        return model.step(x, u, 0.02)

    x = jnp.asarray(np.random.default_rng(0).uniform(-0.3, 0.3, (batch, 12)),
                    jnp.float32)
    sec = time_slope(step, x, k1=8, k2=40)
    return batch / sec


def main():
    for prec in ("highest", "high", "default"):
        set_config(matmul_precision=prec)
        model, ctrl, (u_min, u_max) = build()
        d1, dp = accuracy(ctrl, u_min, u_max)
        r = rate(model, ctrl, 32768)
        print(json.dumps({
            "precision": prec, "first_input_dev": d1, "plan_dev": dp,
            "solves_per_s": r, "passes_gate_1e-4": d1 <= 1e-4,
        }), flush=True)
    set_config(matmul_precision="highest")
    for batch in (16384, 65536):
        model, ctrl, _ = build()
        r = rate(model, ctrl, batch)
        print(json.dumps({"precision": "highest", "batch": batch,
                          "solves_per_s": r}), flush=True)


if __name__ == "__main__":
    main()
