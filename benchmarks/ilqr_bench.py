"""Batched iLQR benchmark — BASELINE.json config 3: "cartpole iLQR: batched
Jacobians via strided broadcast + mapreduce, blocked backward Riccati sweep".

Measures full iLQR solves/s for a scenario batch of cartpole swing-up
problems (each solve = `iters` iterations of rollout + batched linearization
+ Riccati backward scan + 4-point line search).

Usage: timeout 590 python benchmarks/ilqr_bench.py [--batch 256] [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from strided_tpu.models import cartpole
from strided_tpu.mpc import QuadCost, ilqr
from strided_tpu.utils.timing import time_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--horizon", type=int, default=50)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    model = cartpole()
    dt = 0.05
    dtype = jnp.float32
    cost = QuadCost(
        Q=jnp.diag(jnp.array([1.0, 10.0, 0.1, 0.1], dtype)),
        R=jnp.eye(1, dtype=dtype) * 0.01,
        Qf=jnp.diag(jnp.array([10.0, 100.0, 1.0, 1.0], dtype)),
        x_goal=jnp.array([0.0, np.pi, 0.0, 0.0], dtype),
    )
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-0.2, 0.2, (args.batch, 4)), dtype)
    us0 = jnp.asarray(
        rng.standard_normal((args.batch, args.horizon, 1)) * 0.05, dtype
    )

    f = jax.jit(
        lambda x0s, us0: jax.vmap(
            lambda x, u: ilqr(model, cost, x, u, dt, iters=args.iters).cost
        )(x0s, us0)
    )
    sec = time_fn(f, x0s, us0, inner=3, repeats=2)
    costs = np.asarray(f(x0s, us0))
    assert np.isfinite(costs).all()
    print(
        json.dumps(
            {
                "metric": "cartpole iLQR solves/s",
                "batch": args.batch,
                "horizon": args.horizon,
                "ilqr_iters": args.iters,
                "solves_per_s": round(args.batch / sec, 1),
                "latency_ms": round(sec * 1e3, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
