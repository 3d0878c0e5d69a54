"""Batched dynamics rollouts — fused map over (batch, horizon, state) tensors.

BASELINE.json config 2: "4096 batched double-pendulum rollouts as one fused
strided map kernel". The rollout is a ``lax.scan`` over the horizon whose
body is one fused elementwise RK4 step over the whole batch — XLA keeps the
batch resident and fuses the step math into a single VPU pass per stage,
which is this framework's analog of the reference's fused strided map over a
big dimension (SURVEY.md §5 "long-context" mapping).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..models.base import Model

__all__ = ["rollout", "rollout_final"]


def rollout(model: Model, x0: jax.Array, us: jax.Array, dt) -> jax.Array:
    """Roll out ``us`` of shape ``(*batch, T, m)`` from ``x0`` ``(*batch, n)``.

    Returns states ``(*batch, T+1, n)`` (including ``x0``)."""
    T = us.shape[-2]
    us_t = jnp.moveaxis(us, -2, 0)  # (T, *batch, m)

    def body(x, u):
        xn = model.step(x, u, dt)
        return xn, xn

    _, xs = lax.scan(body, x0, us_t)
    xs = jnp.concatenate([x0[None], xs], axis=0)  # (T+1, *batch, n)
    return jnp.moveaxis(xs, 0, -2)


def rollout_final(model: Model, x0: jax.Array, us: jax.Array, dt) -> jax.Array:
    """Final state only — avoids materializing the trajectory (HBM-friendly:
    the scan carry stays in registers/VMEM; nothing but x0/us is read)."""
    us_t = jnp.moveaxis(us, -2, 0)

    def body(x, u):
        return model.step(x, u, dt), None

    xT, _ = lax.scan(body, x0, us_t)
    return xT
