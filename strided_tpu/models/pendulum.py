"""Pendulum family: simple pendulum and the chaotic double pendulum.

The double pendulum is BASELINE.json config 2's rollout workload: "4096
batched double-pendulum rollouts as one fused strided map kernel (dynamics
step, horizon 100)". State ``[th1, th2, w1, w2]``, optional joint torques
``[tau1, tau2]``. Standard point-mass equations of motion.
"""

from __future__ import annotations

import jax.numpy as jnp

from .base import Model

__all__ = ["simple_pendulum", "double_pendulum"]


def simple_pendulum(m=1.0, l=1.0, g=9.81, damping=0.0) -> Model:
    """1-link pendulum: state [theta, omega], input [torque]."""

    def dynamics(x, u):
        th, w = x[..., 0], x[..., 1]
        tau = u[..., 0]
        a = (tau - damping * w - m * g * l * jnp.sin(th)) / (m * l * l)
        return jnp.stack([w, a], axis=-1)

    return Model("simple_pendulum", 2, 1, dynamics)


def double_pendulum(m1=1.0, m2=1.0, l1=1.0, l2=1.0, g=9.81) -> Model:
    """2-link point-mass pendulum: state [th1, th2, w1, w2], input
    [tau1, tau2] (zero input = passive chaotic rollout)."""

    def dynamics(x, u):
        th1, th2, w1, w2 = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
        t1, t2 = u[..., 0], u[..., 1]
        d = th1 - th2
        cd, sd = jnp.cos(d), jnp.sin(d)
        den = m1 + m2 * sd * sd
        # Standard EoM (e.g. via Lagrangian of two point masses).
        a1 = (
            t1
            - m2 * l1 * w1 * w1 * sd * cd
            - m2 * l2 * w2 * w2 * sd
            - (m1 + m2) * g * jnp.sin(th1)
            + m2 * g * jnp.sin(th2) * cd
        ) / (l1 * den)
        a2 = (
            t2
            + (m1 + m2) * l1 * w1 * w1 * sd
            + m2 * l2 * w2 * w2 * sd * cd
            + (m1 + m2) * g * (jnp.sin(th1) * cd - jnp.sin(th2))
        ) / (l2 * den)
        return jnp.stack([w1, w2, a1, a2], axis=-1)

    return Model("double_pendulum", 4, 2, dynamics)
