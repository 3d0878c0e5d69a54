"""Cartpole: the iLQR benchmark model (BASELINE.json config 3).

State ``[p, th, pdot, thdot]`` with ``th`` measured from the DOWNWARD
position (so the upright target is ``th = pi``), input ``[force]``.
Equations follow the standard underactuated-cartpole form (Tedrake,
"Underactuated Robotics", ch. 3).
"""

from __future__ import annotations

import jax.numpy as jnp

from .base import Model

__all__ = ["cartpole"]


def cartpole(mc=1.0, mp=0.2, l=0.5, g=9.81) -> Model:
    def dynamics(x, u):
        th, pdot, thdot = x[..., 1], x[..., 2], x[..., 3]
        f = u[..., 0]
        s, c = jnp.sin(th), jnp.cos(th)
        den = mc + mp * s * s
        pddot = (f + mp * s * (l * thdot * thdot + g * c)) / den
        thddot = (-f * c - mp * l * thdot * thdot * c * s - (mc + mp) * g * s) / (
            l * den
        )
        return jnp.stack([pdot, thdot, pddot, thddot], axis=-1)

    return Model("cartpole", 4, 1, dynamics)
