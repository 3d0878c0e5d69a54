"""Ground-vehicle models: unicycle and kinematic bicycle.

Widens the model family for the trajectory-optimization stack (tracking /
parking problems are the standard non-hover MPC benchmarks alongside the
quadrotor)."""

from __future__ import annotations

import jax.numpy as jnp

from .base import Model

__all__ = ["unicycle", "bicycle"]


def unicycle() -> Model:
    """State [x, y, theta], input [v, omega]."""

    def dynamics(x, u):
        th = x[..., 2]
        v, w = u[..., 0], u[..., 1]
        return jnp.stack([v * jnp.cos(th), v * jnp.sin(th), w], axis=-1)

    return Model("unicycle", 3, 2, dynamics)


def bicycle(wheelbase=2.5) -> Model:
    """Kinematic bicycle: state [x, y, theta, v], input [accel, steer]."""

    def dynamics(x, u):
        th, v = x[..., 2], x[..., 3]
        a, delta = u[..., 0], u[..., 1]
        return jnp.stack(
            [
                v * jnp.cos(th),
                v * jnp.sin(th),
                v * jnp.tan(delta) / wheelbase,
                a,
            ],
            axis=-1,
        )

    return Model("bicycle", 4, 2, dynamics)
