"""Elementary reconstruction losses (config-instantiable)."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["L1Loss", "l1_loss"]


def l1_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(x - y))


class L1Loss:
    """Mean absolute error (torch.nn.L1Loss equivalent)."""

    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        return l1_loss(x, y)
