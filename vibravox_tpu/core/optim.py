"""Optimizer factories with torch-compatible semantics (optax-backed).

The reference configures ``torch.optim.Adam`` partials from YAML
(``configs/lightning_module/optimizer/adam.yaml``: lr=3e-4, betas=(0.5,0.9),
weight_decay=0, amsgrad=false).  These factories accept the same argument
names and return ``optax.GradientTransformation``s, so the config files keep
their shape with only the ``_target_`` swapped.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import optax

__all__ = ["adam", "adamw", "sgd"]


def adam(
    lr: float = 1e-3,
    betas: Sequence[float] = (0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    amsgrad: bool = False,
) -> optax.GradientTransformation:
    """torch.optim.Adam equivalent (L2 added to the gradient, not decoupled)."""
    b1, b2 = betas
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    if amsgrad:
        parts.append(optax.scale_by_amsgrad(b1=b1, b2=b2, eps=eps))
    else:
        parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    parts.append(optax.scale(-lr))
    return optax.chain(*parts)


def sgd(
    lr: float = 1e-3,
    momentum: float = 0.0,
    weight_decay: float = 0.0,
    nesterov: bool = False,
) -> optax.GradientTransformation:
    """torch.optim.SGD equivalent (``configs/lightning_module/optimizer/
    sgd.yaml`` in the reference): L2 folded into the gradient, torch-style
    momentum buffer (no dampening of the first step's lr scaling)."""
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    if momentum:
        parts.append(optax.trace(decay=momentum, nesterov=nesterov))
    parts.append(optax.scale(-lr))
    return optax.chain(*parts)


def adamw(
    lr: float = 1e-3,
    betas: Sequence[float] = (0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 0.01,
) -> optax.GradientTransformation:
    b1, b2 = betas
    return optax.adamw(lr, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay)
