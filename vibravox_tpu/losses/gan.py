"""GAN losses over discriminator embedding pyramids.

Functional equivalents of the reference's
``HingeLossForDiscriminatorMelganMultiScales`` (``losses/hinge_loss.py:6-43``)
and ``FeatureLossForDiscriminatorMelganMultiScales``
(``losses/feature_loss.py:7-50``).  Both consume the list-of-lists embedding
structure returned by the discriminators (input first, certainties last).
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp

__all__ = ["hinge_loss", "feature_matching_loss", "HingeLoss", "FeatureMatchingLoss"]


def hinge_loss(embeddings: List[List[jnp.ndarray]], target: float) -> jnp.ndarray:
    """Mean-over-time hinge on each scale's certainties, averaged over scales.

    ``target`` is +1 for real, −1 for fake.
    """
    loss = 0.0
    for scale_embedding in embeddings:
        # reductions in f32 regardless of the network compute dtype
        certainties = scale_embedding[-1].astype(jnp.float32)
        loss = loss + jnp.mean(jnp.maximum(1.0 - target * certainties, 0.0))
    return loss / len(embeddings)


def feature_matching_loss(
    embeddings_a: List[List[jnp.ndarray]],
    embeddings_b: List[List[jnp.ndarray]],
) -> jnp.ndarray:
    """L1 between intermediate layers, normalized by mean |layer_a|.

    Skips the input audio and the certainties on each scale, then averages
    over scales × layers.  ``embeddings_a`` is the enhanced branch and also
    provides the normalizer, matching the reference exactly.
    """
    loss = 0.0
    for scale_a, scale_b in zip(embeddings_a, embeddings_b):
        for layer_a, layer_b in zip(scale_a[1:-1], scale_b[1:-1]):
            layer_a = layer_a.astype(jnp.float32)
            layer_b = layer_b.astype(jnp.float32)
            l1 = jnp.mean(jnp.abs(layer_a - layer_b))
            loss = loss + l1 / jnp.mean(jnp.abs(layer_a))
    # the reference normalizes by len(scale_a[1:-1]) AFTER the loop, where
    # scale_a has leaked from the last iteration (feature_loss.py:48) — with
    # unequal per-scale depths that is the LAST scale's layer count, and the
    # EBEN multi-scale embeddings are unequal, so reproduce the quirk exactly
    n_layers_last = len(embeddings_a[-1][1:-1])
    return loss / (len(embeddings_a) * n_layers_last)


class HingeLoss:
    """Callable wrapper for config-driven instantiation."""

    def __call__(self, embeddings: List[List[jnp.ndarray]], target: float) -> jnp.ndarray:
        return hinge_loss(embeddings, target)


class FeatureMatchingLoss:
    """Callable wrapper for config-driven instantiation."""

    def __call__(
        self,
        embeddings_a: List[List[jnp.ndarray]],
        embeddings_b: List[List[jnp.ndarray]],
    ) -> jnp.ndarray:
        return feature_matching_loss(embeddings_a, embeddings_b)
