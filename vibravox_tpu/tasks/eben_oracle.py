"""Naive dynamic-loss-balancing oracle for EBEN — TEST/ABLATION ONLY.

The production path computes the balancing lambdas inside
``EBENTask.train_step``'s fused shared-linearization block (one vjp per loss
+ tail-only transpose).  This module keeps the naive per-loss ``jax.grad``
formulation as an *independent oracle*, deliberately outside the production
class: ``tests/test_eben_task.py`` (fused-vs-naive equivalence) and
``tests/test_parity_torch.py`` (torch-autograd λ parity, reference
``vibravox/lightning_modules/eben.py:222-240``) pin the two against each
other — edit one without the other and those tests are the tripwire.
``scripts/ablate_step.py`` uses it to time the balancing component alone.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["balancing_lambdas_naive"]


def balancing_lambdas_naive(
    task,
    state,
    features: jnp.ndarray,
    first_bands: jnp.ndarray,
    reference: jnp.ndarray,
    decomposed_reference: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """λ_i = clip(1/(‖∂L_i/∂W_last‖ + 1e-4), 0, 1e4) with optional EMA.

    The jacobian is taken through the generator tail only: W_last only
    reaches the losses via tail → discriminator, so this equals the
    reference's full-graph ``autograd.grad(L_i, last_conv.weight)``.
    """
    features = jax.lax.stop_gradient(features)
    first_bands = jax.lax.stop_gradient(first_bands)
    last_kernel = state.gen_params["params"]["last_conv"]["kernel"]

    def atomic_losses(kernel):
        gp = {
            "params": {
                **state.gen_params["params"],
                "last_conv": {
                    **state.gen_params["params"]["last_conv"],
                    "kernel": kernel,
                },
            }
        }
        enhanced, decomposed = task.generator.apply(
            gp, features, first_bands, method="tail"
        )
        return task._generator_atomic_losses(
            state.disc_params, enhanced, reference, decomposed, decomposed_reference
        )

    # One jax.grad per atomic loss instead of jacrev over the stacked
    # vector: jacrev vmaps the vjp over the 4x4 identity, which runs
    # EVERY loss's backward (2 discriminator input-backwards each) for
    # every row — 4x the device work.  Separate grads let XLA CSE share
    # the tail + discriminator forwards while each row only pays its own
    # backward (measured: balancing 70 ms -> ~30 ms at batch 32).
    norms = jnp.stack([
        jnp.sqrt(sum(
            jnp.sum(jnp.square(g))
            for g in jax.tree_util.tree_leaves(
                jax.grad(lambda k, n=name: atomic_losses(k)[n].astype(jnp.float32))(last_kernel)
            )
        ))
        for name in task.atomic_loss_names
    ])

    if task.dynamic_loss_balancing == "ema":
        ema = jnp.where(
            state.step == 0,
            norms,
            task.beta_ema * state.atomic_norms_ema + (1 - task.beta_ema) * norms,
        )
    else:  # "simple"
        ema = norms
    lambdas = jnp.clip(1.0 / (ema + 1e-4), 0.0, 1e4)
    return jax.lax.stop_gradient(lambdas), ema
