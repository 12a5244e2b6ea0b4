"""CTC loss (Graves et al., 2006) with an unrollable forward scan.

The reference framework gets CTC from inside HF's torch ``Wav2Vec2ForCTC``
(``vibravox/lightning_modules/wav2vec2_for_stp.py:31-34``, delegating to
``torch.nn.functional.ctc_loss``).  This is a native JAX implementation with
``optax.ctc_loss`` semantics (same blank-insertion lattice, same ``-1e5``
log-zero convention; parity-pinned value AND grad in ``tests/test_stp.py``).

Why not just optax: the alpha recursion is ~T sequential steps of *tiny*
``(B, N)`` vector work (at the STP recipe: 149 steps over ``(8, 129)``
states).  On TPU the two ``while`` loops (forward scan + its transposed
gradient scan) spend more time on loop bookkeeping — carry copies, residual
``dynamic-update-slice`` saves, trip-count plumbing — than on the math:
in the round-4 b8 profile they cost ~2.2 ms of a 22 ms step.  ``unroll``
places several recursion steps inside one loop iteration (identical math,
identical order — ``lax.scan``'s ``unroll`` is a scheduling knob only),
dividing the fixed per-iteration costs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["ctc_loss"]


def ctc_loss(
    logits: jnp.ndarray,
    logit_paddings: jnp.ndarray,
    labels: jnp.ndarray,
    label_paddings: jnp.ndarray,
    blank_id: int = 0,
    log_epsilon: float = -1e5,
    unroll: int = 8,
) -> jnp.ndarray:
    """Per-sequence CTC negative log-likelihoods.

    ``logits`` (B, T, K); ``logit_paddings`` (B, T) 1.0 where padded;
    ``labels`` (B, N) right-padded, ``label_paddings`` (B, N) 1.0 where
    padded.  Returns (B,) losses — the same contract and values as
    ``optax.ctc_loss``.
    """
    batch, _, num_classes = logits.shape
    n_labels = labels.shape[1]

    logprobs = jax.nn.log_softmax(logits)
    # lattice bookkeeping: a label equal to its successor cannot take the
    # emit->emit epsilon shortcut (a blank must separate repeats)
    repeat = jnp.pad(
        (labels[:, :-1] == labels[:, 1:]).astype(logprobs.dtype), ((0, 0), (0, 1))
    )

    # per-frame emission scores gathered per label position: (T, B, N)
    emit_scores = jnp.einsum(
        "btk,bnk->btn", logprobs, jax.nn.one_hot(labels, num_classes)
    ).transpose(1, 0, 2)
    blank_scores = logprobs[:, :, blank_id : blank_id + 1].transpose(1, 0, 2)  # (T, B, 1)
    frame_pad = logit_paddings.transpose(1, 0)  # (T, B)

    # alpha_phi[:, n] = log-prob of having consumed n labels, currently in a
    # blank state; alpha_emit[:, n] = same but currently on label n
    alpha_phi0 = jnp.full((batch, n_labels + 1), log_epsilon, logprobs.dtype)
    alpha_phi0 = alpha_phi0.at[:, 0].set(0.0)
    alpha_emit0 = jnp.full((batch, n_labels), log_epsilon, logprobs.dtype)

    def add_into_phi(phi, scores):
        # log-accumulate `scores` into phi[:, 1:] (position 0 has no
        # preceding label to transition out of)
        return jnp.concatenate(
            [phi[:, :1], jnp.logaddexp(phi[:, 1:], scores)], axis=-1
        )

    def step(carry, frame):
        phi, emit = carry
        emit_score, blank_score, pad = frame

        # emit -> phi epsilon transition, barred when the next label repeats
        phi_in = add_into_phi(phi, emit + log_epsilon * repeat)
        # phi -> emit and emit -> emit (self-loop) transitions
        emit_next = jnp.logaddexp(phi_in[:, :-1] + emit_score, emit + emit_score)
        # phi self-loop, plus the emit -> blank path reserved for repeats
        phi_next = add_into_phi(
            phi_in + blank_score, emit + blank_score + log_epsilon * (1.0 - repeat)
        )

        pad = pad[:, None]
        emit_next = pad * emit + (1.0 - pad) * emit_next
        phi_next = pad * phi + (1.0 - pad) * phi_next
        return (phi_next, emit_next), None

    (phi_last, emit_last), _ = jax.lax.scan(
        step,
        (alpha_phi0, alpha_emit0),
        (emit_scores, blank_scores, frame_pad),
        unroll=max(1, int(unroll)),
    )

    # closing epsilon transition out of the final emit states
    phi_last = add_into_phi(phi_last, emit_last)

    label_lengths = n_labels - jnp.sum(label_paddings, axis=1).astype(jnp.int32)
    return -jnp.einsum(
        "bn,bn->b", phi_last, jax.nn.one_hot(label_lengths, n_labels + 1)
    )
