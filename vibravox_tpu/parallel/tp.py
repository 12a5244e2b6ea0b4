"""Tensor-parallel partition specs (Megatron-style column/row split).

The 2-D mesh's ``model`` axis (``parallel/mesh.py``) is unused by the
reference — its Lightning DDP strategy is data-parallel only
(``/root/reference/configs/trainer/ddp.yaml:4-8``) — but on TPU slices the
axis is a real tensor-parallel dimension.  This module maps the standard
Megatron-LM decomposition for transformer blocks onto GSPMD:

  * attention Q/K/V and FFN-in projections are **column-parallel** — the
    output-feature dim of the kernel (and the bias) is sharded over
    ``model``, so each shard computes its own heads / hidden slice with no
    communication;
  * attention-out and FFN-out projections are **row-parallel** — the
    input-feature dim is sharded, and the contraction over it becomes one
    ``psum`` per projection pair, inserted by the partitioner.

Only *parameter placements* are annotated (applied by
``DataParallel`` to the train state, which covers the optimizer moments
for free — their pytree paths end with the same ``(module, param)``
names); activation shardings propagate from them.  This is exactly the
scaling-book recipe: pick a mesh, annotate shardings, let XLA insert the
collectives.

Covered transformer families: wav2vec2 (``models/wav2vec2.py`` —
``q_proj``/``k_proj``/``v_proj``/``out_proj``,
``intermediate_dense``/``output_dense``) and Mimi's two bottleneck
transformers (``models/mimi/transformer.py`` — same attention names plus
``linear1``/``linear2``).  Conv trunks (EBEN, SEANet, the wav2vec2 feature
encoder) stay replicated: their channel counts are small enough that the
HBM savings never pay for the collectives.

Numerical equivalence of the sharded step with the 1-device step is gated
by ``tests/test_multidevice_equivalence.py`` and
``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

from typing import Sequence, Tuple

from jax.sharding import PartitionSpec as P

__all__ = ["transformer_tp_spec"]

# column-parallel: output features sharded (kernel dim 1, bias dim 0)
_COLUMN = {"q_proj", "k_proj", "v_proj", "intermediate_dense", "linear1"}
# row-parallel: input features sharded (kernel dim 0); bias stays replicated
_ROW = {"out_proj", "output_dense", "linear2"}


def transformer_tp_spec(
    path_names: Sequence[str], shape: Tuple[int, ...], model_size: int
) -> P:
    """PartitionSpec for one state leaf, matched on the trailing
    ``(module, param)`` path names.

    Returns ``P()`` (replicated) for anything that is not a recognised
    transformer projection or whose sharded dim does not divide the model
    axis — per-leaf gating is safe under GSPMD (the partitioner reshards
    activations at the boundary), it only forfeits the memory/compute split
    for that leaf.
    """
    if model_size <= 1 or len(path_names) < 2:
        return P()
    mod, name = path_names[-2], path_names[-1]
    # scanned transformer stacks (nn.scan, e.g. wav2vec2) carry a leading
    # layer axis: kernels are (L, in, out), biases (L, features) — the
    # layer axis always stays unsharded
    if mod in _COLUMN:
        if name == "kernel" and len(shape) == 2 and shape[1] % model_size == 0:
            return P(None, "model")
        if name == "kernel" and len(shape) == 3 and shape[2] % model_size == 0:
            return P(None, None, "model")
        if name == "bias" and len(shape) == 1 and shape[0] % model_size == 0:
            return P("model")
        if name == "bias" and len(shape) == 2 and shape[1] % model_size == 0:
            return P(None, "model")
    elif mod in _ROW:
        if name == "kernel" and len(shape) == 2 and shape[0] % model_size == 0:
            return P("model", None)
        if name == "kernel" and len(shape) == 3 and shape[1] % model_size == 0:
            return P(None, "model", None)
    return P()
