"""FSDP / ZeRO-3-style parameter + optimizer-state sharding over ``data``.

The reference has no analog (its Lightning DDP strategy replicates the
model on every rank, ``/root/reference/configs/trainer/ddp.yaml:4-8``); on
TPU slices this is the standard GSPMD recipe for fitting models and — more
relevantly at vibravox's 23-95M-parameter scale — their f32 adam moments
into per-chip HBM: annotate every large dense-kernel leaf with the
``data`` mesh axis on one divisible dimension and let the partitioner turn
parameter use into an all-gather and the gradient reduction into a
reduce-scatter, both riding ICI.  Because the placement is applied to the *train state* (see
``DataParallel._state_sharding_tree``), the optimizer moments shard
identically to their parameters — ZeRO-1 falls out of ZeRO-3 for free.

Composes with tensor parallelism (``parallel/tp.py``): a leaf the TP spec
already shards over ``model`` gets ``data`` on a remaining free dimension
(2-D sharding) when one divides; everything else keeps the TP placement.

Enabled per-run via ``trainer.mesh.fsdp: true`` (``core/loop.py`` threads
it into ``DataParallel``).  Small leaves stay replicated: below
``min_size`` elements the all-gather latency outweighs the HBM saving, and
the threshold is a config knob (``trainer.mesh.fsdp_min_size``) because the
break-even point is topology-dependent.

Numerical equivalence with the 1-device step and actually-sharded
placement are gated by ``tests/test_fsdp.py`` on the virtual CPU mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

from jax.sharding import PartitionSpec as P

__all__ = ["FSDP_MIN_LEAF_SIZE", "fsdp_spec"]

# Elements below which a leaf stays replicated.  2**15 f32 elements = 128 KiB
# — roughly where one ICI all-gather's latency stops paying for the HBM it
# frees on current TPU generations; override per-run for small models.
FSDP_MIN_LEAF_SIZE = 2**15


def fsdp_spec(
    shape: Tuple[int, ...],
    data_size: int,
    base_spec: Optional[Sequence[Optional[str]]] = None,
    min_size: int = FSDP_MIN_LEAF_SIZE,
) -> P:
    """PartitionSpec sharding one state leaf over the ``data`` mesh axis.

    Starts from ``base_spec`` (e.g. a TP placement from
    ``parallel/tp.py::transformer_tp_spec``) and adds ``data`` on the
    largest dimension that is still unsharded and divides ``data_size``.
    Returns the base spec unchanged when the leaf is too small, fully
    sharded already, or has no divisible free dimension — per-leaf gating
    is safe under GSPMD exactly as for TP: a replicated leaf only forfeits
    its memory split.

    Only rank-2 leaves (dense kernels — and, via the shape-matched state
    tree, their adam moments) are sharded.  This is a measured restriction,
    not a simplification: sharding conv kernels (rank 3) or the 1-D
    norm/bias vectors feeding conv stacks drives GSPMD's convolution
    partitioner into a hard CHECK crash on the dW convolution
    (``convolution_handler.cc:983  new_input_batch_size %
    new_output_batch_size == 0`` — reproduced on jax 0.9.0, XLA:CPU, 8-way
    mesh).  Dense kernels carry ~90% of the parameter HBM in the
    transformer families this framework trains (wav2vec2-base: 85M of
    95M), so the restriction costs little; conv trunks stay replicated
    exactly as under TP (``parallel/tp.py:28-30``).
    """
    base = list(base_spec) if base_spec is not None else []
    base += [None] * (len(shape) - len(base))

    def done():
        while base and base[-1] is None:  # P(None, None) != P() as tuples
            base.pop()
        return P(*base)

    if len(shape) != 2 or data_size <= 1:
        return done()
    if shape[0] * shape[1] < min_size:
        return done()
    candidates = [
        i for i, d in enumerate(shape) if base[i] is None and d % data_size == 0
    ]
    if not candidates:
        return done()
    dim = max(candidates, key=lambda i: shape[i])
    base[dim] = "data"
    return done()
