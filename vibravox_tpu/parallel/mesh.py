"""Device mesh construction and sharding strategy.

The reference's entire parallelism story is Lightning DDP over NCCL
(``configs/trainer/ddp.yaml:4-8``); the TPU-native equivalent (SURVEY §2.5)
is a named ``jax.sharding.Mesh`` over ICI with batch-sharded data and
replicated parameters — gradients and metric reductions become XLA
collectives inserted by the partitioner, not explicit NCCL calls.

The mesh is 2-D ``(data, model)`` from day one: the reference only exercises
data parallelism (model axis size 1), but the model axis is the designed
extension point for tensor-parallel growth, mirroring how the reference
exposes a ``strategy`` knob it never varies.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["MeshConfig", "build_mesh", "shard_batch", "replicate", "DataParallel"]


@dataclasses.dataclass
class MeshConfig:
    """Declarative mesh spec, the config-side mirror of ``trainer.mesh``.

    ``fsdp`` shards parameters and optimizer state over the ``data`` axis
    (ZeRO-3 style, ``parallel/fsdp.py``); leaves smaller than
    ``fsdp_min_size`` elements stay replicated.
    """

    data: int = -1   # -1: all remaining devices
    model: int = 1
    fsdp: bool = False
    fsdp_min_size: Optional[int] = None  # None: parallel/fsdp.py default

    def resolve(self, n_devices: Optional[int] = None) -> Dict[str, int]:
        n = n_devices if n_devices is not None else jax.device_count()
        model = max(1, self.model)
        data = self.data if self.data > 0 else n // model
        if data * model != n:
            raise ValueError(
                f"mesh {data}x{model} does not cover {n} devices"
            )
        return {"data": data, "model": model}


def build_mesh(config: Optional[MeshConfig] = None, devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    config = config or MeshConfig()
    devices = list(devices) if devices is not None else jax.devices()
    sizes = config.resolve(len(devices))
    dev_array = np.asarray(devices).reshape(sizes["data"], sizes["model"])
    return Mesh(dev_array, axis_names=("data", "model"))


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put a host batch with the leading axis sharded over 'data'.

    Single-process: a plain sharded device_put.  Multi-process (the mesh
    spans hosts): each process passes its *local* shard — the per-host slice
    its loader produced (``data/loader.py``) — and the global array is
    assembled with ``jax.make_array_from_process_local_data``.

    Batches whose leading axis does not divide the (local) data axis (e.g.
    the reference's batch-size-1 eval loaders — ``bwe.py:177,209``) fall
    back to replication: correct everywhere, redundant compute on eval only.
    In multi-process runs the per-host loader shards differ, so the fallback
    first allgathers the host batches (concatenated on the leading axis) and
    replicates the *global* view — replicating each host's own rows would
    silently mark divergent arrays as identical.
    """
    data_size = mesh.shape["data"]
    multiproc = jax.process_count() > 1
    # leading-axis device count this process feeds
    local_data = data_size // jax.process_count() if multiproc else data_size

    def put(x):
        if np.ndim(x) >= 1 and local_data > 0 and np.shape(x)[0] % local_data == 0:
            spec = P("data", *([None] * (np.ndim(x) - 1)))
        else:
            spec = P()
        sharding = NamedSharding(mesh, spec)
        if multiproc:
            if spec == P():
                from jax.experimental import multihost_utils

                gathered = multihost_utils.process_allgather(np.asarray(x))
                if np.ndim(x) >= 1:
                    # per-host rows differ: the global batch is their
                    # concatenation (allgather stacks on a new axis 0)
                    x = np.concatenate(list(gathered), axis=0)
                else:
                    first = gathered[0]
                    if not np.all([np.array_equal(g, first) for g in gathered]):
                        raise ValueError(
                            "replicated batch leaf differs across processes"
                        )
                    x = first
                return jax.make_array_from_process_local_data(sharding, np.asarray(x))
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Replicate a pytree (params / train state) across the whole mesh.

    Multi-process: every process must hold identical host values (true for
    seeded init and loaded checkpoints); assembly goes through
    ``jax.make_array_from_process_local_data``.
    """
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:

        def put(x):
            # typed PRNG keys can't cross np.asarray; round-trip the raw bits
            if hasattr(x, "dtype") and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
                data = jax.make_array_from_process_local_data(
                    sharding, np.asarray(jax.random.key_data(x))
                )
                return jax.random.wrap_key_data(data, impl=jax.random.key_impl(x))
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))

        return jax.tree_util.tree_map(put, tree)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


class DataParallel:
    """Wraps a task's step functions for jit execution over the mesh.

    Batches are sharded on the 'data' axis; parameters/state are replicated
    unless the task declares tensor-parallel placements (a
    ``partition_spec_for_path(path_names, shape, model_size)`` attribute —
    see ``parallel/tp.py``) and/or FSDP is enabled (``fsdp=True``, see
    ``parallel/fsdp.py``), in which case the matching state leaves are
    sharded over the 'model' / 'data' axes and the train/eval jits carry
    the full per-leaf sharding tree.  Gradient all-reduces (TP psums, FSDP
    all-gather/reduce-scatter pairs) materialize automatically from the
    sharding propagation — this replaces DDP + ``sync_dist`` wholesale.
    """

    def __init__(
        self,
        task,
        mesh: Optional[Mesh] = None,
        donate_state: bool = True,
        fsdp: bool = False,
        fsdp_min_size: Optional[int] = None,
    ):
        self.task = task
        self.mesh = mesh or build_mesh()
        self._donate = donate_state
        spec_fn = getattr(task, "partition_spec_for_path", None)
        # TP engages whenever the mesh has a real model axis (model=1 makes
        # every spec P() anyway).  Multi-process assembly goes through
        # jax.make_array_from_callback in init_state — every process holds
        # the full host-side state (seeded init / loaded checkpoint), the
        # same invariant `replicate` relies on.
        self._tp_spec_fn = (
            spec_fn
            if spec_fn is not None and self.mesh.shape.get("model", 1) > 1
            else None
        )
        # FSDP/ZeRO state sharding over 'data' (parallel/fsdp.py): task-
        # agnostic (placement is by leaf shape), composes with the TP specs.
        from vibravox_tpu.parallel.fsdp import FSDP_MIN_LEAF_SIZE

        self._fsdp = bool(fsdp) and self.mesh.shape.get("data", 1) > 1
        self._fsdp_min_size = (
            FSDP_MIN_LEAF_SIZE if fsdp_min_size is None else int(fsdp_min_size)
        )
        # let the task adapt to the mesh before anything compiles (e.g.
        # wav2vec2 only needs its SPMD-safe pos-conv vjp when model > 1)
        configure = getattr(task, "configure_for_mesh", None)
        if configure is not None:
            configure(self.mesh)
        self._jit_steps(NamedSharding(self.mesh, P()))

    def _jit_steps(self, state_shardings: Any) -> None:
        """(Re)build the jitted steps for a state sharding (a single
        NamedSharding prefix, or a per-leaf tree under TP)."""
        self._train_step = jax.jit(
            self.task.train_step,
            in_shardings=(state_shardings, None),
            out_shardings=(state_shardings, None),
            donate_argnums=(0,) if self._donate else (),
        )
        self._eval_step = jax.jit(
            self.task.eval_step, in_shardings=(state_shardings, None)
        )

    def _state_sharding_tree(self, state: Any) -> Any:
        """Per-leaf NamedSharding tree for the train state.

        TP: the task's spec hook matched on each leaf's trailing path names
        — optimizer moments shard with their parameters for free (their
        paths end with the same ``(module, param)`` names).  FSDP: on top of
        the TP spec, large leaves get the ``data`` axis on a free divisible
        dimension (``parallel/fsdp.py``) — shape-based, so it covers the
        moments identically.
        """
        from vibravox_tpu.parallel.fsdp import fsdp_spec

        model = self.mesh.shape.get("model", 1)
        data = self.mesh.shape["data"]

        def leaf_sharding(path, leaf):
            names = tuple(
                str(getattr(p, "key", getattr(p, "name", ""))) for p in path
            )
            shape = tuple(getattr(leaf, "shape", ()))
            spec = (
                self._tp_spec_fn(names, shape, model)
                if self._tp_spec_fn is not None
                else P()
            )
            if self._fsdp and not (
                hasattr(leaf, "dtype")
                and jax.dtypes.issubdtype(leaf.dtype, jax.dtypes.prng_key)
            ):
                spec = fsdp_spec(shape, data, spec, min_size=self._fsdp_min_size)
            return NamedSharding(self.mesh, spec)

        return jax.tree_util.tree_map_with_path(leaf_sharding, state)

    @staticmethod
    def split_batch(batch: Any) -> tuple:
        """Separate device-able arrays from host-only fields (e.g. the STP
        collate's ``phonemes_str`` list — strings cannot cross into jit)."""
        if not isinstance(batch, dict):
            return batch, {}
        arrays = {k: v for k, v in batch.items() if hasattr(v, "dtype")}
        host = {k: v for k, v in batch.items() if not hasattr(v, "dtype")}
        return arrays, host

    def init_state(self, rng: jax.Array, example_batch: Any):
        arrays, _ = self.split_batch(example_batch)
        # jit the whole init: eager op-by-op init is pathologically slow on
        # remote-compile TPU backends, and jit also dedupes the RNG work.
        # Tasks built around pretrained weights expose init_state_with_params
        # so the weights enter the jit as ARGUMENTS — jitting a closure over
        # ~100M params embeds them as program constants, which overflows
        # remote-compile transports (HTTP 413 on the axon tunnel).
        init_with = getattr(self.task, "init_state_with_params", None)
        if init_with is not None:
            state = jax.jit(init_with)(rng, arrays, self.task.initial_params())
        else:
            state = jax.jit(self.task.init_state)(rng, arrays)
        if self._tp_spec_fn is not None or self._fsdp:
            shardings = self._state_sharding_tree(state)
            self._jit_steps(shardings)
            if jax.process_count() > 1:
                # every process computed the identical full state (seeded
                # init); each contributes its addressable shards
                def put(x, sharding):
                    if hasattr(x, "dtype") and jax.dtypes.issubdtype(
                        x.dtype, jax.dtypes.prng_key
                    ):
                        data = np.asarray(jax.random.key_data(x))
                        arr = jax.make_array_from_callback(
                            data.shape,
                            NamedSharding(self.mesh, P()),
                            lambda idx: data[idx],
                        )
                        return jax.random.wrap_key_data(
                            arr, impl=jax.random.key_impl(x)
                        )
                    host = np.asarray(x)
                    return jax.make_array_from_callback(
                        host.shape, sharding, lambda idx, h=host: h[idx]
                    )

                return jax.tree_util.tree_map(put, state, shardings)
            return jax.device_put(state, shardings)
        return replicate(self.mesh, state)

    def train_step(self, state, batch):
        arrays, _ = self.split_batch(batch)
        return self._train_step(state, shard_batch(self.mesh, arrays))

    def eval_step(self, state, batch):
        arrays, host = self.split_batch(batch)
        outputs = self._eval_step(state, shard_batch(self.mesh, arrays))
        if jax.process_count() > 1:
            # metrics run host-side (STOI/EER/... on numpy): gather the
            # sharded eval outputs so every host sees the full batch — the
            # analog of the reference's sync_dist=True metric reduction
            from jax.experimental import multihost_utils

            outputs = jax.tree_util.tree_map(
                lambda x: multihost_utils.process_allgather(x, tiled=True)
                if hasattr(x, "sharding") and not x.is_fully_addressable
                else x,
                outputs,
            )
        if host and isinstance(outputs, dict):
            outputs = dict(outputs)
            outputs["host"] = host
        return outputs
