"""FSDP/ZeRO state sharding over the data axis (``parallel/fsdp.py``).

Correctness contract, same as TP's (SURVEY §2.5): the FSDP-sharded step
must (a) actually shard the large state leaves — params AND optimizer
moments — over ``data``, and (b) numerically equal the 1-device step.
Runs on the 8-device virtual CPU mesh (f32, reduction-order tolerance).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from vibravox_tpu.parallel.fsdp import fsdp_spec
from vibravox_tpu.parallel.mesh import DataParallel, MeshConfig, build_mesh


class TestFsdpSpec:
    def test_shards_largest_divisible_dim(self):
        assert fsdp_spec((128, 512), 8, min_size=0) == P(None, "data")
        assert fsdp_spec((512, 128), 8, min_size=0) == P("data")

    def test_small_leaf_stays_replicated(self):
        assert fsdp_spec((512, 64), 8, min_size=2**16) == P()

    def test_scalar_and_data1(self):
        assert fsdp_spec((), 8, min_size=0) == P()
        assert fsdp_spec((1024, 8), 1, min_size=0) == P()

    def test_no_divisible_free_dim(self):
        assert fsdp_spec((7, 9), 8, min_size=0) == P()

    def test_only_rank2_shards(self):
        # conv kernels (rank 3) and 1-D vectors stay replicated: sharding
        # either CHECK-crashes GSPMD's convolution partitioner (see module
        # docstring) — this pin is the regression test for that policy
        assert fsdp_spec((41, 512, 512), 8, min_size=0) == P()
        assert fsdp_spec((4096,), 8, min_size=0) == P()
        # a TP base spec on a rank-3 scanned kernel passes through intact
        assert fsdp_spec((4, 32, 64), 8, base_spec=P(None, None, "model"), min_size=0) == P(
            None, None, "model"
        )

    def test_composes_with_tp_spec(self):
        # TP already took dim 1: data goes on the remaining divisible dim 0
        assert fsdp_spec((64, 32), 8, base_spec=P(None, "model"), min_size=0) == P(
            "data", "model"
        )
        # TP took the only divisible dim: spec unchanged
        assert fsdp_spec((7, 32), 8, base_spec=P(None, "model"), min_size=0) == P(
            None, "model"
        )


def _ctc_batch(rng_np, rows=8):
    audio = rng_np.standard_normal((rows, 4096)).astype(np.float32)
    ids = np.full((rows, 16), -100, np.int64)
    ids[:, :5] = rng_np.integers(0, 30, size=(rows, 5))
    return {"audio": jnp.asarray(audio), "phonemes_ids": jnp.asarray(ids)}


def _make_ctc_task(optimizer=None):
    from vibravox_tpu.models.wav2vec2 import wav2vec2_for_ctc_from_config
    from vibravox_tpu.tasks.wav2vec2_stp import Wav2Vec2STPTask

    return Wav2Vec2STPTask(
        wav2vec2_for_ctc=wav2vec2_for_ctc_from_config(preset="tiny"),
        optimizer=optimizer or optax.sgd(1e-3),
    )


def _data_sharded_paths(tree):
    out = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        spec = getattr(getattr(leaf, "sharding", None), "spec", None)
        if spec and any(ax == "data" for ax in spec if ax is not None):
            names = tuple(str(getattr(p, "key", getattr(p, "name", ""))) for p in path)
            out[names[-2:]] = spec
    return out


class TestFsdpEquivalence:
    def test_fsdp_8dev_step_matches_single_device(self, rng_np):
        """Pure FSDP (model=1): every divisible leaf sharded (min_size=0 on
        the tiny model), updated params equal the 1-device step."""
        batch = _ctc_batch(rng_np)
        devs = jax.devices()
        assert len(devs) >= 8

        def run(cfg, devices, fsdp):
            dp = DataParallel(
                _make_ctc_task(),
                build_mesh(cfg, devices),
                donate_state=False,
                fsdp=fsdp,
                fsdp_min_size=0,
            )
            state = dp.init_state(jax.random.key(11), batch)
            logs = None
            for _ in range(2):
                state, logs = dp.train_step(state, batch)
            jax.block_until_ready(state)
            return state, {k: float(v) for k, v in logs.items()}

        s1, logs1 = run(MeshConfig(data=1, model=1), devs[:1], fsdp=False)
        s8, logs8 = run(MeshConfig(data=8, model=1), devs[:8], fsdp=True)

        sharded = _data_sharded_paths(s8.params)
        assert sharded[("q_proj", "kernel")] == P("data")
        assert sharded[("intermediate_dense", "kernel")] == P(None, "data")
        # conv kernels stay replicated (rank-2-only policy, parallel/fsdp.py)
        assert not any("conv" in mod for mod, _ in sharded)

        la = jax.tree_util.tree_leaves_with_path(s1.params)
        lb = jax.tree_util.tree_leaves(s8.params)
        assert len(la) == len(lb)
        for (path, x), y in zip(la, lb):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=1e-5, atol=1e-5,
                err_msg=jax.tree_util.keystr(path),
            )
        for k in logs1:
            assert logs1[k] == pytest.approx(logs8[k], rel=1e-4, abs=1e-6), k

    def test_fsdp_tp_adam_moments_sharded_and_checkpoint_roundtrip(
        self, rng_np, tmp_path
    ):
        """FSDP × TP on a (data=4, model=2) mesh with adam: TP leaves keep
        the model axis and gain the data axis on their free dim, the adam
        moments shard identically to their params (ZeRO-1), and an orbax
        save/restore brings the shardings AND values back — then steps."""
        from vibravox_tpu.core.checkpoint import CheckpointManager

        batch = _ctc_batch(rng_np, rows=4)
        mesh = build_mesh(MeshConfig(data=4, model=2), jax.devices()[:8])
        dp = DataParallel(
            _make_ctc_task(optax.adam(1e-3)),
            mesh,
            donate_state=False,
            fsdp=True,
            fsdp_min_size=0,
        )
        state = dp.init_state(jax.random.key(3), batch)
        state, logs = dp.train_step(state, batch)
        jax.block_until_ready(state)
        assert all(np.isfinite(float(v)) for v in logs.values())

        # TP placement preserved, FSDP added on the free dim
        spec = state.params["layer_0"]["q_proj"]["kernel"].sharding.spec
        assert spec == P("data", "model"), spec
        # adam moments shard with their params (ZeRO-1 for free)
        mu = jax.tree_util.tree_leaves_with_path(state.opt_state)
        moment_specs = _data_sharded_paths(state.opt_state)
        assert moment_specs[("q_proj", "kernel")] == P("data", "model"), moment_specs
        assert len(mu) > 0

        mgr = CheckpointManager(str(tmp_path / "ckpt"), save_last=True)
        mgr.save(state, step=1)
        fresh = dp.init_state(jax.random.key(9), batch)
        restored = mgr.restore(fresh, "last")
        assert (
            restored.params["layer_0"]["q_proj"]["kernel"].sharding.spec
            == P("data", "model")
        )
        la = jax.tree_util.tree_leaves(state.params)
        lb = jax.tree_util.tree_leaves(restored.params)
        for x, y in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        restored, logs = dp.train_step(restored, batch)
        assert np.isfinite(float(next(iter(logs.values()))))
