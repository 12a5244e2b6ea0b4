"""Mimi codec + regressive task tests (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vibravox_tpu.models.mimi.mimi import Mimi, MimiConfig
from vibravox_tpu.tasks.regressive_mimi import RegressiveMimiTask


@pytest.fixture(scope="module")
def mimi():
    return Mimi(preset="tiny")


class TestMimiCodec:
    def test_hop_and_shapes(self, mimi):
        hop = mimi.frame_size  # tiny: 4*2*2 = 16
        t = 8 * hop
        x = jnp.asarray(np.random.default_rng(0).standard_normal((2, t, 1)).astype(np.float32))
        latent = mimi.encode_to_latent(x)
        assert latent.shape == (2, t // hop, mimi.config.dimension)
        codes = mimi.encode(x)
        assert codes.shape == (mimi.config.rvq_n_q, 2, t // hop)
        assert int(codes.max()) < mimi.config.rvq_codebook_size
        rec = mimi.decode_latent(latent)
        assert rec.shape == (2, t, 1)

    def test_default_config_hop_is_1920(self):
        assert MimiConfig().hop_length == 1920

    def test_valid_length_rounds_up(self, mimi):
        assert mimi.valid_length(1) == mimi.frame_size
        assert mimi.valid_length(mimi.frame_size) == mimi.frame_size


class TestRegressiveMimiTask:
    @pytest.fixture(scope="class")
    def task_and_batch(self, mimi):
        task = RegressiveMimiTask(mimi=mimi, optimizer=optax.adam(1e-3))
        t = 4 * mimi.frame_size
        rng = np.random.default_rng(1)
        ref = rng.standard_normal((2, t, 1)).astype(np.float32) * 0.1
        batch = {
            "audio_body_conducted": jnp.asarray(ref * 0.5),
            "audio_airborne": jnp.asarray(ref),
        }
        return task, batch

    def test_loss_decreases_and_frozen_parts_stay(self, task_and_batch):
        task, batch = task_and_batch
        state = task.init_state(jax.random.key(0), batch)
        dec0 = jax.tree_util.tree_leaves(state.params["params"]["decoder"])
        step = jax.jit(task.train_step)
        losses = []
        for _ in range(5):
            state, logs = step(state, batch)
            losses.append(float(logs["train/l1_latent_loss"]))
        assert losses[-1] < losses[0]
        # decoder and quantizer must not move (ref trains encoder side only)
        dec1 = jax.tree_util.tree_leaves(state.params["params"]["decoder"])
        for a, b in zip(dec0, dec1):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # encoder must move
        enc0 = jax.tree_util.tree_leaves(task.mimi.params["params"]["encoder"])
        enc1 = jax.tree_util.tree_leaves(state.params["params"]["encoder"])
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(enc0, enc1)
        )

    def test_eval_step(self, task_and_batch):
        task, batch = task_and_batch
        state = task.init_state(jax.random.key(0), batch)
        out = jax.jit(task.eval_step)(state, batch)
        assert out["enhanced"].shape == out["corrupted"].shape
        assert "l1_latent_loss" in out["logs"]
