"""Mimi codec + regressive task tests (tiny config) and HF-converter parity.

The parity class pins the full converter chain (`mimi_params_from_hf_torch`)
against a randomly-initialised tiny ``transformers.MimiModel`` — the same
oracle topology the real ``kyutai/mimi`` weights flow through
(``/root/reference/vibravox/lightning_modules/regressive_mimi.py:24-38``
loads the pretrained codec as the task's entire training signal).
"""

import flax.traverse_util
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

    def test_bf16_compute_path_matches_f32(self, mimi):
        """compute_dtype="bfloat16" (matmuls/convs bf16, norms + RVQ + API
        boundary f32) stays close to the f32 forward and emits f32 latents."""
        import dataclasses

        cfg16 = dataclasses.replace(mimi.config, compute_dtype="bfloat16")
        mimi16 = Mimi(config=cfg16, params=mimi.params)
        t = 8 * mimi.frame_size
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal((2, t, 1)).astype(np.float32)
        )
        lat32 = mimi.encode_to_latent(x)
        lat16 = mimi16.encode_to_latent(x)
        assert lat16.dtype == jnp.float32
        scale = float(jnp.max(jnp.abs(lat32))) + 1e-6
        assert float(jnp.max(jnp.abs(lat16 - lat32))) / scale < 0.1
        rec16 = mimi16.decode_latent(lat16)
        assert rec16.dtype == jnp.float32
        assert bool(jnp.all(jnp.isfinite(rec16)))

    def test_bf16_train_step_finite(self, mimi):
        import dataclasses

        cfg16 = dataclasses.replace(mimi.config, compute_dtype="bfloat16")
        mimi16 = Mimi(config=cfg16, params=mimi.params)
        task = RegressiveMimiTask(mimi=mimi16, optimizer=optax.adam(1e-4))
        t = 4 * mimi16.frame_size
        rng = np.random.default_rng(2)
        batch = {
            "audio_body_conducted": jnp.asarray(
                rng.standard_normal((2, t, 1)).astype(np.float32) * 0.1
            ),
            "audio_airborne": jnp.asarray(
                rng.standard_normal((2, t, 1)).astype(np.float32) * 0.1
            ),
        }
        state = task.init_state(jax.random.key(0), batch)
        state, logs = jax.jit(task.train_step)(state, batch)
        loss = float(logs["train/l1_latent_loss"])
        assert np.isfinite(loss) and loss > 0


class TestMimiHFConverterParity:
    """Converted HF ``MimiModel`` weights must reproduce HF forwards."""

    @pytest.fixture(scope="class")
    def converted(self):
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")
        from vibravox_tpu.models.mimi.convert import (
            hf_mimi_config_to_native,
            mimi_params_from_hf_torch,
        )

        torch.manual_seed(0)
        hf_cfg = transformers.MimiConfig(
            sampling_rate=24000,
            hidden_size=32,
            num_filters=4,
            upsampling_ratios=[4, 2],
            num_hidden_layers=2,
            num_attention_heads=2,
            num_key_value_heads=2,
            head_dim=16,
            intermediate_size=64,
            sliding_window=10,
            codebook_dim=16,
            vector_quantization_hidden_dimension=16,
            num_quantizers=4,
            codebook_size=64,
            compress=2,
            upsample_groups=32,
        )
        hf = transformers.MimiModel(hf_cfg).eval()
        # EMA codebook buffers initialise to zero; randomise them so the
        # materialised codebooks (embed_sum / cluster_usage) are non-trivial
        with torch.no_grad():
            for q in (
                hf.quantizer.semantic_residual_vector_quantizer,
                hf.quantizer.acoustic_residual_vector_quantizer,
            ):
                for layer in q.layers:
                    usage = torch.rand_like(layer.codebook.cluster_usage) + 0.5
                    layer.codebook.cluster_usage.copy_(usage)
                    layer.codebook.embed_sum.copy_(
                        torch.randn_like(layer.codebook.embed_sum) * usage[:, None]
                    )
        cfg = hf_mimi_config_to_native(hf_cfg)
        sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
        params = mimi_params_from_hf_torch(sd, cfg)
        return hf, torch, Mimi(config=cfg, params=params)

    @pytest.fixture(scope="class")
    def audio(self, converted):
        hop = converted[2].frame_size
        rng = np.random.default_rng(1)
        return rng.standard_normal((2, 4 * hop)).astype(np.float32) * 0.3

    def test_encoder_latent_parity(self, converted, audio):
        hf, torch, mimi = converted
        with torch.no_grad():
            xt = torch.from_numpy(audio)[:, None, :]
            emb = hf.encoder(xt)
            emb = hf.encoder_transformer(emb.transpose(1, 2))[0].transpose(1, 2)
            latent_hf = hf.downsample(emb).numpy().transpose(0, 2, 1)
        latent = np.asarray(mimi.encode_to_latent(audio[:, :, None]))
        np.testing.assert_allclose(latent, latent_hf, atol=1e-4)

    def test_rvq_codes_match(self, converted, audio):
        hf, torch, mimi = converted
        with torch.no_grad():
            codes_hf = hf.encode(torch.from_numpy(audio)[:, None, :]).audio_codes
        codes = np.asarray(mimi.encode(audio[:, :, None]))  # (n_q, B, T')
        np.testing.assert_array_equal(codes, codes_hf.numpy().transpose(1, 0, 2))

    def test_decode_round_trip_parity(self, converted, audio):
        hf, torch, mimi = converted
        with torch.no_grad():
            codes_hf = hf.encode(torch.from_numpy(audio)[:, None, :]).audio_codes
            audio_hf = hf.decode(codes_hf).audio_values.numpy()[:, 0, :]
        rec = np.asarray(mimi.decode(codes_hf.numpy().transpose(1, 0, 2)))[:, :, 0]
        np.testing.assert_allclose(rec, audio_hf, atol=1e-4)

    def test_converter_rejects_unconsumed_keys(self, converted):
        hf, torch, mimi = converted
        from vibravox_tpu.models.mimi.convert import mimi_params_from_hf_torch

        sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
        sd["surprise.weight"] = np.zeros((1,), np.float32)
        with pytest.raises(ValueError, match="unconsumed"):
            mimi_params_from_hf_torch(sd, mimi.config)


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

    def test_subtree_opt_equivalent_to_multi_transform(
        self, mimi, task_and_batch, monkeypatch
    ):
        """VIBRAVOX_MIMI_SUBTREE_OPT=1 (grads + adam over the encoder-side
        subtree only — no zero-update traffic over the frozen 55M leaves)
        must produce the same training trajectory as the default
        multi_transform path: trainable leaves allclose after 3 steps,
        frozen leaves bitwise-unchanged."""
        task, batch = task_and_batch
        state = task.init_state(jax.random.key(0), batch)
        step = jax.jit(task.train_step)
        for _ in range(3):
            state, logs = step(state, batch)

        monkeypatch.setenv("VIBRAVOX_MIMI_SUBTREE_OPT", "1")
        task_sub = RegressiveMimiTask(mimi=mimi, optimizer=optax.adam(1e-3))
        state_sub = task_sub.init_state(jax.random.key(0), batch)
        step_sub = jax.jit(task_sub.train_step)
        for _ in range(3):
            state_sub, logs_sub = step_sub(state_sub, batch)

        assert np.isclose(
            float(logs["train/l1_latent_loss"]),
            float(logs_sub["train/l1_latent_loss"]),
            rtol=1e-5, atol=1e-6,
        )
        flat = flax.traverse_util.flatten_dict(state.params["params"])
        flat_sub = flax.traverse_util.flatten_dict(state_sub.params["params"])
        assert set(flat) == set(flat_sub)
        trainable_prefixes = ("encoder", "encoder_transformer", "downsample")
        for k in flat:
            a, b = np.asarray(flat[k]), np.asarray(flat_sub[k])
            if any(k[0].startswith(p) for p in trainable_prefixes):
                np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
            else:
                # frozen leaves: the subtree path never touches them; the
                # default path adds +0.0 — numerically equal either way
                np.testing.assert_array_equal(a, b)
