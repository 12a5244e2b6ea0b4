"""ECAPA2 hybrid speaker embedder: shapes, fwSE semantics, SPKV contract,
and converter parity against a torch twin in the expected checkpoint layout
(``ecapa2_params_from_torchscript``'s documented key schema)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vibravox_tpu.models.ecapa2 import (
    ECAPA2,
    ECAPA2Config,
    FwSEBlock,
    ecapa2_params_from_torchscript,
)

TINY = ECAPA2Config(
    stem_channels=8,
    lfe_stages=((8, 1, 2), (12, 1, 2)),
    gfe_channels=16,
    res2_scale=4,
    embed_dim=16,
)


def _torch_twin(cfg: ECAPA2Config):
    """torch re-statement of the ECAPA2 trunk (features (B, T, F) -> (B, D))
    in the converter's expected state-dict layout — see
    ``ecapa2_params_from_torchscript``."""
    import torch
    import torch.nn as tnn

    torch.manual_seed(0)

    class FwSE(tnn.Module):
        def __init__(self, freq, bottleneck=128):
            super().__init__()
            self.fc1 = tnn.Linear(freq, bottleneck)
            self.fc2 = tnn.Linear(bottleneck, freq)

        def forward(self, x):  # (B, C, T, F)
            z = x.mean(dim=(1, 2))  # (B, F)
            s = torch.sigmoid(self.fc2(torch.relu(self.fc1(z))))
            return x * s[:, None, None, :]

    class LFEBlock(tnn.Module):
        def __init__(self, cin, cout, stride, freq_out):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, cout, 3, stride=(1, stride), padding=1)
            self.bn1 = tnn.BatchNorm2d(cout)
            self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
            self.bn2 = tnn.BatchNorm2d(cout)
            self.fwse = FwSE(freq_out)
            if cin != cout or stride != 1:
                self.shortcut = tnn.Conv2d(cin, cout, 1, stride=(1, stride))

        def forward(self, x):
            h = torch.relu(self.bn1(self.conv1(x)))
            h = self.fwse(self.bn2(self.conv2(h)))
            sc = self.shortcut(x) if hasattr(self, "shortcut") else x
            return torch.relu(h + sc)

    class GFEBlock(tnn.Module):
        def __init__(self, c, scale, dilation):
            super().__init__()
            self.scale = scale
            self.conv_in = tnn.Conv1d(c, c, 1)
            self.bn_in = tnn.BatchNorm1d(c)
            w = c // scale
            self.res2_convs = tnn.ModuleDict({
                str(i): tnn.Conv1d(w, w, 3, dilation=dilation, padding=dilation)
                for i in range(1, scale)
            })
            self.conv_out = tnn.Conv1d(c, c, 1)
            self.bn_out = tnn.BatchNorm1d(c)
            self.se_fc1 = tnn.Linear(c, 128)
            self.se_fc2 = tnn.Linear(128, c)

        def forward(self, x):  # (B, C, T)
            residual = x
            h = torch.relu(self.bn_in(self.conv_in(x)))
            chunks = h.chunk(self.scale, dim=1)
            outs = [chunks[0]]
            prev = None
            for i in range(1, self.scale):
                inp = chunks[i] if prev is None else chunks[i] + prev
                prev = torch.relu(self.res2_convs[str(i)](inp))
                outs.append(prev)
            h = torch.cat(outs, dim=1)
            h = torch.relu(self.bn_out(self.conv_out(h)))
            s = h.mean(dim=2)
            s = torch.sigmoid(self.se_fc2(torch.relu(self.se_fc1(s))))
            return residual + h * s[:, :, None]

    class Pooling(tnn.Module):
        def __init__(self, c, bottleneck=128):
            super().__init__()
            self.att_conv1 = tnn.Conv1d(3 * c, bottleneck, 1)
            self.att_conv2 = tnn.Conv1d(bottleneck, c, 1)

        def forward(self, x):  # (B, C, T) -> (B, 2C)
            mean = x.mean(dim=2, keepdim=True)
            std = torch.sqrt(torch.clamp(x.var(dim=2, unbiased=False, keepdim=True), min=1e-8))
            ctx = torch.cat([x, mean.expand_as(x), std.expand_as(x)], dim=1)
            a = torch.softmax(self.att_conv2(torch.tanh(self.att_conv1(ctx))), dim=2)
            mu = (a * x).sum(dim=2)
            sg = torch.sqrt(torch.clamp((a * x * x).sum(dim=2) - mu**2, min=1e-8))
            return torch.cat([mu, sg], dim=1)

    class Stage(tnn.Module):
        pass

    class Twin(tnn.Module):
        def __init__(self):
            super().__init__()
            self.stem = tnn.Conv2d(1, cfg.stem_channels, 3, padding=1)
            self.stem_bn = tnn.BatchNorm2d(cfg.stem_channels)
            freq = cfg.n_mels
            cin = cfg.stem_channels
            for si, (ch, n_blocks, stride) in enumerate(cfg.lfe_stages):
                stage = Stage()
                for bi in range(n_blocks):
                    s = stride if bi == 0 else 1
                    freq = (freq + 2 - 3) // s + 1 if s != 1 else freq
                    setattr(stage, f"block{bi}", LFEBlock(cin, ch, s, freq))
                    cin = ch
                setattr(self, f"stage{si}", stage)
            self.final_freq = freq
            self.gfe_proj = tnn.Conv1d(freq * cin, cfg.gfe_channels, 1)
            self.gfe_bn = tnn.BatchNorm1d(cfg.gfe_channels)
            self.gfe_block = GFEBlock(cfg.gfe_channels, cfg.res2_scale, cfg.gfe_dilation)
            self.pooling = Pooling(cfg.gfe_channels)
            self.pool_bn = tnn.BatchNorm1d(2 * cfg.gfe_channels)
            self.embedding = tnn.Linear(2 * cfg.gfe_channels, cfg.embed_dim)

        def forward(self, feats):  # (B, T, F)
            x = feats[:, None, :, :]  # (B, 1, T, F)
            x = torch.relu(self.stem_bn(self.stem(x)))
            for si in range(len(cfg.lfe_stages)):
                stage = getattr(self, f"stage{si}")
                for bi in range(cfg.lfe_stages[si][1]):
                    x = getattr(stage, f"block{bi}")(x)
            b, c, t, f = x.shape
            # match the flax flattening order: (B, T, F*C) with f-major index
            h = x.permute(0, 2, 3, 1).reshape(b, t, f * c).transpose(1, 2)
            h = torch.relu(self.gfe_bn(self.gfe_proj(h)))
            h = self.gfe_block(h)
            pooled = self.pool_bn(self.pooling(h))
            return self.embedding(pooled)

    return Twin()


class TestECAPA2:
    def test_forward_shape_and_jit(self, rng_np):
        model = ECAPA2(TINY)
        x = jnp.asarray(rng_np.standard_normal((2, 16000)).astype(np.float32))
        variables = model.init(jax.random.key(0), x)
        emb = jax.jit(model.apply)(variables, x)
        assert emb.shape == (2, 16)
        assert bool(jnp.all(jnp.isfinite(emb)))

    def test_bf16_compute_dtype_close_to_f32(self, rng_np):
        """compute_dtype="bfloat16" (the TPU throughput path) must keep the
        param tree identical (checkpoints interchangeable), return f32
        embeddings, and stay within bf16 noise of the f32 trunk — the
        pooling statistics and embedding head run f32 by design."""
        import dataclasses

        model32 = ECAPA2(TINY)
        model16 = ECAPA2(dataclasses.replace(TINY, compute_dtype="bfloat16"))
        x = jnp.asarray(rng_np.standard_normal((2, 16000)).astype(np.float32))
        v32 = model32.init(jax.random.key(0), x)
        v16 = model16.init(jax.random.key(0), x)
        assert jax.tree_util.tree_structure(v32) == jax.tree_util.tree_structure(v16)
        for a, b in zip(jax.tree.leaves(v32), jax.tree.leaves(v16)):
            assert a.dtype == b.dtype  # params stay f32 under the bf16 trunk
        e32 = model32.apply(v32, x)
        e16 = model16.apply(v16, x)
        assert e16.dtype == jnp.float32
        scale = float(jnp.max(jnp.abs(e32))) + 1e-6
        assert float(jnp.max(jnp.abs(e32 - e16))) / scale < 0.08

    def test_time_resolution_preserved_in_lfe(self, rng_np):
        """ECAPA2's LFE strides only the frequency axis — embeddings must be
        computable for any utterance length with frame count scaling in T."""
        model = ECAPA2(TINY)
        short = jnp.asarray(rng_np.standard_normal((1, 8000)).astype(np.float32))
        lng = jnp.asarray(rng_np.standard_normal((1, 24000)).astype(np.float32))
        variables = model.init(jax.random.key(0), short)
        assert model.apply(variables, short).shape == model.apply(variables, lng).shape

    def test_fwse_scales_frequencies(self, rng_np):
        blk = FwSEBlock(bottleneck=4)
        x = jnp.asarray(
            (np.abs(rng_np.standard_normal((2, 5, 6, 3))) + 1.0).astype(np.float32)
        )
        variables = blk.init(jax.random.key(0), x)
        y = blk.apply(variables, x)
        assert y.shape == x.shape
        # excitation is per-frequency: the ratio y/x is constant over (T, C)
        ratio = np.asarray(y / x)
        np.testing.assert_allclose(
            ratio, np.broadcast_to(ratio[:, :1, :, :1], ratio.shape), atol=1e-5
        )

    def test_converter_parity_with_torch_twin(self, rng_np):
        """Converted twin weights reproduce the flax forward from the mel
        features onward (the frontend is shared; the released TorchScript
        archive wraps the same trunk behind its own fbank)."""
        torch = pytest.importorskip("torch")

        from vibravox_tpu.ops.mel import log_mel_spectrogram

        twin = _torch_twin(TINY)
        # randomise BN affine + running stats so parity exercises them
        with torch.no_grad():
            for m in twin.modules():
                if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                    m.weight.copy_(torch.rand_like(m.weight) + 0.5)
                    m.bias.copy_(torch.randn_like(m.bias) * 0.1)
                    m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.2)
                    m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)
        twin.eval()
        sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
        variables = ecapa2_params_from_torchscript(sd, TINY)

        audio = rng_np.standard_normal((2, 16000)).astype(np.float32)
        ours = np.asarray(ECAPA2(TINY).apply(variables, jnp.asarray(audio)))

        feats = log_mel_spectrogram(jnp.asarray(audio), 16000, n_mels=TINY.n_mels)
        feats = np.asarray(feats - jnp.mean(feats, axis=1, keepdims=True))
        with torch.no_grad():
            theirs = twin(torch.from_numpy(feats)).numpy()
        scale = np.abs(theirs).max()
        np.testing.assert_allclose(ours, theirs, atol=2e-5 * max(scale, 1.0))

    def test_converter_rejects_unconsumed_keys(self):
        torch = pytest.importorskip("torch")
        twin = _torch_twin(TINY)
        sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
        sd["mystery.weight"] = np.zeros((1,), np.float32)
        with pytest.raises(ValueError, match="unconsumed"):
            ecapa2_params_from_torchscript(sd, TINY)

    def test_spkv_embedder_contract(self, rng_np):
        """Drops into the SPKV task's embedder slot: (B, T) -> (B, D)."""
        from vibravox_tpu.tasks.ecapa2_spkv import SPKVTask

        task = SPKVTask(sample_rate=16000, embedder=ECAPA2(TINY))
        state = task.init_state(jax.random.key(0), {})
        batch = {
            "sensor_a_audio": jnp.asarray(rng_np.standard_normal((2, 16000)).astype(np.float32)),
            "sensor_b_audio": jnp.asarray(rng_np.standard_normal((2, 16000)).astype(np.float32)),
        }
        out = task.eval_step(state, batch)
        assert out["cosine"].shape == (2,)
        assert out["euclidean"].shape == (2,)

    def test_spkv_task_loads_checkpoint_file(self, tmp_path, rng_np):
        """A torch ECAPA2 checkpoint on disk lights up the pretrained-embedder
        slot (the reference's ecapa2.py:38-40 load path)."""
        torch = pytest.importorskip("torch")
        from vibravox_tpu.tasks.ecapa2_spkv import SPKVTask

        twin = _torch_twin(TINY)
        path = tmp_path / "ecapa2_state.pt"
        torch.save(twin.state_dict(), path)

        task = SPKVTask(
            sample_rate=16000, embedder=ECAPA2(TINY), checkpoint_path=str(path)
        )
        state = task.init_state(jax.random.key(0), {})
        # converted (not random-init) params: embedding kernel must match
        np.testing.assert_allclose(
            np.asarray(state.params["params"]["embedding"]["kernel"]),
            twin.state_dict()["embedding.weight"].numpy().T,
            atol=1e-6,
        )
        batch = {
            "sensor_a_audio": jnp.asarray(rng_np.standard_normal((2, 8000)).astype(np.float32)),
            "sensor_b_audio": jnp.asarray(rng_np.standard_normal((2, 8000)).astype(np.float32)),
        }
        out = task.eval_step(state, batch)
        assert bool(jnp.all(jnp.isfinite(out["cosine"])))
