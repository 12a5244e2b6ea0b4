"""SQUIM predictor tests: shapes, dual-path chunking algebra, and full
converter + forward parity against a torch twin built from torch primitives
(LSTM / GroupNorm / TransformerEncoderLayer / PReLU), which pins every layer
semantics the torchaudio checkpoints will flow through."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vibravox_tpu.models.squim import (
    SquimObjective,
    SquimObjectiveConfig,
    SquimSubjective,
    SquimSubjectiveConfig,
    _chunk,
    _merge,
    squim_objective_params_from_torch,
    squim_subjective_params_from_torch,
)

TINY_OBJ = SquimObjectiveConfig(
    feat_dim=8, win_len=16, d_model=8, nhead=2, hidden_dim=8, num_blocks=1, chunk_size=7
)


class TestChunking:
    @pytest.mark.parametrize("t,chunk", [(100, 7), (71, 71), (256, 8), (33, 10)])
    def test_merge_of_chunk_is_double(self, t, chunk, rng_np):
        x = jnp.asarray(rng_np.standard_normal((2, t, 3)).astype(np.float32))
        chunks, gap = _chunk(x, chunk)
        merged = _merge(chunks, gap, chunk)
        assert merged.shape == x.shape
        np.testing.assert_allclose(np.asarray(merged), 2 * np.asarray(x), atol=1e-6)


class TestSquimObjectiveShapes:
    def test_forward_shapes_and_ranges(self, rng_np):
        model = SquimObjective(TINY_OBJ)
        x = jnp.asarray(rng_np.standard_normal((2, 1600)).astype(np.float32))
        params = model.init(jax.random.key(0), x)
        stoi, pesq, sisdr = model.apply(params, x)
        assert stoi.shape == pesq.shape == sisdr.shape == (2,)
        assert bool(jnp.all((stoi >= 0) & (stoi <= 1)))
        assert bool(jnp.all((pesq >= 1) & (pesq <= 4.5)))
        assert bool(jnp.all(jnp.isfinite(sisdr)))


def _torch_twin(cfg: SquimObjectiveConfig):
    """torch re-statement of the SquimObjective topology with torchaudio's
    state-dict naming (objective.py), used to validate the converter."""
    import torch
    import torch.nn as tnn

    class RangeSigmoid(tnn.Module):
        def __init__(self, lo=0.0, hi=1.0):
            super().__init__()
            self.lo, self.hi = lo, hi

        def forward(self, x):
            return torch.sigmoid(x) * (self.hi - self.lo) + self.lo

    class Encoder(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1d = tnn.Conv1d(1, cfg.feat_dim, cfg.win_len, stride=cfg.win_len // 2, bias=False)

        def forward(self, x):
            return torch.relu(self.conv1d(x.unsqueeze(1)))

    class SingleRNN(tnn.Module):
        def __init__(self):
            super().__init__()
            self.rnn = tnn.LSTM(cfg.feat_dim, cfg.hidden_dim, 1, batch_first=True, bidirectional=True)
            self.proj = tnn.Linear(cfg.hidden_dim * 2, cfg.feat_dim)

        def forward(self, x):
            out, _ = self.rnn(x)
            return self.proj(out)

    class AutoPool(tnn.Module):
        def __init__(self):
            super().__init__()
            self.alpha = tnn.Parameter(torch.ones(1))

        def forward(self, x):
            w = torch.softmax(x * self.alpha, dim=1)
            return torch.sum(x * w, dim=1)

    class DPRNN(tnn.Module):
        def __init__(self):
            super().__init__()
            self.row_rnn = tnn.ModuleList([SingleRNN() for _ in range(cfg.num_blocks)])
            self.col_rnn = tnn.ModuleList([SingleRNN() for _ in range(cfg.num_blocks)])
            self.row_norm = tnn.ModuleList(
                [tnn.GroupNorm(1, cfg.feat_dim, eps=1e-8) for _ in range(cfg.num_blocks)]
            )
            self.col_norm = tnn.ModuleList(
                [tnn.GroupNorm(1, cfg.feat_dim, eps=1e-8) for _ in range(cfg.num_blocks)]
            )
            self.conv = tnn.Sequential(tnn.Conv2d(cfg.feat_dim, cfg.d_model, 1), tnn.PReLU())
            self.chunk = cfg.chunk_size
            self.stride = cfg.chunk_size // 2

        def chunking(self, x):  # (B, N, T) -> (B, N, K, S)
            b, n, t = x.shape
            gap = (self.chunk - (self.stride + t % self.chunk) % self.chunk) % self.chunk
            x = torch.nn.functional.pad(x, (self.stride, self.stride + gap))
            c1 = x[:, :, : -self.stride].reshape(b, n, -1, self.chunk)
            c2 = x[:, :, self.stride :].reshape(b, n, -1, self.chunk)
            out = torch.cat([c1, c2], dim=3).reshape(b, n, -1, self.chunk).transpose(2, 3)
            return out, gap

        def merging(self, x, gap):  # (B, D, K, S) -> (B, D, T)
            b, d, k, s = x.shape
            x = x.transpose(2, 3).reshape(b, d, -1, 2 * self.chunk)
            o1 = x[:, :, :, : self.chunk].reshape(b, d, -1)[:, :, self.stride :]
            o2 = x[:, :, :, self.chunk :].reshape(b, d, -1)[:, :, : -self.stride]
            out = o1 + o2
            if gap > 0:
                out = out[:, :, :-gap]
            return out

        def forward(self, x):  # (B, N, T)
            chunks, gap = self.chunking(x)  # (B, N, K, S)
            b, n, k, s = chunks.shape
            out = chunks
            for i in range(cfg.num_blocks):
                row = out.permute(0, 3, 2, 1).reshape(b * s, k, n)
                row = self.row_rnn[i](row).reshape(b, s, k, n).permute(0, 3, 2, 1)
                out = out + self.row_norm[i](row)
                col = out.permute(0, 2, 3, 1).reshape(b * k, s, n)
                col = self.col_rnn[i](col).reshape(b, k, s, n).permute(0, 3, 1, 2)
                out = out + self.col_norm[i](col)
            out = self.conv(out)
            return self.merging(out, gap)  # (B, D, T)

    def branch(rng):
        layers = [
            tnn.Linear(cfg.d_model, cfg.d_model),
            tnn.PReLU(),
            tnn.Linear(cfg.d_model, 1),
        ]
        if rng is not None:
            layers.append(RangeSigmoid(*rng))
        return tnn.Sequential(
            tnn.TransformerEncoderLayer(
                cfg.d_model, cfg.nhead, 4 * cfg.d_model, dropout=0.0, batch_first=True
            ),
            AutoPool(),
            tnn.Sequential(*layers),
        )

    class Twin(tnn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = Encoder()
            self.dprnn = DPRNN()
            self.branches = tnn.ModuleList([branch(r) for _, r in cfg.branches])

        def forward(self, x):
            x = x / (torch.mean(x**2, dim=1, keepdim=True) ** 0.5 * 20.0)
            out = self.encoder(x)  # (B, N, T')
            out = self.dprnn(out)  # (B, D, T')
            out = out.transpose(1, 2)  # (B, T', D)
            return [br(out).squeeze(-1) for br in self.branches]

    return Twin()


class TestSquimObjectiveTorchParity:
    def test_converted_forward_matches_torch_twin(self, rng_np):
        torch = pytest.importorskip("torch")
        twin = _torch_twin(TINY_OBJ).eval()
        sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
        params = squim_objective_params_from_torch(sd, TINY_OBJ)

        model = SquimObjective(TINY_OBJ)
        x_np = rng_np.standard_normal((2, 1600)).astype(np.float32)
        ours = model.apply(params, jnp.asarray(x_np))
        with torch.no_grad():
            theirs = twin(torch.from_numpy(x_np))
        for o, t in zip(ours, theirs):
            np.testing.assert_allclose(np.asarray(o), t.numpy(), atol=2e-5)

    def test_converter_tree_matches_init(self, rng_np):
        import chex

        twin = _torch_twin(TINY_OBJ)
        sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
        params = squim_objective_params_from_torch(sd, TINY_OBJ)
        model = SquimObjective(TINY_OBJ)
        init = model.init(jax.random.key(0), jnp.zeros((1, 800), jnp.float32))
        chex.assert_trees_all_equal_shapes(params, init)


class TestSquimSubjective:
    def test_forward_shape(self, rng_np):
        from vibravox_tpu.models.wav2vec2 import TINY_W2V2_CONFIG, Wav2Vec2Config
        import dataclasses

        ssl_cfg = Wav2Vec2Config(**{**TINY_W2V2_CONFIG, "apply_spec_augment": False})
        cfg = SquimSubjectiveConfig(proj_dim=8, att_dim=8, ssl=ssl_cfg)
        model = SquimSubjective(cfg)
        est = jnp.asarray(rng_np.standard_normal((2, 4000)).astype(np.float32))
        ref = jnp.asarray(rng_np.standard_normal((2, 2500)).astype(np.float32))
        params = model.init(jax.random.key(0), est, ref)
        mos = model.apply(params, est, ref)
        assert mos.shape == (2,)
        assert bool(jnp.all(jnp.isfinite(mos)))

    def test_align_tiles_and_crops(self):
        model = SquimSubjective()
        est = jnp.zeros((1, 10))
        ref = jnp.asarray(np.arange(4, dtype=np.float32))[None]
        out = model._align(est, ref)
        np.testing.assert_array_equal(
            np.asarray(out)[0], [0, 1, 2, 3, 0, 1, 2, 3, 0, 1]
        )


def _subjective_twin_state_dict_and_oracle(cfg: SquimSubjectiveConfig):
    """torch twin of the torchaudio ``SquimSubjective`` (NORESQA-MOS) topology
    with torchaudio's state-dict naming (``ssl_model.*``, ``projector``,
    ``predictor.att_pool_layer.*``, ``predictor.mos_layer``).

    The SSL backbone is a real HF ``transformers.Wav2Vec2Model`` (the same
    oracle the wav2vec2 converter is pinned against), renamed to torchaudio's
    ``feature_extractor`` / ``encoder.feature_projection`` /
    ``encoder.transformer`` nesting — so the test exercises the full
    torchaudio->HF->flax renaming chain in ``squim_subjective_params_from_torch``.
    Returns ``(state_dict, oracle_fn)``.
    """
    import torch
    import torch.nn as tnn
    import transformers

    s = cfg.ssl
    hf_cfg = transformers.Wav2Vec2Config(
        vocab_size=1,
        hidden_size=s.hidden_size,
        num_hidden_layers=s.num_hidden_layers,
        num_attention_heads=s.num_attention_heads,
        intermediate_size=s.intermediate_size,
        conv_dim=list(s.conv_dim),
        conv_kernel=list(s.conv_kernel),
        conv_stride=list(s.conv_stride),
        num_conv_pos_embeddings=s.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=s.num_conv_pos_embedding_groups,
        do_stable_layer_norm=False,
        apply_spec_augment=False,
        layerdrop=0.0,
    )
    torch.manual_seed(0)
    ssl = transformers.Wav2Vec2Model(hf_cfg).eval()
    hidden = s.hidden_size
    projector = tnn.Linear(2 * hidden, cfg.proj_dim)
    att_lin1 = tnn.Linear(cfg.proj_dim, 1)
    att_lin2 = tnn.Linear(cfg.proj_dim, cfg.att_dim)
    mos_layer = tnn.Linear(cfg.att_dim, 1)

    def hf_to_torchaudio(k: str):
        if k == "masked_spec_embed":
            return None  # torchaudio's backbone has no spec-augment embed
        if k.startswith("feature_extractor."):
            return k
        if k.startswith("feature_projection."):
            return "encoder.feature_projection." + k[len("feature_projection."):]
        if k.startswith("encoder."):
            return "encoder.transformer." + k[len("encoder."):]
        raise AssertionError(f"unexpected HF wav2vec2 key {k}")

    sd = {}
    for k, v in ssl.state_dict().items():
        tk = hf_to_torchaudio(k)
        if tk is not None:
            sd[f"ssl_model.{tk}"] = v.detach().numpy()
    for name, mod in [
        ("projector", projector),
        ("predictor.att_pool_layer.linear1", att_lin1),
        ("predictor.att_pool_layer.linear2", att_lin2),
        ("predictor.mos_layer", mos_layer),
    ]:
        for pk, pv in mod.state_dict().items():
            sd[f"{name}.{pk}"] = pv.detach().numpy()

    def oracle(est_np, ref_np):
        with torch.no_grad():
            est = torch.from_numpy(est_np)
            ref = torch.from_numpy(ref_np)
            reps = -(-est.shape[1] // ref.shape[1])
            ref = ref.repeat(1, reps)[:, : est.shape[1]]
            fe = ssl(est).last_hidden_state
            fr = ssl(ref).last_hidden_state
            h = projector(torch.cat([fr, fe], dim=-1))
            att = torch.softmax(att_lin1(h).transpose(1, 2), dim=2)
            pooled = torch.bmm(att, h)[:, 0]
            return mos_layer(att_lin2(pooled))[:, 0].numpy()

    return sd, oracle


class TestSquimSubjectiveTorchParity:
    def test_converted_forward_matches_torch_twin(self, rng_np):
        pytest.importorskip("torch")
        pytest.importorskip("transformers")
        import dataclasses

        from vibravox_tpu.models.wav2vec2 import TINY_W2V2_CONFIG, Wav2Vec2Config

        ssl_cfg = Wav2Vec2Config(
            **{**TINY_W2V2_CONFIG, "vocab_size": 1},
            apply_spec_augment=False, layerdrop=0.0,
        )
        cfg = SquimSubjectiveConfig(proj_dim=8, att_dim=8, ssl=ssl_cfg)
        sd, oracle = _subjective_twin_state_dict_and_oracle(cfg)
        params = squim_subjective_params_from_torch(sd, cfg)

        model = SquimSubjective(cfg)
        est = rng_np.standard_normal((2, 4000)).astype(np.float32)
        ref = rng_np.standard_normal((2, 2500)).astype(np.float32)
        ours = np.asarray(model.apply(params, jnp.asarray(est), jnp.asarray(ref)))
        theirs = oracle(est, ref)
        np.testing.assert_allclose(ours, theirs, atol=2e-5)

    def test_converter_rejects_unknown_head_keys(self):
        pytest.importorskip("torch")
        pytest.importorskip("transformers")
        from vibravox_tpu.models.wav2vec2 import TINY_W2V2_CONFIG, Wav2Vec2Config

        ssl_cfg = Wav2Vec2Config(
            **{**TINY_W2V2_CONFIG, "vocab_size": 1},
            apply_spec_augment=False, layerdrop=0.0,
        )
        cfg = SquimSubjectiveConfig(proj_dim=8, att_dim=8, ssl=ssl_cfg)
        sd, _ = _subjective_twin_state_dict_and_oracle(cfg)
        sd["predictor.surprise.weight"] = np.zeros((1,), np.float32)
        with pytest.raises(ValueError, match="unconsumed"):
            squim_subjective_params_from_torch(sd, cfg)


class TestSEMetricsSquimIntegration:
    def test_reference_free_path_with_objective_checkpoint(self, tmp_path, rng_np):
        """End-to-end: a torch SquimObjective checkpoint on disk lights up
        torchsquim_stoi in the reference-free SE eval path (base_se.py:91-99)."""
        import torch

        from vibravox_tpu.models.squim import SquimObjectiveConfig
        from vibravox_tpu.tasks.se_metrics import SEMetrics

        twin = _torch_twin(SquimObjectiveConfig())  # base config, random weights
        torch.save(twin.state_dict(), tmp_path / "squim_objective.pt")

        se = SEMetrics(16000, squim_dir=str(tmp_path))
        enhanced = jnp.asarray(rng_np.standard_normal((2, 8000, 1)).astype(np.float32))
        out = se({"enhanced": enhanced})
        assert set(out) == {"torchsquim_stoi"}
        assert 0.0 <= out["torchsquim_stoi"] <= 1.0

        # referenced path: intrusive + squim metrics together (base_se.py:82-90)
        ref = jnp.asarray(rng_np.standard_normal((2, 8000, 1)).astype(np.float32))
        out2 = se({"enhanced": enhanced, "reference": ref})
        assert {"torchmetrics_si_sdr", "torchmetrics_stoi", "torchsquim_stoi"} <= set(out2)

    def test_mos_path_with_subjective_checkpoint(self, tmp_path, rng_np):
        """End-to-end: a torch SquimSubjective checkpoint on disk lights up
        noresqa_mos in both SE eval paths (base_se.py:88-104)."""
        import torch

        from vibravox_tpu.tasks.se_metrics import SEMetrics

        sd, _ = _subjective_twin_state_dict_and_oracle(SquimSubjectiveConfig())
        torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
                   tmp_path / "squim_subjective.pt")

        se = SEMetrics(16000, squim_dir=str(tmp_path))
        enhanced = jnp.asarray(rng_np.standard_normal((1, 8000, 1)).astype(np.float32))
        ref = jnp.asarray(rng_np.standard_normal((1, 8000, 1)).astype(np.float32))
        out = se({"enhanced": enhanced, "reference": ref})
        assert "noresqa_mos" in out and np.isfinite(out["noresqa_mos"])
        # reference-free path reuses the stored first clean batch as the
        # non-matching reference (base_se.py:91-104)
        out2 = se({"enhanced": enhanced})
        assert "noresqa_mos" in out2 and np.isfinite(out2["noresqa_mos"])

    def test_no_weights_degrades_gracefully(self, rng_np):
        from vibravox_tpu.tasks.se_metrics import SEMetrics

        se = SEMetrics(16000, squim_dir=None)
        enhanced = jnp.asarray(rng_np.standard_normal((1, 4000, 1)).astype(np.float32))
        assert se({"enhanced": enhanced}) == {}
