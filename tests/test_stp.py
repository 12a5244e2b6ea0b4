"""STP stack tests: phoneme tokenizer, collate, CTC task steps, PER metric."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import optax

transformers = pytest.importorskip("transformers")

from vibravox_tpu.data.phonemes import build_phoneme_tokenizer
from vibravox_tpu.data.stp import STPDataModule
from vibravox_tpu.metrics.text import (
    char_error_rate,
    decode_operations,
    levenshtein_editops,
    split_editops,
)
from vibravox_tpu.models.wav2vec2 import wav2vec2_for_ctc_from_config
from vibravox_tpu.tasks.wav2vec2_stp import Wav2Vec2STPTask


class TestPhonemeTokenizer:
    def test_vocab_contract(self):
        tok = build_phoneme_tokenizer()
        # the reference asserts pad 35 / vocab 38 (wav2vec2_for_stp.py:228-249)
        assert tok.pad_token_id == 35
        assert len(tok) == 38

    def test_round_trip(self):
        tok = build_phoneme_tokenizer()
        text = "bɔ̃ʒuʁ lə mɔ̃d"
        ids = tok(text).input_ids
        decoded = tok.decode(ids)
        assert decoded == text


class TestTextMetrics:
    def test_cer_zero_and_total(self):
        assert char_error_rate(["abc"], ["abc"]) == 0.0
        assert char_error_rate([""], ["abc"]) == 1.0

    def test_cer_known_value(self):
        # one substitution over 4 target chars
        assert char_error_rate(["abcd"], ["abxd"]) == 0.25

    def test_editops_roundtrip(self):
        ops = levenshtein_editops("kitten", "sitting")
        assert len(ops) == 3  # classic distance
        decoded = decode_operations("kitten", "sitting", ops)
        assert all(len(t) == 3 for t in decoded)

    def test_split_editops(self):
        pred, target = "ab cd", "ab ce"
        ops = levenshtein_editops(pred, target)
        before, in_word, all_ops = split_editops(pred, target, ops)
        assert len(before) + len(in_word) == len(all_ops)


@pytest.fixture(scope="module")
def stp_datamodule():
    dm = STPDataModule(
        dataset_name_principal="synthetic",
        batch_size=2,
        synthetic_size=4,
        tokenizer=build_phoneme_tokenizer(),
    )
    dm.setup("fit")
    dm.setup("test")
    return dm


class TestSTPDataModule:
    def test_collate_shapes(self, stp_datamodule):
        batch = next(iter(stp_datamodule.train_dataloader()))
        assert batch["audio"].ndim == 2
        assert batch["audio"].shape[1] % 128 == 0
        assert batch["phonemes_ids"].shape[1] % 128 == 0
        assert len(batch["phonemes_str"]) == 2
        # padded label positions are -100 (ref stp.py:249)
        assert (batch["phonemes_ids"] == -100).any()

    def test_tokenizer_bijection_through_collate(self, stp_datamodule):
        batch = next(iter(stp_datamodule.test_dataloader()))
        ids = batch["phonemes_ids"][0]
        ids = ids[ids != -100]
        decoded = stp_datamodule.tokenizer.decode(ids, group_tokens=False)
        assert decoded == batch["phonemes_str"][0]


@pytest.fixture(scope="module")
def stp_task(stp_datamodule):
    model = wav2vec2_for_ctc_from_config(preset="tiny")
    return Wav2Vec2STPTask(
        wav2vec2_for_ctc=model,
        optimizer=optax.adam(1e-3),
        tokenizer=stp_datamodule.tokenizer,
    )


class TestSTPTask:
    def test_train_step_and_loss_decreases(self, stp_task, stp_datamodule):
        from vibravox_tpu.parallel.mesh import DataParallel

        dp = DataParallel(stp_task, donate_state=False)
        batch = next(iter(stp_datamodule.train_dataloader()))
        state = dp.init_state(jax.random.key(0), batch)
        losses = []
        for _ in range(6):
            state, logs = dp.train_step(state, batch)
            losses.append(float(logs["train/ctc_loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

    def test_eval_step_and_per(self, stp_task, stp_datamodule):
        from vibravox_tpu.parallel.mesh import DataParallel

        dp = DataParallel(stp_task, donate_state=False)
        batch = next(iter(stp_datamodule.test_dataloader()))
        state = dp.init_state(jax.random.key(0), batch)
        outputs = dp.eval_step(state, batch)
        assert "predictions" in outputs and "host" in outputs
        metrics = stp_task.eval_metrics(outputs)
        assert "char_error_rate" in metrics
        assert metrics["char_error_rate"] >= 0


class TestPackedFeatureConv:
    """The space-to-depth matmul fast path of the feature-encoder convs
    (models/wav2vec2.py::_FeatureConv) must match the plain XLA strided
    conv exactly — values AND gradients (the encoder trains when
    freeze_feature_encoder=False), at every (kernel, stride) in the
    wav2vec2 stack and at non-divisible input lengths."""

    @pytest.mark.parametrize(
        "kernel,stride,cin,t",
        [
            (10, 5, 1, 2000),   # conv_0: waveform input
            (10, 5, 1, 1998),   # T not divisible by the stride
            (3, 2, 8, 321),     # conv_1..4 shape class, odd T
            (2, 2, 8, 101),     # conv_5..6: kernel == stride
        ],
    )
    def test_matches_plain_conv_and_grads(self, kernel, stride, cin, t, monkeypatch):
        from vibravox_tpu.models.wav2vec2 import _FeatureConv

        mod = _FeatureConv(
            features=16, kernel_size=kernel, stride=stride, use_bias=True, dtype=None
        )
        x = jax.random.normal(jax.random.key(0), (2, t, cin), jnp.float32)
        params = mod.init(jax.random.key(1), x)

        def run(flag):
            monkeypatch.setenv("VIBRAVOX_PACKED_W2V2", flag)
            loss = lambda p, x: jnp.sum(jnp.tanh(mod.apply(p, x)))
            val, grads = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
            return val, grads

        v_packed, g_packed = run("1")
        v_plain, g_plain = run("0")
        assert np.allclose(v_packed, v_plain, rtol=1e-6, atol=1e-5)
        # dW sums hundreds of products in a different order than the conv
        # lowering — tolerance covers f32 accumulation noise only (measured
        # max abs diff 3e-5 on grads of magnitude ~200)
        for a, b in zip(jax.tree.leaves(g_packed), jax.tree.leaves(g_plain)):
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-4)

    def test_param_tree_matches_nn_conv(self):
        """Checkpoint compatibility: same names/shapes as the nn.Conv tree
        the converters (wav2vec2_params_from_torch) were built against."""
        from vibravox_tpu.models.wav2vec2 import _FeatureConv
        import flax.linen as nn

        x = jnp.zeros((1, 50, 4))
        new = _FeatureConv(
            features=8, kernel_size=3, stride=2, use_bias=True, dtype=None
        ).init(jax.random.key(0), x)
        old = nn.Conv(
            8, (3,), strides=(2,), padding="VALID", use_bias=True
        ).init(jax.random.key(0), x)
        assert jax.tree.structure(new) == jax.tree.structure(old)
        for a, b in zip(jax.tree.leaves(new), jax.tree.leaves(old)):
            assert a.shape == b.shape and a.dtype == b.dtype


class TestBatchedPosConv:
    """grouped_conv1d_batched (opt-in VIBRAVOX_POSCONV_BATCHED, reachable in
    training via models/wav2vec2.py) is claimed bitwise-identical to the
    plain grouped conv — pin values AND grads against _conv1d_raw at the
    pos-conv shape class (k=128, g=16), the fused-vs-naive tripwire
    convention every other packed path follows (TestPackedFeatureConv)."""

    @pytest.mark.parametrize("k,groups,dim,t", [(128, 16, 768, 96), (5, 4, 32, 40)])
    def test_matches_plain_grouped_conv_and_grads(self, k, groups, dim, t):
        from vibravox_tpu.ops.conv import _conv1d_raw, grouped_conv1d_batched

        key = jax.random.key(0)
        x = jax.random.normal(key, (2, t, dim), jnp.float32)
        w = jax.random.normal(jax.random.key(1), (k, dim // groups, dim)) * 0.05
        pad = (k // 2, k // 2)

        def loss(fn):
            return lambda x, w: jnp.sum(jnp.tanh(fn(x, w)))

        batched = loss(lambda x, w: grouped_conv1d_batched(x, w, pad, groups))
        plain = loss(lambda x, w: _conv1d_raw(x, w, 1, pad, 1, groups))

        v_b, g_b = jax.jit(jax.value_and_grad(batched, argnums=(0, 1)))(x, w)
        v_p, g_p = jax.jit(jax.value_and_grad(plain, argnums=(0, 1)))(x, w)
        # forward outputs are bitwise identical (measured, round 4); the loss
        # reduction and tanh keep that exactness at f32
        np.testing.assert_array_equal(np.asarray(v_b), np.asarray(v_p))
        # grads: dW/dx lower through different conv transposes (different
        # f32 accumulation order) — tight tolerance, not bitwise
        for a, b in zip(jax.tree.leaves(g_b), jax.tree.leaves(g_p)):
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-4)


class TestNativeCTC:
    """ops/ctc.py must reproduce optax.ctc_loss exactly (value and grad),
    including repeated labels, label padding, frame padding, and every
    unroll factor (unroll is a scan scheduling knob, not a math change)."""

    def _random_case(self, seed, b=3, t=37, k=11, n=9):
        rng = np.random.default_rng(seed)
        logits = jnp.asarray(rng.standard_normal((b, t, k)).astype(np.float32))
        labels = rng.integers(1, k, size=(b, n))
        labels[0, 2] = labels[0, 3]  # force a repeat (blank-mandatory path)
        lab_lens = rng.integers(2, n + 1, size=(b,))
        label_paddings = (np.arange(n)[None] >= lab_lens[:, None]).astype(np.float32)
        labels = np.where(label_paddings > 0, 0, labels)
        frame_lens = rng.integers(t - 5, t + 1, size=(b,))
        logit_paddings = (np.arange(t)[None] >= frame_lens[:, None]).astype(np.float32)
        return (
            logits,
            jnp.asarray(logit_paddings),
            jnp.asarray(labels),
            jnp.asarray(label_paddings),
        )

    @pytest.mark.parametrize("unroll", [1, 4, 8])
    def test_matches_optax_value_and_grad(self, unroll):
        from vibravox_tpu.ops.ctc import ctc_loss

        args = self._random_case(0)

        def mine(logits):
            return jnp.sum(ctc_loss(logits, *args[1:], blank_id=0, unroll=unroll))

        def theirs(logits):
            return jnp.sum(optax.ctc_loss(logits, *args[1:], blank_id=0))

        v1, g1 = jax.value_and_grad(mine)(args[0])
        v0, g0 = jax.value_and_grad(theirs)(args[0])
        np.testing.assert_allclose(v1, v0, rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(g1, g0, rtol=1e-5, atol=1e-6)

    def test_nonzero_blank_id(self):
        from vibravox_tpu.ops.ctc import ctc_loss

        logits, lp, labels, labp = self._random_case(1)
        labels = jnp.where(labels == 5, 6, labels)  # keep blank out of targets
        mine = ctc_loss(logits, lp, labels, labp, blank_id=5)
        ref = optax.ctc_loss(logits, lp, labels, labp, blank_id=5)
        np.testing.assert_allclose(mine, ref, rtol=1e-6, atol=1e-6)
