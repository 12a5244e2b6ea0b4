"""STP stack tests: phoneme tokenizer, collate, CTC task steps, PER metric."""

import jax
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
