"""Reference-free neural quality metrics (SQUIM STOI / Noresqa-MOS).

The reference wraps torchaudio's pretrained SQUIM pipelines
(``metrics/torchsquim_stoi.py:38``, ``metrics/noresqa_mos.py:32``) — frozen
neural predictors of STOI (objective) and non-matching-reference MOS
(subjective).  These classes reproduce the metric *interface* (update /
compute accumulation with the same names the SE eval logs) and run any
converted predictor supplied as ``(apply_fn, params)``.

Port status: the predictor networks require the torchaudio pretrained
weights, which need network access to obtain; on offline builds the metrics
raise a clear error when computed without a predictor rather than returning
fabricated numbers.  The intrusive STOI/SI-SDR metrics (``metrics/audio``)
cover the referenced eval paths meanwhile.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np

__all__ = ["TorchsquimSTOI", "NoresqaMOS", "MissingPretrainedPredictor"]


class MissingPretrainedPredictor(RuntimeError):
    pass


class _AccumulatingMetric:
    def __init__(self, predictor: Optional[Tuple[Callable, object]] = None):
        self.predictor = predictor
        self.total = 0.0
        self.count = 0

    def reset(self) -> None:
        self.total, self.count = 0.0, 0

    def compute(self) -> float:
        if self.count == 0:
            raise MissingPretrainedPredictor(
                f"{type(self).__name__} has no accumulated values — construct it "
                "with a converted SQUIM predictor (apply_fn, params) to enable "
                "reference-free evaluation."
            )
        return self.total / self.count


class TorchsquimSTOI(_AccumulatingMetric):
    """Reference-free STOI predictor (torchaudio SQUIM_OBJECTIVE equivalent)."""

    def update(self, preds: np.ndarray) -> None:
        if self.predictor is None:
            raise MissingPretrainedPredictor(
                "TorchsquimSTOI requires the SQUIM objective predictor weights "
                "(pass predictor=(apply_fn, params))."
            )
        apply_fn, params = self.predictor
        # the reference flattens the batch (torchsquim_stoi.py:62)
        stoi = apply_fn(params, np.asarray(preds).reshape(1, -1))
        self.total += float(np.sum(stoi))
        self.count += int(np.size(stoi))


class NoresqaMOS(_AccumulatingMetric):
    """Non-matching-reference MOS (torchaudio SQUIM_SUBJECTIVE equivalent)."""

    def __init__(self, sample_rate: int = 16000, predictor=None):
        super().__init__(predictor)
        assert sample_rate == 16000, "MOS predictor runs at 16 kHz"

    def update(self, preds: np.ndarray, non_matching_reference: np.ndarray) -> None:
        if self.predictor is None:
            raise MissingPretrainedPredictor(
                "NoresqaMOS requires the SQUIM subjective predictor weights "
                "(pass predictor=(apply_fn, params))."
            )
        apply_fn, params = self.predictor
        mos = apply_fn(params, np.asarray(preds), np.asarray(non_matching_reference))
        self.total += float(np.sum(mos))
        self.count += int(np.size(mos))
