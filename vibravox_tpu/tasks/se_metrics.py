"""Shared speech-enhancement eval metrics (the reference's BaseSE logic).

Mirrors ``BaseSELightningModule.common_eval_logging``
(``lightning_modules/base_se.py:67-128``): metrics always computed at
16 kHz after resampling.

* with a reference signal: intrusive metrics (STOI, SI-SDR) plus — when the
  SQUIM predictor weights are available — torchsquim_stoi on the enhanced
  signal and noresqa_mos against the true reference; the first clean batch
  is kept as the non-matching reference for later reference-free eval
  (``base_se.py:88-90``);
* without one (real noisy speech): torchsquim_stoi always, noresqa_mos
  against the stored first clean sample (``base_se.py:91-104``).

SQUIM predictors are loaded from ``$VIBRAVOX_SQUIM_DIR`` (see
``vibravox_tpu.metrics.squim.load_squim_predictors``); when absent the
reference-free path degrades to whatever is computable instead of raising.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from vibravox_tpu.metrics.audio import si_sdr, stoi
from vibravox_tpu.metrics.squim import NoresqaMOS, TorchsquimSTOI, load_squim_predictors
from vibravox_tpu.ops.resample import resample

__all__ = ["SEMetrics"]


class SEMetrics:
    def __init__(self, sample_rate: int, squim_dir: Optional[str] = None):
        self.sample_rate = sample_rate
        self.first_sample: Optional[np.ndarray] = None
        objective, subjective = load_squim_predictors(squim_dir)
        self.squim_stoi = TorchsquimSTOI(objective) if objective else None
        self.noresqa_mos = NoresqaMOS(predictor=subjective) if subjective else None

    def _to_16k(self, audio: jnp.ndarray) -> jnp.ndarray:
        return resample(audio, self.sample_rate, 16000, window="hann")

    def __call__(self, outputs: Dict[str, jnp.ndarray]) -> Dict[str, float]:
        """outputs: dict with 'enhanced' (B, T, 1) and optionally 'reference'."""
        enhanced16 = np.asarray(self._to_16k(outputs["enhanced"]))[:, :, 0]
        metrics: Dict[str, float] = {}
        if "reference" in outputs:
            reference16 = np.asarray(self._to_16k(outputs["reference"]))[:, :, 0]
            metrics["torchmetrics_si_sdr"] = float(
                si_sdr(jnp.asarray(enhanced16), jnp.asarray(reference16))
            )
            metrics["torchmetrics_stoi"] = float(
                np.mean([
                    stoi(r, e, fs=16000) for r, e in zip(reference16, enhanced16)
                ])
            )
            if self.squim_stoi is not None:
                metrics["torchsquim_stoi"] = self.squim_stoi(enhanced16)
            if self.noresqa_mos is not None:
                metrics["noresqa_mos"] = self.noresqa_mos(enhanced16, reference16)
            if self.first_sample is None:
                # the reference keeps the first clean batch as the
                # non-matching reference for reference-free MOS
                self.first_sample = reference16
        else:
            # reference-free path (base_se.py:91-104)
            if self.squim_stoi is not None:
                metrics["torchsquim_stoi"] = self.squim_stoi(enhanced16)
            if self.noresqa_mos is not None and self.first_sample is not None:
                nmr = self.first_sample
                if nmr.shape[0] != enhanced16.shape[0]:
                    reps = -(-enhanced16.shape[0] // nmr.shape[0])
                    nmr = np.tile(nmr, (reps, 1))[: enhanced16.shape[0]]
                metrics["noresqa_mos"] = self.noresqa_mos(enhanced16, nmr)
        return metrics
