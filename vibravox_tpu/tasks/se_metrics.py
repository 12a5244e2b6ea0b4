"""Shared speech-enhancement eval metrics (the reference's BaseSE logic).

Mirrors ``BaseSELightningModule.common_eval_logging``
(``lightning_modules/base_se.py:67-128``): metrics always computed at
16 kHz after resampling; with a reference signal, intrusive metrics
(STOI, SI-SDR); without one, the reference-free path (reference uses SQUIM
networks there — tracked as a port gap, the classical metrics stand in
until those weights are converted).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from vibravox_tpu.metrics.audio import si_sdr, stoi
from vibravox_tpu.ops.resample import resample

__all__ = ["SEMetrics"]


class SEMetrics:
    def __init__(self, sample_rate: int):
        self.sample_rate = sample_rate
        self.first_sample: Optional[np.ndarray] = None

    def _to_16k(self, audio: jnp.ndarray) -> jnp.ndarray:
        return resample(audio, self.sample_rate, 16000)

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
            if self.first_sample is None:
                # the reference keeps the first clean sample as the
                # non-matching reference for MOS on reference-free eval
                self.first_sample = reference16[:1]
        return metrics
