"""Reference-free neural quality metrics (SQUIM STOI / Noresqa-MOS).

The reference wraps torchaudio's pretrained SQUIM pipelines
(``metrics/torchsquim_stoi.py:38``, ``metrics/noresqa_mos.py:32``) — frozen
neural predictors of STOI (objective) and non-matching-reference MOS
(subjective).  The architectures are implemented natively in
``vibravox_tpu.models.squim`` (DPRNN objective model, NORESQA-MOS subjective
model) with torch-checkpoint converters; these classes reproduce the metric
interface (update / compute accumulation with the same names the SE eval
logs) on top of them.

Weights: the torchaudio pipeline checkpoints need network access.  Point
``VIBRAVOX_SQUIM_DIR`` (or the ``checkpoint_dir`` argument of
:func:`load_squim_predictors`) at a directory containing
``squim_objective.pt`` / ``squim_subjective.pt`` torch state dicts and the
metrics light up; without weights they raise a clear error instead of
returning fabricated numbers.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Callable, Optional, Tuple

import numpy as np

__all__ = [
    "TorchsquimSTOI",
    "NoresqaMOS",
    "MissingPretrainedPredictor",
    "load_squim_objective",
    "load_squim_subjective",
    "load_squim_predictors",
]


class MissingPretrainedPredictor(RuntimeError):
    pass


Predictor = Tuple[Callable, Any]


def _load_torch_state_dict(path: str | Path):
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return {k: np.asarray(v) for k, v in obj.items()}


def load_squim_objective(path: str | Path) -> Predictor:
    """Build a jitted (params, (B, T) audio) -> (B,) STOI predictor from a
    torchaudio ``SquimObjective`` checkpoint."""
    import jax
    import jax.numpy as jnp

    from vibravox_tpu.models.squim import (
        squim_objective_base,
        squim_objective_params_from_torch,
    )

    params = squim_objective_params_from_torch(_load_torch_state_dict(path))
    model = squim_objective_base()
    apply = jax.jit(lambda p, x: model.apply(p, x)[0])  # scores[0] == STOI
    return (lambda p, x: np.asarray(apply(p, jnp.asarray(x)))), params


def load_squim_subjective(path: str | Path) -> Predictor:
    """Build a jitted (params, estimate, non-matching ref) -> (B,) MOS
    predictor from a torchaudio ``SquimSubjective`` checkpoint."""
    import jax
    import jax.numpy as jnp

    from vibravox_tpu.models.squim import (
        squim_subjective_base,
        squim_subjective_params_from_torch,
    )

    params = squim_subjective_params_from_torch(_load_torch_state_dict(path))
    model = squim_subjective_base()
    apply = jax.jit(lambda p, e, r: model.apply(p, e, r))
    return (
        lambda p, e, r: np.asarray(apply(p, jnp.asarray(e), jnp.asarray(r)))
    ), params


def load_squim_predictors(
    checkpoint_dir: Optional[str | Path] = None,
) -> Tuple[Optional[Predictor], Optional[Predictor]]:
    """Load (objective, subjective) predictors from ``checkpoint_dir`` or
    ``$VIBRAVOX_SQUIM_DIR``; missing files yield ``None`` entries."""
    root = checkpoint_dir or os.environ.get("VIBRAVOX_SQUIM_DIR")
    if not root:
        return None, None
    root = Path(root)
    obj_path = root / "squim_objective.pt"
    subj_path = root / "squim_subjective.pt"
    objective = load_squim_objective(obj_path) if obj_path.exists() else None
    subjective = load_squim_subjective(subj_path) if subj_path.exists() else None
    return objective, subjective


class _AccumulatingMetric:
    def __init__(self, predictor: Optional[Predictor] = None):
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
                "(pass predictor=(apply_fn, params) or set VIBRAVOX_SQUIM_DIR)."
            )
        apply_fn, params = self.predictor
        # the reference flattens the batch (torchsquim_stoi.py:62)
        stoi = apply_fn(params, np.asarray(preds).reshape(1, -1))
        self.total += float(np.sum(stoi))
        self.count += int(np.size(stoi))

    def __call__(self, preds: np.ndarray) -> float:
        if self.predictor is None:
            raise MissingPretrainedPredictor("TorchsquimSTOI has no predictor")
        apply_fn, params = self.predictor
        batch = apply_fn(params, np.asarray(preds).reshape(1, -1))
        self.total += float(np.sum(batch))
        self.count += int(np.size(batch))
        return float(np.mean(batch))


class NoresqaMOS(_AccumulatingMetric):
    """Non-matching-reference MOS (torchaudio SQUIM_SUBJECTIVE equivalent)."""

    def __init__(self, sample_rate: int = 16000, predictor: Optional[Predictor] = None):
        super().__init__(predictor)
        assert sample_rate == 16000, "MOS predictor runs at 16 kHz"

    def update(self, preds: np.ndarray, non_matching_reference: np.ndarray) -> None:
        if self.predictor is None:
            raise MissingPretrainedPredictor(
                "NoresqaMOS requires the SQUIM subjective predictor weights "
                "(pass predictor=(apply_fn, params) or set VIBRAVOX_SQUIM_DIR)."
            )
        apply_fn, params = self.predictor
        mos = apply_fn(params, np.asarray(preds), np.asarray(non_matching_reference))
        self.total += float(np.sum(mos))
        self.count += int(np.size(mos))

    def __call__(self, preds: np.ndarray, non_matching_reference: np.ndarray) -> float:
        if self.predictor is None:
            raise MissingPretrainedPredictor("NoresqaMOS has no predictor")
        apply_fn, params = self.predictor
        mos = apply_fn(params, np.asarray(preds), np.asarray(non_matching_reference))
        self.total += float(np.sum(mos))
        self.count += int(np.size(mos))
        return float(np.mean(mos))
