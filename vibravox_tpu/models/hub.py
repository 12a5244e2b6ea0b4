"""Hugging Face Hub integration: pretrained load + export.

The reference attaches ``PyTorchModelHubMixin`` to its models
(``eben_generator.py:89-92``, ``eben_discriminator.py:10``) giving
``from_pretrained`` / ``push_to_hub``.  This module provides the same
surface against the *reference's torch weight format* so the published
``Cnam-LMSSC/EBEN_*`` checkpoints load directly into the flax models, and
locally-trained flax checkpoints export back to hub-compatible files.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Optional, Tuple

import numpy as np

from vibravox_tpu.models.convert import (
    eben_discriminator_params_from_torch,
    eben_generator_params_from_torch,
    eben_generator_params_to_torch,
    infer_eben_hparams_from_torch,
    load_torch_state_dict,
    save_torch_state_dict,
)

__all__ = [
    "eben_generator_from_pretrained",
    "eben_discriminator_from_pretrained",
    "save_eben_generator",
    "push_eben_generator_to_hub",
]

_WEIGHT_CANDIDATES = ("model.safetensors", "pytorch_model.bin", "model.pt")


def _resolve_weights(repo_or_path: str) -> str:
    path = Path(repo_or_path)
    if path.is_file():
        return str(path)
    if path.is_dir():
        for name in _WEIGHT_CANDIDATES:
            if (path / name).exists():
                return str(path / name)
        raise FileNotFoundError(f"no weight file under {path}")
    # hub repo id
    from huggingface_hub import hf_hub_download

    last_err: Optional[Exception] = None
    for name in _WEIGHT_CANDIDATES:
        try:
            return hf_hub_download(repo_or_path, name)
        except Exception as e:  # noqa: BLE001 — try the next filename
            last_err = e
    raise last_err  # type: ignore[misc]


def eben_generator_from_pretrained(repo_or_path: str):
    """Load an EBEN generator from a hub repo id, local dir or weight file.

    Returns ``(model, params)`` with hparams (m, n, p) re-inferred from the
    weight shapes like the reference's upload script
    (``upload_eben_to_hub.py:17-20``).
    """
    from vibravox_tpu.models.eben_generator import EBENGenerator

    sd = load_torch_state_dict(_resolve_weights(repo_or_path))
    hparams = infer_eben_hparams_from_torch(sd)
    return EBENGenerator(**hparams), eben_generator_params_from_torch(sd)


def eben_discriminator_from_pretrained(repo_or_path: str, q: int = 4, min_channels: int = 24):
    from vibravox_tpu.models.eben_discriminator import DiscriminatorEBENMultiScales

    sd = load_torch_state_dict(_resolve_weights(repo_or_path))
    return (
        DiscriminatorEBENMultiScales(q=q, min_channels=min_channels),
        eben_discriminator_params_from_torch(sd),
    )


_MODEL_CARD = """---
language: fr
license: mit
tags:
  - audio
  - audio-to-audio
  - speech
datasets:
  - Cnam-LMSSC/vibravox
model-index:
  - name: EBEN(M={m},P={p},Q=?)
    results:
      - task:
          name: Bandwidth Extension
          type: speech-enhancement
        dataset:
          name: Vibravox["{sensor}"]
          type: Cnam-LMSSC/vibravox
          args: fr
        metrics:
          - name: Test STOI, in-domain training
            type: stoi
            value: {stoi}
---

# EBEN(M={m},P={p}) — trained with vibravox-tpu

Bandwidth-extension model for body-conduction sensor speech, trained with the
TPU-native vibravox-tpu framework. Weights are stored in the reference
PyTorch layout and load in both frameworks:

```python
# vibravox-tpu (JAX)
from vibravox_tpu.models.hub import eben_generator_from_pretrained
model, params = eben_generator_from_pretrained("THIS_REPO")
enhanced, bands = model.apply(params, model.cut_to_valid_length(audio_16k))
```
"""


def save_eben_generator(
    params: Any, save_dir: str, m: int = 4, n: int = 32, p: int = 2,
    sensor: str = "YOUR_MIC", test_stoi: Any = "???",
) -> str:
    """Write hub-layout files (safetensors + config.json + model card)."""
    out = Path(save_dir)
    out.mkdir(parents=True, exist_ok=True)
    sd = eben_generator_params_to_torch(params, m=m, n=n)
    weights = out / "model.safetensors"
    try:
        save_torch_state_dict(sd, str(weights))
    except ImportError:
        weights = out / "pytorch_model.bin"
        save_torch_state_dict(sd, str(weights))
    (out / "config.json").write_text(json.dumps({"m": m, "n": n, "p": p}))
    (out / "README.md").write_text(
        _MODEL_CARD.format(m=m, p=p, sensor=sensor, stoi=test_stoi)
    )
    return str(weights)


def push_eben_generator_to_hub(
    params: Any, repo_id: str, m: int = 4, n: int = 32, p: int = 2,
    commit_message: str = "Upload EBENGenerator",
) -> None:
    """Export + upload (requires network + HF token, like the reference's
    ``push_to_hub_after_testing`` — ``eben.py:177-182``)."""
    import tempfile

    from huggingface_hub import HfApi

    with tempfile.TemporaryDirectory() as tmp:
        save_eben_generator(params, tmp, m=m, n=n, p=p)
        HfApi().upload_folder(
            repo_id=repo_id, folder_path=tmp, commit_message=commit_message
        )
