"""Checkpoint conversion between reference (PyTorch) and vibravox-tpu (flax).

The reference persists models as torch state dicts (HF hub safetensors /
Lightning checkpoints) with ``weight_norm`` parametrizations stored as
``...parametrizations.weight.original0`` (the per-channel gains g) and
``original1`` (the direction tensor v) — see
``vibravox/torch_modules/utils.py:4-9`` and the hub upload scripts
(``scripts/upload_eben_to_hub.py:17-20``).

This module converts those state dicts into this framework's flax param
pytrees (and back), handling the layout changes:

  * Conv1d weight      torch (out, in/g, k)  ->  flax WIO (k, in/g, out)
  * ConvTranspose1d    torch (in, out/g, k)  ->  stored unchanged
  * weight-norm g      torch (c, 1, 1)       ->  (c,)
  * PQMF filterbank weights are *designed*, not loaded (the design
    reproduces the reference's to ~1e-7), so they never appear in params.

State dicts are plain ``{name: np.ndarray}`` mappings, so the converters
work on safetensors, torch ``.pt`` files, or npz dumps alike.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

__all__ = [
    "eben_generator_params_from_torch",
    "eben_discriminator_params_from_torch",
    "eben_generator_params_to_torch",
    "infer_eben_hparams_from_torch",
    "load_torch_state_dict",
    "save_torch_state_dict",
]


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pt/.bin/.safetensors state dict into numpy arrays."""
    if str(path).endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.numpy() for k, v in obj.items()}


def _conv_kernel(sd: Mapping[str, np.ndarray], name: str) -> Dict[str, np.ndarray]:
    """Plain Conv1d: torch (out, in/g, k) -> {'kernel': WIO}."""
    w = np.asarray(sd[f"{name}.weight"])
    out = {"kernel": np.transpose(w, (2, 1, 0))}
    if f"{name}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{name}.bias"])
    return out


def _wn_conv(sd: Mapping[str, np.ndarray], name: str) -> Dict[str, np.ndarray]:
    """Weight-normed Conv1d -> {'kernel_v': WIO, 'kernel_g': (out,)}."""
    g = np.asarray(sd[f"{name}.parametrizations.weight.original0"]).reshape(-1)
    v = np.asarray(sd[f"{name}.parametrizations.weight.original1"])
    out = {"kernel_v": np.transpose(v, (2, 1, 0)), "kernel_g": g}
    if f"{name}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{name}.bias"])
    return out


def _wn_conv_transpose(sd: Mapping[str, np.ndarray], name: str) -> Dict[str, np.ndarray]:
    """Weight-normed ConvTranspose1d -> torch-layout v + (in,) gains."""
    g = np.asarray(sd[f"{name}.parametrizations.weight.original0"]).reshape(-1)
    v = np.asarray(sd[f"{name}.parametrizations.weight.original1"])
    out = {"kernel_v": v, "kernel_g": g}
    if f"{name}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{name}.bias"])
    return out


def _strip_prefix(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    if not prefix:
        return dict(sd)
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


# --------------------------------------------------------------------------- #
# EBEN generator
# --------------------------------------------------------------------------- #


def infer_eben_hparams_from_torch(sd: Mapping[str, np.ndarray]) -> Dict[str, int]:
    """Re-infer (m, n, p) from weight shapes like ``upload_eben_to_hub.py:17-20``."""
    m = int(sd["pqmf.analysis_weights"].shape[0])
    n = int(sd["pqmf.analysis_weights"].shape[2])
    p = int(sd["first_conv.weight"].shape[1])
    return {"m": m, "n": n, "p": p}


def _residual_unit(sd: Mapping[str, np.ndarray], name: str) -> Dict[str, Any]:
    return {
        "dilated_conv": _wn_conv(sd, f"{name}.dilated_conv"),
        "pointwise_conv": _wn_conv(sd, f"{name}.pointwise_conv"),
    }


def eben_generator_params_from_torch(sd: Mapping[str, np.ndarray], prefix: str = "") -> Dict[str, Any]:
    """Torch EBENGenerator state dict -> flax params (inner 'params' tree)."""
    sd = _strip_prefix(sd, prefix)
    params: Dict[str, Any] = {
        "first_conv": _conv_kernel(sd, "first_conv"),
        "last_conv": _conv_kernel(sd, "last_conv"),
        "latent_conv_0": _wn_conv(sd, "latent_conv.1"),
        "latent_conv_1": _wn_conv(sd, "latent_conv.3"),
    }
    for i in range(3):
        enc = {"conv": _wn_conv(sd, f"encoder_blocks.{i}.conv")}
        for j in range(3):
            enc[f"residual_{j}"] = _residual_unit(sd, f"encoder_blocks.{i}.residuals.{j}")
        params[f"enc_{i}"] = enc
        dec = {"conv_trans": _wn_conv_transpose(sd, f"decoder_blocks.{i}.conv_trans")}
        for j in range(3):
            dec[f"residual_{j}"] = _residual_unit(sd, f"decoder_blocks.{i}.residuals.{j}")
        params[f"dec_{i}"] = dec
    return {"params": params}


# --------------------------------------------------------------------------- #
# EBEN discriminator (multi-scales)
# --------------------------------------------------------------------------- #


def _melgan_params(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    # torch module list indices 0..6 map to conv_0..conv_6; stages 0..5 are
    # Sequential(pad?, conv, leaky) so the conv lives at index 1 (stage 0) or 0.
    out: Dict[str, Any] = {}
    out["conv_0"] = _wn_conv(sd, f"{prefix}discriminator.0.1")
    for i in range(1, 6):
        out[f"conv_{i}"] = _wn_conv(sd, f"{prefix}discriminator.{i}.0")
    out["conv_6"] = _wn_conv(sd, f"{prefix}discriminator.6")
    return out


def _eben_disc_params(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    out["conv_0"] = _wn_conv(sd, f"{prefix}discriminator.0.1")
    for i in range(1, 7):
        out[f"conv_{i}"] = _wn_conv(sd, f"{prefix}discriminator.{i}.0")
    out["conv_7"] = _wn_conv(sd, f"{prefix}discriminator.7")
    return out


def eben_discriminator_params_from_torch(sd: Mapping[str, np.ndarray], prefix: str = "") -> Dict[str, Any]:
    """Torch DiscriminatorEBENMultiScales state dict -> flax params."""
    sd = _strip_prefix(sd, prefix)
    params: Dict[str, Any] = {}
    for idx, dilation in enumerate((1, 2, 3)):
        params[f"pqmf_disc_{dilation}"] = _eben_disc_params(sd, f"pqmf_discriminators.{idx}.")
    params["melgan"] = _melgan_params(sd, "melgan_discriminator.")
    return {"params": params}


# --------------------------------------------------------------------------- #
# Export back to the reference's torch format (checkpoint round-trip)
# --------------------------------------------------------------------------- #


def eben_generator_params_to_torch(
    params: Mapping[str, Any], m: int = 4, n: int = 32
) -> Dict[str, np.ndarray]:
    """Flax EBENGenerator params -> reference torch state dict.

    Produces the exact tensor names/layouts the reference persists
    (incl. the frozen PQMF buffers), so exported checkpoints load in the
    PyTorch reference and on the hub (``upload_eben_to_hub.py`` flow).
    """
    from vibravox_tpu.ops.pqmf import design_pqmf_bank

    p = params["params"] if "params" in params else params
    sd: Dict[str, np.ndarray] = {}

    analysis, synthesis = design_pqmf_bank(m, n, 9.0)
    sd["pqmf.analysis_weights"] = analysis[:, None, :].astype(np.float32)
    sd["pqmf.synthesis_weights"] = synthesis[:, None, :].astype(np.float32)

    def put_conv(name: str, node: Mapping[str, np.ndarray]) -> None:
        sd[f"{name}.weight"] = np.transpose(np.asarray(node["kernel"]), (2, 1, 0))
        if "bias" in node:
            sd[f"{name}.bias"] = np.asarray(node["bias"])

    def put_wn(name: str, node: Mapping[str, np.ndarray]) -> None:
        g = np.asarray(node["kernel_g"])
        sd[f"{name}.parametrizations.weight.original0"] = g.reshape(-1, 1, 1)
        sd[f"{name}.parametrizations.weight.original1"] = np.transpose(
            np.asarray(node["kernel_v"]), (2, 1, 0)
        )
        if "bias" in node:
            sd[f"{name}.bias"] = np.asarray(node["bias"])

    def put_wn_trans(name: str, node: Mapping[str, np.ndarray]) -> None:
        g = np.asarray(node["kernel_g"])
        sd[f"{name}.parametrizations.weight.original0"] = g.reshape(-1, 1, 1)
        sd[f"{name}.parametrizations.weight.original1"] = np.asarray(node["kernel_v"])
        if "bias" in node:
            sd[f"{name}.bias"] = np.asarray(node["bias"])

    put_conv("first_conv", p["first_conv"])
    put_conv("last_conv", p["last_conv"])
    put_wn("latent_conv.1", p["latent_conv_0"])
    put_wn("latent_conv.3", p["latent_conv_1"])
    for i in range(3):
        put_wn(f"encoder_blocks.{i}.conv", p[f"enc_{i}"]["conv"])
        put_wn_trans(f"decoder_blocks.{i}.conv_trans", p[f"dec_{i}"]["conv_trans"])
        for j in range(3):
            for blk, key in ((f"encoder_blocks.{i}", f"enc_{i}"), (f"decoder_blocks.{i}", f"dec_{i}")):
                node = p[key][f"residual_{j}"]
                put_wn(f"{blk}.residuals.{j}.dilated_conv", node["dilated_conv"])
                put_wn(f"{blk}.residuals.{j}.pointwise_conv", node["pointwise_conv"])
    return sd


def save_torch_state_dict(sd: Dict[str, np.ndarray], path: str) -> None:
    """Persist a numpy state dict as torch ``.pt`` or ``.safetensors``."""
    if str(path).endswith(".safetensors"):
        from safetensors.numpy import save_file

        save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, path)
        return
    import torch

    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}, path)
