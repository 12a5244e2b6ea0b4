"""Weights-day runbook: one command from network access to real-data parity.

Every scientific output that still runs on random weights (SPKV EER, SQUIM
MOS/STOI, Mimi regressive BWE — see PARITY.md "network-gated") becomes real
the day the hub is reachable.  This script is that day's single command:

    python -m vibravox_tpu.scripts.weights_day --stage all

1. ``fetch``   — download every pretrained checkpoint the reference uses:
   EBEN generators (``Cnam-LMSSC/EBEN_<sensor>``, ref
   ``scripts/eben_enhanced_vibravox.py:7-11``), phonemizers
   (``Cnam-LMSSC/phonemizer_<sensor>``, ref ``upload_phonemizer_to_hub.py:41``),
   ECAPA2 (``Jenthe/ECAPA2`` TorchScript, ref ``lightning_modules/ecapa2.py:38``),
   SQUIM objective+subjective (torchaudio pipelines, ref
   ``metrics/torchsquim_stoi.py:4`` / ``noresqa_mos.py:4``), and Mimi
   (``kyutai/mimi`` HF format, ref ``regressive_mimi.py:24-30``).
2. ``convert`` — run every converter with its fail-loudly checks (each one
   raises with a full key inventory on schema drift) and a jitted forward
   smoke test; stage the artifacts where the tasks ingest them
   (``$VIBRAVOX_ECAPA2_CKPT``, ``$VIBRAVOX_SQUIM_DIR``, task
   ``pretrained_path`` knobs).
3. ``parity``  — execute the five BASELINE.md parity configs through
   ``run.py`` and write the real-data metric table to ``REAL_DATA.md``.

``--offline-dry-run`` proves the whole pipeline TODAY, with no network: it
synthesizes donor checkpoints in the exact on-disk formats (torch state
dicts exported from our own models for EBEN/phonemizer, a random tiny HF
``MimiModel``, the self-authored torch twins from ``tests/`` for
ECAPA2/SQUIM), then runs the same ``convert`` stage and a compose-and
-instantiate validation of all five parity configs.  CI runs it
(``tests/test_scripts.py``), so the runbook cannot rot.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path
from typing import Callable, Dict, List, Optional

SENSORS = (
    "forehead_accelerometer",
    "rigid_in_ear_microphone",
    "soft_in_ear_microphone",
    "throat_microphone",
    "temple_vibration_pickup",
)

# the five real-data parity configs from BASELINE.md ("Parity configs")
PARITY_CONFIGS: List[Dict] = [
    {
        "name": "spkv_ecapa2_eval",
        "metric_keys": ["test/equal_error_rate", "test/minimum_dcf"],
        "overrides": [
            "lightning_datamodule=spkv",
            "lightning_module=ecapa2",
            "lightning_datamodule.sensor_a=headset_microphone",
            "lightning_datamodule.sensor_b=headset_microphone",
        ],
        "needs": ["ecapa2"],
        "synthetic": "lightning_datamodule.dataset_name=synthetic",
        # the one config the offline dry run EXECUTES through the real
        # ``run_module.main`` branch (env-var weight staging, fit/test,
        # metric-key extraction, REAL_DATA.md row — round-4 verdict: the
        # day-of-network code path must have run once before it matters).
        # tiny embedder = the donor twin's geometry, so the staged
        # $VIBRAVOX_ECAPA2_CKPT loads through the production checkpoint slot.
        "dryrun_execute": [
            "++lightning_module.embedder._target_=vibravox_tpu.models.ecapa2.ecapa2_from_config",
            "++lightning_module.embedder.preset=tiny",
            "++trainer.limit_test_batches=8",
        ],
    },
    {
        "name": "stp_wav2vec2_throat",
        "metric_keys": ["test/per"],
        "overrides": [
            "lightning_datamodule=stp",
            "lightning_module=wav2vec2_for_stp",
            "lightning_datamodule.sensor=throat_microphone",
            "++trainer.max_epochs=10",
        ],
        "needs": ["phonemizer_throat_microphone"],
        "synthetic": "lightning_datamodule.dataset_name_principal=synthetic",
        # offline instantiation: the production default pulls the pretrained
        # HF base config from the hub
        "dryrun_overrides": [
            "lightning_module/dnn_module@lightning_module.wav2vec2_for_ctc=wav2vec2_for_ctc_tiny",
        ],
    },
    {
        "name": "bwe_eben_throat",
        "metric_keys": ["test/stoi", "test/si_sdr"],
        "overrides": [
            "lightning_datamodule=bwe",
            "lightning_module=eben",
            "lightning_datamodule.sensor=throat_microphone",
        ],
        "needs": [],
        "synthetic": "lightning_datamodule.dataset_name_principal=synthetic",
    },
    {
        "name": "noisy_bwe_from_pretrained_eben",
        "metric_keys": ["test/stoi"],
        "overrides": [
            "lightning_datamodule=noisybwe",
            "lightning_module=eben",
            "lightning_datamodule.sensor=temple_vibration_pickup",
        ],
        "needs": ["eben_temple_vibration_pickup"],
        "synthetic": "lightning_datamodule.dataset_name=synthetic",
    },
    {
        "name": "mimi_regressive_bwe",
        "metric_keys": ["test/stoi"],
        "overrides": [
            "lightning_datamodule=bwe",
            "lightning_module=regressive_mimi",
            "lightning_datamodule.sample_rate=24000",
            "lightning_datamodule.batch_size=16",
        ],
        "needs": ["mimi"],
        "synthetic": "lightning_datamodule.dataset_name_principal=synthetic",
        # full-size Mimi init is minutes on a 1-core CPU host; the tiny
        # preset validates the identical config/instantiation surface
        "dryrun_overrides": ["++lightning_module.mimi.preset=tiny"],
    },
]


def _log(msg: str) -> None:
    print(f"[weights-day] {msg}", flush=True)


# --------------------------------------------------------------------- #
# fetch
# --------------------------------------------------------------------- #


def stage_fetch(cache: Path) -> None:
    """Download every artifact.  Fails per-artifact with an actionable
    message; already-downloaded artifacts are skipped (hub cache)."""
    os.environ.pop("HF_HUB_OFFLINE", None)
    os.environ.pop("HF_DATASETS_OFFLINE", None)
    from huggingface_hub import hf_hub_download, snapshot_download

    raw = cache / "raw"
    raw.mkdir(parents=True, exist_ok=True)
    failures = []

    def attempt(name: str, fn: Callable[[], None]) -> None:
        try:
            fn()
            _log(f"fetch {name}: ok")
        except Exception as e:  # noqa: BLE001 — report all, then fail once
            failures.append((name, repr(e)))
            _log(f"fetch {name}: FAILED ({e})")

    for sensor in SENSORS:
        attempt(
            f"eben_{sensor}",
            lambda s=sensor: snapshot_download(
                f"Cnam-LMSSC/EBEN_{s}", local_dir=raw / f"eben_{s}"
            ),
        )
        attempt(
            f"phonemizer_{sensor}",
            lambda s=sensor: snapshot_download(
                f"Cnam-LMSSC/phonemizer_{s}", local_dir=raw / f"phonemizer_{s}"
            ),
        )
    attempt(
        "ecapa2",
        lambda: hf_hub_download(
            "Jenthe/ECAPA2", "ecapa2.pt", local_dir=raw / "ecapa2"
        ),
    )
    attempt("mimi", lambda: snapshot_download("kyutai/mimi", local_dir=raw / "mimi"))

    def fetch_squim_direct() -> None:
        # torchaudio is not installed here; its SQUIM pipelines resolve to
        # plain download URLs — fetch the state dicts directly
        from torch.hub import download_url_to_file

        base = "https://download.pytorch.org/torchaudio/models"
        (raw / "squim").mkdir(exist_ok=True)
        download_url_to_file(
            f"{base}/squim_objective_dns2020.pth", str(raw / "squim/squim_objective.pt")
        )
        download_url_to_file(
            f"{base}/squim_subjective_bvcc_daps.pth",
            str(raw / "squim/squim_subjective.pt"),
        )

    attempt("squim", fetch_squim_direct)

    if failures:
        raise SystemExit(
            f"{len(failures)} artifacts failed to download: "
            + ", ".join(n for n, _ in failures)
        )


# --------------------------------------------------------------------- #
# offline dry-run donors (exact on-disk formats, no network)
# --------------------------------------------------------------------- #


def _load_test_module(name: str):
    """Import a twin-builder module from tests/ by path (tests are not a
    package; the twins are the repo's pinned offline oracles)."""
    import importlib.util

    root = Path(__file__).resolve().parents[2]
    path = root / "tests" / f"{name}.py"
    spec = importlib.util.spec_from_file_location(f"_weights_day_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def stage_make_offline_donors(cache: Path) -> None:
    """Synthesize donor checkpoints in the formats ``convert`` ingests."""
    import jax
    import torch

    raw = cache / "raw"
    raw.mkdir(parents=True, exist_ok=True)

    # EBEN: export OUR random params through the torch-layout exporter —
    # the exact format of the published Cnam-LMSSC/EBEN_* repos
    from vibravox_tpu.models.convert import (
        eben_generator_params_to_torch,
        save_torch_state_dict,
    )
    from vibravox_tpu.models.eben_generator import EBENGenerator

    gen = EBENGenerator(m=4, n=32, p=2)
    t0 = gen.valid_length(2048)
    import jax.numpy as jnp

    params = jax.jit(gen.init)(jax.random.key(0), jnp.zeros((1, t0, 1)))
    (raw / "eben_temple_vibration_pickup").mkdir(exist_ok=True)
    save_torch_state_dict(
        eben_generator_params_to_torch(params, m=4, n=32),
        str(raw / "eben_temple_vibration_pickup/pytorch_model.bin"),
    )
    _log("donor eben_temple_vibration_pickup: ok")

    # phonemizer: tiny HF wav2vec2 checkpoint via transformers (offline,
    # config-only construction)
    from transformers import Wav2Vec2Config as HFW2V2Config
    from transformers import Wav2Vec2ForCTC as TorchW2V2

    from vibravox_tpu.models.wav2vec2 import TINY_W2V2_CONFIG

    hf_cfg = HFW2V2Config(
        vocab_size=38,
        pad_token_id=35,
        hidden_size=TINY_W2V2_CONFIG["hidden_size"],
        num_hidden_layers=TINY_W2V2_CONFIG["num_hidden_layers"],
        num_attention_heads=TINY_W2V2_CONFIG["num_attention_heads"],
        intermediate_size=TINY_W2V2_CONFIG["intermediate_size"],
        conv_dim=list(TINY_W2V2_CONFIG["conv_dim"]),
        conv_kernel=list(TINY_W2V2_CONFIG["conv_kernel"]),
        conv_stride=list(TINY_W2V2_CONFIG["conv_stride"]),
        num_conv_pos_embeddings=TINY_W2V2_CONFIG["num_conv_pos_embeddings"],
        num_conv_pos_embedding_groups=TINY_W2V2_CONFIG["num_conv_pos_embedding_groups"],
    )
    torch.manual_seed(0)
    TorchW2V2(hf_cfg).save_pretrained(raw / "phonemizer_throat_microphone")
    _log("donor phonemizer_throat_microphone: ok")

    # ECAPA2: the self-authored torch twin (tests/test_ecapa2.py) saved as a
    # plain state-dict .pt — the converter accepts torch.jit state dicts and
    # eager twins alike (models/ecapa2.py:234)
    ecapa_mod = _load_test_module("test_ecapa2")
    cfg = ecapa_mod.TINY  # the converter's pinned tiny-twin config
    twin = ecapa_mod._torch_twin(cfg)
    (raw / "ecapa2").mkdir(exist_ok=True)
    torch.save(twin.state_dict(), raw / "ecapa2/ecapa2.pt")
    json.dump(
        {
            "stem_channels": cfg.stem_channels,
            "lfe_stages": [list(s) for s in cfg.lfe_stages],
            "gfe_channels": cfg.gfe_channels,
            "res2_scale": cfg.res2_scale,
            "embed_dim": cfg.embed_dim,
        },
        open(raw / "ecapa2/dryrun_config.json", "w"),
    )
    _log("donor ecapa2: ok")

    # SQUIM ×2: the torchaudio-schema twins from tests/test_squim.py
    squim_mod = _load_test_module("test_squim")

    (raw / "squim").mkdir(exist_ok=True)
    obj_twin = squim_mod._torch_twin(squim_mod.TINY_OBJ)
    torch.save(obj_twin.state_dict(), raw / "squim/squim_objective.pt")
    from vibravox_tpu.models.squim import SquimSubjectiveConfig
    from vibravox_tpu.models.wav2vec2 import Wav2Vec2Config

    subj_cfg = SquimSubjectiveConfig(
        proj_dim=8, att_dim=8,
        ssl=Wav2Vec2Config(
            **{**TINY_W2V2_CONFIG, "vocab_size": 1},
            apply_spec_augment=False, layerdrop=0.0,
        ),
    )
    subj_sd, _ = squim_mod._subjective_twin_state_dict_and_oracle(subj_cfg)
    torch.save(subj_sd, raw / "squim/squim_subjective.pt")
    json.dump({"tiny_twins": True}, open(raw / "squim/dryrun_config.json", "w"))
    _log("donor squim (objective + subjective): ok")

    # Mimi: a random tiny transformers.MimiModel in real HF format (the same
    # tiny topology the converter is parity-pinned against, tests/test_mimi.py)
    from transformers import MimiConfig as HFMimiConfig
    from transformers import MimiModel

    mimi_cfg = HFMimiConfig(
        sampling_rate=24000, hidden_size=32, num_filters=4,
        upsampling_ratios=[4, 2], num_hidden_layers=2, num_attention_heads=2,
        num_key_value_heads=2, head_dim=16, intermediate_size=64,
        sliding_window=10, codebook_dim=16,
        vector_quantization_hidden_dimension=16, num_quantizers=4,
        codebook_size=64, compress=2, upsample_groups=32,
    )
    torch.manual_seed(0)
    hf_mimi = MimiModel(mimi_cfg).eval()
    # EMA codebook buffers initialise to zero; randomise so the materialised
    # codebooks are non-trivial (same trick as the converter parity test)
    with torch.no_grad():
        for q in (
            hf_mimi.quantizer.semantic_residual_vector_quantizer,
            hf_mimi.quantizer.acoustic_residual_vector_quantizer,
        ):
            for layer in q.layers:
                usage = torch.rand_like(layer.codebook.cluster_usage) + 0.5
                layer.codebook.cluster_usage.copy_(usage)
                layer.codebook.embed_sum.copy_(
                    torch.randn_like(layer.codebook.embed_sum) * usage[:, None]
                )
    hf_mimi.save_pretrained(raw / "mimi")
    _log("donor mimi: ok")


# --------------------------------------------------------------------- #
# convert
# --------------------------------------------------------------------- #


def stage_convert(cache: Path) -> Dict[str, str]:
    """Run every converter (each fails loudly on schema drift) + a jitted
    forward smoke; stage artifacts at the paths the tasks ingest."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    raw, staged = cache / "raw", cache / "staged"
    staged.mkdir(parents=True, exist_ok=True)
    manifest: Dict[str, str] = {}

    # ---- EBEN generators ------------------------------------------------
    from vibravox_tpu.models.hub import eben_generator_from_pretrained

    for d in sorted(raw.glob("eben_*")):
        model, params = eben_generator_from_pretrained(str(d))
        t = model.valid_length(2048)
        y, _ = jax.jit(model.apply)(params, jnp.zeros((1, t, 1)))
        assert np.isfinite(np.asarray(y)).all()
        manifest[d.name] = str(d)
        _log(f"convert {d.name}: forward ok {tuple(y.shape)}")

    # ---- phonemizers ----------------------------------------------------
    from vibravox_tpu.models.wav2vec2 import wav2vec2_for_ctc_from_pretrained

    for d in sorted(raw.glob("phonemizer_*")):
        model = wav2vec2_for_ctc_from_pretrained(str(d))
        logits = jax.jit(lambda p, x, m=model: m.module.apply({"params": p}, x))(
            model.params, jnp.zeros((1, 4000))
        )
        assert np.isfinite(np.asarray(logits)).all()
        manifest[d.name] = str(d)
        _log(f"convert {d.name}: forward ok {tuple(logits.shape)}")

    # ---- ECAPA2 ----------------------------------------------------------
    if (raw / "ecapa2/ecapa2.pt").exists():
        import torch

        from vibravox_tpu.models.ecapa2 import (
            ECAPA2,
            ECAPA2Config,
            ecapa2_params_from_torchscript,
        )

        cfg_file = raw / "ecapa2/dryrun_config.json"
        if cfg_file.exists():  # dry-run twin dims
            cfg_kw = json.load(open(cfg_file))
            cfg_kw["lfe_stages"] = tuple(tuple(s) for s in cfg_kw["lfe_stages"])
            config = ECAPA2Config(**cfg_kw)
        else:
            config = ECAPA2Config()
        obj = torch.load(raw / "ecapa2/ecapa2.pt", map_location="cpu", weights_only=False)
        sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
        params = ecapa2_params_from_torchscript(
            {k: np.asarray(v) for k, v in sd.items()}, config=config
        )
        emb = jax.jit(ECAPA2(config=config).apply)(params, jnp.zeros((1, 16000)))
        assert np.isfinite(np.asarray(emb)).all()
        manifest["ecapa2"] = str(raw / "ecapa2/ecapa2.pt")  # $VIBRAVOX_ECAPA2_CKPT
        _log(f"convert ecapa2: embedding ok {tuple(emb.shape)}")

    # ---- SQUIM ×2 ---------------------------------------------------------
    if (raw / "squim").is_dir():
        from vibravox_tpu.metrics.squim import load_squim_predictors

        cfg_file = raw / "squim/dryrun_config.json"
        if cfg_file.exists():
            # dry-run twins are tiny: drive the converters directly with the
            # matching configs (the production loader assumes full-size)
            import torch

            from vibravox_tpu.models.squim import (
                SquimObjective,
                SquimSubjectiveConfig,
                squim_objective_params_from_torch,
                squim_subjective_params_from_torch,
            )
            from vibravox_tpu.models.wav2vec2 import TINY_W2V2_CONFIG, Wav2Vec2Config

            squim_mod = _load_test_module("test_squim")
            obj_cfg = squim_mod.TINY_OBJ
            sd = torch.load(raw / "squim/squim_objective.pt", weights_only=False)
            obj_params = squim_objective_params_from_torch(
                {k: np.asarray(v) for k, v in sd.items()}, config=obj_cfg
            )
            # non-zero input: the model RMS-normalises (zeros divide by 0)
            wave = jnp.asarray(
                np.random.default_rng(0).standard_normal((1, 3200)).astype(np.float32)
            )
            out = jax.jit(SquimObjective(config=obj_cfg).apply)(obj_params, wave)
            assert all(np.isfinite(np.asarray(v)).all() for v in out)
            subj_cfg = SquimSubjectiveConfig(
                proj_dim=8, att_dim=8,
                ssl=Wav2Vec2Config(
                    **{**TINY_W2V2_CONFIG, "vocab_size": 1},
                    apply_spec_augment=False, layerdrop=0.0,
                ),
            )
            sd = torch.load(raw / "squim/squim_subjective.pt", weights_only=False)
            squim_subjective_params_from_torch(
                {k: np.asarray(v) for k, v in sd.items()}, config=subj_cfg
            )
            _log("convert squim (tiny twins): objective forward + subjective keys ok")
        else:
            objective, subjective = load_squim_predictors(raw / "squim")
            assert objective is not None and subjective is not None
            _log("convert squim: objective + subjective loaded")
        manifest["squim"] = str(raw / "squim")  # $VIBRAVOX_SQUIM_DIR

    # ---- Mimi -------------------------------------------------------------
    if (raw / "mimi").is_dir():
        from transformers import MimiModel

        from vibravox_tpu.models.mimi.convert import (
            hf_mimi_config_to_native,
            mimi_params_from_hf_torch,
        )
        from vibravox_tpu.models.mimi.mimi import Mimi

        hf_model = MimiModel.from_pretrained(str(raw / "mimi")).eval()
        native_cfg = hf_mimi_config_to_native(hf_model.config)
        mimi = Mimi(config=native_cfg)
        params = mimi_params_from_hf_torch(
            {k: np.asarray(v) for k, v in hf_model.state_dict().items()}, native_cfg
        )
        t = mimi.valid_length(int(0.5 * 24000))
        latent = jax.jit(lambda p, x: mimi.encode_to_latent(x, params=p))(
            params, jnp.zeros((1, t, 1))
        )
        assert np.isfinite(np.asarray(latent)).all()
        manifest["mimi"] = str(raw / "mimi")
        _log(f"convert mimi: encode ok {tuple(latent.shape)}")

    json.dump(manifest, open(staged / "manifest.json", "w"), indent=2)
    _log(f"manifest: {staged / 'manifest.json'} ({len(manifest)} artifacts)")
    return manifest


# --------------------------------------------------------------------- #
# parity
# --------------------------------------------------------------------- #


def stage_parity(
    cache: Path, dry_run: bool, out_path: Path, extra_overrides: Optional[List[str]] = None
) -> None:
    """Run the five BASELINE.md parity configs.  In dry-run mode each config
    is composed and its datamodule/task/trainer INSTANTIATED (full config
    -surface validation) but not fitted — fitting five full-size models is a
    day-of-network job, not a CI one."""
    manifest_path = cache / "staged/manifest.json"
    manifest = json.load(open(manifest_path)) if manifest_path.exists() else {}

    def stage_env() -> None:
        """Point the tasks at the converted weights — the real day's env-var
        staging.  In dry-run mode this only happens for configs the dry run
        EXECUTES (the staged tiny twins must not leak into other processes'
        checkpoint loading)."""
        if manifest.get("ecapa2"):
            os.environ.setdefault("VIBRAVOX_ECAPA2_CKPT", manifest["ecapa2"])
        if manifest.get("squim"):
            os.environ.setdefault("VIBRAVOX_SQUIM_DIR", manifest["squim"])

    if not dry_run:
        stage_env()

    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
    import run as run_module

    def execute(spec, overrides):
        """The day-of-network path: fit/test through run.py, then metric-key
        extraction.  The dry run drives ≥1 config through THIS function."""
        metrics = run_module.main(overrides)
        return {k: metrics.get(k) for k in spec["metric_keys"]}

    rows = []
    for spec in PARITY_CONFIGS:
        overrides = list(spec["overrides"]) + list(extra_overrides or [])
        missing = [n for n in spec["needs"] if n not in manifest]
        if missing and not dry_run:
            rows.append((spec["name"], {"SKIPPED": f"missing {missing}"}))
            _log(f"parity {spec['name']}: SKIPPED (missing {missing})")
            continue
        if dry_run:
            os.environ.setdefault("HF_HUB_OFFLINE", "1")
            os.environ.setdefault("HF_DATASETS_OFFLINE", "1")
            overrides = [
                o for o in overrides if not o.startswith("++trainer.max_epochs")
            ] + [spec["synthetic"]] + list(spec.get("dryrun_overrides", []))
            if spec.get("dryrun_execute") is not None:
                # full end-to-end execution of the non-dry-run branch at tiny
                # scale: staged donor checkpoint + synthetic data.  Env vars
                # are scoped to the call so the tiny twins never leak into
                # anything else this process (or CI) runs afterwards.
                if missing:
                    raise SystemExit(
                        f"dry-run execute {spec['name']}: run the convert "
                        f"stage first (missing {missing})"
                    )
                saved = {
                    k: os.environ.get(k)
                    for k in ("VIBRAVOX_ECAPA2_CKPT", "VIBRAVOX_SQUIM_DIR")
                }
                stage_env()
                try:
                    picked = execute(
                        spec,
                        overrides
                        + list(spec["dryrun_execute"])
                        + [f"++run_dir={cache / 'dryrun_runs' / spec['name']}"],
                    )
                finally:
                    for k, v in saved.items():
                        if v is None:
                            os.environ.pop(k, None)
                        else:
                            os.environ[k] = v
                assert all(v is not None for v in picked.values()), (
                    f"{spec['name']}: executed dry run produced no value for "
                    f"some of {spec['metric_keys']}: {picked}"
                )
                rows.append((spec["name"], {"dry_run_executed": picked}))
                _log(f"parity {spec['name']}: dry-run EXECUTED {picked}")
                continue
            from vibravox_tpu.core.config import compose, instantiate

            cfg = compose(run_module.CONFIG_DIR, "run", overrides)
            datamodule = instantiate(cfg.lightning_datamodule)
            task = instantiate(cfg.lightning_module)
            trainer = instantiate(cfg.trainer, checkpoint=None, logger=None)
            assert hasattr(task, "train_step") or hasattr(task, "eval_step")
            assert trainer is not None and datamodule is not None
            rows.append((spec["name"], {"dry_run": "compose+instantiate ok"}))
            _log(f"parity {spec['name']}: dry-run compose+instantiate ok")
        else:
            picked = execute(spec, overrides)
            rows.append((spec["name"], picked))
            _log(f"parity {spec['name']}: {picked}")

    lines = [
        "# Real-data parity results" + (" (OFFLINE DRY-RUN)" if dry_run else ""),
        "",
        "Written by `python -m vibravox_tpu.scripts.weights_day` — see",
        "BASELINE.md for the reference targets these compare against.",
        "",
        "| config | metrics |",
        "|---|---|",
    ]
    for name, metrics in rows:
        lines.append(f"| {name} | {json.dumps(metrics)} |")
    out_path.write_text("\n".join(lines) + "\n")
    _log(f"wrote {out_path}")


# --------------------------------------------------------------------- #


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--stage", default="all", choices=["all", "fetch", "convert", "parity"]
    )
    parser.add_argument("--offline-dry-run", action="store_true")
    parser.add_argument(
        "--cache-dir", default=os.path.expanduser("~/.cache/vibravox_tpu_weights")
    )
    parser.add_argument("--output", default="REAL_DATA.md")
    parser.add_argument(
        "--override", action="append", default=[],
        help="extra run.py override applied to every parity config",
    )
    args = parser.parse_args(argv)
    cache = Path(args.cache_dir)

    if args.offline_dry_run:
        # offline env FIRST: huggingface_hub snapshots HF_HUB_OFFLINE at
        # import time, so setting it after a stage has imported transformers
        # (donor synthesis does) silently re-enables 5×-retry hub lookups in
        # later stages (observed standalone; pytest runs were shielded by the
        # suite's env).
        os.environ.setdefault("HF_HUB_OFFLINE", "1")
        os.environ.setdefault("HF_DATASETS_OFFLINE", "1")
        # the dry run is a CPU job (donor synthesis, converter smoke tests,
        # and one tiny executed parity config) — never burn remote-TPU
        # compiles on it.  Forcing the platform works as long as the backend
        # has not been initialized yet (same recipe as tests/conftest.py);
        # under pytest the conftest has already done exactly this.
        os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.stage in ("all", "fetch"):
        if args.offline_dry_run:
            stage_make_offline_donors(cache)
        else:
            stage_fetch(cache)
    if args.stage in ("all", "convert"):
        stage_convert(cache)
    if args.stage in ("all", "parity"):
        stage_parity(cache, args.offline_dry_run, Path(args.output), args.override)


if __name__ == "__main__":
    main()
