"""Entry point: config-composed training/eval runs.

The exact CLI surface of the reference (``/root/reference/run.py:25-53``):

    python run.py lightning_datamodule=bwe lightning_module=eben \
        lightning_datamodule.sensor=throat_microphone ++trainer.max_epochs=500

composes ``configs/run.yaml``, instantiates the datamodule / task / trainer /
callbacks / logger, seeds everything, runs fit then test(ckpt="last") —
backed by the JAX trainer instead of Lightning.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

CONFIG_DIR = Path(__file__).resolve().parent / "configs"


def setup_environment() -> None:
    """Warnings / env hygiene (the JAX analog of ``run.py:56-74``)."""
    import warnings

    warnings.filterwarnings("ignore")
    # zero-egress clusters: skip hub lookups instead of retrying for 30 s
    # (the reference's SLURM scripts set the same offline env vars)
    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    os.environ.setdefault("HF_DATASETS_OFFLINE", "1")
    from vibravox_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    os.environ.setdefault("JAX_TRACEBACK_FILTERING", "auto")
    # multi-host: join the coordination service when a pod/env topology is
    # announced (no-op single-process; must precede backend initialization)
    from vibravox_tpu.parallel.distributed import initialize_distributed

    initialize_distributed()


def main(argv=None) -> dict:
    setup_environment()
    from vibravox_tpu.core.config import compose, instantiate

    overrides = list(argv if argv is not None else sys.argv[1:])
    cfg = compose(CONFIG_DIR, "run", overrides)

    if cfg.get("lightning_datamodule") in (None, {}):
        raise SystemExit("lightning_datamodule must be overridden (e.g. lightning_datamodule=bwe)")
    if cfg.get("lightning_module") in (None, {}):
        raise SystemExit("lightning_module must be overridden (e.g. lightning_module=eben)")

    # hydra.job.chdir equivalent: each run owns a fresh cwd so checkpoints,
    # tensorboard dirs and CSVs are relative (``configs/run.yaml:10-12`` there)
    run_dir = Path(cfg.get("run_dir", "outputs/run/default"))
    run_dir.mkdir(parents=True, exist_ok=True)
    old_cwd = os.getcwd()
    os.chdir(run_dir)
    try:
        datamodule = instantiate(cfg.lightning_datamodule)
        task = instantiate(cfg.lightning_module)

        # tasks that decode text share the datamodule's tokenizer (the
        # reference reads it via trainer.datamodule — ``wav2vec2_for_stp.py:189``)
        if getattr(task, "tokenizer", False) is None and hasattr(datamodule, "tokenizer"):
            task.tokenizer = datamodule.tokenizer

        callbacks = cfg.get("callbacks") or {}
        checkpoint = instantiate(callbacks["checkpoint"]) if "checkpoint" in callbacks else None
        model_summary = (
            instantiate(callbacks["model_summary"]) if "model_summary" in callbacks else None
        )
        logging_cfg = cfg.get("logging") or {}
        logger = instantiate(logging_cfg["logger"]) if "logger" in logging_cfg else None

        trainer = instantiate(
            cfg.trainer, checkpoint=checkpoint, logger=logger, model_summary=model_summary
        )

        trainer.fit(task, datamodule)
        if getattr(trainer, "_preempt_signum", None) is not None:
            # preempted mid-fit: the state is checkpointed and the hard kill
            # is imminent — exit for resubmission instead of starting test
            return {}
        metrics = trainer.test(task, datamodule, ckpt_path="last")
        return metrics
    finally:
        os.chdir(old_cwd)


if __name__ == "__main__":
    main()
