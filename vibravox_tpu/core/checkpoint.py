"""Checkpointing with monitor / top-k / save-last semantics.

Replaces Lightning's ``ModelCheckpoint`` configuration surface
(``configs/callbacks/bwe_checkpoint.yaml:2-13``: monitored metric, mode,
``save_top_k``, ``save_last``) on top of orbax's async-capable pytree
checkpointer.  Train state pytrees (params, both optimizer states, EMA loss
norms, RNG, step) round-trip losslessly, giving full training resume —
``trainer.test(ckpt_path="last")`` equivalents load from ``last/``.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager"]


class CheckpointManager:
    """Saves top-k checkpoints by a monitored metric plus an always-fresh
    ``last`` checkpoint.

    Directory layout::

        dirpath/
          last/            # most recent state (overwritten every save)
          step_000123/     # top-k by monitor
          index.json       # {step: monitor_value}
    """

    def __init__(
        self,
        dirpath: str,
        monitor: Optional[str] = None,
        mode: str = "max",
        save_top_k: int = 1,
        save_last: bool = True,
    ):
        assert mode in {"max", "min"}
        self.dirpath = Path(dirpath)
        self.dirpath.mkdir(parents=True, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self.save_top_k = save_top_k
        self.save_last = save_last
        self._ckptr = ocp.StandardCheckpointer()
        self._index_path = self.dirpath / "index.json"
        self._index: Dict[str, float] = {}
        if self._index_path.exists():
            self._index = json.loads(self._index_path.read_text())

    # ------------------------------------------------------------------ #

    def _step_dir(self, step: int) -> Path:
        return self.dirpath / f"step_{step:08d}"

    def _persist_index(self) -> None:
        self._index_path.write_text(json.dumps(self._index, indent=1))

    def save(self, state: Any, step: int, metrics: Optional[Dict[str, float]] = None,
             trainer_state: Optional[Dict[str, Any]] = None) -> None:
        """Save ``last`` and, when the monitored metric qualifies, a top-k entry."""
        if self.save_last:
            last = self.dirpath / "last"
            if last.exists():
                shutil.rmtree(last)
            self._ckptr.save(last.absolute(), state)
            self._ckptr.wait_until_finished()
            if trainer_state is not None:
                (self.dirpath / "trainer_state.json").write_text(json.dumps(trainer_state))

        if self.monitor is None or not metrics or self.monitor not in metrics:
            return
        value = float(metrics[self.monitor])
        worse = (min if self.mode == "max" else max)(
            self._index.values(), default=None
        )
        if len(self._index) < self.save_top_k or worse is None or (
            value > worse if self.mode == "max" else value < worse
        ):
            path = self._step_dir(step)
            if path.exists():
                shutil.rmtree(path)
            self._ckptr.save(path.absolute(), state)
            self._ckptr.wait_until_finished()
            self._index[str(step)] = value
            # prune beyond top-k
            ranked = sorted(
                self._index.items(), key=lambda kv: kv[1], reverse=(self.mode == "max")
            )
            for stale_step, _ in ranked[self.save_top_k:]:
                stale = self._step_dir(int(stale_step))
                if stale.exists():
                    shutil.rmtree(stale)
                del self._index[stale_step]
            self._persist_index()

    # ------------------------------------------------------------------ #

    def restore(self, target: Any, which: str = "last") -> Any:
        """Restore a checkpoint into the structure of ``target``.

        ``which``: 'last', 'best', or an explicit step int/str.
        """
        if which == "last":
            path = self.dirpath / "last"
        elif which == "best":
            if not self._index:
                raise FileNotFoundError("no best checkpoint recorded")
            best_step = (max if self.mode == "max" else min)(
                self._index, key=self._index.get
            )
            path = self._step_dir(int(best_step))
        else:
            path = self._step_dir(int(which))
        if not path.exists():
            raise FileNotFoundError(f"checkpoint not found: {path}")
        return self._ckptr.restore(
            path.absolute(), target=jax.tree_util.tree_map(lambda x: x, target)
        )

    def best_step(self) -> Optional[int]:
        if not self._index:
            return None
        return int((max if self.mode == "max" else min)(self._index, key=self._index.get))

    def has_last(self) -> bool:
        return (self.dirpath / "last").exists()

    def trainer_state(self) -> Dict[str, Any]:
        path = self.dirpath / "trainer_state.json"
        return json.loads(path.read_text()) if path.exists() else {}
