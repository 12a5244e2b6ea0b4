"""Trainer callbacks (config-composable).

The reference wires Lightning callbacks from ``configs/callbacks/*.yaml``
(``rich_model_summary.yaml`` -> ``RichModelSummary(max_depth=3)``); the
TPU-native trainer keeps the same config surface with explicit callback
objects the loop invokes at fixed points.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import numpy as np

__all__ = ["ModelSummary"]


class ModelSummary:
    """Param-count table over the train-state's parameter pytrees.

    ``max_depth`` bounds how deep into the nested param dict the breakdown
    descends (depth 1 = one line per state field, like Lightning's default
    ``ModelSummary``; the reference's ``rich_model_summary.yaml`` uses 3).
    """

    def __init__(self, max_depth: int = 1):
        self.max_depth = int(max_depth)

    # ------------------------------------------------------------------ #

    def _count(self, tree) -> int:
        return sum(
            int(np.prod(leaf.shape))
            for leaf in jax.tree_util.tree_leaves(tree)
            if hasattr(leaf, "shape")
        )

    def _rows(self, name: str, tree, depth: int) -> List[Tuple[str, int]]:
        rows = [(name, self._count(tree))]
        if depth < self.max_depth and isinstance(tree, dict):
            for key in sorted(tree):
                rows.extend(self._rows(f"{name}.{key}", tree[key], depth + 1))
        return rows

    def summarize(self, state) -> str:
        """Return the formatted summary for a dataclass train state."""
        import dataclasses

        if state is None or not dataclasses.is_dataclass(state):
            return ""
        lines: List[str] = []
        total = 0
        for field in dataclasses.fields(state):
            if "param" not in field.name:
                continue
            sub = getattr(state, field.name, None)
            if sub is None:
                continue
            rows = self._rows(field.name, sub, 1)
            total += rows[0][1]
            indentless = self.max_depth <= 1
            for name, count in rows if not indentless else rows[:1]:
                depth = name.count(".")
                lines.append(f"{'  ' * depth}{name}: {count:,} params")
        if not lines:
            return ""
        return "\n".join(lines) + f"\ntotal: {total:,}"

    def __call__(self, state, logger) -> None:
        summary = self.summarize(state)
        if summary:
            print(f"[model summary]\n{summary}", flush=True)
            logger.log_text("model_summary", summary.replace("\n", " | "))
