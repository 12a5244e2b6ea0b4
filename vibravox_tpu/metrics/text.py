"""Text metrics: character error rate (= phoneme error rate on phoneme
strings) and Levenshtein edit operations.

Replaces torchmetrics ``CharErrorRate`` (used as PER by the reference —
``wav2vec2_for_stp.py:38,190-207``) and the Levenshtein edit-op helpers
(``vibravox/utils.py:256-331``) used by the phonemizer confusion analysis.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

__all__ = [
    "levenshtein_editops",
    "char_error_rate",
    "decode_operations",
    "get_space_indices",
    "split_editops",
]


def _load_native():
    """ctypes binding to the C++ Levenshtein kernel (built on demand)."""
    import ctypes

    try:
        from vibravox_tpu.native.build import build

        lib = ctypes.CDLL(str(build()))
    except Exception:
        return None
    lib.levenshtein_editops.restype = ctypes.c_int
    lib.levenshtein_editops.argtypes = [
        np.ctypeslib.ndpointer(np.uint32), ctypes.c_int,
        np.ctypeslib.ndpointer(np.uint32), ctypes.c_int,
        np.ctypeslib.ndpointer(np.int32), ctypes.c_int,
    ]
    lib.levenshtein_distance.restype = ctypes.c_int
    lib.levenshtein_distance.argtypes = [
        np.ctypeslib.ndpointer(np.uint32), ctypes.c_int,
        np.ctypeslib.ndpointer(np.uint32), ctypes.c_int,
    ]
    return lib


_NATIVE = _load_native()
_OP_NAMES = ("replace", "insert", "delete")


def _codepoints(s: str) -> np.ndarray:
    return np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).copy()


def levenshtein_editops(pred: str, target: str) -> List[Tuple[str, int, int]]:
    """Minimal edit operations transforming ``pred`` into ``target``.

    Returns (op, pred_idx, target_idx) triples with op in
    {replace, insert, delete}, matching the python-Levenshtein convention
    the reference consumes.  Uses the native C++ kernel when available
    (``vibravox_tpu/native``), pure-python DP otherwise.
    """
    if _NATIVE is not None:
        a = _codepoints(pred)
        b = _codepoints(target)
        max_ops = len(a) + len(b) + 1
        out = np.empty(3 * max_ops, dtype=np.int32)
        n_ops = _NATIVE.levenshtein_editops(a, len(a), b, len(b), out, max_ops)
        if n_ops >= 0:
            return [
                (_OP_NAMES[out[3 * k]], int(out[3 * k + 1]), int(out[3 * k + 2]))
                for k in range(n_ops)
            ]
    return _levenshtein_editops_py(pred, target)


def _levenshtein_editops_py(pred: str, target: str) -> List[Tuple[str, int, int]]:
    m, n = len(pred), len(target)
    dist = np.zeros((m + 1, n + 1), dtype=np.int32)
    dist[:, 0] = np.arange(m + 1)
    dist[0, :] = np.arange(n + 1)
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            cost = 0 if pred[i - 1] == target[j - 1] else 1
            dist[i, j] = min(
                dist[i - 1, j] + 1,      # delete
                dist[i, j - 1] + 1,      # insert
                dist[i - 1, j - 1] + cost,  # replace / match
            )
    ops: List[Tuple[str, int, int]] = []
    i, j = m, n
    while i > 0 or j > 0:
        if i > 0 and j > 0 and dist[i, j] == dist[i - 1, j - 1] and pred[i - 1] == target[j - 1]:
            i, j = i - 1, j - 1
        elif i > 0 and j > 0 and dist[i, j] == dist[i - 1, j - 1] + 1:
            ops.append(("replace", i - 1, j - 1))
            i, j = i - 1, j - 1
        elif i > 0 and dist[i, j] == dist[i - 1, j] + 1:
            ops.append(("delete", i - 1, j))
            i -= 1
        else:
            ops.append(("insert", i, j - 1))
            j -= 1
    ops.reverse()
    return ops


def char_error_rate(preds: Sequence[str], targets: Sequence[str]) -> float:
    """Corpus-level CER: total edit distance / total target characters."""
    total_edits = 0
    total_chars = 0
    for p, t in zip(preds, targets):
        if _NATIVE is not None:
            a, b = _codepoints(p), _codepoints(t)
            total_edits += int(_NATIVE.levenshtein_distance(a, len(a), b, len(b)))
        else:
            total_edits += len(levenshtein_editops(p, t))
        total_chars += len(t)
    return total_edits / max(total_chars, 1)


# --------------------------------------------------------------------------- #
# Edit-op decoding (phoneme confusion analysis, ref ``utils.py:256-331``)
# --------------------------------------------------------------------------- #


def decode_operations(
    predicted_chr: str, label_chr: str, editops: List[Tuple[str, int, int]]
) -> List[Tuple[str, str, str]]:
    ops = []
    for op, pred_idx, label_idx in editops:
        if op == "insert":
            token = label_chr[label_idx]
            ops.append((op, token, token))
        elif op == "delete":
            token = predicted_chr[pred_idx]
            ops.append((op, token, token))
        else:
            ops.append((op, predicted_chr[pred_idx], label_chr[label_idx]))
    return ops


def get_space_indices(string: str) -> List[int]:
    return [i for i, x in enumerate(string) if x == " "]


def split_editops(pred: str, target: str, editops: List[Tuple[str, int, int]]):
    """Split edit ops into (before-space, in-word, all) — ref ``utils.py:301-331``."""
    pred_space_idx = get_space_indices(pred)
    target_space_idx = get_space_indices(target)
    before_space, in_word = [], []
    for editop in editops:
        op, pred_idx, label_idx = editop
        if (
            (op == "replace" and ((pred_idx + 1) in pred_space_idx or (label_idx + 1) in target_space_idx))
            or (op == "delete" and (pred_idx + 1) in pred_space_idx)
            or (op == "insert" and (label_idx + 1) in target_space_idx)
        ):
            before_space.append(editop)
        else:
            in_word.append(editop)
    return before_space, in_word, editops
