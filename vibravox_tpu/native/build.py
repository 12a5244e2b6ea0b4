"""Build the native kernels shared library (g++)."""

from __future__ import annotations

import subprocess
from pathlib import Path

NATIVE_DIR = Path(__file__).parent
LIB_PATH = NATIVE_DIR / "libvibravox_native.so"


def build(force: bool = False) -> Path:
    src = NATIVE_DIR / "levenshtein.cpp"
    if LIB_PATH.exists() and not force and LIB_PATH.stat().st_mtime >= src.stat().st_mtime:
        return LIB_PATH
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-o", str(LIB_PATH), str(src)],
        check=True,
    )
    return LIB_PATH


if __name__ == "__main__":
    print(build(force=True))
