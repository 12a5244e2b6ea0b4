"""Build the native kernels shared library (g++)."""

from __future__ import annotations

import subprocess
from pathlib import Path

NATIVE_DIR = Path(__file__).parent
LIB_PATH = NATIVE_DIR / "libvibravox_native.so"


def build(force: bool = False) -> Path:
    sources = sorted(NATIVE_DIR.glob("*.cpp"))
    if (
        LIB_PATH.exists()
        and not force
        and all(LIB_PATH.stat().st_mtime >= s.stat().st_mtime for s in sources)
    ):
        return LIB_PATH
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-o", str(LIB_PATH)]
        + [str(s) for s in sources],
        check=True,
    )
    return LIB_PATH


if __name__ == "__main__":
    print(build(force=True))
