"""Build the native host helpers with g++ (no pybind11 needed — plain C ABI)."""

from __future__ import annotations

import subprocess
import sysconfig
from pathlib import Path

SRC_DIR = Path(__file__).parent
SO_PATH = SRC_DIR / "_fastparse.so"


def build(force: bool = False) -> Path | None:
    """Compile fastparse.cpp -> _fastparse.so; returns the path or None."""
    src = SRC_DIR / "fastparse.cpp"
    if SO_PATH.exists() and not force and SO_PATH.stat().st_mtime >= src.stat().st_mtime:
        return SO_PATH
    cxx = sysconfig.get_config_var("CXX") or "g++"
    cmd = [cxx.split()[0], "-O3", "-march=native", "-shared", "-fPIC", str(src), "-o", str(SO_PATH)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return SO_PATH
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired, FileNotFoundError):
        return None


if __name__ == "__main__":
    path = build(force=True)
    print(f"built: {path}" if path else "build FAILED")
