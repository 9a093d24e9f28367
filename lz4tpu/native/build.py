"""Builds the native C++ engine into a shared library, cached by source hash.

Invoked lazily on first ``import lz4tpu.native``; no pip/apt dependencies —
just g++ from the toolchain.
"""

from __future__ import annotations

import hashlib
import os
import pathlib
import subprocess

_SRC = pathlib.Path(__file__).parent / "src" / "lz4_native.cpp"
_BUILD_DIR = pathlib.Path(__file__).parent / "_build"

_CXXFLAGS = [
    "-O3",
    "-std=c++17",
    "-shared",
    "-fPIC",
    "-fno-exceptions",
    "-fno-rtti",
    "-Wall",
    "-Wextra",
]


def build() -> pathlib.Path:
    """Compile (if stale) and return the path to liblz4tpu.so."""
    src = _SRC.read_bytes()
    tag = hashlib.sha256(src + b"|".join(f.encode() for f in _CXXFLAGS)).hexdigest()[:16]
    out = _BUILD_DIR / f"liblz4tpu-{tag}.so"
    if out.exists():
        return out
    _BUILD_DIR.mkdir(exist_ok=True)
    tmp = out.with_suffix(f".tmp{os.getpid()}.so")
    cmd = ["g++", *_CXXFLAGS, "-march=native", str(_SRC), "-o", str(tmp)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except subprocess.CalledProcessError as e:  # fall back without -march=native
        cmd = ["g++", *_CXXFLAGS, str(_SRC), "-o", str(tmp)]
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    os.replace(tmp, out)
    # clean stale builds
    for old in _BUILD_DIR.glob("liblz4tpu-*.so"):
        if old != out:
            try:
                old.unlink()
            except OSError:
                pass
    return out
