"""Checksum backend selection: native C++ xxh32 when built, spec otherwise."""

from __future__ import annotations


def make_hasher(seed: int = 0):
    """Streaming xxHash32 with ``update``/``digest`` — fastest available."""
    try:
        from ..native import XXHash32
    except Exception:
        from ..spec.xxhash32 import XXHash32
    return XXHash32(seed)
