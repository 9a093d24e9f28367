"""Limb-hash proof promised by lz4tpu/kernels/compress.py's docstring.

The reference 5-byte hash (``/root/reference/src/raw/compress/mod.rs:40-51``)
is ``((v << 24) wrapping_mul 889523592379) >> (64 - HASHLOG)`` on a
little-endian u64 read.  Mosaic scalars are 32-bit, so the kernel computes
the exact top HASHLOG bits with 32-bit limbs:

    hi32 = (b0*(m0>>8) + (b0*(m0&0xFF))>>8 + ((b0*m1)&0xFF)<<24 + w1*m0) mod 2^32
    hash = hi32 >> (32 - HASHLOG)

where b0 = byte 0 of v, w1 = bytes 1..4 of v (the only bytes surviving the
``<< 24``), and m0/m1 are the multiplier's low/high 32-bit limbs.  This test
proves the identity over random u64s and structured edge cases, using the
module's own constants.
"""

import numpy as np

from lz4tpu.kernels.compress import _M0, _M1, HASHLOG
from lz4tpu.spec.table import HASH64_MUL

MASK64 = (1 << 64) - 1


def _ref_hash(v: int) -> int:
    return (((v << 24) & MASK64) * HASH64_MUL & MASK64) >> (64 - HASHLOG)


def _limb_hash(v: np.ndarray) -> np.ndarray:
    """The kernel's 32-bit-limb formula (vector form from compress.py's
    hash precompute), on uint64 input split into b0 / w1."""
    b0 = (v & 0xFF).astype(np.uint32)
    w1 = ((v >> 8) & 0xFFFFFFFF).astype(np.uint32)
    m0 = np.uint32(_M0)
    with np.errstate(over="ignore"):
        hi32 = (
            b0 * (m0 >> np.uint32(8))
            + ((b0 * (m0 & np.uint32(0xFF))) >> np.uint32(8))
            + (((b0 * np.uint32(_M1)) & np.uint32(0xFF)) << np.uint32(24))
            + w1 * m0
        )
    return hi32 >> np.uint32(32 - HASHLOG)


def test_limb_constants():
    assert _M0 == HASH64_MUL & 0xFFFFFFFF
    assert _M1 == HASH64_MUL >> 32
    assert HASH64_MUL == 889523592379


def test_limb_hash_random():
    rng = np.random.default_rng(0)
    v = rng.integers(0, 1 << 64, size=1_000_000, dtype=np.uint64)
    got = _limb_hash(v)
    want = np.array([_ref_hash(int(x)) for x in v[:4096]], dtype=np.uint32)
    np.testing.assert_array_equal(got[:4096], want)
    # full set against a vectorized object-int reference
    vi = v.astype(object)
    want_all = ((((vi << 24) & MASK64) * HASH64_MUL & MASK64) >> (64 - HASHLOG)).astype(
        np.uint32
    )
    np.testing.assert_array_equal(got, want_all)


def test_limb_hash_edges():
    edges = [0, 1, 0xFF, 0x100, 0xFFFF_FFFF, 0x1_0000_0000,
             0xFF_FFFF_FFFF, (1 << 64) - 1, (1 << 40) - 1, 1 << 39]
    # carry-critical patterns: values whose partial products straddle the
    # 2^32 boundary in every limb combination
    for b0 in (0, 1, 0x7F, 0x80, 0xFF):
        for w1 in (0, 1, 0xFFFF, 0xFFFF_FFFF, 0x8000_0000):
            edges.append(b0 | (w1 << 8))
    v = np.array(edges, dtype=np.uint64)
    got = _limb_hash(v)
    want = np.array([_ref_hash(int(x)) for x in edges], dtype=np.uint32)
    np.testing.assert_array_equal(got, want)
