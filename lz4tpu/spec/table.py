"""Encoder hash tables — the match-finder state of the LZ4 greedy parser.

Executable spec of the reference's ``EncoderTable`` trait and its two
implementations (``/root/reference/src/raw/compress/mod.rs:19-101``):

* ``U32Table`` — 4096 (``1 << HASHLOG``) u32 slots, hashing 5 bytes out of a
  little-endian u64 read (the 64-bit fast path, ``compress/mod.rs:40-51``);
  payload limit 4 GiB.
* ``U16Table`` — 8192 u16 slots hashing a u32 read (``compress/mod.rs:58-61``);
  payload limit 64 KiB.

The hash constants and shift amounts are load-bearing for bit-exact output
parity with the C implementation — changing any of them yields valid but
different LZ4 streams.

These tables are also the single source of truth for the Pallas compress
kernel (``lz4tpu/kernels/compress.py``) and the C++ engine
(``lz4tpu/native/src/lz4_native.cpp``), which implement identical semantics.
"""

from __future__ import annotations

import numpy as np

HASHLOG = 12
DICTIONARY_SIZE = 1 << HASHLOG  # 4096
MINMATCH = 4

# (v << 24) * 889523592379 >> (64 - HASHLOG), little-endian u64 read.
HASH64_MUL = 889523592379
# v * 2654435761 >> (32 - HASHLOG - 1), little-endian u32 read.
HASH32_MUL = 2654435761

_M64 = (1 << 64) - 1
_M32 = (1 << 32) - 1


def hash_u32_table(data: bytes, offset: int) -> int:
    """Hash for U32Table: 5 significant bytes of an LE u64 read at ``offset``.

    Positions within 8 bytes of the end read 0 (the reference does
    ``input.get(..8).unwrap_or(0)`` — such positions are never allowed to
    match anyway because of the last-5-bytes rule).
    """
    chunk = data[offset : offset + 8]
    v = int.from_bytes(chunk, "little") if len(chunk) == 8 else 0
    return (((v << 24) & _M64) * HASH64_MUL & _M64) >> (64 - HASHLOG)


def hash_u16_table(data: bytes, offset: int) -> int:
    """Hash for U16Table: LE u32 read at ``offset`` (requires 4 valid bytes)."""
    v = int.from_bytes(data[offset : offset + 4], "little")
    return ((v * HASH32_MUL) & _M32) >> (32 - HASHLOG - 1)


class U32Table:
    """4096-slot u32 encoder table (``compress/mod.rs:28-76``).

    ``replace`` swaps the current absolute position into the slot for the
    bytes at ``offset`` and returns the previous occupant, both adjusted by
    the sliding-window ``offset`` used in linked-block mode
    (``compress/mod.rs:64-74``): positions are stored in *stream* coordinates
    and mapped back to *buffer* coordinates on the way out with a saturating
    subtraction.
    """

    payload_size_limit = _M32
    __slots__ = ("dict", "offset")

    def __init__(self):
        self.dict = np.zeros(DICTIONARY_SIZE, dtype=np.uint32)
        self.offset = 0

    def copy(self) -> "U32Table":
        t = U32Table.__new__(U32Table)
        t.dict = self.dict.copy()
        t.offset = self.offset
        return t

    def replace(self, data: bytes, offset: int) -> int:
        h = hash_u32_table(data, offset)
        prev = int(self.dict[h])
        self.dict[h] = offset + self.offset
        return max(prev - self.offset, 0)

    def slide(self, amount: int) -> None:
        """Shift buffer coordinates by ``amount`` (window forgot that many bytes)."""
        self.offset += amount


def hash_all_u32(data: bytes) -> np.ndarray:
    """Vectorised ``hash_u32_table`` for every position of ``data``.

    Positions past ``len(data) - 8`` hash a zero word, matching the scalar
    spec.  Used for dictionary priming and by the TPU compress path.
    """
    n = len(data)
    buf = np.zeros(n + 8, dtype=np.uint8)
    buf[:n] = np.frombuffer(data, dtype=np.uint8)
    if n >= 8:
        # little-endian u64 at each position via sliding-window view
        words = np.lib.stride_tricks.sliding_window_view(buf[: n + 7], 8).astype(np.uint64)
        v = np.zeros(n, dtype=np.uint64)
        for b in range(8):
            v |= words[:n, b] << np.uint64(8 * b)
        v[n - 7 :] = 0  # <8 bytes available -> reference reads 0
    else:
        v = np.zeros(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        h = ((v << np.uint64(24)) * np.uint64(HASH64_MUL)) >> np.uint64(64 - HASHLOG)
    return h.astype(np.int64)


def prime_u32_table(table: U32Table, dict_bytes: bytes) -> None:
    """Dictionary priming: insert positions 0, 3, 6, … ≤ len-8 of the
    dictionary into the table (``framed/compress.rs:202-214``, which walks
    8-byte windows with ``step_by(3)``).  Later inserts overwrite earlier
    ones on hash collision, which NumPy fancy assignment reproduces
    (last index wins).
    """
    n = len(dict_bytes)
    if n < 8:
        return
    positions = np.arange(0, n - 7, 3, dtype=np.uint32)
    h = hash_all_u32(dict_bytes)[positions.astype(np.int64)]
    table.dict[h] = positions + np.uint32(table.offset)


class U16Table:
    """8192-slot u16 encoder table for payloads ≤ 64 KiB (``compress/mod.rs:78-101``)."""

    payload_size_limit = 0xFFFF
    __slots__ = ("dict", "offset")

    def __init__(self):
        self.dict = np.zeros(DICTIONARY_SIZE * 2, dtype=np.uint16)
        self.offset = 0

    def copy(self) -> "U16Table":
        t = U16Table.__new__(U16Table)
        t.dict = self.dict.copy()
        t.offset = self.offset
        return t

    def replace(self, data: bytes, offset: int) -> int:
        h = hash_u16_table(data, offset)
        prev = int(self.dict[h])
        self.dict[h] = offset + self.offset
        return max(prev - self.offset, 0)

    def slide(self, amount: int) -> None:
        self.offset += amount
