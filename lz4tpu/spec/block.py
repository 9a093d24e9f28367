"""Executable spec of the raw LZ4 block codec.

This is the oracle implementation: a direct, slow, obviously-correct
statement of the sequence format and of the exact greedy-parse heuristics
required for byte-for-byte output parity with the C reference
implementation.  Mirrors:

* compressor: ``/root/reference/src/raw/compress/mod.rs:147-260``
  (skip-acceleration, backtracking, the cursor-2 re-insert, the last-12 /
  last-5 byte end rules, LSIC emission)
* decompressor: ``/root/reference/src/raw/decompress.rs:28-138``
  (LSIC parsing, prefix/dictionary resolution, overlap-copy semantics,
  typed error conditions)

The Pallas kernels (``lz4tpu/kernels``) and the C++ engine
(``lz4tpu/native``) are differentially tested against this module.
"""

from __future__ import annotations

from dataclasses import dataclass

from .table import MINMATCH, U16Table, U32Table

ACCELERATION = 1
SKIP_TRIGGER = 6  # every 64 misses the skip stride grows by one

# The spec's arbitrary end-of-block rules (compress/mod.rs:178-195):
# the last 12 bytes are always emitted as literals (a final literal-only
# token), and the last 5 bytes may never be part of a match.
LAST_LITERALS = 12
MFLIMIT = 5


class BlockTooBig(ValueError):
    """Input exceeds the encoder table's payload size limit."""


class Incompressible(Exception):
    """Raised when output would exceed the caller's byte cap.

    Mirrors the reference's ``NoPartialWrites`` all-or-nothing writer
    (``framed/compress.rs:285-314``): the frame layer caps compressed output
    at the raw input size and stores the block uncompressed on overflow.
    The encoder table keeps all mutations made up to the abort point, which
    is what makes subsequent linked-mode blocks bit-exact.  Abort is checked
    per emitted group, which is equivalent to the reference's per-write
    granularity: table mutations only happen in the match-search loop, and
    any write overflow within a group aborts before the next group's
    searches either way.
    """


@dataclass(frozen=True)
class DecodeError(Exception):
    """Typed decode failure, mirroring ``raw/decompress.rs:8-17``."""

    kind: str  # one of the KIND_* constants below

    KIND_UNEXPECTED_END = "unexpected_end"
    KIND_MEMORY_LIMIT = "memory_limit_exceeded"
    KIND_ZERO_OFFSET = "zero_deduplication_offset"
    KIND_INVALID_OFFSET = "invalid_deduplication_offset"

    def __str__(self) -> str:
        return f"DecodeError({self.kind})"


def _count_matching_bytes(data: bytes, a_start: int, a_end: int, b_start: int) -> int:
    """Match-extension: longest common prefix of data[a_start:a_end] and
    data[b_start:], with the reference's exact word-at-a-time semantics
    (``compress/mod.rs:117-145``).

    The reference compares 8-byte chunks and, only if *every* full chunk pair
    matched, compares up to 7 trailing bytes.  The chunked loop stops at the
    first differing chunk using trailing_zeros, which is equivalent to plain
    longest-common-prefix — so a straight LCP is bit-exact here.
    """
    a_len = a_end - a_start
    b_len = len(data) - b_start
    limit = min(a_len, b_len)
    n = 0
    while n < limit and data[a_start + n] == data[b_start + n]:
        n += 1
    return n


def _write_lsic_tail(out: bytearray, value: int) -> None:
    """LSIC varint continuation bytes (``compress/mod.rs:243-260``).

    The head (min(value, 15)) lives in the token; if it saturated, emit
    (value-15) as a run of 0xFF bytes plus a final byte < 0xFF.  The
    reference's 4×0xFF fast path writes the same bytes.
    """
    if value < 0xF:
        return
    value -= 0xF
    out.extend(b"\xff" * (value // 0xFF))
    out.append(value % 0xFF)


def compress_block(
    data,
    cursor: int = 0,
    table=None,
    out: bytearray | None = None,
    acceleration: int = ACCELERATION,
    cap: int | None = None,
) -> bytearray:
    """Greedy LZ4 parse of ``data[cursor:]`` into raw block format.

    ``data[:cursor]`` is the already-known prefix (dictionary / linked-block
    carry-over window); matches may reach back into it.  ``table`` carries
    match-finder state across blocks in linked mode.

    Exactly reproduces ``compress2`` (``compress/mod.rs:166-238``):

    * a position may match only if it is not the first cursor position and
      the candidate is within 0xFFFF bytes
    * matches extend ≥ MINMATCH bytes, never into the last 5 bytes
    * the match start is backtracked into pending literals
    * after a match, ``cursor - 2`` is re-inserted into the table
    * on a miss the cursor advances by ``step``; from the second miss of
      each run onward, ``step = step_counter >> SKIP_TRIGGER`` with the
      counter starting at ``acceleration << SKIP_TRIGGER`` and then
      incrementing — so advances go 1, 1, a, a, … exactly like C
      ``LZ4_compress_fast`` for every acceleration (and exactly like the
      reference for its hardwired ``ACCELERATION = 1``)
    * if fewer than 12 bytes remain the block ends with a literal-only token
    """
    data = bytes(data)
    if table is None:
        table = U16Table() if len(data) <= 0xFFFF else U32Table()
    if len(data) > table.payload_size_limit:
        raise BlockTooBig(
            f"input of {len(data)} bytes exceeds table limit {table.payload_size_limit}"
        )
    if out is None:
        out = bytearray()

    init_cursor = cursor
    n = len(data)

    while cursor < n:
        literal_start = cursor
        step_counter = acceleration << SKIP_TRIGGER
        step = 1

        # -- find a duplicate ------------------------------------------------
        while True:
            # tail guard: bail to a literal-only ending when the NEXT probe
            # would pass n-11.  At step == 1 (thus everywhere when
            # acceleration == 1, including the reference's whole behavior
            # space) this is exactly the reference's `n - cursor < 12` rule
            # (compress/mod.rs:179); for larger steps it replicates C
            # liblz4's `forwardIp > mflimitPlusOne` bail, which skips
            # still-in-range positions — verified byte-exact against
            # liblz4 1.9.4 for acceleration 1..1000
            if cursor + step > n - (LAST_LITERALS - 1):
                # end with a literal-only token
                literal_len = n - literal_start
                group = bytearray()
                group.append(min(literal_len, 0xF) << 4)
                _write_lsic_tail(group, literal_len)
                group.extend(data[literal_start:n])
                if cap is not None and len(out) + len(group) > cap:
                    raise Incompressible()
                out.extend(group)
                return out

            candidate = table.replace(data, cursor)

            if cursor != init_cursor and cursor - candidate <= 0xFFFF:
                matching = _count_matching_bytes(data, cursor, n - MFLIMIT, candidate)
                if matching >= MINMATCH:
                    extra = matching - MINMATCH
                    offset = cursor - candidate

                    # backtrack the match start into pending literals
                    backtrack = 0
                    max_backtrack = cursor - literal_start
                    while (
                        backtrack < max_backtrack
                        and candidate - backtrack > 0
                        and data[cursor - backtrack - 1] == data[candidate - backtrack - 1]
                    ):
                        backtrack += 1
                    extra += backtrack
                    cursor += matching
                    table.replace(data, cursor - 2)
                    break

            cursor += step
            # the step assignment lags one miss behind the advance (C's
            # `forwardIp += step; step = searchMatchNb++ >> skipTrigger`
            # uses the PREVIOUS iteration's step), so advances go
            # 1, 1, a, a, ... — identical to the reference at a == 1,
            # byte-exact with LZ4_compress_fast for every acceleration
            if literal_start + 1 != cursor:
                step = step_counter >> SKIP_TRIGGER
                step_counter += 1

        # -- emit token + literals + match -----------------------------------
        literal_end = cursor - extra - MINMATCH
        literal_len = literal_end - literal_start
        group = bytearray()
        token = (min(literal_len, 0xF) << 4) | min(extra, 0xF)
        group.append(token)
        _write_lsic_tail(group, literal_len)
        group.extend(data[literal_start:literal_end])
        group.extend(offset.to_bytes(2, "little"))
        _write_lsic_tail(group, extra)
        if cap is not None and len(out) + len(group) > cap:
            raise Incompressible()
        out.extend(group)

    return out


def _read_lsic(data: bytes, pos: int, initial: int) -> tuple[int, int]:
    """LSIC varint read (``decompress.rs:31-43``); returns (value, new_pos)."""
    value = initial
    if value == 0xF:
        while True:
            if pos >= len(data):
                raise DecodeError(DecodeError.KIND_UNEXPECTED_END)
            more = data[pos]
            pos += 1
            value += more
            if more != 0xFF:
                break
    return value, pos


def decompress_block(
    data,
    prefix=b"",
    out: bytearray | None = None,
    output_limit: int | None = None,
) -> bytearray:
    """Decode a raw LZ4 block, mirroring ``decompress_raw``
    (``decompress.rs:59-138``).

    ``prefix`` serves back-references that reach before the start of
    ``out`` (dictionary or linked-block carry-over window).  ``output_limit``
    is the soft OOM guard: a match that would push ``len(out)`` past it
    raises ``MemoryLimitExceeded`` (literals may exceed it by up to
    ``len(data)``, as in the reference).
    """
    data = bytes(data)
    prefix = bytes(prefix)
    if out is None:
        out = bytearray()
    if output_limit is None:
        output_limit = 1 << 62
    pos = 0
    n = len(data)

    while pos < n:
        token = data[pos]
        pos += 1

        literal_len, pos = _read_lsic(data, pos, token >> 4)
        if pos + literal_len > n:
            raise DecodeError(DecodeError.KIND_UNEXPECTED_END)
        out.extend(data[pos : pos + literal_len])
        pos += literal_len

        # A block may end after literals.  A failed u16 offset read consumes
        # nothing (decompress.rs:70 `if let Ok(offset)`), so with exactly one
        # byte left that byte is re-read as a token on the next iteration
        # (clean EOF only if its literal nibble is 0); with zero bytes left
        # the loop ends cleanly.
        if n - pos < 2:
            continue
        offset = int.from_bytes(data[pos : pos + 2], "little")
        pos += 2
        match_len, pos = _read_lsic(data, pos, token & 0xF)
        match_len += MINMATCH
        if len(out) + match_len > output_limit:
            raise DecodeError(DecodeError.KIND_MEMORY_LIMIT)
        _copy_overlapping(offset, match_len, prefix, out)

    return out


def _copy_overlapping(offset: int, match_len: int, prefix: bytes, out: bytearray) -> None:
    """Back-reference copy with prefix resolution (``decompress.rs:80-138``).

    The reference has five dispatch paths (memset, non-overlapping memcpy,
    power-of-two pattern replication, byte loop, prefix); they are all
    behaviourally the canonical 'copy one byte at a time from
    ``pos - offset``' loop, which we state directly — plus the prefix path
    for offsets reaching before the block start.
    """
    if offset == 0:
        raise DecodeError(DecodeError.KIND_ZERO_OFFSET)
    old_len = len(out)
    if offset > old_len:
        prefix_needed = offset - old_len
        if prefix_needed > len(prefix):
            raise DecodeError(DecodeError.KIND_INVALID_OFFSET)
        take = min(prefix_needed, match_len)
        start = len(prefix) - prefix_needed
        out.extend(prefix[start : start + take])
        remaining = match_len - take
        if remaining:
            # cursor advanced by `take`, so the same offset now resolves
            # entirely within `out` (reference recurses with empty prefix)
            _copy_overlapping(offset, remaining, b"", out)
        return
    if match_len <= offset:
        # non-overlapping fast path — plain slice copy
        out.extend(out[old_len - offset : old_len - offset + match_len])
        return
    for i in range(match_len):
        out.append(out[old_len - offset + i])
