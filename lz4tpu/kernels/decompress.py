"""Host-side entry points for the Pallas raw-block decompressor.

The live kernel lives in ``decompress_v4.py`` (parse-ahead ring + fused
drain; ``decompress_v3.py`` is kept as the measured baseline — see both
docstrings and PERF_NOTES.md for the evolution from the retired v1/v2
designs).  This module is the stable import surface:

* ``decompress_blocks(blocks, prefixes, block_maxsize)`` — batched decode,
  the high-throughput path (one Pallas grid over many blocks);
* ``decompress_block_tpu`` — single-block adapter used by the streaming
  frame API's ``engine="tpu"``;
* the per-block status codes shared with the host validators.

Semantics: ``/root/reference/src/raw/decompress.rs:59-138`` (token loop,
LSIC, prefix/dictionary resolution, typed errors).
"""

from __future__ import annotations

from ..spec.block import DecodeError
from .status import (  # noqa: F401  (re-exported surface)
    ERR_INVALID_OFFSET,
    ERR_MEMORY_LIMIT,
    ERR_UNEXPECTED_END,
    ERR_ZERO_OFFSET,
    OK,
    STATUS_TO_KIND,
)


def decompress_blocks(blocks, prefixes=None, block_maxsize: int = 1 << 16):
    """Decode a batch of raw LZ4 blocks on the TPU; returns a list of
    byte strings.  ``prefixes[i]`` is block *i*'s dictionary / carry-over
    window (only the trailing 64 KiB is addressable).  Raises
    ``DecodeError`` for the first failed block.

    Routing is per block: blocks whose [prefix rows + output + comp]
    shape fits the lane decoder's VMEM budget (``lanes_eligible``) ride
    ``decode128`` (128 blocks per kernel step — the fast path, with
    per-lane right-aligned prefixes); oversized shapes use the scalar v4
    pipeline (which itself host-falls-back past its SMEM window)."""
    from .decode128 import decompress_blocks_128, lanes_eligible

    if prefixes is not None:
        prefixes = [bytes(p) for p in prefixes]
    # a lane batch's prefix rows are sized by its LONGEST prefix, so
    # eligibility uses the batch-wide maximum (conservative for mixed
    # prefix lengths; the common cases are no prefixes or one shared
    # dictionary)
    maxp = (
        max((len(p) for p in prefixes), default=0)
        if prefixes is not None
        else 0
    )
    lane_idx = [
        i
        for i, b in enumerate(blocks)
        if lanes_eligible(len(b), block_maxsize, maxp)
    ]
    # the lockstep kernel's wall time is round-bound regardless of live
    # lanes, so small batches (e.g. the streaming engine="tpu" adapter's
    # one-block calls) are faster on the scalar pipeline: lane aggregate
    # ~275 MB/s * k/128 vs ~58 MB/s per v4 block => break-even ~27 lanes
    if len(lane_idx) < 24:
        lane_idx = []
    out = [None] * len(blocks)
    for base in range(0, len(lane_idx), 128):
        idxs = lane_idx[base : base + 128]
        for i, o in zip(
            idxs,
            decompress_blocks_128(
                [blocks[i] for i in idxs],
                block_maxsize=block_maxsize,
                prefixes=(
                    [prefixes[i] for i in idxs]
                    if prefixes is not None
                    else None
                ),
            ),
        ):
            out[i] = o
    rest = [i for i in range(len(blocks)) if out[i] is None]
    if rest:
        from .decompress_v4 import decompress_blocks_v4

        for i, o in zip(
            rest,
            decompress_blocks_v4(
                [blocks[i] for i in rest],
                [bytes(prefixes[i]) for i in rest] if prefixes else None,
                block_maxsize=block_maxsize,
            ),
        ):
            out[i] = o
    return out


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def decompress_block_tpu(data, prefix=b"", out=None, output_limit=None):
    """Single-block engine adapter (``engine='tpu'``); the batch API above
    is the high-throughput path.

    ``output_limit=None`` means "unbounded" in the spec/native engines; the
    TPU kernel needs a static output capacity, so we start at 4 MiB and
    retry with doubled capacity on ``memory_limit_exceeded`` up to the LZ4
    format's true expansion bound (≤255 output bytes per input byte), which
    keeps the three engines contract-interchangeable.
    """
    data = bytes(data)
    if output_limit is not None:
        result = decompress_blocks(
            [data], [bytes(prefix)], block_maxsize=output_limit
        )[0]
    else:
        hard_bound = 255 * max(len(data), 1) + 64
        limit = 1 << 22
        while True:
            try:
                result = decompress_blocks(
                    [data], [bytes(prefix)], block_maxsize=limit
                )[0]
                break
            except DecodeError as e:
                if e.kind != DecodeError.KIND_MEMORY_LIMIT or limit >= hard_bound:
                    raise
                limit = min(limit * 2, _round_up(hard_bound, 4))
    if out is not None:
        out.extend(result)
        return out
    return result
