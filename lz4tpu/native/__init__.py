"""C++ native engine: fast host-side block codec + xxHash32 via ctypes.

Drop-in replacements for the spec functions with identical signatures and
bit-identical output (enforced by tests/test_native.py):

* ``compress_block(data, cursor, table, acceleration, cap)`` — raises
  ``spec.block.Incompressible`` on cap overflow, mutating the shared
  NumPy table exactly like the spec does
* ``decompress_block(data, prefix, output_limit)`` — raises
  ``spec.block.DecodeError`` with the same kinds
* ``xxh32(data, seed)`` and streaming ``XXHash32``

This is the task-mandated native equivalent of the reference's Rust core
(compressor ``/root/reference/src/raw/compress/mod.rs``, decompressor
``/root/reference/src/raw/decompress.rs``, checksums via twox-hash): the
frame layer's default engine on host, the oracle for TPU-kernel
differential tests, and the per-block worker for the multi-core host path.
"""

from __future__ import annotations

import ctypes
import threading

import numpy as np

from ..spec.block import DecodeError, Incompressible
from ..spec.table import U16Table, U32Table
from .build import build

_lib = ctypes.CDLL(str(build()))

_lib.lz4tpu_xxh32.restype = ctypes.c_uint32
_lib.lz4tpu_xxh32.argtypes = [ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint32]
_lib.lz4tpu_xxh32_init.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
_lib.lz4tpu_xxh32_update.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint64]
_lib.lz4tpu_xxh32_digest.restype = ctypes.c_uint32
_lib.lz4tpu_xxh32_digest.argtypes = [ctypes.c_void_p, ctypes.c_uint32]

for _name in ("lz4tpu_compress_block_u32", "lz4tpu_compress_block_u16"):
    fn = getattr(_lib, _name)
    fn.restype = ctypes.c_int64
    fn.argtypes = [
        ctypes.c_char_p,  # in
        ctypes.c_uint64,  # n
        ctypes.c_uint64,  # cursor
        ctypes.c_void_p,  # table slots
        ctypes.c_uint64,  # table offset
        ctypes.c_int64,  # cap (-1 = none)
        ctypes.c_uint64,  # acceleration
        ctypes.c_void_p,  # out
        ctypes.c_uint64,  # out capacity
    ]

_lib.lz4tpu_compress_block_hc.restype = ctypes.c_int64
_lib.lz4tpu_compress_block_hc.argtypes = [
    ctypes.c_char_p,  # in
    ctypes.c_uint64,  # n
    ctypes.c_uint64,  # cursor
    ctypes.c_uint64,  # level
    ctypes.c_int64,  # cap (-1 = none)
    ctypes.c_void_p,  # out
    ctypes.c_uint64,  # out capacity
]

_lib.lz4tpu_model_rounds.restype = ctypes.c_int64
_lib.lz4tpu_model_rounds.argtypes = [
    ctypes.c_char_p,  # comp stream
    ctypes.c_uint64,  # n
    ctypes.c_uint64,  # cb
    ctypes.c_uint64,  # flush threshold
    ctypes.c_uint64,  # flush granularity
    ctypes.c_uint64,  # far group bytes
    ctypes.c_uint64,  # mid window bytes
]

_lib.lz4tpu_repack_window.restype = ctypes.c_int64
_lib.lz4tpu_repack_window.argtypes = [
    ctypes.c_char_p,  # comp stream
    ctypes.c_uint64,  # n
    ctypes.c_uint64,  # output_limit
    ctypes.c_uint32,  # ws_log
    ctypes.c_uint64,  # win_r (stride; 0 in the lengths-only pass)
    ctypes.c_void_p,  # out (NULL = lengths-only pass)
    ctypes.c_uint64,  # out capacity
    ctypes.c_void_p,  # chunk_lens (u32[max_chunks])
    ctypes.c_uint64,  # max_chunks
    ctypes.c_void_p,  # total_out (u64*)
]

_lib.lz4tpu_decompress_block.restype = ctypes.c_int64
_lib.lz4tpu_decompress_block.argtypes = [
    ctypes.c_char_p,  # in
    ctypes.c_uint64,  # n
    ctypes.c_char_p,  # prefix
    ctypes.c_uint64,  # prefix len
    ctypes.c_void_p,  # out
    ctypes.c_uint64,  # out capacity
    ctypes.c_uint64,  # output limit
]

_DECODE_ERRORS = {
    -1: DecodeError.KIND_UNEXPECTED_END,
    -2: DecodeError.KIND_MEMORY_LIMIT,
    -3: DecodeError.KIND_ZERO_OFFSET,
    -4: DecodeError.KIND_INVALID_OFFSET,
}


def xxh32(data, seed: int = 0) -> int:
    data = bytes(data)
    return int(_lib.lz4tpu_xxh32(data, len(data), seed))


class XXHash32:
    """Streaming xxHash32 backed by the C++ state machine."""

    def __init__(self, seed: int = 0):
        self._state = ctypes.create_string_buffer(64)
        self._seed = seed
        _lib.lz4tpu_xxh32_init(self._state, seed)

    def update(self, data) -> "XXHash32":
        data = bytes(data)
        _lib.lz4tpu_xxh32_update(self._state, data, len(data))
        return self

    def digest(self) -> int:
        return int(_lib.lz4tpu_xxh32_digest(self._state, self._seed))


def compress_bound(n: int) -> int:
    """Worst-case raw block size: all literals + LSIC overhead."""
    return n + n // 255 + 16


class _BufferPool:
    """Reusable scratch buffers — avoids per-call page-fault churn on the
    hot host path (a fresh np.empty per 4 MiB block costs more in soft
    faults than the codec itself).  Buffers are per-thread: the frame
    writer's threaded independent-block path runs several native calls
    concurrently (ctypes releases the GIL), and a shared buffer would
    let one thread's codec scribble over another's result mid-copy."""

    def __init__(self):
        self._local = threading.local()

    def get(self, capacity: int) -> np.ndarray:
        buf = getattr(self._local, "buf", None)
        if buf is None or buf.size < capacity:
            buf = np.empty(
                max(capacity, 1 << 20, 0 if buf is None else buf.size * 2),
                dtype=np.uint8,
            )
            self._local.buf = buf
        return buf


_compress_pool = _BufferPool()
_decompress_pool = _BufferPool()


def compress_block(
    data,
    cursor: int = 0,
    table=None,
    out=None,
    acceleration: int = 1,
    cap: int | None = None,
) -> bytes:
    """Native greedy parse; same contract as ``spec.block.compress_block``."""
    data = bytes(data)
    if table is None:
        table = U16Table() if len(data) <= 0xFFFF else U32Table()
    if len(data) > table.payload_size_limit:
        from ..spec.block import BlockTooBig

        raise BlockTooBig(
            f"input of {len(data)} bytes exceeds table limit {table.payload_size_limit}"
        )
    capacity = compress_bound(len(data)) if cap is None else min(cap, compress_bound(len(data)))
    buf = _compress_pool.get(max(capacity, 1))
    slots = np.ascontiguousarray(table.dict)
    fn = (
        _lib.lz4tpu_compress_block_u32
        if slots.dtype == np.uint32
        else _lib.lz4tpu_compress_block_u16
    )
    rc = fn(
        data,
        len(data),
        cursor,
        slots.ctypes.data,
        table.offset,
        -1 if cap is None else cap,
        max(int(acceleration), 1),
        buf.ctypes.data,
        capacity,
    )
    if slots is not table.dict:
        table.dict[:] = slots  # keep caller's table state in sync
    if rc < 0:
        raise Incompressible()
    result = buf[:rc].tobytes()
    if out is not None:
        out.extend(result)
        return out
    return result


def compress_block_hc(
    data,
    cursor: int = 0,
    out=None,
    level: int = 9,
    cap: int | None = None,
) -> bytes:
    """Native high-compression parse; same contract as
    ``spec.hc.compress_block_hc`` (bit-identical output, differential
    tested)."""
    data = bytes(data)
    capacity = compress_bound(len(data)) if cap is None else min(cap, compress_bound(len(data)))
    buf = _compress_pool.get(max(capacity, 1))
    rc = _lib.lz4tpu_compress_block_hc(
        data,
        len(data),
        cursor,
        max(int(level), 2),
        -1 if cap is None else cap,
        buf.ctypes.data,
        capacity,
    )
    if rc < 0:
        raise Incompressible()
    result = buf[:rc].tobytes()
    if out is not None:
        out.extend(result)
        return out
    return result


def decompress_block_into(data, out_np, prefix=b"", output_limit=None) -> int:
    """Native block decode directly into caller memory (``out_np``: a
    C-contiguous uint8 numpy view); returns the decoded length.  Used by
    the threaded frame reader to decode each independent block into its
    final resting slice with zero intermediate copies.  A stream whose
    output would exceed the view raises the MEMORY_LIMIT kind (the frame
    layer maps it to BlockSizeOverflow — any such block would overflow
    ``block_maxsize`` anyway)."""
    data = bytes(data)
    prefix = bytes(prefix)
    assert out_np.dtype == np.uint8 and out_np.flags.c_contiguous
    soft_limit = (1 << 62) if output_limit is None else output_limit
    rc = _lib.lz4tpu_decompress_block(
        data, len(data), prefix, len(prefix),
        out_np.ctypes.data, out_np.size, soft_limit,
    )
    if rc == -5:
        raise DecodeError(DecodeError.KIND_MEMORY_LIMIT)
    if rc < 0:
        raise DecodeError(_DECODE_ERRORS.get(int(rc), DecodeError.KIND_UNEXPECTED_END))
    return int(rc)


def decompress_block(
    data,
    prefix=b"",
    out=None,
    output_limit: int | None = None,
) -> bytes:
    """Native block decode; same contract as ``spec.block.decompress_block``."""
    data = bytes(data)
    prefix = bytes(prefix)
    soft_limit = (1 << 62) if output_limit is None else output_limit
    if output_limit is not None:
        # matches are limit-checked; trailing literals add <= len(data)
        capacity = output_limit + len(data)
        retries = 0
    else:
        # no limit: start from the format's practical expansion bound and
        # grow geometrically if a pathological stream exceeds it
        capacity = 256 * len(data) + 64
        retries = 3
    while True:
        buf = _decompress_pool.get(max(capacity, 1))
        rc = _lib.lz4tpu_decompress_block(
            data, len(data), prefix, len(prefix), buf.ctypes.data, capacity, soft_limit
        )
        if rc != -5:
            break
        if retries == 0:
            raise DecodeError(DecodeError.KIND_MEMORY_LIMIT)
        retries -= 1
        capacity *= 16
    if rc < 0:
        raise DecodeError(_DECODE_ERRORS.get(int(rc), DecodeError.KIND_UNEXPECTED_END))
    result = buf[:rc].tobytes()
    if out is not None:
        out.extend(result)
        return out
    return result


def model_decode_rounds(
    comp,
    cb: int = 16,
    flush_thresh: int = 400,
    flush_b: int = 256,
    far_g_bytes: int = 1024,
    mid_bytes: int = 2044,
) -> int:
    """Modeled decode128 lockstep rounds for one raw block (the lane
    kernel's SEQ2 round state machine — scheduling advice for the
    multi-batch balancer; defaults mirror the kernel's shipping config:
    CB=16, RING_W=128, FLUSH_THRESH=400, FLUSH_B=256, FAR_G=256 rows, mid_w=512 rows)."""
    comp = bytes(comp)
    return int(
        _lib.lz4tpu_model_rounds(
            comp, len(comp), cb, flush_thresh, flush_b, far_g_bytes, mid_bytes
        )
    )


def repack_window_lens(comp, output_limit: int, ws_log: int) -> tuple[np.ndarray, int]:
    """Pass 1 of the decodebig window-aligned repack: per-output-window
    chunk lengths (native walk of the sequence stream; typed
    ``DecodeError`` on malformed input).  Returns (chunk_lens, total_out)."""
    comp = bytes(comp)
    max_chunks = (output_limit + len(comp) >> ws_log) + 2
    lens = np.zeros(max_chunks, np.uint32)
    total = np.zeros(1, np.uint64)
    rc = _lib.lz4tpu_repack_window(
        comp, len(comp), output_limit, ws_log, 0, None, 0,
        lens.ctypes.data, max_chunks, total.ctypes.data,
    )
    if rc == -5:
        # ERR_CAPACITY: the C++ side ran out of caller-provided buffer —
        # a sizing bug here, never malformed input
        raise RuntimeError("lz4tpu_repack_window: caller buffer too small (internal bug)")
    if rc < 0:
        raise DecodeError(_DECODE_ERRORS.get(int(rc), DecodeError.KIND_UNEXPECTED_END))
    return lens[:rc], int(total[0])


def repack_window_into(comp, output_limit: int, ws_log: int, win_r: int, out: np.ndarray) -> int:
    """Pass 2: write chunk k's bytes at ``out[k*win_r:]`` (uint8 buffer,
    zero-filled by the caller).  Returns the chunk count."""
    comp = bytes(comp)
    assert out.dtype == np.uint8 and out.flags.c_contiguous
    max_chunks = (output_limit + len(comp) >> ws_log) + 2
    lens = np.zeros(max_chunks, np.uint32)
    total = np.zeros(1, np.uint64)
    rc = _lib.lz4tpu_repack_window(
        comp, len(comp), output_limit, ws_log, win_r,
        out.ctypes.data, out.nbytes, lens.ctypes.data, max_chunks,
        total.ctypes.data,
    )
    if rc == -5:
        raise RuntimeError("lz4tpu_repack_window: caller buffer too small (internal bug)")
    if rc < 0:
        raise DecodeError(_DECODE_ERRORS.get(int(rc), DecodeError.KIND_UNEXPECTED_END))
    return int(rc)


_lib.lz4tpu_prime_tables.restype = None
_lib.lz4tpu_prime_tables.argtypes = [
    ctypes.c_char_p,  # data
    ctypes.c_void_p,  # starts (i64[n])
    ctypes.c_void_p,  # wlens (i64[n])
    ctypes.c_void_p,  # base_offs (i64[n])
    ctypes.c_int64,   # n_lanes
    ctypes.c_int64,   # hashlog
    ctypes.c_void_p,  # tables out (1<<hashlog, 128) int32
]


def prime_tables_native(data, starts, wlens, base_offs, hashlog: int) -> np.ndarray:
    """Transposed (1<<hashlog, 128) pos17|tag15 lane tables primed from
    sliding windows of ``data`` (lane i: data[starts[i]-wlens[i],
    starts[i]), entries at buffer offsets base_offs[i] + step-3
    positions).  Scalar C++ walk — the NumPy equivalent costs 100s of
    ms on hosts with slow vector integer units."""
    data = bytes(data)
    n = len(starts)
    assert n <= 128
    starts = np.ascontiguousarray(starts, np.int64)
    wlens = np.ascontiguousarray(wlens, np.int64)
    base_offs = np.ascontiguousarray(base_offs, np.int64)
    tables = np.empty((1 << hashlog, 128), np.int32)
    _lib.lz4tpu_prime_tables(
        data, starts.ctypes.data, wlens.ctypes.data, base_offs.ctypes.data,
        n, hashlog, tables.ctypes.data,
    )
    return tables


_lib.lz4tpu_tail_split.restype = ctypes.c_int64
_lib.lz4tpu_tail_split.argtypes = [
    ctypes.c_char_p, ctypes.c_uint64, ctypes.c_void_p, ctypes.c_void_p,
]


def tail_split(stream) -> tuple[int, int]:
    """(token position, literal count) of a raw block stream's final
    literal-only sequence; DecodeError on malformed streams."""
    stream = bytes(stream)
    tp = np.zeros(1, np.uint64)
    tl = np.zeros(1, np.uint64)
    rc = _lib.lz4tpu_tail_split(
        stream, len(stream), tp.ctypes.data, tl.ctypes.data
    )
    if rc < 0:
        raise DecodeError(DecodeError.KIND_UNEXPECTED_END)
    return int(tp[0]), int(tl[0])


def splice_streams(payloads) -> bytes:
    """Concatenate standalone raw LZ4 streams into ONE valid stream
    decoding to the concatenation of their outputs.  LZ4 is
    end-delimited: each interior stream's final literal-only sequence
    has no offset field, so its literal bytes are merged into the NEXT
    stream's first sequence (literal-length header rewritten)."""
    out = bytearray()
    pending = b""
    for idx, p in enumerate(payloads):
        p = bytes(p)
        if idx < len(payloads) - 1:
            tpos, tlit = tail_split(p)
            body = p[:tpos]
            lits = p[len(p) - tlit :] if tlit else b""
        else:
            body, lits = p, b""
        if not body:
            pending = pending + lits
            continue
        if pending:
            tok = body[0]
            lit = tok >> 4
            pos = 1
            if lit == 0xF:
                while True:
                    b = body[pos]
                    pos += 1
                    lit += b
                    if b != 0xFF:
                        break
            total = lit + len(pending)
            hdr = bytearray()
            if total >= 15:
                hdr.append(0xF0 | (tok & 0xF))
                rem = total - 15
                while rem >= 255:
                    hdr.append(255)
                    rem -= 255
                hdr.append(rem)
            else:
                hdr.append((total << 4) | (tok & 0xF))
            out += hdr
            out += pending
            out += body[pos:]
        else:
            out += body
        pending = lits
    if pending:
        # every stream was literal-only: emit one literal tail
        total = len(pending)
        if total >= 15:
            out.append(0xF0)
            rem = total - 15
            while rem >= 255:
                out.append(255)
                rem -= 255
            out.append(rem)
        else:
            out.append(total << 4)
        out += pending
    return bytes(out)
