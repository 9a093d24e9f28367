"""Pallas TPU raw-block decompressor.

TPU-native re-design of the reference decoder
(``/root/reference/src/raw/decompress.rs:59-138``) — not a translation: the
byte-serial token loop is split across the TPU's two engines:

* the **scalar core** walks sequence headers (token, LSIC varints, offsets)
  out of a *packed-word copy of the compressed stream held in SMEM*, where
  dynamic scalar loads are cheap;
* the **VPU** executes all data movement as 128-byte masked vector chunks in
  VMEM over an *unpacked byte-per-int32 layout*: dynamic sublane slices +
  dynamic lane rolls realign arbitrary byte offsets, and overlapping match
  copies use a lag that is the smallest multiple of the match offset ≥ 128
  with a masked-doubling bootstrap (log-time pattern replication, the
  vector generalisation of the reference's 16-byte pattern buffer,
  ``decompress.rs:112-127``).

One grid step decodes one block; Pallas pipelines the HBM↔VMEM transfers
of neighbouring blocks, and the chip processes a large batch of blocks per
call.  Multi-chip batches shard over a mesh in ``lz4tpu.parallel``.

Error handling mirrors the spec's typed ``DecodeError`` as a per-block
status code: every data-derived index is clamped so hostile input can never
read or write out of bounds (the kernel-level analogue of
``raw/decompress.rs:53-57``), and the block's status reports the first
error encountered.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..spec.block import DecodeError

# status codes (match spec.block.DecodeError kinds; 0 = ok)
OK = 0
ERR_UNEXPECTED_END = 1
ERR_MEMORY_LIMIT = 2
ERR_ZERO_OFFSET = 3
ERR_INVALID_OFFSET = 4

STATUS_TO_KIND = {
    ERR_UNEXPECTED_END: DecodeError.KIND_UNEXPECTED_END,
    ERR_MEMORY_LIMIT: DecodeError.KIND_MEMORY_LIMIT,
    ERR_ZERO_OFFSET: DecodeError.KIND_ZERO_OFFSET,
    ERR_INVALID_OFFSET: DecodeError.KIND_INVALID_OFFSET,
}

LANES = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# vector chunk primitives (byte-per-int32 layout, (rows, 128) in VMEM)
# ---------------------------------------------------------------------------


def _read_chunk(src_ref, byte_off):
    """Load 128 consecutive bytes starting at arbitrary ``byte_off`` from an
    unpacked (R,128) ref as a (1,128) vector: two-row sublane slice + lane
    roll + lane select."""
    row = byte_off // LANES
    c = byte_off % LANES
    two = src_ref[pl.ds(row, 2), :]  # (2,128)
    rolled = pltpu.roll(two, (LANES - c) % LANES, 1)  # rolled[r, j] = two[r, (j+c)%128]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    return jnp.where(lane < LANES - c, rolled[0:1, :], rolled[1:2, :])


def _write_chunk(dst_ref, byte_off, chunk, valid_len):
    """Store ``chunk[0, :valid_len]`` at arbitrary ``byte_off`` into an
    unpacked (R,128) ref: lane roll + masked read-modify-write of two rows."""
    row = byte_off // LANES
    e = byte_off % LANES
    rolled = pltpu.roll(chunk, e, 1)  # rolled[j] = chunk[(j - e) % 128]
    two = jnp.concatenate([rolled, rolled], axis=0)  # (2,128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (2, LANES), 1)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (2, LANES), 0)
    pos = lane - e + LANES * rowi  # position within the chunk
    mask = (pos >= 0) & (pos < valid_len)
    old = dst_ref[pl.ds(row, 2), :]
    dst_ref[pl.ds(row, 2), :] = jnp.where(mask, two, old)


def _copy_chunks(src_ref, src_off, dst_ref, dst_off, length):
    """Non-overlapping byte copy between unpacked refs, 128 bytes per step."""
    n_chunks = pl.cdiv(length, LANES)

    def body(k, _):
        off = k * LANES
        chunk = _read_chunk(src_ref, src_off + off)
        _write_chunk(dst_ref, dst_off + off, chunk, jnp.minimum(length - off, LANES))
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0, unroll=False)


def _match_copy(out_ref, dst, offset, length):
    """Self-referential match copy: out[dst+i] = out[dst+i-offset].

    For offset >= 128 this degenerates to plain chunked copying.  For small
    offsets the source region is lagged by the smallest multiple of
    ``offset`` that is >= the chunk we copy, and a masked-doubling bootstrap
    grows the valid pattern span — O(length/128 + log(128/offset)) steps.
    """

    def cond(c):
        return c < length

    def body(s):
        # largest multiple of offset that keeps reads inside [dst-offset, dst+s)
        step = ((s + offset) // offset) * offset
        copy_len = jnp.minimum(jnp.minimum(LANES, length - s), step)
        chunk = _read_chunk(out_ref, dst + s - step)
        _write_chunk(out_ref, dst + s, chunk, copy_len)
        return s + copy_len

    jax.lax.while_loop(cond, body, jnp.int32(0))


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _decode_kernel(
    comp_words_ref,  # SMEM (1, 1, W) int32 — packed LE words of the compressed stream
    comp_len_ref,  # SMEM (1, 1, 1) int32
    prefix_len_ref,  # SMEM (1, 1, 1) int32
    comp_bytes_ref,  # VMEM (1, Rc, 128) int32 — unpacked bytes
    prefix_bytes_ref,  # VMEM (1, Rp, 128) int32 — unpacked prefix bytes
    out_bytes_ref,  # VMEM (1, Ro, 128) int32 — unpacked output
    out_len_ref,  # SMEM (1, 1, 1) int32
    status_ref,  # SMEM (1, 1, 1) int32
    *,
    output_limit: int,
    rc: int,
    rp: int,
    ro: int,
):
    n = comp_len_ref[0, 0, 0]
    prefix_len = prefix_len_ref[0, 0, 0]
    comp_b = comp_bytes_ref.at[0]
    prefix_b = prefix_bytes_ref.at[0]
    out_b = out_bytes_ref.at[0]

    max_word = rc * LANES // 4 - 1

    def read_byte(p):
        """Scalar byte read from the packed SMEM copy (clamped index)."""
        idx = jnp.minimum(p >> 2, max_word)
        word = comp_words_ref[0, 0, idx]
        return (word >> ((p & 3) * 8)) & 0xFF

    def read_lsic(initial, p, ok):
        """LSIC varint: keep adding bytes while 0xFF (decompress.rs:31-43)."""

        def cond(c):
            _, _, st, last = c
            return (last == 0xFF) & (st == OK)

        def body(c):
            v, p, st, _ = c
            eof = p >= n
            b = read_byte(jnp.minimum(p, n - 1))
            st = jnp.where(eof, ERR_UNEXPECTED_END, st)
            b = jnp.where(eof, 0, b)
            return v + b, p + 1, st, b

        last0 = jnp.where((initial == 0xF) & ok, 0xFF, 0)
        v, p, st, _ = jax.lax.while_loop(
            cond, body, (initial, p, jnp.int32(OK), last0)
        )
        return v, p, st

    def seq_cond(c):
        pos, _, status = c
        return (pos < n) & (status == OK)

    def seq_body(c):
        pos, out_len, status = c

        token = read_byte(pos)
        pos = pos + 1

        # --- literals ---
        lit_len, pos, status = read_lsic(token >> 4, pos, True)
        status = jnp.where(
            (status == OK) & (pos + lit_len > n), ERR_UNEXPECTED_END, status
        )
        lit_copy = jnp.where(status == OK, lit_len, 0)
        _copy_chunks(comp_b, pos, out_b, out_len, lit_copy)
        pos = pos + lit_copy
        out_len = out_len + lit_copy

        # --- match (absent if <2 bytes remain: the token re-read semantics
        #     of decompress.rs:70 fall out of the loop structure) ---
        have_match = (status == OK) & (n - pos >= 2)
        b0 = read_byte(jnp.minimum(pos, n - 1))
        b1 = read_byte(jnp.minimum(pos + 1, n - 1))
        offset = jnp.where(have_match, b0 | (b1 << 8), 1)
        pos = pos + jnp.where(have_match, 2, 0)

        mv, pos2, vst = read_lsic(
            jnp.where(have_match, token & 0xF, 0), pos, have_match
        )
        pos = jnp.where(have_match, pos2, pos)
        status = jnp.where(have_match & (vst != OK), vst, status)
        match_len = jnp.where(have_match & (status == OK), mv + 4, 0)

        status = jnp.where(
            have_match & (status == OK) & (out_len + match_len > output_limit),
            ERR_MEMORY_LIMIT,
            status,
        )
        status = jnp.where(
            have_match & (status == OK) & (offset == 0), ERR_ZERO_OFFSET, status
        )

        # prefix resolution (decompress.rs:84-99)
        prefix_needed = jnp.maximum(offset - out_len, 0)
        status = jnp.where(
            have_match & (status == OK) & (prefix_needed > prefix_len),
            ERR_INVALID_OFFSET,
            status,
        )
        ok = have_match & (status == OK) & (match_len > 0)
        take = jnp.where(ok, jnp.minimum(prefix_needed, match_len), 0)
        _copy_chunks(prefix_b, prefix_len - prefix_needed, out_b, out_len, take)
        out_len = out_len + take

        remaining = jnp.where(ok, match_len - take, 0)
        _match_copy(out_b, out_len, offset, remaining)
        out_len = out_len + remaining

        return pos, out_len, status

    pos, out_len, status = jax.lax.while_loop(
        seq_cond, seq_body, (jnp.int32(0), jnp.int32(0), jnp.int32(OK))
    )
    out_len_ref[0, 0, 0] = out_len
    status_ref[0, 0, 0] = status


# ---------------------------------------------------------------------------
# XLA wrapper
# ---------------------------------------------------------------------------


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(
    jax.jit, static_argnames=("block_maxsize", "comp_capacity", "prefix_capacity")
)
def _decompress_batch_jit(
    comp_u8,  # uint8 [N, C]
    comp_len,  # int32 [N]
    prefix_u8,  # uint8 [N, P]
    prefix_len,  # int32 [N]
    *,
    block_maxsize: int,
    comp_capacity: int,
    prefix_capacity: int,
):
    n_blocks, c = comp_u8.shape
    assert c == comp_capacity
    p = prefix_u8.shape[1]
    assert p == prefix_capacity

    rc = comp_capacity // LANES + 2  # +2 rows: chunk reads may touch row+1
    rp = prefix_capacity // LANES + 2
    # output capacity: matches are limit-checked at block_maxsize; trailing
    # literals can add at most comp_capacity more (soft-limit semantics)
    ro = (block_maxsize + comp_capacity) // LANES + 2

    comp_i32 = comp_u8.astype(jnp.int32)
    comp_bytes = jnp.zeros((n_blocks, rc * LANES), jnp.int32).at[:, :c].set(comp_i32)
    comp_bytes = comp_bytes.reshape(n_blocks, rc, LANES)

    w = rc * LANES // 4
    cw = comp_bytes.reshape(n_blocks, w, 4).astype(jnp.uint32)
    comp_words = (
        cw[:, :, 0] | (cw[:, :, 1] << 8) | (cw[:, :, 2] << 16) | (cw[:, :, 3] << 24)
    ).astype(jnp.int32)

    prefix_i32 = prefix_u8.astype(jnp.int32)
    prefix_bytes = (
        jnp.zeros((n_blocks, rp * LANES), jnp.int32).at[:, :p].set(prefix_i32)
    ).reshape(n_blocks, rp, LANES)

    kernel = functools.partial(
        _decode_kernel,
        output_limit=block_maxsize,
        rc=rc,
        rp=rp,
        ro=ro,
    )

    out_bytes, out_len, status = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1, w), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, rc, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rp, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, ro, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, ro, LANES), jnp.int32),
            jax.ShapeDtypeStruct((n_blocks, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_blocks, 1, 1), jnp.int32),
        ],
        interpret=_interpret(),
    )(
        comp_words.reshape(n_blocks, 1, w),
        comp_len.reshape(n_blocks, 1, 1),
        prefix_len.reshape(n_blocks, 1, 1),
        comp_bytes,
        prefix_bytes,
    )

    out_u8 = out_bytes.reshape(n_blocks, ro * LANES).astype(jnp.uint8)
    return out_u8, out_len.reshape(n_blocks), status.reshape(n_blocks)


def decompress_blocks(blocks, prefixes=None, block_maxsize: int = 1 << 16):
    """Decode a batch of raw LZ4 blocks on the TPU (v3 register-accumulator
    kernel; see decompress_v3.py).  v2/v1 remain as baselines."""
    from .decompress_v3 import decompress_blocks_v3

    return decompress_blocks_v3(blocks, prefixes, block_maxsize=block_maxsize)


def decompress_blocks_v1(
    blocks,
    prefixes=None,
    block_maxsize: int = 1 << 16,
):
    """Decode a batch of raw LZ4 blocks on the TPU.

    ``blocks`` — list of compressed byte strings; ``prefixes`` — optional
    list of per-block prefixes (dictionary / carry-over window, only the
    trailing 64 KiB is addressable).  Returns a list of decompressed byte
    strings.  Raises ``DecodeError`` for the first failed block.
    """
    n_blocks = len(blocks)
    if n_blocks == 0:
        return []
    if prefixes is None:
        prefixes = [b""] * n_blocks
    prefixes = [bytes(p)[-65536:] for p in prefixes]

    comp_capacity = _round_up(max(max(len(b) for b in blocks), 1), LANES)
    prefix_capacity = _round_up(max(max(len(p) for p in prefixes), 1), LANES)

    comp = np.zeros((n_blocks, comp_capacity), np.uint8)
    comp_len = np.zeros(n_blocks, np.int32)
    for i, b in enumerate(blocks):
        comp[i, : len(b)] = np.frombuffer(bytes(b), np.uint8)
        comp_len[i] = len(b)
    # left-aligned: the kernel indexes prefix bytes as
    # [prefix_len - needed, prefix_len) from the start of the buffer
    pref = np.zeros((n_blocks, prefix_capacity), np.uint8)
    pref_len = np.zeros(n_blocks, np.int32)
    for i, b in enumerate(prefixes):
        if len(b):
            pref[i, : len(b)] = np.frombuffer(b, np.uint8)
            pref_len[i] = len(b)

    out_u8, out_len, status = _decompress_batch_jit(
        jnp.asarray(comp),
        jnp.asarray(comp_len),
        jnp.asarray(pref),
        jnp.asarray(pref_len),
        block_maxsize=block_maxsize,
        comp_capacity=comp_capacity,
        prefix_capacity=prefix_capacity,
    )
    out_u8 = np.asarray(out_u8)
    out_len = np.asarray(out_len)
    status = np.asarray(status)

    results = []
    for i in range(n_blocks):
        if status[i] != OK:
            raise DecodeError(STATUS_TO_KIND[int(status[i])])
        results.append(out_u8[i, : out_len[i]].tobytes())
    return results


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
