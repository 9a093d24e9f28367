"""Pallas TPU raw-block decompressor, v2 — interleaved state machines.

Second-generation design (v1 in ``decompress.py`` is the readable
correctness baseline).  Two observations drive it, both measured on v5e
hardware:

1. a dependent scalar→vector→memory chain costs ~300-500 cycles per
   dynamic-index chunk op, so per-sequence decode cost is latency-bound;
2. different blocks are fully independent, so their chains can overlap.

The kernel decodes K blocks per grid step in lockstep: each uniform loop
iteration advances every block's small state machine — *parse* one
sequence header (scalar reads from the packed-word SMEM image) and move
one 512-byte chunk (VPU) — with all control flow expressed as masks, no
nested data-dependent loops (the LSIC varint loop is the one exception
and almost never iterates).  K independent chains let the scalar core and
the VPU overlap work instead of stalling on each other.

Data plane:

* chunks are 512 bytes = 4 rows of the byte-per-int32 layout; arbitrary
  byte alignment = 5-row read + dynamic lane roll + two-view select on
  load, 5-row masked read-modify-write on store;
* the output buffer embeds the prefix (dictionary / linked-block window)
  right-aligned immediately *before* the output region, so prefix-reaching
  matches are ordinary backward copies — the reference's recursive prefix
  path (``raw/decompress.rs:84-99``) disappears entirely;
* overlapping matches copy with a lag that is always a multiple of the
  offset, doubling from ``offset`` up to the chunk size (log-time
  bootstrap) — the 512-byte vector generalisation of the reference's
  16-byte pattern trick (``raw/decompress.rs:112-127``).  The copy source
  ``dst - lag`` is invariant under doubling, which keeps every read inside
  the valid [prefix|output) region by construction.

Safety: every data-derived index is clamped; malformed streams set a
per-block typed status (same kinds as ``spec.block.DecodeError``) and the
block's machine halts while the others continue.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..spec.block import DecodeError
from .decompress import (
    ERR_INVALID_OFFSET,
    ERR_MEMORY_LIMIT,
    ERR_UNEXPECTED_END,
    ERR_ZERO_OFFSET,
    OK,
    STATUS_TO_KIND,
)

LANES = 128
CHUNK = 512  # bytes per vector move
CROWS = CHUNK // LANES  # 4

MODE_PARSE, MODE_LIT, MODE_MATCH = 0, 1, 2


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _read_chunk(ref, byte_off):
    """CHUNK bytes at arbitrary ``byte_off`` from an unpacked (R,128) ref,
    returned as (CROWS,128): 5-row sublane slice + lane roll + select."""
    byte_off = jnp.maximum(byte_off, 0)
    row = byte_off // LANES
    c = byte_off % LANES
    five = ref[pl.ds(row, CROWS + 1), :]
    rolled = pltpu.roll(five, (LANES - c) % LANES, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (CROWS, LANES), 1)
    return jnp.where(lane < LANES - c, rolled[:CROWS, :], rolled[1:, :])


def _write_chunk(ref, byte_off, chunk, valid_len):
    """Masked store of the first ``valid_len`` bytes of ``chunk`` at
    ``byte_off``: lane roll + (CROWS+1)-row masked read-modify-write."""
    row = byte_off // LANES
    e = byte_off % LANES
    rolled = pltpu.roll(chunk, e, 1)
    zero = jnp.zeros((1, LANES), jnp.int32)
    top = jnp.concatenate([zero, rolled], axis=0)  # contributes rolled[j-1]
    bot = jnp.concatenate([rolled, zero], axis=0)  # contributes rolled[j]
    lane = jax.lax.broadcasted_iota(jnp.int32, (CROWS + 1, LANES), 1)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (CROWS + 1, LANES), 0)
    val = jnp.where(lane >= e, bot, top)
    pos = rowi * LANES + lane - e  # byte index within the chunk
    mask = (pos >= 0) & (pos < valid_len)
    old = ref[pl.ds(row, CROWS + 1), :]
    ref[pl.ds(row, CROWS + 1), :] = jnp.where(mask, val, old)


def _decode_v2_kernel(
    comp_words_ref,  # SMEM (K, 1, W) int32 — packed stream image
    comp_len_ref,  # SMEM (K, 1, 1) int32
    prefix_len_ref,  # SMEM (K, 1, 1) int32
    comp_bytes_ref,  # VMEM (K, Rc, 128) int32 — unpacked stream bytes
    prefix_bytes_ref,  # VMEM (K, Rp(+1), 128) int32 — right-aligned prefix
    out_bytes_ref,  # VMEM (K, Rt, 128) int32 — [prefix rows | output rows]
    out_len_ref,  # SMEM (K, 1, 1) int32
    status_ref,  # SMEM (K, 1, 1) int32
    *,
    k_blocks: int,
    output_limit: int,
    rp: int,  # prefix rows
    w: int,
    parse_only: bool = False,  # perf-bisect instrumentation: skip the data plane
):
    rp_bytes = rp * LANES
    max_word = w - 1

    # seed the prefix region of each block's output buffer
    if rp:
        def copy_prefix(i, _):
            for k in range(k_blocks):
                out_bytes_ref[k, pl.ds(i, 1), :] = prefix_bytes_ref[k, pl.ds(i, 1), :]
            return 0

        jax.lax.fori_loop(0, rp, copy_prefix, 0)

    def read_byte(k, p):
        idx = jnp.minimum(jnp.maximum(p, 0) >> 2, max_word)
        word = comp_words_ref[k, 0, idx]
        return jax.lax.shift_right_logical(word, (p & 3) * 8) & 0xFF

    def read_lsic(k, n, initial, p, enable):
        def cond(c):
            _, _, st, last = c
            return (last == 0xFF) & (st == OK)

        def body(c):
            v, p, st, _ = c
            eof = p >= n
            b = jnp.where(eof, 0, read_byte(k, jnp.minimum(p, n - 1)))
            st = jnp.where(eof, ERR_UNEXPECTED_END, st)
            return v + b, p + 1, st, b

        last0 = jnp.where((initial == 0xF) & enable, 0xFF, 0)
        v, p, st, _ = jax.lax.while_loop(
            cond, body, (initial, p, jnp.int32(OK), last0)
        )
        return v, p, st

    def init_state():
        z = jnp.int32(0)
        return (z, z, jnp.int32(OK), jnp.int32(MODE_PARSE), z, z, z, jnp.int32(1), z, jnp.int32(1))

    def step_block(k, state):
        (pos, out_len, status, mode, has_match, lit_src, lit_rem, m_off, m_rem, m_lag) = state
        n = comp_len_ref[k, 0, 0]
        prefix_len = prefix_len_ref[k, 0, 0]
        comp_b = comp_bytes_ref.at[k]
        out_b = out_bytes_ref.at[k]

        # ---------------- parse phase ----------------
        parsing = (mode == MODE_PARSE) & (pos < n) & (status == OK)
        token = jnp.where(parsing, read_byte(k, pos), 0)
        litv, p1, st1 = read_lsic(k, n, token >> 4, pos + 1, parsing)
        status = jnp.where(parsing & (st1 != OK), st1, status)
        pok = parsing & (status == OK)
        status = jnp.where(pok & (p1 + litv > n), ERR_UNEXPECTED_END, status)
        pok &= status == OK

        p_after_lit = p1 + litv
        hm = pok & (n - p_after_lit >= 2)
        b0 = read_byte(k, jnp.minimum(p_after_lit, n - 1))
        b1 = read_byte(k, jnp.minimum(p_after_lit + 1, n - 1))
        offset = jnp.where(hm, b0 | (b1 << 8), 1)
        mv, p2, st2 = read_lsic(
            k, n, jnp.where(hm, token & 0xF, 0), p_after_lit + 2, hm
        )
        status = jnp.where(hm & (st2 != OK), st2, status)
        pok &= status == OK
        hm &= status == OK
        match_len = jnp.where(hm, mv + 4, 0)

        # ordered checks: memory limit, zero offset, invalid offset
        status = jnp.where(
            hm & (out_len + litv + match_len > output_limit),
            ERR_MEMORY_LIMIT,
            status,
        )
        status = jnp.where(
            hm & (status == OK) & (offset == 0), ERR_ZERO_OFFSET, status
        )
        status = jnp.where(
            hm & (status == OK) & (offset > out_len + litv + prefix_len),
            ERR_INVALID_OFFSET,
            status,
        )
        pok &= status == OK
        hm &= status == OK

        # commit parse
        pos = jnp.where(pok, jnp.where(hm, p2, p_after_lit), pos)
        lit_src = jnp.where(pok, p1, lit_src)
        lit_rem = jnp.where(pok, litv, lit_rem)
        has_match = jnp.where(pok, hm.astype(jnp.int32), has_match)
        m_off = jnp.where(pok, jnp.where(hm, offset, 1), m_off)
        m_rem = jnp.where(pok, match_len, m_rem)
        m_lag = jnp.where(pok, jnp.where(hm, offset, 1), m_lag)
        mode = jnp.where(pok, MODE_LIT, mode)

        # ---------------- chunk phase ----------------
        ok = status == OK
        is_lit = ok & (mode == MODE_LIT) & (lit_rem > 0)
        is_match = ok & (mode == MODE_MATCH) & (m_rem > 0)

        lit_take = jnp.where(is_lit, jnp.minimum(lit_rem, CHUNK), 0)
        m_take = jnp.where(is_match, jnp.minimum(jnp.minimum(m_rem, CHUNK), m_lag), 0)

        dst = rp_bytes + out_len
        take = jnp.where(is_lit, lit_take, m_take)
        if not parse_only:
            lit_chunk = _read_chunk(comp_b, lit_src)
            match_chunk = _read_chunk(out_b, dst - m_lag)
            content = jnp.where(is_lit, lit_chunk, match_chunk)
            _write_chunk(out_b, dst, content, take)

        out_len = out_len + take
        lit_src = jnp.where(is_lit, lit_src + take, lit_src)
        lit_rem = jnp.where(is_lit, lit_rem - take, lit_rem)
        m_rem = jnp.where(is_match, m_rem - take, m_rem)
        # the lag may double only while the full lag span was copied; the
        # source byte dst-lag is invariant under this rule
        m_lag = jnp.where(
            is_match & (take == m_lag) & (m_lag < CHUNK), m_lag * 2, m_lag
        )

        # transitions (fresh matches have m_rem >= 4, so order is safe)
        mode = jnp.where(
            ok & (mode == MODE_LIT) & (lit_rem == 0),
            jnp.where(has_match == 1, MODE_MATCH, MODE_PARSE),
            mode,
        )
        mode = jnp.where(ok & (mode == MODE_MATCH) & (m_rem == 0), MODE_PARSE, mode)

        return (pos, out_len, status, mode, has_match, lit_src, lit_rem, m_off, m_rem, m_lag)

    def block_finished(k, state):
        pos, _, status, mode, _, _, _, _, _, _ = state
        n = comp_len_ref[k, 0, 0]
        return ((mode == MODE_PARSE) & (pos >= n)) | (status != OK)

    def cond(carry):
        done = block_finished(0, carry[0])
        for k in range(1, k_blocks):
            done &= block_finished(k, carry[k])
        return ~done

    def body(carry):
        return tuple(step_block(k, carry[k]) for k in range(k_blocks))

    final = jax.lax.while_loop(cond, body, tuple(init_state() for _ in range(k_blocks)))

    for k in range(k_blocks):
        out_len_ref[k, 0, 0] = final[k][1]
        status_ref[k, 0, 0] = final[k][2]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("block_maxsize", "comp_capacity", "prefix_rows", "k_blocks", "parse_only"),
)
def _decompress_batch_v2_jit(
    comp_u8,  # uint8 [N, C]
    comp_len,  # int32 [N]
    prefix_u8,  # uint8 [N, Rp*128] right-aligned (zeros allowed when Rp==0)
    prefix_len,  # int32 [N]
    *,
    block_maxsize: int,
    comp_capacity: int,
    prefix_rows: int,
    k_blocks: int = 4,
    parse_only: bool = False,
):
    n_blocks, c = comp_u8.shape
    assert n_blocks % k_blocks == 0
    rp = prefix_rows

    rc = comp_capacity // LANES + CROWS + 2
    ro = (block_maxsize + comp_capacity) // LANES + CROWS + 2
    rt = rp + ro
    w = rc * LANES // 4

    comp_i32 = comp_u8.astype(jnp.int32)
    comp_bytes = jnp.zeros((n_blocks, rc * LANES), jnp.int32).at[:, :c].set(comp_i32)
    comp_bytes = comp_bytes.reshape(n_blocks, rc, LANES)

    cw = comp_bytes.reshape(n_blocks, w, 4).astype(jnp.uint32)
    comp_words = (
        cw[:, :, 0] | (cw[:, :, 1] << 8) | (cw[:, :, 2] << 16) | (cw[:, :, 3] << 24)
    ).astype(jnp.int32)

    rp_in = max(rp, 1)
    prefix_bytes = (
        jnp.zeros((n_blocks, rp_in * LANES), jnp.int32)
        .at[:, : prefix_u8.shape[1]]
        .set(prefix_u8.astype(jnp.int32))
        .reshape(n_blocks, rp_in, LANES)
    )

    kernel = functools.partial(
        _decode_v2_kernel,
        k_blocks=k_blocks,
        output_limit=block_maxsize,
        rp=rp,
        w=w,
        parse_only=parse_only,
    )

    grid = (n_blocks // k_blocks,)

    def spec3(shape):
        return pl.BlockSpec(shape, lambda i: (i, 0, 0), memory_space=pltpu.SMEM)

    out_bytes, out_len, status = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            spec3((k_blocks, 1, w)),
            spec3((k_blocks, 1, 1)),
            spec3((k_blocks, 1, 1)),
            pl.BlockSpec(
                (k_blocks, rc, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (k_blocks, rp_in, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (k_blocks, rt, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            spec3((k_blocks, 1, 1)),
            spec3((k_blocks, 1, 1)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, rt, LANES), jnp.int32),
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

    out_u8 = out_bytes.reshape(n_blocks, rt * LANES)[:, rp * LANES :].astype(jnp.uint8)
    return out_u8, out_len.reshape(n_blocks), status.reshape(n_blocks)


def decompress_blocks_v2(blocks, prefixes=None, block_maxsize: int = 1 << 16, k_blocks: int = 4):
    """Batch decode on the v2 kernel; same contract as
    ``decompress.decompress_blocks``."""
    n = len(blocks)
    if n == 0:
        return []
    if prefixes is None:
        prefixes = [b""] * n
    prefixes = [bytes(p)[-65536:] for p in prefixes]
    any_prefix = any(len(p) for p in prefixes)

    # bucket the capacity (pow2 >= 4 KiB) so varying batches reuse the
    # compiled kernel — Mosaic recompiles cost ~10 min on this backend
    need = max(max(len(b) for b in blocks), 4)
    comp_capacity = 4096
    while comp_capacity < need:
        comp_capacity *= 2
    comp_capacity = _round_up(comp_capacity, LANES)
    rp = (1 << 16) // LANES if any_prefix else 0  # 512 rows

    n_padded = _round_up(n, k_blocks)
    comp = np.zeros((n_padded, comp_capacity), np.uint8)
    comp_len = np.zeros(n_padded, np.int32)
    for i, b in enumerate(blocks):
        comp[i, : len(b)] = np.frombuffer(bytes(b), np.uint8)
        comp_len[i] = len(b)

    # right-align prefixes so the last prefix byte sits at rp*128 - 1
    pref = np.zeros((n_padded, max(rp, 1) * LANES), np.uint8)
    pref_len = np.zeros(n_padded, np.int32)
    if any_prefix:
        for i, p in enumerate(prefixes):
            if len(p):
                pref[i, rp * LANES - len(p) : rp * LANES] = np.frombuffer(p, np.uint8)
                pref_len[i] = len(p)

    out_u8, out_len, status = _decompress_batch_v2_jit(
        jnp.asarray(comp),
        jnp.asarray(comp_len),
        jnp.asarray(pref),
        jnp.asarray(pref_len),
        block_maxsize=block_maxsize,
        comp_capacity=comp_capacity,
        prefix_rows=rp,
        k_blocks=k_blocks,
    )
    out_u8 = np.asarray(out_u8)
    out_len = np.asarray(out_len)
    status = np.asarray(status)

    results = []
    for i in range(n):
        if status[i] != OK:
            raise DecodeError(STATUS_TO_KIND[int(status[i])])
        results.append(out_u8[i, : out_len[i]].tobytes())
    return results
