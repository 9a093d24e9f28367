"""Pallas TPU raw-block decompressor, v3 — register-accumulator data plane.

v2 measurement (chained, fetch-forced, v5e): every *dynamically indexed
vector memory op* costs a hard ~400 cycles with no overlap; the scalar
parse is nearly free.  v2 spends 4 such ops per loop iteration.  v3
restructures so most iterations touch no memory at all:

* the newest ≤1 KiB of output lives in an 8×128 **register accumulator**;
  sequences merge into it with lane/sublane rolls + selects (pure vector
  register ops).  When ≥512 B accumulate, one *aligned* 4-row store
  flushes — no read-modify-write;
* literals stream from a 1 KiB **read-ahead window** of the compressed
  stream held in registers, refilled with one aligned 4-row read per
  512 B consumed (the stream is consumed monotonically);
* matches with offset ≤ the accumulator fill ("near": all RLE and
  recent-history matches) are extracted from the accumulator itself —
  zero memory ops — with the v2 lag-doubling bootstrap for overlaps;
* only far matches (offset reaching flushed output or the prefix) pay a
  dynamic 512-byte read from the [prefix|output] VMEM buffer.

Each loop iteration performs at most ONE memory action, selected by a
4-way ``lax.switch`` (none / flush / stream-refill / far-read), plus the
masked register-level merge.  Amortised memory-op budget: 1 store per
512 B of output + 1 read per 512 B of compressed input + 1 read per far
match.

Parse phase, status/error semantics, prefix embedding and the host
wrapper contract are identical to v2 (``decompress_v2.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..spec.block import DecodeError
from .status import (
    ERR_INVALID_OFFSET,
    ERR_MEMORY_LIMIT,
    ERR_UNEXPECTED_END,
    ERR_ZERO_OFFSET,
    OK,
    STATUS_TO_KIND,
)

LANES = 128
CHUNK = 512
CROWS = CHUNK // LANES  # 4
AR = 16  # output accumulator rows (2 KiB: offsets < 2 KiB stay register-local)
CR = 8  # compressed-stream read-ahead rows (1 KiB)
# flush only when this much is buffered, so up to ~FLUSH_AT+511 bytes of
# recent history stay register-resident for near matches
FLUSH_AT = AR * LANES - 1024

MODE_PARSE, MODE_LIT, MODE_MATCH = 0, 1, 2
ACT_NONE, ACT_FLUSH, ACT_REFILL, ACT_FAR = 0, 1, 2, 3


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# register-chunk primitives (values, not refs — no memory traffic)
# ---------------------------------------------------------------------------


def _reg_extract(acc, byte_off):
    """chunk[m,l] = acc byte (byte_off + 128m + l), as (CROWS,128).

    Register-only: one dynamic sublane roll + one dynamic lane roll +
    select; the +1-row variant derives from the first roll with a STATIC
    roll (dynamic-amount rolls are the dominant cost of these helpers —
    measured ~60-80 ns each on this part).
    """
    rows = acc.shape[0]
    r0 = byte_off // LANES
    e = byte_off % LANES
    rows_a = pltpu.roll(acc, (rows - r0) % rows, 0)  # rows_a[m] = acc[m + r0]
    la = pltpu.roll(rows_a, (LANES - e) % LANES, 1)
    # rows_b[m] = acc[m + r0 + 1] = rows_a[m + 1]  (static roll)
    lb = pltpu.roll(la, rows - 1, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    return jnp.where(lane < LANES - e, la, lb)[:CROWS]


def _reg_merge(acc, chunk, byte_off, take):
    """Place chunk[:take] bytes at acc byte offset ``byte_off`` (scalar),
    masked; register-only."""
    rows = acc.shape[0]
    expanded = jnp.concatenate(
        [chunk, jnp.zeros((rows - CROWS, LANES), jnp.int32)], axis=0
    )
    r0 = byte_off // LANES
    e = byte_off % LANES
    r2 = pltpu.roll(expanded, e, 1)
    shifted = pltpu.roll(r2, r0, 0)  # shifted[row] = r2[row - r0]
    top = pltpu.roll(shifted, 1, 0)  # top[row] = r2[row - r0 - 1] (static roll)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    val = jnp.where(lane >= e, shifted, top)
    pos = rowi * LANES + lane - byte_off
    mask = (pos >= 0) & (pos < take)
    return jnp.where(mask, val, acc)


def _shift_down(acc):
    """Drop the first CROWS rows (after a flush)."""
    return jnp.concatenate(
        [acc[CROWS:], jnp.zeros((CROWS, LANES), jnp.int32)], axis=0
    )


def _read_chunk(ref, byte_off):
    """v2-style unaligned 512B read from an unpacked (R,128) ref."""
    byte_off = jnp.maximum(byte_off, 0)
    row = byte_off // LANES
    c = byte_off % LANES
    five = ref[pl.ds(row, CROWS + 1), :]
    rolled = pltpu.roll(five, (LANES - c) % LANES, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (CROWS, LANES), 1)
    return jnp.where(lane < LANES - c, rolled[:CROWS, :], rolled[1:, :])


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _decode_v3_kernel(
    comp_words_ref,  # SMEM (1, 1, W) int32
    comp_len_ref,  # SMEM (1, 1, 1) int32
    prefix_len_ref,  # SMEM (1, 1, 1) int32
    comp_bytes_ref,  # VMEM (1, Rc, 128) int32
    prefix_bytes_ref,  # VMEM (1, Rp(+1), 128) int32
    out_bytes_ref,  # VMEM (1, Rt, 128) int32
    out_len_ref,  # SMEM (1, 1, 1) int32
    status_ref,  # SMEM (1, 1, 1) int32
    *,
    output_limit: int,
    rp: int,
    w: int,
    rc: int,
    rt: int,
):
    rp_bytes = rp * LANES
    max_word = w - 1
    n = comp_len_ref[0, 0, 0]
    prefix_len = prefix_len_ref[0, 0, 0]
    comp_b = comp_bytes_ref.at[0]
    out_b = out_bytes_ref.at[0]

    # seed the prefix region of the output buffer
    if rp:

        def copy_prefix(i, _):
            out_bytes_ref[0, pl.ds(i, 1), :] = prefix_bytes_ref[0, pl.ds(i, 1), :]
            return 0

        jax.lax.fori_loop(0, rp, copy_prefix, 0)

    def read_byte(p):
        idx = jnp.minimum(jnp.maximum(p, 0) >> 2, max_word)
        word = comp_words_ref[0, 0, idx]
        return jax.lax.shift_right_logical(word, (p & 3) * 8) & 0xFF

    def read_lsic(initial, p, enable):
        def cond(c):
            _, _, st, last = c
            return (last == 0xFF) & (st == OK)

        def body(c):
            v, p, st, _ = c
            eof = p >= n
            b = jnp.where(eof, 0, read_byte(jnp.minimum(p, n - 1)))
            st = jnp.where(eof, ERR_UNEXPECTED_END, st)
            return v + b, p + 1, st, b

        last0 = jnp.where((initial == 0xF) & enable, 0xFF, 0)
        v, p, st, _ = jax.lax.while_loop(
            cond, body, (initial, p, jnp.int32(OK), last0)
        )
        return v, p, st

    def read4_aligned(ref, row, max_row):
        """Aligned CROWS-row read with clamped dynamic row index."""
        row = jnp.clip(row, 0, max_row)
        return ref[pl.ds(row, CROWS), :]

    # state: pos, out_len, status, mode, has_match, lit_src, lit_rem,
    #        m_off, m_rem, m_lag, flushed, cbase  +  acc, cacc
    def cond(c):
        pos, _, status, mode = c[0], c[1], c[2], c[3]
        return ((mode != MODE_PARSE) | (pos < n)) & (status == OK)

    def body(c):
        (pos, out_len, status, mode, has_match, lit_src, lit_rem,
         m_off, m_rem, m_lag, flushed, cbase, acc, cacc) = c

        # ---------------- parse (same as v2) ----------------
        parsing = (mode == MODE_PARSE) & (pos < n) & (status == OK)
        token = jnp.where(parsing, read_byte(pos), 0)
        litv, p1, st1 = read_lsic(token >> 4, pos + 1, parsing)
        status = jnp.where(parsing & (st1 != OK), st1, status)
        pok = parsing & (status == OK)
        status = jnp.where(pok & (p1 + litv > n), ERR_UNEXPECTED_END, status)
        pok &= status == OK

        p_after_lit = p1 + litv
        hm = pok & (n - p_after_lit >= 2)
        b0 = read_byte(jnp.minimum(p_after_lit, n - 1))
        b1 = read_byte(jnp.minimum(p_after_lit + 1, n - 1))
        offset = jnp.where(hm, b0 | (b1 << 8), 1)
        mv, p2, st2 = read_lsic(
            jnp.where(hm, token & 0xF, 0), p_after_lit + 2, hm
        )
        status = jnp.where(hm & (st2 != OK), st2, status)
        pok &= status == OK
        hm &= status == OK
        match_len = jnp.where(hm, mv + 4, 0)

        status = jnp.where(
            hm & (out_len + litv + match_len > output_limit), ERR_MEMORY_LIMIT, status
        )
        status = jnp.where(hm & (status == OK) & (offset == 0), ERR_ZERO_OFFSET, status)
        status = jnp.where(
            hm & (status == OK) & (offset > out_len + litv + prefix_len),
            ERR_INVALID_OFFSET,
            status,
        )
        pok &= status == OK
        hm &= status == OK

        pos = jnp.where(pok, jnp.where(hm, p2, p_after_lit), pos)
        lit_src = jnp.where(pok, p1, lit_src)
        lit_rem = jnp.where(pok, litv, lit_rem)
        has_match = jnp.where(pok, hm.astype(jnp.int32), has_match)
        m_off = jnp.where(pok, jnp.where(hm, offset, 1), m_off)
        m_rem = jnp.where(pok, match_len, m_rem)
        m_lag = jnp.where(pok, jnp.where(hm, offset, 1), m_lag)
        mode = jnp.where(pok, MODE_LIT, mode)

        ok = status == OK
        filled = out_len - flushed
        lit_active = ok & (mode == MODE_LIT) & (lit_rem > 0)
        match_active = ok & (mode == MODE_MATCH) & (m_rem > 0)
        # the lagged source dst-m_lag lives in the accumulator iff
        # m_lag <= filled; otherwise it was already flushed (or is in the
        # prefix) and must be read from VMEM.  The v2 invariant
        # (m_lag <= copied + offset, source index invariant under doubling)
        # keeps every read inside valid bytes.
        near = match_active & (m_lag <= filled)
        far = match_active & (m_lag > filled)

        # ---------------- memory action (at most one) ----------------
        need_flush = ok & (filled >= FLUSH_AT)
        need_refill = ok & (~need_flush) & lit_active & (lit_src >= cbase + CHUNK)
        need_far = ok & (~need_flush) & (~need_refill) & far

        action = jnp.where(
            need_flush,
            ACT_FLUSH,
            jnp.where(need_refill, ACT_REFILL, jnp.where(need_far, ACT_FAR, ACT_NONE)),
        )

        zero_chunk = jnp.zeros((CROWS, LANES), jnp.int32)

        def act_none(op):
            acc, cacc, flushed, cbase = op
            return acc, cacc, flushed, cbase, zero_chunk

        def act_flush(op):
            acc, cacc, flushed, cbase = op
            row = jnp.clip(rp + flushed // LANES, 0, rt - CROWS)
            out_b[pl.ds(row, CROWS), :] = acc[:CROWS]
            return _shift_down(acc), cacc, flushed + CHUNK, cbase, zero_chunk

        def act_refill(op):
            acc, cacc, flushed, cbase = op
            nxt = read4_aligned(comp_b, (cbase + CR * LANES) // LANES, rc - CROWS - 1)
            cacc2 = jnp.concatenate([cacc[CROWS:], nxt], axis=0)
            return acc, cacc2, flushed, cbase + CHUNK, zero_chunk

        def act_far(op):
            acc, cacc, flushed, cbase = op
            chunk = _read_chunk(out_b, rp_bytes + out_len - m_lag)
            return acc, cacc, flushed, cbase, chunk

        acc, cacc, flushed, cbase, far_chunk = jax.lax.switch(
            action, [act_none, act_flush, act_refill, act_far], (acc, cacc, flushed, cbase)
        )
        filled = out_len - flushed  # may have changed via flush

        # ---------------- register-level merge ----------------
        # literal bytes from the read-ahead window
        lit_take = jnp.clip(
            jnp.minimum(
                jnp.minimum(lit_rem, CHUNK), cbase + CR * LANES - lit_src
            ),
            0,
            CHUNK,
        )
        lit_take = jnp.where(lit_active, lit_take, 0)
        lit_chunk = _reg_extract(cacc, jnp.clip(lit_src - cbase, 0, CR * LANES - 1))

        # near match from the accumulator
        near_ok = near & (action == ACT_NONE)
        near_take = jnp.where(
            near_ok, jnp.minimum(jnp.minimum(m_rem, CHUNK), m_lag), 0
        )
        near_chunk = _reg_extract(acc, jnp.clip(filled - m_lag, 0, AR * LANES - 1))

        # far match chunk from the switch
        far_take = jnp.where(
            (action == ACT_FAR),
            jnp.clip(
                jnp.minimum(jnp.minimum(m_rem, CHUNK), m_lag - filled),
                0,
                CHUNK,
            ),
            0,
        )

        chunk = jnp.where(
            lit_take > 0, lit_chunk, jnp.where(near_take > 0, near_chunk, far_chunk)
        )
        take = lit_take + near_take + far_take  # at most one is nonzero
        acc = _reg_merge(acc, chunk, filled, take)

        # ---------------- state updates ----------------
        out_len = out_len + take
        lit_src = jnp.where(lit_take > 0, lit_src + take, lit_src)
        lit_rem = jnp.where(lit_take > 0, lit_rem - take, lit_rem)
        m_rem = jnp.where((near_take > 0) | (far_take > 0), m_rem - take, m_rem)
        m_lag = jnp.where(
            (near_take > 0) & (take == m_lag) & (m_lag < CHUNK), m_lag * 2, m_lag
        )

        mode = jnp.where(
            ok & (mode == MODE_LIT) & (lit_rem == 0),
            jnp.where(has_match == 1, MODE_MATCH, MODE_PARSE),
            mode,
        )
        mode = jnp.where(ok & (mode == MODE_MATCH) & (m_rem == 0), MODE_PARSE, mode)

        return (pos, out_len, status, mode, has_match, lit_src, lit_rem,
                m_off, m_rem, m_lag, flushed, cbase, acc, cacc)

    z = jnp.int32(0)
    acc0 = jnp.zeros((AR, LANES), jnp.int32)
    cacc0 = jnp.concatenate(
        [
            read4_aligned(comp_b, 0, rc - CROWS - 1),
            read4_aligned(comp_b, CROWS, rc - CROWS - 1),
        ],
        axis=0,
    )
    final = jax.lax.while_loop(
        cond,
        body,
        (z, z, jnp.int32(OK), jnp.int32(MODE_PARSE), z, z, z,
         jnp.int32(1), z, jnp.int32(1), z, z, acc0, cacc0),
    )
    out_len_f, status_f, flushed_f, acc_f = final[1], final[2], final[10], final[12]

    # drain the accumulator tail (up to FLUSH_AT+511 unflushed bytes)
    row = jnp.clip(rp + flushed_f // LANES, 0, rt - AR)
    for j in range(AR // CROWS):
        out_b[pl.ds(row + j * CROWS, CROWS), :] = acc_f[j * CROWS : (j + 1) * CROWS]

    out_len_ref[0, 0, 0] = out_len_f
    status_ref[0, 0, 0] = status_f


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("block_maxsize", "comp_capacity", "prefix_rows"),
)
def _decompress_batch_v3_jit(
    comp_u8,
    comp_len,
    prefix_u8,
    prefix_len,
    *,
    block_maxsize: int,
    comp_capacity: int,
    prefix_rows: int,
):
    n_blocks, c = comp_u8.shape
    rp = prefix_rows

    rc = comp_capacity // LANES + 2 * CROWS + 2
    ro = (block_maxsize + comp_capacity) // LANES + 2 * CROWS + 2
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
        _decode_v3_kernel,
        output_limit=block_maxsize,
        rp=rp,
        w=w,
        rc=rc,
        rt=rt,
    )

    def spec3(shape):
        return pl.BlockSpec(shape, lambda i: (i, 0, 0), memory_space=pltpu.SMEM)

    out_bytes, out_len, status = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            spec3((1, 1, w)),
            spec3((1, 1, 1)),
            spec3((1, 1, 1)),
            pl.BlockSpec((1, rc, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rp_in, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rt, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            spec3((1, 1, 1)),
            spec3((1, 1, 1)),
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


def decompress_blocks_v3(blocks, prefixes=None, block_maxsize: int = 1 << 16):
    """Batch decode on the v3 kernel; same contract as v2."""
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
    rp = (1 << 16) // LANES if any_prefix else 0

    comp = np.zeros((n, comp_capacity), np.uint8)
    comp_len = np.zeros(n, np.int32)
    for i, b in enumerate(blocks):
        comp[i, : len(b)] = np.frombuffer(bytes(b), np.uint8)
        comp_len[i] = len(b)

    pref = np.zeros((n, max(rp, 1) * LANES), np.uint8)
    pref_len = np.zeros(n, np.int32)
    if any_prefix:
        for i, p in enumerate(prefixes):
            if len(p):
                pref[i, rp * LANES - len(p) : rp * LANES] = np.frombuffer(p, np.uint8)
                pref_len[i] = len(p)

    out_u8, out_len, status = _decompress_batch_v3_jit(
        jnp.asarray(comp),
        jnp.asarray(comp_len),
        jnp.asarray(pref),
        jnp.asarray(pref_len),
        block_maxsize=block_maxsize,
        comp_capacity=comp_capacity,
        prefix_rows=rp,
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
