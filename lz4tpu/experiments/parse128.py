"""EXPERIMENTAL: lane-parallel LZ4 sequence parser — 128 blocks per step.

Round-2 measurements (PERF_NOTES.md) put the scalar parse at ~220 ns per
sequence and showed that any per-sequence design caps at ~60–80 MB/s.
This kernel is the round-3 architecture probe: parse 128 blocks
simultaneously, one block per SIMD lane, in lockstep rounds of one
sequence per lane.  All per-lane state lives in (1,128) registers and
every primitive is a bounded-window operation:

* per-lane streams are stored TRANSPOSED: word j of block l at
  ``words[j, l]`` (whole streams resident in VMEM);
* each lane's read window is a (PAGE_W, 128) VMEM page refilled by a
  one-hot gather over row groups (cost linear in the number of groups,
  amortized over the page size), refreshed mid-round after literal jumps;
* byte reads extract from the page with a one-hot select over PAGE_W
  rows plus shifts — no per-lane dynamic addressing anywhere;
* each round emits one record row per field, aligned across lanes
  (``rec[r, l]`` = lane *l*'s *r*-th sequence), staged 8 rounds at a
  time so stores stay (8,128)-aligned.

The output records (lit_src, lit_len, m_off, m_len) use the same
conventions as the v4 ring parser, checked against the spec parse in
tests/test_parse128.py.  Semantics: the reference sequence grammar
(``/root/reference/src/raw/decompress.rs:59-78``), including the
literal-only final sequence.  Error detection covers the same four kinds
as a per-lane status.

This is NOT wired into any default path yet; it exists to measure the
lane-parallel round cost on hardware (see bench note in PERF_NOTES.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..kernels.status import (
    ERR_INVALID_OFFSET,
    ERR_MEMORY_LIMIT,
    ERR_UNEXPECTED_END,
    ERR_ZERO_OFFSET,
    OK,
)

LANES = 128
PAGE_W = 64  # page rows (words per lane): 256 B of stream per lane
GROUP_W = 32  # refill group granularity (words): >=32 words forward margin
STAGE = 8  # record rows staged in registers between aligned stores
LSIC_STEPS = 8  # static LSIC continuation bound (longer -> host fallback)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _onehot_rows(sel_row, rows, width):
    """mask[r, l] = (sel_row[l] == r) as int32, shape (rows, width)."""
    rowi = jax.lax.broadcasted_iota(jnp.int32, (rows, width), 0)
    return (rowi == sel_row).astype(jnp.int32)


def _parse128_kernel(
    words_ref,  # VMEM (Rw, 128) int32 — transposed packed streams
    n_ref,  # VMEM (1, 128) int32 — per-lane stream lengths (bytes)
    rec_lit_src_ref,  # VMEM (MAXR, 128) int32 out
    rec_lit_len_ref,  # VMEM (MAXR, 128) int32 out
    rec_m_off_ref,  # VMEM (MAXR, 128) int32 out
    rec_m_len_ref,  # VMEM (MAXR, 128) int32 out
    nrec_ref,  # VMEM (1, 128) int32 out — records per lane
    status_ref,  # VMEM (1, 128) int32 out
    page_ref,  # VMEM scratch (PAGE_W, 128) int32
    state_ref,  # VMEM scratch (8, 128) int32 — per-lane state rows
    stage_ref,  # VMEM scratch (4*STAGE, 128) int32 — record staging
    *,
    rw: int,
    maxr: int,
    output_limit: int,
):
    # All per-lane state is carried as (8,128) with identical rows:
    # (1,128) vectors in while-loop carries hit Mosaic layout-legalization
    # failures (mixed vpad layouts at scf.yield), and a (1,128) op costs a
    # full vreg op anyway.
    S8 = (8, LANES)
    n = jnp.broadcast_to(n_ref[0:1, :], S8)
    n_groups = (rw - PAGE_W) // GROUP_W + 1

    def refill(gbase):
        """page[k, l] = words[gbase[l]*GROUP_W + k, l] via one-hot groups."""
        acc = jnp.zeros((PAGE_W, LANES), jnp.int32)
        gb = gbase[0:1, :]
        for g in range(n_groups):
            mask = (gb == g).astype(jnp.int32)  # (1,128) broadcasts over rows
            slab = words_ref[g * GROUP_W : g * GROUP_W + PAGE_W, :]
            acc = acc + slab * mask
        page_ref[:, :] = acc

    def ensure_page(gbase, pos, active):
        """Advance lanes' pages so pos/4 lands in the page's FIRST group
        (>= 32 words of forward margin); returns new gbase."""
        want = jnp.clip((pos >> 2) // GROUP_W, 0, n_groups - 1)
        new_gbase = jnp.where(active, want, gbase)
        need = jnp.any(new_gbase != gbase)

        @pl.when(need)
        def _():
            refill(new_gbase)

        return new_gbase

    def byte_at(page, gbase, pos):
        """byte at per-lane byte position ``pos`` (must be inside the
        page); one-hot select over PAGE_W rows + shift."""
        rel = jnp.clip((pos >> 2) - gbase * GROUP_W, 0, PAGE_W - 1)  # in-page row
        word = jnp.sum(page * _onehot_rows(rel[0:1, :], PAGE_W, LANES), axis=0,
                       keepdims=True)
        word = jnp.broadcast_to(word, S8)
        return jax.lax.shift_right_logical(word, (pos & 3) * 8) & 0xFF

    def lsic(page, gbase, initial, p, enable, status):
        """Vector LSIC, statically bounded: 4 unrolled continuation steps
        cover values up to 15 + 4*255 (the overwhelmingly common range);
        longer chains flag a sentinel status and fall back to the scalar
        parse on the host.  (scf.while cannot yield sublane-replicated
        vector layouts in Mosaic, so the inner loops must be static.)"""
        need = (initial == 0xF) & enable
        v = initial
        for _ in range(LSIC_STEPS):  # covers values <= 15 + 8*255 = 2055
            eof = need & (p >= n)
            status = jnp.where(
                (eof != 0) & (status == OK), ERR_UNEXPECTED_END, status
            )
            need = need & (~eof)
            b = byte_at(page, gbase, jnp.where(need, p, 0))
            v = v + jnp.where(need, b, 0)
            p = p + need.astype(jnp.int32)
            need = need & (b == 0xFF)
        status = jnp.where(
            (need != 0) & (status == OK), ERR_MEMORY_LIMIT, status
        )
        return v, p, status

    R_POS, R_LA, R_ST, R_DONE, R_GB, R_NREC = range(6)

    def round_body(r, _):
        # loop-carried vectors fail Mosaic layout legalization (replicated
        # vpad in scf yields), so ALL per-lane state round-trips through
        # VMEM scratch each round; the fori carry is a dummy scalar.
        st8 = state_ref[:, :]
        pos = jnp.broadcast_to(st8[R_POS : R_POS + 1], S8)
        la_out = jnp.broadcast_to(st8[R_LA : R_LA + 1], S8)
        status = jnp.broadcast_to(st8[R_ST : R_ST + 1], S8)
        done = jnp.broadcast_to(st8[R_DONE : R_DONE + 1], S8) != 0
        gbase = jnp.broadcast_to(st8[R_GB : R_GB + 1], S8)
        nrec = jnp.broadcast_to(st8[R_NREC : R_NREC + 1], S8)
        stage = stage_ref[:, :]
        active = (~done) & (status == OK) & (pos < n)

        gbase = ensure_page(gbase, pos, active)
        page = page_ref[:, :]

        tok = byte_at(page, gbase, jnp.where(active, pos, 0))
        lit0 = jax.lax.shift_right_logical(tok, 4)
        nib = tok & 0xF
        p = pos + 1
        lit, p, status = lsic(page, gbase, lit0, p, active, status)
        lit_src = p
        p = p + jnp.where(active, lit, 0)
        status = jnp.where(
            (active & (p > n)) & (status == OK), ERR_UNEXPECTED_END, status
        )

        # literal-only final sequence: fewer than 2 bytes remain
        has_match = active & (status == OK) & (n - p >= 2)
        gbase = ensure_page(gbase, jnp.where(has_match, p, pos), has_match)
        page = page_ref[:, :]
        b0 = byte_at(page, gbase, jnp.where(has_match, p, 0))
        b1 = byte_at(page, gbase, jnp.where(has_match, p + 1, 0))
        offset = jnp.where(has_match, b0 | (b1 << 8), 1)
        p = p + 2 * has_match.astype(jnp.int32)
        mv, p, status = lsic(
            page, gbase, jnp.where(has_match, nib, 0), p, has_match, status
        )
        mlen = jnp.where(has_match, mv + 4, 0)

        ok = status == OK
        status = jnp.where(
            has_match & ok & (la_out + lit + mlen > output_limit),
            ERR_MEMORY_LIMIT, status,
        )
        ok = status == OK
        status = jnp.where(has_match & ok & (offset == 0), ERR_ZERO_OFFSET, status)
        ok = status == OK
        status = jnp.where(
            has_match & ok & (offset > la_out + lit), ERR_INVALID_OFFSET, status
        )
        emit = active & (status == OK)

        # stage the record row; FIELD-MAJOR layout so each field's block
        # is a contiguous static slice (strided views don't lower in
        # Mosaic): rows [f0r0..f0r7, f1r0..f1r7, ...]
        srow = jax.lax.rem(r, STAGE)
        rowi = jax.lax.broadcasted_iota(jnp.int32, (4 * STAGE, LANES), 0)
        smask = jax.lax.rem(rowi, STAGE) == srow
        tiled = jnp.concatenate(
            [
                jnp.where(emit, lit_src, -1),
                jnp.where(emit, lit, 0),
                jnp.where(emit, offset, 1),
                jnp.where(emit, mlen, 0),
            ],
            axis=0,
        )  # 4 x (8,128) rows-identical blocks = (4*STAGE, 128)
        stage = jnp.where(smask, tiled, stage)

        @pl.when(srow == STAGE - 1)
        def _():
            base = (r // STAGE) * STAGE
            for f, ref in enumerate(
                (rec_lit_src_ref, rec_lit_len_ref, rec_m_off_ref, rec_m_len_ref)
            ):
                ref[pl.ds(jnp.clip(base, 0, maxr - STAGE), STAGE), :] = stage[
                    f * STAGE : (f + 1) * STAGE
                ]

        pos = jnp.where(emit, p, pos)
        la_out = jnp.where(emit, la_out + lit + mlen, la_out)
        nrec = nrec + emit.astype(jnp.int32)
        done = done | (~has_match & active & (status == OK)) | (pos >= n)
        state_ref[:, :] = jnp.concatenate(
            [
                pos[0:1], la_out[0:1], status[0:1],
                done.astype(jnp.int32)[0:1], gbase[0:1], nrec[0:1],
                jnp.zeros((2, LANES), jnp.int32),
            ],
            axis=0,
        )
        stage_ref[:, :] = stage
        return 0

    z1 = jnp.zeros((1, LANES), jnp.int32)
    state_ref[:, :] = jnp.concatenate(
        [
            z1, z1, jnp.full((1, LANES), OK, jnp.int32),
            (0 >= n[0:1]).astype(jnp.int32), jnp.full((1, LANES), -1, jnp.int32),
            z1, jnp.zeros((2, LANES), jnp.int32),
        ],
        axis=0,
    )
    stage_ref[:, :] = jnp.zeros((4 * STAGE, LANES), jnp.int32)

    # outer rounds as a static fori (scf.while layout limits, see lsic);
    # rounds after all lanes finish are predicated no-ops
    jax.lax.fori_loop(0, maxr, round_body, 0)
    r_final = jnp.int32(maxr)
    st8 = state_ref[:, :]
    status = st8[R_ST : R_ST + 1]
    nrec = st8[R_NREC : R_NREC + 1]
    stage_f = stage_ref[:, :]
    # flush the final partial stage block (rows past nrec are ignored by
    # the host)
    base = jnp.clip((jnp.maximum(r_final - 1, 0) // STAGE) * STAGE, 0, maxr - STAGE)
    for f, ref in enumerate(
        (rec_lit_src_ref, rec_lit_len_ref, rec_m_off_ref, rec_m_len_ref)
    ):
        ref[pl.ds(base, STAGE), :] = stage_f[f * STAGE : (f + 1) * STAGE]
    nrec_ref[:, :] = nrec
    status_ref[:, :] = status


@functools.partial(jax.jit, static_argnames=("rw", "maxr", "output_limit"))
def _parse128_jit(words, n, *, rw: int, maxr: int, output_limit: int):
    return pl.pallas_call(
        functools.partial(
            _parse128_kernel, rw=rw, maxr=maxr, output_limit=output_limit
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_shape=[
            jax.ShapeDtypeStruct((maxr, LANES), jnp.int32),
            jax.ShapeDtypeStruct((maxr, LANES), jnp.int32),
            jax.ShapeDtypeStruct((maxr, LANES), jnp.int32),
            jax.ShapeDtypeStruct((maxr, LANES), jnp.int32),
            jax.ShapeDtypeStruct((1, LANES), jnp.int32),
            jax.ShapeDtypeStruct((1, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((PAGE_W, LANES), jnp.int32),
            pltpu.VMEM((8, LANES), jnp.int32),  # per-lane state rows
            pltpu.VMEM((4 * STAGE, LANES), jnp.int32),  # record stage
        ],
        interpret=_interpret(),
    )(words, n)


def parse_blocks_128(blocks, output_limit: int = 1 << 16, maxr: int | None = None):
    """Parse up to 128 raw blocks lane-parallel; returns per-block lists of
    (lit_src, lit_len, m_off, m_len) records plus a status list.

    Experimental measurement surface; blocks longer than the transposed
    VMEM budget or with LSIC chains crossing a page margin report a
    sentinel status and should fall back to the scalar parse.
    """
    assert len(blocks) <= LANES
    blocks = [bytes(b) for b in blocks]
    maxlen = max((len(b) for b in blocks), default=4)
    rw = -(-maxlen // 4)
    rw = -(-rw // GROUP_W) * GROUP_W + 2 * PAGE_W
    if maxr is None:
        maxr = min(max(maxlen // 3 + STAGE, STAGE), 1 << 15)
    maxr = -(-maxr // STAGE) * STAGE

    arr = np.zeros((LANES, rw * 4), np.uint8)
    n = np.zeros((1, LANES), np.int32)
    for i, b in enumerate(blocks):
        arr[i, : len(b)] = np.frombuffer(b, np.uint8)
        n[0, i] = len(b)
    words = (
        arr.reshape(LANES, rw, 4).astype(np.uint32)
    )
    words = (
        words[:, :, 0]
        | (words[:, :, 1] << 8)
        | (words[:, :, 2] << 16)
        | (words[:, :, 3] << 24)
    ).astype(np.int32).T  # (rw, 128)

    ls, ll, mo, ml, nrec, status = _parse128_jit(
        jnp.asarray(np.ascontiguousarray(words)),
        jnp.asarray(n),
        rw=rw,
        maxr=maxr,
        output_limit=output_limit,
    )
    ls, ll, mo, ml = (np.asarray(x) for x in (ls, ll, mo, ml))
    nrec = np.asarray(nrec)[0]
    status = np.asarray(status)[0]

    out = []
    for i in range(len(blocks)):
        recs = [
            (int(ls[r, i]), int(ll[r, i]), int(mo[r, i]), int(ml[r, i]))
            for r in range(nrec[i])
        ]
        out.append(recs)
    return out, [int(s) for s in status[: len(blocks)]]
