"""Shared lane-parallel kernel machinery (decode128 / compress128 /
decodebig).

One block per SIMD lane, byte streams held TRANSPOSED in VMEM
(``words[j, l]`` = little-endian word ``j`` of lane ``l``); everything
here avoids per-lane dynamic addressing:

* ``gather_rows`` — two-level one-hot windowed row gather: level 1
  selects the aligned 8-row slabs containing each lane's window (one
  vreg FMA per source slab), level 2 gathers the k rows from that small
  window (~n_slabs + 2*k_rows vreg ops instead of n_slabs*k_rows).
* ``funnel`` / ``byte_shift`` — word-row alignment at per-lane byte
  shifts in [0, 3].
* ``place_multi`` — scatter a list of contiguous chunks into an aligned
  register window, then merge into a mod-addressed staging ring at slab
  granularity, under the slop-write invariant (bytes below ``dst``
  preserved; slop above the span is rewritten before it is observable).
* ``sweep_flush`` — publish ring rows to the (transposed) main output as
  a lane-uniform masked sweep: the ring address ``p mod ring_w`` is the
  same in every lane, so no per-lane gather exists anywhere on the
  output path.

Design notes and measured costs: PERF_NOTES.md (round 2-3); the
structures themselves have no counterpart in the reference (which is a
scalar Rust library) — they are what makes per-byte codec work
SIMD-tractable on the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl  # noqa: F401  (re-export site)

LANES = 128


def gather_rows(src, src_rows, base_row, k_rows, modulo, *, rowi8=None):
    """out[k, l] = src[(base_row[l] + k) (mod modulo), l], k < k_rows."""
    assert src_rows % 8 == 0 and (not modulo or modulo % 8 == 0)
    if rowi8 is None:
        rowi8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    b = base_row[0:1, :]
    n_slabs = src_rows // 8
    l1 = (k_rows + 6) // 8 + 1  # slabs spanned at worst offset 7
    sb = b >> 3
    accs = [jnp.zeros((8, LANES), jnp.int32) for _ in range(l1)]
    for s in range(n_slabs):
        slab = src[s * 8 : s * 8 + 8, :]
        for j in range(l1):
            t = sb + j
            if modulo:
                t = jax.lax.rem(t, modulo // 8)
            m = jnp.broadcast_to((t == s).astype(jnp.int32), (8, LANES))
            accs[j] = accs[j] + slab * m
    lvl1 = jnp.concatenate(accs, axis=0)
    off = b & 7
    rows_out = [jnp.zeros((1, LANES), jnp.int32) for _ in range(k_rows)]
    for r0 in range(0, 8 * l1, 8):
        slab = lvl1[r0 : r0 + 8, :]
        t = rowi8 + r0 - off
        for k in range(k_rows):
            m = (t == k).astype(jnp.int32)
            rows_out[k] = rows_out[k] + jnp.sum(slab * m, axis=0, keepdims=True)
    return jnp.concatenate(rows_out, axis=0)


def funnel(w_rows, sh):
    """out[k] = 4 stream bytes starting at byte ``sh & 3`` of word k;
    input has one extra row."""
    k = w_rows.shape[0] - 1
    cur = w_rows[:k]
    nxt = w_rows[1 : k + 1]
    shb = jnp.broadcast_to((sh & 3)[0:1, :], (k, LANES)) * 8
    lo = jax.lax.shift_right_logical(cur, shb)
    hi = jnp.where(shb == 0, 0, nxt << ((32 - shb) & 31))
    return lo | hi


def byte_shift(bytes_w, sh):
    """Word rows shifted left within the stream by the per-lane byte
    amount ``sh`` in [0, 3]; returns one extra row."""
    k = bytes_w.shape[0]
    z = jnp.zeros((1, LANES), jnp.int32)
    ext = jnp.concatenate([bytes_w, z], axis=0)
    prev = jnp.concatenate([z, bytes_w], axis=0)
    shb = jnp.broadcast_to(sh, (k + 1, LANES)) * 8
    return jnp.where(
        shb == 0,
        ext,
        (ext << shb) | jax.lax.shift_right_logical(prev, (32 - shb) & 31),
    )


def window_geometry(n_chunks, cw, dst, *, cb, ring_w):
    """Window shape + per-lane alignment for a ``n_chunks``-chunk span
    at byte position ``dst``: output position ``dst + d`` lives at
    window byte ``off*4 + sh + d``."""
    PW = -(-(7 + ((3 + (n_chunks - 1) * cb) >> 2) + cw + 1) // 8) * 8
    assert PW <= ring_w  # the window merge may not lap the ring
    sh = (dst & 3)[0:1, :]
    base = jax.lax.rem(dst >> 2, ring_w)[0:1, :]
    return PW, sh, base


def window_extend(win, chunks, sh, base, cum, *, zero_tails):
    """Scatter ``chunks`` into the span window starting at byte
    ``cum`` past the span start; returns (win, new cum).  ``zero_tails``
    chunks get their bytes at/after their end zeroed — mandatory for
    every chunk that another chunk (or a later window_extend call) will
    land after, because the scatter ADDs and the boundary word is
    shared."""
    PW = win.shape[0]
    cw = chunks[0][0].shape[0]
    off = base & 7
    wpi = jax.lax.broadcasted_iota(jnp.int32, (PW, LANES), 0)
    offb = jnp.broadcast_to(off, (PW, LANES))
    rowi_c = jax.lax.broadcasted_iota(jnp.int32, (cw + 1, LANES), 0)
    for ci, (bytes_w, take) in enumerate(chunks):
        s_k = sh + cum
        shk = s_k & 3
        rk = s_k >> 2
        shifted = byte_shift(bytes_w, shk)
        e_k = s_k + take[0:1, :]
        if ci < len(chunks) - 1 or zero_tails:
            brow = jnp.broadcast_to((e_k >> 2) - rk, (cw + 1, LANES))
            lowm = (1 << (8 * jnp.broadcast_to(e_k & 3, (cw + 1, LANES)))) - 1
            shifted = jnp.where(
                rowi_c == brow, shifted & lowm,
                jnp.where(rowi_c > brow, 0, shifted),
            )
        offk = offb + jnp.broadcast_to(rk, (PW, LANES))
        for k in range(cw + 1):
            sel = (wpi == offk + k).astype(jnp.int32)
            win = win + jnp.broadcast_to(shifted[k : k + 1], (PW, LANES)) * sel
        cum = cum + take[0:1, :]
    return win, cum


def window_merge(ring, win, sh, base, total, *, ring_w):
    """Merge the span window into the staging ring at slab granularity
    under the slop-write invariant (bytes below the span preserved;
    slop above it is rewritten before it is observable)."""
    PW = win.shape[0]
    off = base & 7
    sb = base >> 3
    nsl = ring_w // 8
    wpi = jax.lax.broadcasted_iota(jnp.int32, (PW, LANES), 0)
    offb = jnp.broadcast_to(off, (PW, LANES))
    # row validity over the COMBINED span; first row keeps bytes below
    # dst&3.  When all takes are 0 but dst&3 > 0, the head row's bytes
    # >= dst&3 are still rewritten with slop — safe under the invariant.
    nrows = (sh + total + 3) >> 2
    rows_ok = (wpi >= offb) & (wpi < offb + jnp.broadcast_to(nrows, (PW, LANES)))
    m16 = jnp.where(rows_ok, jnp.int32(-1), 0)
    headm = jnp.int32(-1) << (jnp.broadcast_to(sh, (PW, LANES)) * 8)
    m16 = jnp.where(wpi == offb, m16 & headm, m16)
    out_slabs = []
    for s in range(nsl):
        acc = ring[s * 8 : s * 8 + 8, :]
        for w in range(PW // 8):
            sel = (jax.lax.rem(sb + w, nsl) == s).astype(jnp.int32)
            mm = m16[w * 8 : w * 8 + 8, :] * jnp.broadcast_to(sel, (8, LANES))
            acc = (acc & ~mm) | (win[w * 8 : w * 8 + 8, :] & mm)
        out_slabs.append(acc)
    return jnp.concatenate(out_slabs, axis=0)


def place_multi(ring, chunks, dst, *, cb, ring_w):
    """Write the ``chunks`` list of ((cw, LANES) word rows, (8-or-1,
    LANES) take) as ONE contiguous span at per-lane byte position
    ``dst``; see module docstring for the slop invariant.  The ring must
    satisfy fill + len(chunks)*cb + 3 <= ring_w*4 at placement time.
    (Thin composition of window_geometry/extend/merge — decode128 builds
    the window incrementally so phase-2 matches can gather THIS round's
    bytes from it before the last chunk lands.)"""
    cw = chunks[0][0].shape[0]
    PW, sh, base = window_geometry(len(chunks), cw, dst, cb=cb, ring_w=ring_w)
    win = jnp.zeros((PW, LANES), jnp.int32)
    cum = jnp.zeros((1, LANES), jnp.int32)
    win, total = window_extend(win, chunks, sh, base, cum, zero_tails=False)
    return window_merge(ring, win, sh, base, total, ring_w=ring_w)


def sweep_flush(
    out_ref, ring, fw, nwords, *, ring_w, out_rows, row_base=None,
    mid_ref=None, mid_w=0,
):
    """out_ref[p - row_base, l] = ring[p mod ring_w, l] for
    fw_l <= p < fw_l + nwords_l (p in absolute word rows; ``row_base``
    (scalar or traced) offsets banded outputs — decodebig keeps only a
    sliding band of the output in VMEM)."""
    fwr = fw[0:1, :]
    nwr = nwords[0:1, :]
    act = nwr > 0
    lo = jnp.min(jnp.where(act, fwr, jnp.int32(1 << 30)))
    hi = jnp.max(jnp.where(act, fwr + nwr, 0))
    if row_base is not None:
        lo = lo - row_base
        hi = hi - row_base
    nblk = out_rows // ring_w
    b_lo = jnp.clip(lo // ring_w, 0, nblk - 1)
    b_hi = jnp.clip((hi + ring_w - 1) // ring_w, 0, nblk)
    piota = jax.lax.broadcasted_iota(jnp.int32, (ring_w, LANES), 0)
    rb = row_base if row_base is not None else 0

    def body(i, _):
        base = (b_lo + i) * ring_w
        blk = out_ref[pl.ds(base, ring_w), :]
        p = piota + base + rb
        m = (p >= fwr) & (p < fwr + nwr)
        out_ref[pl.ds(base, ring_w), :] = jnp.where(m, ring, blk)
        if mid_w:
            mb = jax.lax.rem(base + rb, mid_w)
            mblk = mid_ref[pl.ds(mb, ring_w), :]
            mid_ref[pl.ds(mb, ring_w), :] = jnp.where(m, ring, mblk)
        return 0

    jax.lax.fori_loop(0, jnp.maximum(b_hi - b_lo, 0), body, 0)
