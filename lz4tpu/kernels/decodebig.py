"""HBM-staged lane-parallel LZ4 decoder for big blocks (>= 256 KiB).

decode128 keeps each lane's whole compressed stream and output resident
in VMEM, which caps blocks at ~64 KiB/lane.  The reference's DEFAULT
frame geometry is 4 MiB blocks (``framed/compress.rs:49``; sizes
``framed/header.rs:72-80``) — this kernel decodes those on-chip with
CONSTANT VMEM by staging both streams in HBM:

* the transposed compressed words and outputs live in HBM
  (``pl.ANY``); VMEM holds a LINEAR sliding band of each — rows
  ``[base, base + BAND)`` — advanced by half-band ``async_copy`` DMAs
  (one rectangle per advance: the band is shared by all 128 lanes, so
  no per-lane DMA exists anywhere);
* LZ4 match offsets are 16-bit (<= 0xFFFF), so every match source lies
  in the trailing 64 KiB of the lane's output — the output band is
  sized 64 KiB + a working window, and the band-advance invariant
  (``min_active(out) - window_bound >= (ob+OHALF)*4``) guarantees far
  sources never fall off the band;
* lanes that need rows beyond a band PAUSE for the round (their parse /
  copy work is masked) until the slowest active lane lets the band
  advance — a pure scheduling effect, never a correctness one.  Lanes
  with wildly divergent compression ratios can cross-block the two
  bands (an RLE lane races ahead in output while barely consuming
  compressed bytes, pinning the comp band that incompressible lanes
  need); a no-progress backstop detects the stall and hands the
  band-blocking lanes to the host fallback (RLE-ish lanes are exactly
  the ones the native engine decodes fastest), letting the rest of the
  batch proceed on-chip;
* the round body is otherwise decode128's: lockstep one-sequence
  rounds, shared gather/funnel/place/sweep machinery from
  ``kernels/lanes.py``, re-entrant LSIC continuations, typed per-lane
  statuses (``decompress.rs:8-17`` semantics) validated on the host.

Scope: independent blocks (the reference's big-block frames are
independent by default); dictionary/linked prefixes stay decode128
features.  The phase-2 second sequence per round (SEQ2) is ported from
decode128: when the running record drains mid-round, the NEXT sequence
parses speculatively in the same round and executes its literal chunk
plus its match chunk when the source is servable — this round's span
(in-register window), the pre-place ring, or the banded far page whose
single rebuild folds phase-2 wants.  All phase-2 state commitment is
gated on the exact drain; aborted lanes re-parse identically next
round.  ``window_bound`` is 65535 in real use; tests shrink it (with
matching data) to exercise the banding machinery at
CPU-interpret-tractable sizes.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..spec.block import DecodeError
from .lanes import funnel
from .lanes import gather_rows as _lanes_gather_rows
from .lanes import place_multi as _lanes_place_multi
from .lanes import sweep_flush as _lanes_sweep_flush
from .lanes import window_extend, window_geometry, window_merge
from .status import (
    ERR_INVALID_OFFSET,
    ERR_MEMORY_LIMIT,
    ERR_UNEXPECTED_END,
    ERR_ZERO_OFFSET,
    OK,
    STATUS_TO_KIND,
)

LANES = 128
GROUP_W = 256  # comp page group (words), as decode128
FAR_G = 256  # far page group granularity (band rows)
CB = int(_os.environ.get("LZ4TPU_DBIG_CB", "16"))
CW = CB // 4
_MARGIN = -(-max(CW + 2, 5) // 8) * 8
PAGE_W = GROUP_W + _MARGIN
FAR_W = FAR_G + _MARGIN
# OBAND % RING_W == 0 must hold for the banded sweep.  decode128's
# round-4 tuning (RING 192 / THRESH 400 / FLUSH_B 256 / RESID 144)
# measured +6.6% there; env-tunable here for the same sweep
RING_W = int(_os.environ.get("LZ4TPU_DBIG_RINGW", "128"))
# phase-2 second sequence per round (decode128's SEQ2, ported): rounds
# place up to FOUR chunks (litA|mA|litB|mB), so the slop tail extends up
# to 4*CB+3 past the round-start fill
SEQ2 = _os.environ.get("LZ4TPU_DBIG_SEQ2", "1") == "1"
_NCHUNK = 4 if SEQ2 else 2
FLUSH_B = int(_os.environ.get("LZ4TPU_DBIG_FLUSHB", "128"))
FLUSH_THRESH = min(
    int(_os.environ.get("LZ4TPU_DBIG_FLUSHT", "176")),
    RING_W * 4 - _NCHUNK * CB - 4,
)
# flush gating + drain-to-residual (decode128's round-4 scheme: the
# sweep cost is the firing lanes' fw spread, so grant flushes every
# FLUSH_K rounds and drain each firing lane to the residual)
FLUSH_K = int(
    _os.environ.get("LZ4TPU_DBIG_FLUSHK", "4" if CB <= 16 else "2")
)
FLUSH_RESID = int(_os.environ.get("LZ4TPU_DBIG_FLUSHR", "48"))
assert 0 <= FLUSH_RESID <= FLUSH_THRESH - 64
assert FLUSH_THRESH >= FLUSH_B
assert FLUSH_THRESH - 1 + FLUSH_K * _NCHUNK * CB + 3 <= RING_W * 4, (
    RING_W, CB, FLUSH_K,
)
LSIC_STEPS = 8
assert 2 + LSIC_STEPS <= 12
STATUS_FALLBACK = 100

# default band geometry (rows = words).  Output band: 64 KiB offset
# reach + OHALF advance quantum + working spread; comp band: CHALF
# advance quantum + spread tolerance.  VMEM row sum at the defaults:
# out 26624 + comp 3072 + pages/ring/state ~700 = ~30.4K rows = 15.6 MB.
OBAND = int(_os.environ.get("LZ4TPU_DBIG_OBAND", str(26624)))
OHALF = int(_os.environ.get("LZ4TPU_DBIG_OHALF", "2048"))
CBAND = int(_os.environ.get("LZ4TPU_DBIG_CBAND", str(3072)))
CHALF = int(_os.environ.get("LZ4TPU_DBIG_CHALF", "1024"))
assert OBAND % OHALF == 0 and CBAND % CHALF == 0
assert OHALF % FAR_G == 0 and CHALF % GROUP_W == 0
assert OBAND % RING_W == 0

# state rows
(R_POS, R_OUT, R_ST, R_DONE, R_GB, R_FLUSH,
 R_LREM, R_LSRC, R_MREM, R_MOFF, R_MLAG, R_TAIL, R_FGB, R_PGF,
 R_RND, R_DONEAT, R_PPH, R_PV, R_SLIT, R_SSRC, R_SOFF) = range(21)
NSTATE = 24
PH_NONE, PH_LIT, PH_MATCH, PH_MHDR = 0, 1, 2, 3


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _decodebig_kernel(
    words_hbm,  # ANY (rw_pad, 128) int32 — transposed comp streams
    n_ref,  # VMEM (1, 128) int32
    prefix_hbm,  # ANY (max(pr,8), 128) int32 — right-aligned prefixes
    plen_ref,  # VMEM (1, 128) int32 — per-lane prefix byte lengths
    out_hbm,  # ANY (ro_pad, 128) int32 OUT
    out_len_ref,  # VMEM (3, 128) int32 OUT: len / done-at / rounds
    status_ref,  # VMEM (1, 128) int32 OUT
    cband_ref,  # scratch (CBAND, 128) — comp band
    oband_ref,  # scratch (OBAND, 128) — output band
    page_ref,  # scratch (PAGE_W, 128)
    far_ref,  # scratch (FAR_W, 128)
    ring_ref,  # scratch (RING_W, 128)
    state_ref,  # scratch (NSTATE, 128)
    mid_ref,  # scratch (max(mid_w,8), 128) — mod-addressed flush mirror
    base_ref,  # scratch SMEM (4,) int32: cb_base, ob_base (rows)
    dma_sem,  # DMA semaphore
    *,
    oband: int,
    cband: int,
    rw_pad: int,
    ro_pad: int,
    max_rounds: int,
    output_limit: int,
    window_bound: int,
    win_r: int,
    ws_log: int,
    pr: int = 0,
    mid_w: int = 0,
    debug_state: bool = False,
):
    """Prefix/dictionary mode (pr > 0): the first ``pr`` output rows are
    seeded with each lane's right-aligned prefix (DMA'd into the initial
    output band — prefix bytes then serve match offsets exactly like
    flushed output, ``/root/reference/src/raw/decompress.rs:84-99``) and
    decoding starts at byte ``pstart = pr*4``, pre-flushed.  Offsets
    validate against decoded + per-lane prefix length; window-repack
    chunk arithmetic uses OUTPUT coordinates (out - pstart)."""
    S8 = (8, LANES)
    n = jnp.broadcast_to(n_ref[0:1, :], S8)
    pstart = pr * 4
    plen = jnp.broadcast_to(plen_ref[0:1, :], S8)
    rowi8 = jax.lax.broadcasted_iota(jnp.int32, S8, 0)
    n_slots = (cband - PAGE_W) // GROUP_W + 1  # comp groups fully in band
    far_slots = (oband - FAR_W) // FAR_G + 1

    def gather_rows(src, src_rows, base_row, k_rows, modulo):
        return _lanes_gather_rows(
            src, src_rows, base_row, k_rows, modulo, rowi8=rowi8
        )

    # ---------------- banded comp page machinery ------------------------
    def refill_page(gbase, cb_g):
        """gbase is the lane's ABSOLUTE comp group; the band holds groups
        [cb_g, cb_g + n_slots_total).  Lanes whose page group has dropped
        BELOW the band keep their existing page: its content is still
        correct (pages hold absolute groups, copied while in band), and
        phase 2's residency check is arithmetic — zeroing stale lanes
        here made B parse zeros (the on-chip ERR_ZERO_OFFSET, 24/96
        lanes on the 96 MiB corpus)."""
        acc = jnp.zeros((PAGE_W, LANES), jnp.int32)
        gb = gbase[0:1, :]
        for s in range(n_slots):
            mask = ((gb - cb_g) == s).astype(jnp.int32)
            acc = acc + cband_ref[s * GROUP_W : s * GROUP_W + PAGE_W, :] * mask
        keep = ((gb < cb_g) | (gb - cb_g >= n_slots)).astype(jnp.int32)
        page_ref[:, :] = acc + page_ref[:, :] * keep

    def ensure_page(gbase, pos, active, cb_g):
        """Absolute-group ensure; lanes whose wanted group is not fully
        inside the comp band stall for the round (the band advances when
        the slowest lane releases the lower half)."""
        want = (pos >> 2) // GROUP_W
        in_band = (want >= cb_g) & (want - cb_g < n_slots)
        need = active & (want != gbase) & in_band
        new_gbase = jnp.where(need, want, gbase)

        @pl.when(jnp.any(need))
        def _():
            refill_page(new_gbase, cb_g)

        return new_gbase, active & ~in_band

    def lsic_from(span, k0, initial, p, enable, status, cont):
        need = ((initial == 0xF) | cont) & enable
        v = initial
        for k in range(LSIC_STEPS):
            eof = need & (p >= n)
            status = jnp.where(
                (eof != 0) & (status == OK), ERR_UNEXPECTED_END, status
            )
            need = need & (~eof)
            b = span[k0 + k]
            v = v + jnp.where(need, b, 0)
            p = p + need.astype(jnp.int32)
            need = need & (b == 0xFF)
        return v, p, status, need

    def place_multi(ring, chunks, dst):
        return _lanes_place_multi(ring, chunks, dst, cb=CB, ring_w=RING_W)

    def sweep_flush(ring, fw, nwords, ob_rows):
        _lanes_sweep_flush(
            oband_ref, ring, fw, nwords, ring_w=RING_W, out_rows=oband,
            row_base=ob_rows, mid_ref=mid_ref, mid_w=mid_w,
        )

    # ---------------- main loop ----------------------------------------
    def round_body(r, _):
        st = state_ref[:, :]

        def row(i):
            return jnp.broadcast_to(st[i : i + 1], S8)

        pos, out, status, done = row(R_POS), row(R_OUT), row(R_ST), row(R_DONE) != 0
        gbase, flushed = row(R_GB), row(R_FLUSH)
        lit_rem, lit_src = row(R_LREM), row(R_LSRC)
        m_rem, m_off, m_lag = row(R_MREM), row(R_MOFF), row(R_MLAG)
        tail_only, fgb = row(R_TAIL), row(R_FGB)
        pgf = row(R_PGF)
        rnd, doneat = row(R_RND), row(R_DONEAT)
        done0 = done
        pph, pv = row(R_PPH), row(R_PV)
        slit, ssrc, soff = row(R_SLIT), row(R_SSRC), row(R_SOFF)

        live = (~done) & (status == OK)

        # ---- band advances (round start; blocking DMAs, fire rarely) ----
        cb_g0 = base_ref[0] // GROUP_W  # absolute group of comp band base
        ob0 = base_ref[1]  # output band base (rows)
        # lowest comp row any live lane still needs (copying lanes read
        # literals at lit_src <= pos; everyone else reads at pos)
        low_need = jnp.where(lit_rem > 0, jnp.minimum(lit_src, pos), pos)
        # re-entrant LSIC suspensions still need bytes BEHIND the cursor:
        # a PH_MATCH lane's literal source (ssrc) is only committed to
        # lit_src when the match field completes, and cont resumes re-read
        # 1 (PH_LIT) / 2 (PH_MATCH) bytes before pos.  Without these the
        # band can advance past a suspended lane's pending reads and its
        # resume stalls below the base forever (observed: 4 MiB blocks,
        # lsrc one group under cb_base, both lanes wedged -> backstop)
        low_need = jnp.where(
            pph == PH_LIT, jnp.minimum(low_need, pos - 1), low_need
        )
        low_need = jnp.where(
            pph == PH_MATCH,
            jnp.minimum(jnp.minimum(low_need, ssrc), pos - 2),
            low_need,
        )
        low_row = jnp.min(
            jnp.where(live, low_need >> 2, jnp.int32(1 << 30))
        )
        # advance while any stream extends beyond the band, OR any live
        # lane wants rows in the band's trailing PAGE_W margin (groups
        # >= cb_g + n_slots are never "fully in band", so near stream
        # end — when nothing extends past the band — a want there would
        # stall forever; rw_pad keeps the extra DMA in-bounds).
        # Observed: 3/128 lanes of the 1 MiB corpus wedged with wants at
        # cb_g + 11..12 and every stream ending inside the band.
        hi_need = jnp.maximum(
            pos, jnp.where(lit_rem > 0, lit_src, pos)
        )
        stall_hi = live & (
            (hi_need >> 2) >= base_ref[0] + n_slots * GROUP_W
        )
        comp_left = (
            jnp.any(live & ((n + 3) >> 2 > base_ref[0] + cband))
            | jnp.any(stall_hi)
        )

        @pl.when((low_row >= base_ref[0] + CHALF) & comp_left)
        def _():
            cband_ref[0 : cband - CHALF, :] = cband_ref[CHALF:cband, :]
            cp = pltpu.make_async_copy(
                words_hbm.at[pl.ds(base_ref[0] + cband, CHALF)],
                cband_ref.at[pl.ds(cband - CHALF, CHALF)],
                dma_sem,
            )
            cp.start()
            cp.wait()
            base_ref[0] = base_ref[0] + CHALF
            base_ref[2] = 0  # band advance counts as progress

        # output band advance: the lower half may leave VMEM only when no
        # live lane's future far source (>= out - window_bound) or
        # unflushed byte can touch it
        min_out = jnp.min(jnp.where(live, out, jnp.int32(1 << 30)))
        min_flushed = jnp.min(jnp.where(live, flushed, jnp.int32(1 << 30)))
        can_adv = (
            (min_out - window_bound >= (ob0 + OHALF) * 4)
            & (min_flushed >= (ob0 + OHALF) * 4)
            & jnp.any(live)
        )

        @pl.when(can_adv)
        def _():
            cp = pltpu.make_async_copy(
                oband_ref.at[pl.ds(0, OHALF)],
                out_hbm.at[pl.ds(base_ref[1], OHALF)],
                dma_sem,
            )
            cp.start()
            cp.wait()
            oband_ref[0 : oband - OHALF, :] = oband_ref[OHALF:oband, :]
            base_ref[1] = base_ref[1] + OHALF
            base_ref[2] = 0

        cb_g = base_ref[0] // GROUP_W
        ob = base_ref[1]

        # lanes whose output would overrun the band pause this round
        opause = out >= (ob + oband) * 4 - 2 * RING_W * 4
        active = live & ~opause

        # ---- parse (decode128's re-entrant structure) -------------------
        need_rec = active & (lit_rem == 0) & (m_rem == 0)
        if win_r:
            # window-aligned comp layout: the next sequence's header lives
            # in the chunk of its output window (k*win_r); jump when the
            # previous match's output crossed window boundaries.  Chunk
            # indices are OUTPUT coordinates — prefix rows don't count.
            wk_out = jax.lax.shift_right_logical(out - pstart, ws_log)
            wk_pos = pos // win_r
            pos = jnp.where(
                need_rec & (pph == PH_NONE) & (wk_out > wk_pos),
                wk_out * win_r, pos,
            )
        pbase = (
            pos
            - (pph == PH_LIT).astype(jnp.int32)
            - 2 * (pph == PH_MATCH).astype(jnp.int32)
        )
        gbase, pstall = ensure_page(
            gbase, jnp.where(need_rec, pbase, lit_src),
            active & (need_rec | (lit_rem > 0)), cb_g,
        )
        # mid-LSIC suspensions at EOF are real truncation; a PH_MHDR lane
        # with < 2 bytes left is the reference's match-less stream end
        # (read_u16 fails => done), e.g. a literal-only tail that crossed
        # window chunks
        cont_pending = (pph == PH_LIT) | (pph == PH_MATCH)
        status = jnp.where(
            need_rec & cont_pending & (pos >= n) & (status == OK),
            ERR_UNEXPECTED_END, status,
        )
        mhdr_tail = (
            need_rec & (pph == PH_MHDR) & (n - pos < 2) & (status == OK)
        )
        parse_ok = need_rec & (pos < n) & ~pstall & (status == OK)
        fresh = parse_ok & (pph == PH_NONE)
        cont_lit = parse_ok & (pph == PH_LIT)
        cont_match = parse_ok & (pph == PH_MATCH)
        cont_mhdr = parse_ok & (pph == PH_MHDR) & ~mhdr_tail
        page = page_ref[:, :]

        def span_at(p, enable):
            base_row = jnp.clip(
                (p >> 2) - gbase * GROUP_W, 0, PAGE_W - 5
            )
            w4 = gather_rows(page, PAGE_W, base_row, 4, 0)
            ws = funnel(w4, p)
            outb = []
            for k in range(12):
                word = jnp.broadcast_to(ws[k // 4 : k // 4 + 1], S8)
                outb.append(
                    jax.lax.shift_right_logical(word, (k % 4) * 8) & 0xFF
                )
            return outb

        lit_en = fresh | cont_lit
        span1 = span_at(jnp.where(lit_en, pbase, 0), lit_en)
        tok = span1[0]
        nib = jnp.where(cont_lit, soff, tok & 0xF)
        lit_init = jnp.where(cont_lit, pv, jax.lax.shift_right_logical(tok, 4))
        p = pos + fresh.astype(jnp.int32)
        litv, p, status, lneed = lsic_from(
            span1, 1, jnp.where(lit_en, lit_init, 0), p, lit_en, status,
            cont=cont_lit,
        )
        susp_lit = lneed & (status == OK)
        adv = lit_en & ~lneed & (status == OK)
        new_lsrc = jnp.where(cont_match, ssrc, p)
        litv = jnp.where(cont_match, slit, litv)
        if win_r:
            # literals split across window chunks: the match header sits
            # in the chunk of the literal run's LAST output window — often
            # several windows (and comp-band advances) ahead.  Accept the
            # LITERAL part now (PH_MHDR) and parse the match field when
            # the copy drains; by then the bands have advanced with out.
            oe = out - pstart + litv
            m_w = jax.lax.shift_right_logical(oe, ws_log)
            p_w = p // win_r
            header_far = adv & (m_w > p_w)
            p = jnp.where(
                cont_match | cont_mhdr, pos,
                jnp.where(
                    header_far,
                    m_w * win_r + (oe & ((1 << ws_log) - 1)),
                    p + jnp.where(adv, litv, 0),
                ),
            )
            adv = adv & ~header_far
        else:
            header_far = adv & False
            p = jnp.where(cont_match, pos, p + jnp.where(adv, litv, 0))
        status = jnp.where(
            adv & (p > n) & (status == OK), ERR_UNEXPECTED_END, status
        )
        adv = adv & (status == OK)

        m_en = adv & (n - p >= 2)
        m_parse = m_en | cont_match | cont_mhdr
        span2_base = jnp.where(cont_match, pbase, jnp.where(cont_mhdr, pos, p))
        gbase, pstall2 = ensure_page(
            gbase, jnp.where(m_parse, span2_base, pos), m_parse, cb_g
        )
        # a lane whose match header left the band defers the whole parse
        # to a later round (no state commitment)
        m_parse = m_parse & ~pstall2
        m_en = m_en & ~pstall2
        adv = adv & ~pstall2
        page = page_ref[:, :]
        span2 = span_at(jnp.where(m_parse, span2_base, 0), m_parse)
        offv = jnp.where(
            cont_match, soff,
            jnp.where(
                m_en | cont_mhdr, span2[0] | (span2[1] << 8), 1
            ),
        )
        p = p + 2 * (m_en | cont_mhdr).astype(jnp.int32)
        # cont_mhdr: the match nibble was saved in soff at the literal
        # acceptance; its literals are already copied (litv = 0 below)
        m_init = jnp.where(
            cont_match, pv,
            jnp.where(cont_mhdr, soff, jnp.where(m_en, nib, 0)),
        )
        mv, p, status, mneed = lsic_from(
            span2, 2, m_init, p, m_parse, status, cont=cont_match
        )
        susp_match = mneed & (status == OK)
        m_done = m_parse & ~mneed & (status == OK)
        mlenv = jnp.where(m_done, mv + 4, 0)

        ok = status == OK
        status = jnp.where(
            m_done & ok & (out - pstart + litv + mlenv > output_limit),
            ERR_MEMORY_LIMIT, status,
        )
        ok = status == OK
        # tail soft-limit: route buffer-overrunning tails to the host
        buf_cap = ro_pad * 4 - _NCHUNK * CB - 8
        status = jnp.where(
            (adv & ~m_en) & ok & (out + litv > buf_cap),
            STATUS_FALLBACK, status,
        )
        ok = status == OK
        status = jnp.where(m_done & ok & (offv == 0), ERR_ZERO_OFFSET, status)
        ok = status == OK
        # offsets may reach back through decoded bytes AND the lane's
        # prefix (decompress.rs:84-99)
        status = jnp.where(
            m_done & ok & (offv > out - pstart + plen + litv),
            ERR_INVALID_OFFSET, status,
        )
        ok = status == OK
        # offsets beyond the banding window (test-sized window_bound
        # only; real offsets are <= 0xFFFF = the default bound) fall back
        status = jnp.where(
            m_done & ok & (offv > window_bound), STATUS_FALLBACK, status
        )
        seq_done = (adv & ~m_en) | m_done | mhdr_tail
        accept = seq_done & (status == OK)
        # header_far: accept the LITERAL part now; the match field parses
        # (PH_MHDR) once the copy drains and the bands caught up
        accept_lit = header_far & (status == OK)
        litv = jnp.where(mhdr_tail, 0, litv)
        mlenv = jnp.where(mhdr_tail, 0, mlenv)

        lit_rem = jnp.where(accept | accept_lit, litv, lit_rem)
        lit_src = jnp.where(accept | accept_lit, new_lsrc, lit_src)
        m_rem = jnp.where(accept, mlenv, jnp.where(accept_lit, 0, m_rem))
        m_off = jnp.where(accept, offv, m_off)
        m_lag = jnp.where(accept, offv, m_lag)
        tail_only = jnp.where(
            accept, (~(m_done | mhdr_tail)).astype(jnp.int32),
            jnp.where(accept_lit, 0, tail_only),
        )
        # mhdr_tail does NOT consume the (possible) single leftover byte:
        # the reference's failed u16 read consumes nothing, so that byte
        # is re-read as a fresh token next round (pos stays put; at exact
        # EOF pos == n already and the lane completes below)
        pos = jnp.where(
            accept | accept_lit | susp_lit | susp_match,
            jnp.where(mhdr_tail, pos, p), pos,
        )
        pph = jnp.where(
            susp_lit, PH_LIT,
            jnp.where(
                susp_match, PH_MATCH,
                jnp.where(
                    accept_lit, PH_MHDR,
                    jnp.where(accept, PH_NONE, pph),
                ),
            ),
        )
        pv = jnp.where(susp_lit, litv, jnp.where(susp_match, mv, pv))
        soff = jnp.where(
            susp_lit, nib,
            jnp.where(susp_match, offv, jnp.where(accept_lit, nib, soff)),
        )
        slit = jnp.where(susp_match, litv, slit)
        ssrc = jnp.where(susp_match, new_lsrc, ssrc)

        active = active & (status == OK)

        # ---- flush (plus the final drain of lanes finishing this round,
        # so band advances never outrun a finished lane's ring tail).
        # Gated to every FLUSH_K rounds with drain-to-residual (same
        # economics as decode128's round-4 flush gating) ----
        ring0 = ring_ref[:, :]
        do_flush = (
            active & (out - flushed >= FLUSH_THRESH)
            & (jax.lax.rem(r, FLUSH_K) == 0)
        )
        nwf = jnp.where(do_flush, (out - flushed - FLUSH_RESID) >> 2, 0)

        @pl.when(jnp.any(do_flush))
        def _():
            sweep_flush(ring0, flushed >> 2, nwf, ob)

        flushed = flushed + nwf * 4

        # ---- literal chunk ----
        lit_take = jnp.where(pstall, 0, jnp.clip(lit_rem, 0, CB))
        if win_r:
            # a literal run's bytes continue in the next window's chunk;
            # stop the copy at the boundary and jump lit_src below
            # (chunk boundaries are OUTPUT coordinates: out - pstart)
            to_boundary = (
                (jax.lax.shift_right_logical(out - pstart, ws_log) + 1)
                << ws_log
            ) - (out - pstart)
            lit_take = jnp.minimum(lit_take, to_boundary)
        gbase, lstall = ensure_page(
            gbase, jnp.where(lit_take > 0, lit_src, pos),
            active & (lit_take > 0), cb_g,
        )
        lit_take = jnp.where(lstall, 0, lit_take)
        page = page_ref[:, :]
        lsrc_row = jnp.clip(
            (lit_src >> 2) - gbase * GROUP_W, 0, PAGE_W - CW - 2
        )
        litw = gather_rows(page, PAGE_W, lsrc_row, CW + 1, 0)
        lit_bytes = funnel(litw, lit_src)

        # ---- match chunk ----
        lit_take1 = jnp.where(active, lit_take, 0)
        m_ready = active & (lit_rem - lit_take == 0) & (m_rem > 0)
        src_abs = out + lit_take - m_lag
        near = m_ready & (src_abs >= flushed)
        far = m_ready & (src_abs < flushed)

        # m_take without the far-page watermark clamp (exact for near
        # lanes; used to speculate the phase-2 parse position and far
        # group before the rebuild)
        m_take_pre = jnp.where(
            m_ready, jnp.minimum(jnp.minimum(m_rem, CB), m_lag), 0
        )
        m_take_pre = jnp.where(
            near & (lit_take > 0),
            jnp.minimum(m_take_pre, jnp.clip(out - src_abs, 0, None)),
            m_take_pre,
        )

        ob_g = ob // FAR_G

        # ---- phase 2: speculative parse of the NEXT sequence (SEQ2,
        # decode128's structure under the banded geometry; every read is
        # gated on residency in the CURRENT page/band — out-of-band lanes
        # abort and re-parse via phase 1 next round) ----
        if SEQ2:
            out1_pre = out + lit_take1 + m_take_pre
            ph2s = (
                active
                & (lit_rem - lit_take == 0)
                & (m_rem - m_take_pre == 0)
                & (pos < n)
                & (pph == PH_NONE)
                & (tail_only == 0)
            )
            if win_r:
                # B's header lives in the chunk of its output window when
                # phase 1's match crossed window boundaries (no literal
                # continuation bytes precede it there — matches consume
                # no comp)
                wkB = jax.lax.shift_right_logical(out1_pre - pstart, ws_log)
                posB = jnp.where(
                    ph2s & (wkB > pos // win_r), wkB * win_r, pos
                )
            else:
                posB = pos
            rowB = (posB >> 2) - gbase * GROUP_W
            ph2s = ph2s & (rowB >= 0) & (rowB <= PAGE_W - 5)
            statusB = status
            span1B = span_at(jnp.where(ph2s, posB, 0), ph2s)
            tokB = span1B[0]
            pB = posB + ph2s.astype(jnp.int32)
            litvB, pB, statusB, lneedB = lsic_from(
                span1B, 1, jnp.where(
                    ph2s, jax.lax.shift_right_logical(tokB, 4), 0
                ), pB, ph2s, statusB, cont=ph2s & False,
            )
            advB = ph2s & ~lneedB & (statusB == OK)
            lsrcB = pB
            if win_r:
                # match header beyond the literal run's last window
                # (PH_MHDR territory): abort B, phase 1 handles it
                oeB = out1_pre - pstart + litvB
                advB = advB & (
                    jax.lax.shift_right_logical(oeB, ws_log) <= pB // win_r
                )
            pB = pB + jnp.where(advB, litvB, 0)
            statusB = jnp.where(
                advB & (pB > n) & (statusB == OK), ERR_UNEXPECTED_END, statusB
            )
            advB = advB & (statusB == OK)
            lrowB_raw = (lsrcB >> 2) - gbase * GROUP_W
            advB = advB & (lrowB_raw >= 0) & (lrowB_raw <= PAGE_W - CW - 2)
            tailB = advB & (n - pB < 2)
            m_enB = advB & (n - pB >= 2)
            rowB2 = (pB >> 2) - gbase * GROUP_W
            m_enB = m_enB & (rowB2 >= 0) & (rowB2 <= PAGE_W - 5)
            span2B = span_at(jnp.where(m_enB, pB, 0), m_enB)
            offvB = jnp.where(m_enB, span2B[0] | (span2B[1] << 8), 1)
            pB = pB + 2 * m_enB.astype(jnp.int32)
            mvB, pB, statusB, mneedB = lsic_from(
                span2B, 2, jnp.where(m_enB, tokB & 0xF, 0), pB, m_enB,
                statusB, cont=m_enB & False,
            )
            m_doneB = m_enB & ~mneedB & (statusB == OK)
            mlenvB = jnp.where(m_doneB, mvB + 4, 0)
            lit_takeB_pre = jnp.where(advB, jnp.minimum(litvB, CB), 0)
            if win_r:
                to_bB = (
                    (jax.lax.shift_right_logical(out1_pre - pstart, ws_log)
                     + 1) << ws_log
                ) - (out1_pre - pstart)
                lit_takeB_pre = jnp.minimum(lit_takeB_pre, to_bB)
            src_absB_pre = out1_pre + lit_takeB_pre - offvB
            farB_pre = (
                m_doneB & (src_absB_pre < flushed) & (src_absB_pre >= 0)
            )
            if mid_w:
                # mid-servable wants need no far page: keep them out of
                # the fold so they never burn the round's single rebuild
                farB_pre = farB_pre & (
                    src_absB_pre < flushed - (mid_w * 4 - 4)
                )
            fwantB = (jnp.clip(src_absB_pre, 0, None) >> 2) // FAR_G
            # only in-band groups may fold into the rebuild (out-of-band
            # wants carry; the one-hot below would serve zeros otherwise)
            farB_pre = farB_pre & (fwantB >= ob_g) & (fwantB - ob_g < far_slots)
        else:
            farB_pre = active & False
            fwantB = fgb

        nsrc_row = jax.lax.rem(jnp.clip(src_abs, 0, None) >> 2, RING_W)
        nearw = gather_rows(ring0, RING_W, nsrc_row, CW + 1, RING_W)
        near_bytes = funnel(nearw, src_abs)

        # far page: absolute FAR_G groups of the output; the band holds
        # groups [ob/FAR_G, ob/FAR_G + far_slots_total).  Phase-2 wants
        # fold into the SAME single rebuild on lanes whose phase-1 record
        # needs no far group this round.
        fwant = (jnp.clip(src_abs, 0, None) >> 2) // FAR_G
        foldB = farB_pre & ~far
        rebuild = far & ((fwant != fgb) | (src_abs + CB > pgf))
        if SEQ2:
            rebuild = rebuild | (
                foldB & ((fwantB != fgb) | (src_absB_pre + CB > pgf))
            )
        want_all = jnp.where(far, fwant, jnp.where(foldB, fwantB, fgb))

        @pl.when(jnp.any(rebuild))
        def _():
            fw1 = want_all[0:1, :]
            acc = jnp.zeros((FAR_W, LANES), jnp.int32)
            for s in range(far_slots):
                mask = ((fw1 - ob_g) == s).astype(jnp.int32)
                acc = acc + oband_ref[s * FAR_G : s * FAR_G + FAR_W, :] * mask
            far_ref[:, :] = acc

        fgb = want_all
        pgf = jnp.where(rebuild, flushed, pgf)
        farp = far_ref[:, :]
        fsrc_row = jnp.clip(
            (src_abs >> 2) - fgb * FAR_G, 0, FAR_W - CW - 2
        )
        farw = gather_rows(farp, FAR_W, fsrc_row, CW + 1, 0)
        far_bytes = funnel(farw, src_abs)

        m_bytes = jnp.where(
            jnp.broadcast_to(near[0:1], (CW, LANES)), near_bytes, far_bytes
        )
        m_take = jnp.where(
            far, jnp.clip(jnp.minimum(m_take_pre, pgf - src_abs), 0, None),
            m_take_pre,
        )

        # ---- phase 2 commitment + execution -----------------------------
        if SEQ2:
            drained = (
                active & (lit_rem - lit_take1 == 0) & (m_rem - m_take == 0)
            )
            commitB = ph2s & drained & (m_take == m_take_pre)
            statusB = jnp.where(commitB, statusB, status)
            okB = statusB == OK
            statusB = jnp.where(
                commitB & m_doneB & okB
                & (out - pstart + lit_take1 + m_take + litvB + mlenvB
                   > output_limit),
                ERR_MEMORY_LIMIT, statusB,
            )
            okB = statusB == OK
            statusB = jnp.where(
                commitB & tailB & okB
                & (out + lit_take1 + m_take + litvB > buf_cap),
                STATUS_FALLBACK, statusB,
            )
            okB = statusB == OK
            statusB = jnp.where(
                commitB & m_doneB & okB & (offvB == 0), ERR_ZERO_OFFSET,
                statusB,
            )
            okB = statusB == OK
            statusB = jnp.where(
                commitB & m_doneB & okB
                & (offvB > out - pstart + plen + lit_take1 + m_take + litvB),
                ERR_INVALID_OFFSET, statusB,
            )
            okB = statusB == OK
            # offsets beyond the banding window fall back exactly like
            # phase 1 (test-sized window_bound only in real use)
            statusB = jnp.where(
                commitB & m_doneB & okB & (offvB > window_bound),
                STATUS_FALLBACK, statusB,
            )
            status = jnp.where(commitB, statusB, status)
            acceptB = commitB & (tailB | m_doneB) & (status == OK)

            out1 = out + lit_take1 + m_take
            lit_takeB = jnp.where(acceptB, lit_takeB_pre, 0)
            m_readyB = acceptB & (litvB == lit_takeB) & (mlenvB > 0)
            src_absB = out1 + lit_takeB - offvB
            # span: source bytes placed THIS round — gathered from the
            # in-register span window below
            spanB = m_readyB & (src_absB >= out)
            nearB = m_readyB & (src_absB >= flushed) & ~spanB
            farB = m_readyB & (src_absB < flushed)
            if mid_w:
                # the mod-addressed flush mirror serves phase-2 sources
                # within its window with no rebuild and no band residency
                # requirement (decode128's round-5 port)
                midB = farB & (src_absB >= flushed - (mid_w * 4 - 4))
                farB = farB & ~midB
            else:
                midB = farB & False
            m_takeB = jnp.where(
                m_readyB, jnp.minimum(jnp.minimum(mlenvB, CB), offvB), 0
            )
            m_takeB = jnp.where(
                nearB,
                jnp.clip(jnp.minimum(m_takeB, out - src_absB), 0, None),
                m_takeB,
            )
            # mid: the mirror holds flushed bytes only
            m_takeB = jnp.where(
                midB,
                jnp.clip(jnp.minimum(m_takeB, flushed - src_absB), 0, None),
                m_takeB,
            )
            # far: only when the (possibly folded) page holds B's group
            fwantB_x = (jnp.clip(src_absB, 0, None) >> 2) // FAR_G
            m_takeB = jnp.where(
                farB,
                jnp.where(
                    fwantB_x == fgb,
                    jnp.clip(jnp.minimum(m_takeB, pgf - src_absB), 0, None),
                    0,
                ),
                m_takeB,
            )

            lrowB = jnp.clip(lrowB_raw, 0, PAGE_W - CW - 2)
            litBw = gather_rows(page, PAGE_W, lrowB, CW + 1, 0)
            litB_bytes = funnel(litBw, lsrcB)

            # span window: scatter the three already-known chunks so the
            # phase-2 match can gather this round's bytes before the last
            # chunk lands
            PW_, shW, baseW = window_geometry(
                _NCHUNK, CW, out, cb=CB, ring_w=RING_W
            )
            winW = jnp.zeros((PW_, LANES), jnp.int32)
            winW, cumW = window_extend(
                winW,
                [(lit_bytes, lit_take1), (m_bytes, m_take),
                 (litB_bytes, lit_takeB)],
                shW, baseW, jnp.zeros((1, LANES), jnp.int32),
                zero_tails=True,
            )
            dspan = jnp.clip(src_absB - out, 0, None)
            idxB = jnp.broadcast_to((baseW & 7) * 4 + shW, S8) + dspan
            # in-bounds cap for garbage lanes: the gather reads CW+1 rows
            # from idxB>>2 (legitimate reads never exceed this — start
            # byte <= 31, dspan <= 3*CB - 1)
            idxB = jnp.clip(idxB, 0, (PW_ - CW - 1) * 4 + 3)
            spw = gather_rows(winW, PW_, idxB >> 2, CW + 1, 0)
            spanB_bytes = funnel(spw, idxB)

            nsrcB = jax.lax.rem(jnp.clip(src_absB, 0, None) >> 2, RING_W)
            nearBw = gather_rows(ring0, RING_W, nsrcB, CW + 1, RING_W)
            nearB_bytes = funnel(nearBw, src_absB)
            fsrcB = jnp.clip(
                (jnp.clip(src_absB, 0, None) >> 2) - fgb * FAR_G,
                0, FAR_W - CW - 2,
            )
            farBw = gather_rows(far_ref[:, :], FAR_W, fsrcB, CW + 1, 0)
            farB_bytes = funnel(farBw, src_absB)
            if mid_w:
                msrcB = jax.lax.rem(jnp.clip(src_absB, 0, None) >> 2, mid_w)
                midBw = gather_rows(mid_ref[:, :], mid_w, msrcB, CW + 1, mid_w)
                midB_bytes = funnel(midBw, src_absB)
            else:
                midB_bytes = farB_bytes
            mB_bytes = jnp.where(
                jnp.broadcast_to(spanB[0:1], (CW, LANES)),
                spanB_bytes,
                jnp.where(
                    jnp.broadcast_to(nearB[0:1], (CW, LANES)),
                    nearB_bytes,
                    jnp.where(
                        jnp.broadcast_to(midB[0:1], (CW, LANES)),
                        midB_bytes, farB_bytes,
                    ),
                ),
            )
            winW, totW = window_extend(
                winW, [(mB_bytes, m_takeB)], shW, baseW, cumW,
                zero_tails=False,
            )
            ring2 = window_merge(ring0, winW, shW, baseW, totW, ring_w=RING_W)
        else:
            lit_takeB = jnp.zeros(S8, jnp.int32)
            m_takeB = jnp.zeros(S8, jnp.int32)
            acceptB = active & False
            ring2 = place_multi(
                ring0, [(lit_bytes, lit_take1), (m_bytes, m_take)], out
            )
        ring_ref[:, :] = ring2

        out = out + lit_take1 + m_take + lit_takeB + m_takeB
        if SEQ2:
            lit_rem = jnp.where(acceptB, litvB - lit_takeB, lit_rem - lit_take1)
            lit_src = jnp.where(acceptB, lsrcB + lit_takeB, lit_src + lit_take1)
            m_rem = jnp.where(acceptB, mlenvB - m_takeB, m_rem - m_take)
        else:
            lit_rem = lit_rem - lit_take1
            lit_src = lit_src + lit_take1
            m_rem = m_rem - m_take
        take_last = jnp.where(acceptB, lit_takeB, lit_take1)
        if win_r:
            # crossing lanes resume their literal run at the next chunk
            crossed = (
                (lit_rem > 0) & (((out - pstart) & ((1 << ws_log) - 1)) == 0)
                & (take_last > 0)
            )
            lit_src = jnp.where(
                crossed,
                jax.lax.shift_right_logical(out - pstart, ws_log) * win_r,
                lit_src,
            )
        m_lag = jnp.where(
            (m_take > 0) & (m_take == m_lag) & (m_lag < CB), m_lag * 2, m_lag
        )
        if SEQ2:
            lagB = jnp.where(
                (m_takeB > 0) & (m_takeB == offvB) & (offvB < CB),
                offvB * 2, offvB,
            )
            m_lag = jnp.where(acceptB, lagB, m_lag)
            m_off = jnp.where(acceptB, offvB, m_off)
            tail_only = jnp.where(acceptB, tailB.astype(jnp.int32), tail_only)
            pos = jnp.where(acceptB, pB, pos)

        # tail completion requires exact EOF — one leftover byte re-parses
        # as a token instead (reference read_exact consumes nothing on
        # EOF; see decode128.py and test_fuzz_generative.py)
        done = done | (
            active & (tail_only != 0) & (lit_rem == 0) & (pos >= n)
        ) | (
            (pos >= n) & (lit_rem == 0) & (m_rem == 0) & (pph == PH_NONE)
        )

        # drain the ring tail of lanes that FINISHED this round so band
        # advances never strand their unflushed bytes
        just_done = (done & ~done0) | ((status != OK) & ~done0)
        fin_nw = jnp.where(
            just_done, jnp.clip(((out - flushed) + 3) >> 2, 0, RING_W), 0
        )

        @pl.when(jnp.any(fin_nw > 0))
        def _():
            sweep_flush(ring_ref[:, :], flushed >> 2, fin_nw, ob)

        flushed = jnp.where(fin_nw > 0, out, flushed)

        # ---- cross-band deadlock backstop ----
        # No lane progressed and no band advanced: divergent-ratio lanes
        # are cross-blocking the bands.  First hand the output-paused
        # (out-ahead) lanes to the host fallback; if still wedged, all
        # remaining live lanes (fallback is always safe — the host
        # engine redoes those blocks with identical typed semantics).
        # Parse-side motion (LSIC suspensions, literal-part acceptance)
        # counts as progress.
        progressed = jnp.any(
            accept | accept_lit | susp_lit | susp_match | acceptB
            | (lit_take1 + m_take + lit_takeB + m_takeB > 0)
        )
        base_ref[2] = jnp.where(progressed, 0, base_ref[2] + 1)
        live_now = (~done) & (status == OK)
        status = jnp.where(
            (base_ref[2] >= 16) & live_now & opause, STATUS_FALLBACK, status
        )
        status = jnp.where(
            (base_ref[2] >= 32) & live_now, STATUS_FALLBACK, status
        )

        finished = done | (status != OK)
        doneat = jnp.where(finished & ~done0 & (doneat == 0), rnd + 1, doneat)
        new_rows = [pos, out, status, done.astype(jnp.int32), gbase, flushed,
                    lit_rem, lit_src, m_rem, m_off, m_lag, tail_only, fgb, pgf,
                    rnd + 1, doneat, pph, pv, slit, ssrc, soff]
        pad = (
            [jnp.zeros((NSTATE - len(new_rows), LANES), jnp.int32)]
            if len(new_rows) < NSTATE else []
        )
        state_ref[:, :] = jnp.concatenate([x[0:1] for x in new_rows] + pad, axis=0)
        return 0

    # ---- init: fill the initial bands, zero state ----------------------
    base_ref[0] = 0
    base_ref[1] = 0
    base_ref[2] = 0
    cp = pltpu.make_async_copy(
        words_hbm.at[pl.ds(0, cband)], cband_ref, dma_sem
    )
    cp.start()
    cp.wait()
    oband_ref[:, :] = jnp.zeros((oband, LANES), jnp.int32)
    if pr:
        # prefix rows ride the initial output band: bytes below pstart
        # then behave exactly like flushed output for the far pages, and
        # the band machinery publishes them to out_hbm as it advances
        cpp = pltpu.make_async_copy(
            prefix_hbm.at[pl.ds(0, pr)], oband_ref.at[pl.ds(0, pr)], dma_sem
        )
        cpp.start()
        cpp.wait()
    z1 = jnp.zeros((1, LANES), jnp.int32)
    one = jnp.full((1, LANES), 1, jnp.int32)
    ps1 = jnp.full((1, LANES), pstart, jnp.int32)
    state_ref[:, :] = jnp.concatenate(
        [z1, ps1, jnp.full((1, LANES), OK, jnp.int32),
         (0 >= n[0:1]).astype(jnp.int32), jnp.full((1, LANES), -1, jnp.int32),
         ps1, z1, z1, z1, one, one, z1, jnp.full((1, LANES), -1, jnp.int32),
         z1, jnp.zeros((NSTATE - 14, LANES), jnp.int32)],
        axis=0,
    )
    ring_ref[:, :] = jnp.zeros((RING_W, LANES), jnp.int32)
    if mid_w:
        mid_ref[:, :] = jnp.zeros((max(mid_w, 8), LANES), jnp.int32)

    n_chunks = -(-max_rounds // 64)

    def chunk_cond(c):
        i, all_done = c
        return (i < n_chunks) & (~all_done)

    def chunk_body(c):
        i, _ = c
        jax.lax.fori_loop(0, 64, round_body, 0)
        st = state_ref[:, :]
        lane_live = (st[R_DONE : R_DONE + 1] == 0) & (st[R_ST : R_ST + 1] == OK)
        return i + 1, ~jnp.any(lane_live)

    jax.lax.while_loop(chunk_cond, chunk_body, (jnp.int32(0), jnp.bool_(False)))

    st = state_ref[:, :]
    live = (st[R_DONE : R_DONE + 1] == 0) & (st[R_ST : R_ST + 1] == OK)
    state_ref[R_ST : R_ST + 1, :] = jnp.where(
        live, STATUS_FALLBACK, st[R_ST : R_ST + 1]
    )
    st = state_ref[:, :]
    if debug_state:
        # diagnostics-only: clobber the head of the output with the final
        # state rows + band bases (tools/chip_dbig_debug.py reads them)
        dbg = jnp.concatenate(
            [st, jnp.broadcast_to(base_ref[0], (1, LANES)).astype(jnp.int32),
             jnp.broadcast_to(base_ref[1], (1, LANES)).astype(jnp.int32)],
            axis=0,
        )
        cp = pltpu.make_async_copy(
            oband_ref.at[pl.ds(0, NSTATE + 2)],
            out_hbm.at[pl.ds(0, NSTATE + 2)], dma_sem,
        )
        oband_ref[0 : NSTATE + 2, :] = dbg
        cp.start()
        cp.wait()
        out_len_ref[:, :] = jnp.concatenate(
            [st[R_OUT : R_OUT + 1] - pstart, st[R_DONEAT : R_DONEAT + 1],
             st[R_RND : R_RND + 1]], axis=0,
        )
        status_ref[:, :] = st[R_ST : R_ST + 1]
        return
    # final drain: any ring tail not covered by the just-done drains
    out_f = jnp.broadcast_to(st[R_OUT : R_OUT + 1], S8)
    flushed_f = jnp.broadcast_to(st[R_FLUSH : R_FLUSH + 1], S8)
    _lanes_sweep_flush(
        oband_ref, ring_ref[:, :], flushed_f >> 2,
        jnp.clip(((out_f - flushed_f) + 3) >> 2, 0, RING_W),
        ring_w=RING_W, out_rows=oband, row_base=base_ref[1],
    )
    # publish the whole remaining band
    cp = pltpu.make_async_copy(
        oband_ref, out_hbm.at[pl.ds(base_ref[1], oband)], dma_sem
    )
    cp.start()
    cp.wait()
    out_len_ref[:, :] = jnp.concatenate(
        [st[R_OUT : R_OUT + 1] - pstart, st[R_DONEAT : R_DONEAT + 1],
         st[R_RND : R_RND + 1]], axis=0,
    )
    status_ref[:, :] = st[R_ST : R_ST + 1]


@functools.partial(
    jax.jit,
    static_argnames=(
        "oband", "cband", "rw_pad", "ro_pad", "max_rounds", "output_limit",
        "window_bound", "win_r", "ws_log", "pr", "mid_w", "debug_state",
    ),
)
def _decodebig_jit(
    words, n, prefix=None, plen=None, *, oband, cband, rw_pad, ro_pad,
    max_rounds, output_limit, window_bound=65535, win_r=0, ws_log=12,
    pr=0, mid_w=0, debug_state=False,
):
    if prefix is None:
        assert pr == 0
        prefix = jnp.zeros((8, LANES), jnp.int32)
        plen = jnp.zeros((1, LANES), jnp.int32)
    assert mid_w % RING_W == 0  # the flush mirror writes RING_W-row blocks
    return pl.pallas_call(
        functools.partial(
            _decodebig_kernel,
            oband=oband, cband=cband, rw_pad=rw_pad, ro_pad=ro_pad,
            max_rounds=max_rounds, output_limit=output_limit,
            window_bound=window_bound, win_r=win_r, ws_log=ws_log,
            pr=pr, mid_w=mid_w, debug_state=debug_state,
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ro_pad, LANES), jnp.int32),
            jax.ShapeDtypeStruct((3, LANES), jnp.int32),
            jax.ShapeDtypeStruct((1, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((cband, LANES), jnp.int32),
            pltpu.VMEM((oband, LANES), jnp.int32),
            pltpu.VMEM((PAGE_W, LANES), jnp.int32),
            pltpu.VMEM((FAR_W, LANES), jnp.int32),
            pltpu.VMEM((RING_W, LANES), jnp.int32),
            pltpu.VMEM((NSTATE, LANES), jnp.int32),
            pltpu.VMEM((max(mid_w, 8), LANES), jnp.int32),
            pltpu.SMEM((4,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        # explicit scoped-vmem stack claim: the XLA default budget is
        # 16 MiB of v5e's 128 MiB and the remote-compile service's
        # effective default drifted between sessions (see decode128)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(
                _os.environ.get("LZ4TPU_DBIG_VMEM_LIMIT", str(96 << 20))
            ),
        ),
        interpret=_interpret(),
    )(words, n, prefix, plen)



WS_LOG = 12  # output window: 4 KiB
WS = 1 << WS_LOG

# mid-mirror cap (rows, RING_W-aligned); 0 disables.  Sized from the
# VMEM headroom the band shape leaves (decode128's pick_mid_w scheme).
MID_CAP = int(_os.environ.get("LZ4TPU_DBIG_MIDW", "512"))
VMEM_ROWSUM_BUDGET = int(
    _os.environ.get("LZ4TPU_DBIG_VMEM", "15_600_000").replace("_", "")
)


def pick_mid_w(oband_rows: int, cband_rows: int) -> int:
    """Largest mid size (rows, RING_W-aligned, <= MID_CAP) whose VMEM row
    sum stays under the band budget (default band geometry = ~15.6 MB,
    the documented anchor in the geometry note above)."""
    base = oband_rows + cband_rows + PAGE_W + FAR_W + RING_W + NSTATE
    w = min(MID_CAP, max(VMEM_ROWSUM_BUDGET // (LANES * 4) - base, 0))
    return (w // RING_W) * RING_W


def _repack_block(comp: bytes, output_limit: int, ws_log: int = WS_LOG):
    """Window-aligned comp layout: split the stream into per-output-window
    chunks so every lane's comp consumption schedule is uniform in OUTPUT
    space (chunk k at byte k*R) and the shared comp band can advance in
    lockstep with the output band.  Chunk k holds: the continuation bytes
    of a literal run crossing into window k, then the header + lsic +
    window-k literal bytes of every sequence starting in window k.
    Sequences are assigned by their output START; match bytes consume no
    comp, so a long match simply leaves later windows empty.  Parsing
    here doubles as hostile-input validation (typed DecodeError)."""
    W = 1 << ws_log
    chunks: list[bytearray] = []

    def chunk(k: int) -> bytearray:
        while len(chunks) <= k:
            chunks.append(bytearray())
        return chunks[k]

    pos, out, n = 0, 0, len(comp)
    while pos < n:
        s0 = pos
        tok = comp[pos]
        pos += 1
        lit = tok >> 4
        if lit == 0xF:
            while True:
                if pos >= n:
                    raise DecodeError(DecodeError.KIND_UNEXPECTED_END)
                b = comp[pos]
                pos += 1
                lit += b
                if b != 0xFF:
                    break
        hdr = comp[s0:pos]
        if pos + lit > n:
            raise DecodeError(DecodeError.KIND_UNEXPECTED_END)
        lits = comp[pos : pos + lit]
        pos += lit
        k0 = out >> ws_log
        first = min(lit, ((k0 + 1) << ws_log) - out)
        c = chunk(k0)
        c.extend(hdr)
        c.extend(lits[:first])
        x, j = first, k0 + 1
        while x < lit:
            t = min(W, lit - x)
            chunk(j).extend(lits[x : x + t])
            x += t
            j += 1
        out += lit
        if out > output_limit + n:
            raise DecodeError(DecodeError.KIND_MEMORY_LIMIT)
        if pos >= n:
            break  # literal-only tail
        if pos + 2 > n:
            # a single stray byte: the reference's read_u16 fails => tail;
            # keep the byte unread at the stream end (n - p == 1 < 2)
            chunk(out >> ws_log).extend(comp[pos:])
            pos = n
            break
        m0 = pos
        pos += 2
        ml = tok & 0xF
        if ml == 0xF:
            while True:
                if pos >= n:
                    raise DecodeError(DecodeError.KIND_UNEXPECTED_END)
                b = comp[pos]
                pos += 1
                ml += b
                if b != 0xFF:
                    break
        chunk(out >> ws_log).extend(comp[m0:pos])
        out += ml + 4
        if out > output_limit:
            raise DecodeError(DecodeError.KIND_MEMORY_LIMIT)
    return chunks, out


def round_bound(max_comp_len: int, block_maxsize: int) -> int:
    # parse/LSIC rounds + chunk rounds + pause slack per band advance
    return (
        3 * max_comp_len
        + block_maxsize // CB
        + 64 * (block_maxsize // (OHALF * 4) + max_comp_len // (CHALF * 4) + 4)
        + 1024
    )


def decompress_blocks_big(
    blocks, block_maxsize: int, *, repack: bool = True, prefixes=None,
    _window_bound: int = 65535,
    _oband: int | None = None, _cband: int | None = None,
):
    """dispatch + collect in one call; see ``dispatch_blocks_big``."""
    return collect_blocks_big(
        dispatch_blocks_big(
            blocks, block_maxsize, repack=repack, prefixes=prefixes,
            _window_bound=_window_bound, _oband=_oband, _cband=_cband,
        )
    )


def dispatch_blocks_big(
    blocks, block_maxsize: int, *, repack: bool = True, prefixes=None,
    _window_bound: int = 65535,
    _oband: int | None = None, _cband: int | None = None,
):
    """Decode up to 128 independent raw blocks of up to ``block_maxsize``
    (any frame size code incl. the reference-default 4 MiB) with the
    HBM-staged lane kernel; per-lane typed errors raise ``DecodeError``,
    fallback-flagged lanes re-decode on the host native engine.

    ``repack=True`` (default) lays each stream out window-aligned
    (``_repack_block``) so lanes with divergent compression ratios share
    one comp band without cross-band stalls; ``repack=False`` feeds the
    raw streams (used by the banding tests).  The underscore knobs
    shrink the bands/window for CPU-interpret tests; real callers use
    the defaults.

    ``prefixes`` (optional, per block): dictionary / carryover-window
    bytes (<= 64 KiB each) the block's offsets may reach back into —
    seeded into the initial output band, serving dictionary frames and
    linked-chain wave decode at big-block geometry on-chip."""
    assert len(blocks) <= LANES
    blocks = [bytes(b) for b in blocks]
    nb = len(blocks)
    if nb == 0:
        return None
    oband = _oband or OBAND
    cband = _cband or CBAND
    if prefixes is not None:
        prefixes = [bytes(p or b"")[-65536:] for p in prefixes]
        assert len(prefixes) == nb
        if not any(prefixes):
            prefixes = None
    max_plen = max((len(p) for p in prefixes), default=0) if prefixes else 0
    # prefix rows: RING_W-aligned so decoding starts flush-block aligned,
    # and they must fit the initial output band with working room
    _pw = -(-max_plen // 4)
    pr = -(-_pw // RING_W) * RING_W if max_plen else 0
    # the initial output band must hold the whole prefix plus working room
    assert pr + OHALF <= oband or not pr, (pr, oband)

    win_r = 0
    if repack:
        # native two-pass repack (lz4tpu_repack_window): pass 1 sizes the
        # batch stride from the max chunk length, pass 2 writes the
        # strided layout straight into the transposed pack buffer.  The
        # C++ walk replaces the original per-sequence Python loop (which
        # cost more host time than the kernel itself on 4 MiB blocks);
        # _repack_block stays as its differential oracle.
        from ..native import repack_window_lens

        chunk_lens = [
            repack_window_lens(b, block_maxsize, WS_LOG) for b in blocks
        ]
        maxchunk = max(
            (int(cl.max()) for cl, _ in chunk_lens if len(cl)), default=0
        )
        win_r = -(-(maxchunk + 16) // 512) * 512
        # pathological header density (should not occur on valid LZ4 of
        # sane ratio): keep the raw layout, divergence backstop applies
        if win_r > 6 * WS:
            repack = False
            win_r = 0

    if repack:
        lens = [
            ((len(cl) - 1) * win_r + int(cl[-1]) if len(cl) else 0)
            for cl, _ in chunk_lens
        ]
        maxlen = max(max(lens), 4)
    else:
        lens = [len(b) for b in blocks]
        maxlen = max(max(lens), 4)
    rw = -(-maxlen // 4)
    rw_pad = -(-rw // CHALF) * CHALF + cband + CHALF  # DMA always in-bounds
    ro_pad = -(-block_maxsize // 4)
    ro_pad = pr + -(-ro_pad // OHALF) * OHALF + oband + OHALF
    max_rounds = round_bound(maxlen, block_maxsize)

    arr = np.zeros((LANES, rw_pad * 4), np.uint8)
    n = np.zeros((1, LANES), np.int32)
    if repack:
        from ..native import repack_window_into
    for i in range(nb):
        if repack:
            repack_window_into(
                blocks[i], block_maxsize, WS_LOG, win_r, arr[i]
            )
        else:
            arr[i, : len(blocks[i])] = np.frombuffer(blocks[i], np.uint8)
        n[0, i] = lens[i]
    from ..hostpack import pack_words_le

    words = pack_words_le(arr)

    from ..hostpack import to_device_chunked

    kw = {}
    if pr:
        parr = np.zeros((LANES, pr * 4), np.uint8)
        plen = np.zeros((1, LANES), np.int32)
        for i, p in enumerate(prefixes):
            if p:
                parr[i, pr * 4 - len(p) :] = np.frombuffer(p, np.uint8)
            plen[0, i] = len(p)
        kw["prefix"] = to_device_chunked(pack_words_le(parr))
        kw["plen"] = jnp.asarray(plen)

    # mid mirror: fill the VMEM headroom this band shape leaves, up to
    # MID_CAP (prefix mode stays mid-less: prefix rows never pass through
    # the flush sweep, so the mirror would lack them)
    mid_w = 0 if pr else pick_mid_w(oband, cband)
    out_t, meta = _decodebig_jit_t(
        to_device_chunked(words), jnp.asarray(n),
        oband=oband, cband=cband, rw_pad=rw_pad, ro_pad=ro_pad,
        max_rounds=max_rounds, output_limit=block_maxsize,
        window_bound=_window_bound, win_r=win_r, ws_log=WS_LOG, pr=pr,
        mid_w=mid_w, **kw,
    )
    try:
        meta.copy_to_host_async()  # streams as the kernel finishes
    except Exception:
        pass
    return _DispatchedBigBatch(
        out_t=out_t, meta=meta, blocks=blocks,
        block_maxsize=block_maxsize, pr=pr, prefixes=prefixes,
    )


class _DispatchedBigBatch:
    """In-flight decodebig batch (device handles + metadata).  Outputs
    for a full 128 x 4 MiB batch hold ~540 MB of HBM, so callers keep
    at most a couple in flight."""

    __slots__ = ("out_t", "meta", "blocks", "block_maxsize",
                 "pr", "prefixes")

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


@functools.partial(
    jax.jit,
    static_argnames=(
        "oband", "cband", "rw_pad", "ro_pad", "max_rounds", "output_limit",
        "window_bound", "win_r", "ws_log", "pr", "mid_w",
    ),
)
def _decodebig_jit_t(words, n, prefix=None, plen=None, **kw):
    """_decodebig_jit + on-device transpose: the host unpack becomes one
    contiguous row slice per lane instead of 128 strided column copies
    over a ~0.5 GB buffer."""
    out_w, out_len, status = _decodebig_jit(words, n, prefix, plen, **kw)
    return out_w.T, jnp.concatenate([out_len, status], axis=0)


def collect_blocks_big(batch):
    """Fetch + unpack one dispatched decodebig batch; host-native
    fallback for flagged lanes, typed errors otherwise."""
    if batch is None:
        return []
    blocks = batch.blocks
    meta = np.asarray(batch.meta)
    out_len, status = meta[0], meta[meta.shape[0] - 1]
    pr = batch.pr
    # fetch only the produced rows, quantized to eighths of ro (each
    # distinct slice shape is a separate compiled program), with
    # overlapped piecewise D2H — a full 128 x 4 MiB out_t is ~540 MB
    # and mostly padding on partial batches
    nb = len(blocks)
    need_rows = pr + (int(
        max((int(out_len[i]) for i in range(nb) if status[i] == OK),
            default=0)
    ) + 3) // 4
    ro = batch.out_t.shape[1]
    step = max(ro // 8, 1)
    fetch_rows = min(-(-max(need_rows, 1) // step) * step, ro)
    from ..hostpack import fetch_device_rows

    out_b = (
        fetch_device_rows(batch.out_t, fetch_rows)
        .astype("<i4", copy=False)
        .view(np.uint8)
        .reshape(LANES, -1)
    )
    results = []
    for i in range(len(blocks)):
        s = int(status[i])
        if s == OK:
            results.append(
                out_b[i, pr * 4 : pr * 4 + out_len[i]].tobytes()
            )
        elif s == STATUS_FALLBACK:
            from ..native import decompress_block as _native_decompress

            results.append(
                bytes(
                    _native_decompress(
                        blocks[i],
                        batch.prefixes[i] if batch.prefixes else b"",
                        output_limit=batch.block_maxsize,
                    )
                )
            )
        else:
            raise DecodeError(STATUS_TO_KIND[s])
    return results
