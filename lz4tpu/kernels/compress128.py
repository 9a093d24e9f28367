"""Lane-parallel LZ4 compressor — 128 blocks per step.

decode128's lockstep-round machinery run in reverse: one block per SIMD
lane, transposed VMEM streams, two-level one-hot slab gathers, and a
mod-addressed output staging ring flushed by lane-uniform masked sweeps.
Each lane is a small phase machine advanced once per round:

* SEARCH — hash the 4 bytes at the cursor, probe + insert a per-lane
  hash table held transposed in VMEM ((2^HASHLOG, 128); the probe and
  the insert share one one-hot sweep over the table slabs).  Each table
  entry PACKS (position(17) | hash tag(15) << 17) into one int32 array
  (one array instead of positions+keys, +7% measured; 17-bit positions
  cover [window|block] buffers up to 96 KiB with an explicit
  offset<=0xFFFF hit check).  The tag check is probabilistic (2^-15
  false positives per probe); the authoritative byte verify is EXTEND's
  first LCP round — output validity never depends on the tag;
* EXTEND — CB-byte LCP steps from mlen=0: XOR the cursor/candidate
  windows, find the first differing byte branchlessly; a first round
  yielding < MINMATCH bytes rejects the candidate (tag false positive
  or a genuine short collision) and the scan resumes at mstart+1;
* TOK / EXT_L / LCOPY / MHDR / EXT_M — emit the sequence: token +
  literal-LSIC, a 0xFF-run emitter for long LSIC chains, literal copy
  from the input page, offset + match-LSIC.

The hash table is per lane, so its size is the main VMEM/ratio knob
(HASHLOG above) — any table produces VALID LZ4, the table only affects
match discovery.  With the C-sized 2^12 default and the opportunistic
backward extension, the lane parse compresses the bench corpus BELOW
the reference greedy (0.5718 vs 0.5743) at ~99 MB/s/chip.  Scope:
C-style skip acceleration (step = miss>>TRIGGER, K-way per round),
opportunistic backtrack, blocks <= 32 KiB (wrapper contract; the frame
layer may emit 32 KiB blocks inside any larger block-maxsize frame).
End rules mirror the reference encoder: no match starts past n-12 and
matches stop at n-5 (/root/reference/src/raw/compress/mod.rs;
spec/block.py `compress_block`).

Window/dictionary mode: ``compress_blocks_128(prefixes=...)`` — see
``_compress128_kernel``.  The gather/funnel/place/sweep machinery is
shared with decode128 in ``kernels/lanes.py``.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lanes import funnel
from .lanes import gather_rows as _lanes_gather_rows
from .lanes import place_multi as _lanes_place_multi
from .lanes import sweep_flush as _lanes_sweep_flush

LANES = 128
GROUP_W = 256  # input page group (words)
PAGE_W = GROUP_W + 32
# table size/speed/ratio knob, measured on-chip with backtrack on the
# bench corpus: 2^12 = 99 MB/s @ ratio 0.5718 (BELOW the reference
# greedy's 0.5743 — the C-sized table), 2^11 = 127 @ 0.583,
# 2^10 = 140 @ 0.600.  Default to the C-sized table so the lane
# compressor's output is at-or-below reference size; drop to 10-11 for
# throughput when ratio headroom exists.
HASHLOG = int(_os.environ.get("LZ4TPU_C128_HASHLOG", "12"))
# positions probed per SEARCH round (1, 2 or 4).  The greedy scan is 71%
# of all rounds on mixed data (simulated round counts; PERF_NOTES.md), so
# probing K positions per round against one shared table sweep cuts total
# rounds ~2x at K=4 with measurably unchanged ratio.  All K probes insert
# (position, key) regardless of earlier hits in the round ("insert-all"
# semantics — simulated ratio 0.6100 vs 0.6112 for strict C ordering).
PROBES = int(_os.environ.get("LZ4TPU_C128_PROBES", "4"))
# timing decomposition (debug only, output is wrong): comma list of
# {fixed,nosweep,noplace,noflush,noextend,noprobeword,nolit}; "fixed"
# runs exactly max_rounds rounds (no early exit) so variant deltas give
# clean per-round component costs (predicated vector work costs full
# price on this core, so the phase mix does not matter)
TIMING = frozenset(
    f for f in _os.environ.get("LZ4TPU_C128_TIMING", "").split(",") if f
)
# cursor-side page refill gating: refills are granted only on rounds
# r % K == 0; a lane whose page is absent stalls (its phase work is
# masked for the round and retried after the next refill).  Measured on
# the bench corpus (gbok-fixed build): K=1 143.5 MB/s, K=2 137.4,
# K=4 121.7, K=8 83.6 with page2 gated too — the candidate-side stalls
# dominate, so page2 is ungated by default (GATE2) and K=1 (gating off,
# but the ensure sites stay coalesced into one round-start site, which
# alone was worth +12.5% over per-phase ensures).
REFILL_K = int(_os.environ.get("LZ4TPU_C128_REFILL_K", "1"))
# gate the candidate-side (page2) ensure too — measured a loss (page2
# groups are random-access per fresh hit); kept as a knob for corpora
# with very few matches
GATE2 = _os.environ.get("LZ4TPU_C128_GATE2", "0") == "1"
# backward match extension (reference backtrack semantics) at the
# ext_done transition; opportunistic on page residency — see the kernel
BACKTRACK = _os.environ.get("LZ4TPU_C128_BACKTRACK", "1") == "1"
# STRICT: byte-for-byte parity with the reference greedy parse
# (``compress/mod.rs:147-260``; oracle ``spec/block.py``): the 5-byte
# reference hash buckets a 4-byte-word tag (equal words => equal tags,
# so tag rejects are never false negatives for C's >=4-byte verify),
# empty slots read as position 0 with word-0's tag (C's zero-init
# quirk), inserts are suppressed after the round's first tag hit,
# tag-false-hit lanes resume the exact skip-accelerated walk, the
# backward extension is unbounded (PH_BT continuation rounds), and
# cursor-2 re-inserts after every match.  Flow proven byte-exact vs the
# oracle in tools/sim_c128_strict.py; the kernel is differentially
# tested in tests/test_compress128_strict.py.
STRICT = _os.environ.get("LZ4TPU_C128_STRICT", "0") == "1"
# output staging ring geometry.  Compressed outputs DESYNC across lanes
# (per-lane ratio), so each flush sweep spans many output blocks — a
# bigger ring with bigger, rarer flushes amortizes that spread
# (measured: flush = 16% of the round at the 64/128/176 defaults).
RING_W = int(_os.environ.get("LZ4TPU_C128_RINGW", "64"))  # ring rows (words)
CB = 32  # bytes per chunk per round
CW = CB // 4
FLUSH_B = int(_os.environ.get("LZ4TPU_C128_FLUSHB", "128"))  # bytes per flush
FLUSH_THRESH = int(_os.environ.get("LZ4TPU_C128_THRESH", "176"))
assert RING_W % 8 == 0 and FLUSH_B % 4 == 0
assert FLUSH_B <= FLUSH_THRESH <= RING_W * 4 - CB + 1  # ring never overfills
assert FLUSH_B // 4 <= RING_W  # one flush fits the ring window
# each flush must drain at least one emitting round's max inflow, or the
# fill ratchets up past the ring capacity on incompressible runs
assert FLUSH_B >= CB
MAX_B = 32 << 10  # per-lane input cap (VMEM budget)

# phases
(PH_SEARCH, PH_EXTEND, PH_TOK, PH_EXT_L, PH_LCOPY, PH_MHDR, PH_EXT_M,
 PH_BT) = range(8)

# state rows (C_STEP..C_PND: strict-mode walk state — current step, the
# saved false-hit resume triple, pending cursor-2 reinsert flag)
(C_CUR, C_ANCHOR, C_PH, C_OUT, C_FLUSH, C_GB, C_GB2, C_MOFF, C_MSTART,
 C_MLEN, C_EMR, C_LREM, C_LSRC, C_TAIL, C_DONE, C_FAIL, C_MISS,
 C_STEP, C_RQ, C_RSC, C_RST, C_PND) = range(22)
# strict-mode deferred probe inserts: 2 rows per probe (bucket hash,
# -1 = empty; packed pos17|tag15 value).  A round's probe inserts land
# in the NEXT round's single fused sweep; reads see them via fixups.
C_PP0 = 22
NSTATE = 22 + 2 * PROBES  # rows reserved regardless of mode (STRICT is
# toggled at runtime by tests/bench; non-strict rounds leave them zero)
SKIP_TRIGGER = 6  # C-style skip acceleration (raw/compress/mod.rs:147-148)

HASH_MUL = np.uint32(2654435761)
# 32-bit limbs of the reference 5-byte hash multiplier (strict mode)
from ..spec.table import HASH64_MUL as _HASH64_MUL  # noqa: E402
_SM0 = _HASH64_MUL & 0xFFFFFFFF
_SM1 = _HASH64_MUL >> 32


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _compress128_kernel(
    words_ref,  # VMEM (Ri, 128) int32 — transposed raw input
    n_ref,  # VMEM (1, 128) int32 — input byte lengths (incl. window)
    cur0_ref,  # VMEM (1, 128) int32 — parse-start byte (window length)
    tinit_ref,  # VMEM (T_ROWS or 8, 128) int32 — primed table (prime=1)
    out_words_ref,  # VMEM (Ro, 128) int32 OUT — transposed comp streams
    out_len_ref,  # VMEM (1, 128) int32 OUT
    page_ref,  # scratch (PAGE_W, 128) — cursor-side input page
    page2_ref,  # scratch (PAGE_W, 128) — candidate-side input page
    table_ref,  # scratch (T_ROWS, 128) — per-lane table: pos | tag<<17
    ring_ref,  # scratch (RING_W, 128) — output staging ring
    state_ref,  # scratch (NSTATE, 128)
    *,
    ri: int,
    ro: int,
    max_rounds: int,
    hashlog: int,
    prime: bool,
):
    """Prefix/window mode (``cur0 > 0``): each lane's buffer is
    ``[window | block]`` and the parse starts at ``cur0`` with the table
    host-primed from the window (the reference's dictionary/carryover
    semantics, ``framed/compress.rs:202-218``, applied per lane).  Match
    candidates may reach back into the window; offsets are explicitly
    capped at 0xFFFF (positions exceed 64 KiB in this mode, so the
    packed entry carries a 17-bit position + 15-bit tag)."""
    T_ROWS = 1 << hashlog
    S8 = (8, LANES)
    n = jnp.broadcast_to(n_ref[0:1, :], S8)
    n_groups = max((ri - PAGE_W) // GROUP_W + 1, 1)
    rowi8 = jax.lax.broadcasted_iota(jnp.int32, S8, 0)

    # ---------------- shared gather/funnel/place/sweep ------------------
    # (kernels/lanes.py — shared with decode128/decodebig)
    def gather_rows(src, src_rows, base_row, k_rows, modulo):
        return _lanes_gather_rows(
            src, src_rows, base_row, k_rows, modulo, rowi8=rowi8
        )

    def place(ring, bytes_w, dst, take):
        """Single-chunk emission placement under the shared slop-write
        invariant (bytes below ``dst`` preserved, slop above the span is
        republished-before-observable): flush rows stay strictly below
        ``out`` (FLUSH_THRESH >= FLUSH_B) and the host truncates the
        final drain at out_len, exactly as in decode128."""
        return _lanes_place_multi(
            ring, [(bytes_w, take)], dst, cb=CB, ring_w=RING_W
        )

    def sweep_flush(ring, fw, nwords):
        _lanes_sweep_flush(
            out_words_ref, ring, fw, nwords, ring_w=RING_W, out_rows=ro
        )

    # ---------------- input page machinery ------------------------------
    def refill(ref, gbase):
        acc = jnp.zeros((PAGE_W, LANES), jnp.int32)
        gb = gbase[0:1, :]
        for g in range(n_groups):
            mask = (gb == g).astype(jnp.int32)
            acc = acc + words_ref[g * GROUP_W : g * GROUP_W + PAGE_W, :] * mask
        ref[:, :] = acc

    def ensure(ref, gbase, pos, active, granted):
        """Gated page ensure: lanes whose wanted group is absent refill
        only when ``granted``; otherwise they are reported as stalled.
        Returns (new_gbase, stalled)."""
        want = jnp.clip((pos >> 2) // GROUP_W, 0, n_groups - 1)
        need = active & (want != gbase)
        if "norefill" in TIMING:
            return jnp.where(need, want, gbase), need & (want != want)
        take = need & granted
        new_gbase = jnp.where(take, want, gbase)

        @pl.when(jnp.any(take))
        def _():
            refill(ref, new_gbase)

        return new_gbase, need & ~take

    def read_words(ref, gbase, p, k):
        """k funneled words (4k bytes) of the input starting at byte p."""
        base_row = jnp.clip((p >> 2) - gbase * GROUP_W, 0, PAGE_W - k - 2)
        w = gather_rows(ref[:, :], PAGE_W, base_row, k + 1, 0)
        return funnel(w, p)

    # ---------------- round -------------------------------------------
    def round_body(r, _):
        st = state_ref[:, :]

        def row(i):
            return jnp.broadcast_to(st[i : i + 1], S8)

        cur, anchor, ph, out = row(C_CUR), row(C_ANCHOR), row(C_PH), row(C_OUT)
        flushed, gb, gb2 = row(C_FLUSH), row(C_GB), row(C_GB2)
        moff, mstart, mlen = row(C_MOFF), row(C_MSTART), row(C_MLEN)
        emr, lrem, lsrc = row(C_EMR), row(C_LREM), row(C_LSRC)
        tail, done = row(C_TAIL) != 0, row(C_DONE) != 0
        fail = row(C_FAIL) != 0
        miss = row(C_MISS)
        stepv = row(C_STEP)
        rq, rsc, rst = row(C_RQ), row(C_RSC), row(C_RST)
        pnd = row(C_PND)
        # deferred probe inserts from the lane's last search round
        # (hash -1 = empty).  Reapplying an already-applied entry is
        # idempotent: the lane writes its column only through these
        # entries (+ the pending cursor-2 reinsert in strict mode), and
        # they are replaced at the lane's next search round.
        pp_h = [st[C_PP0 + 2 * j : C_PP0 + 2 * j + 1] for j in range(PROBES)]
        pp_v = [st[C_PP0 + 2 * j + 1 : C_PP0 + 2 * j + 2] for j in range(PROBES)]

        active = ~done

        # ---- coalesced cursor-side page ensure (one site per round) ----
        # Every page_ref consumer this round reads within [want_pos,
        # want_pos + ~100 B], which the page's 128-byte margin covers:
        # probe/extend reads run ahead of the cursor by <= ~44 B.  The
        # fused-emission literal read (<= 14 B back to the anchor) does
        # NOT request a group: fusion is opportunistic — it only fires
        # when the anchor's group is already resident (``gbok`` below),
        # else the sequence takes the constructed TOK/LCOPY path, whose
        # LCOPY rounds request their own lsrc group.  (A stalled lane may
        # reach TOK via a short gated EXTEND with its anchor in an older
        # group; fusing there would read a non-resident group.)
        granted = jax.lax.rem(r, REFILL_K) == 0
        e_search = active & (ph == PH_SEARCH)
        e_extend = active & (ph == PH_EXTEND)
        e_lcopy = active & (ph == PH_LCOPY)
        if STRICT:
            e_bt0 = active & (ph == PH_BT)
        near_anchor = (cur - anchor) < 15
        want_pos = cur
        if STRICT:
            # the probe read is based at cur-4 (pending cursor-2 reinsert
            # hash bytes); the fused-emission anchor read shares the page
            want_pos = jnp.where(
                e_search, jnp.maximum(cur - 4, 0), want_pos
            )
            want_pos = jnp.where(
                e_search & near_anchor,
                jnp.maximum(jnp.minimum(anchor, cur - 4), 0), want_pos,
            )
        else:
            want_pos = jnp.where(e_search & near_anchor, anchor, want_pos)
        want_pos = jnp.where(e_extend, mstart + mlen, want_pos)
        want_pos = jnp.where(e_lcopy, lsrc, want_pos)
        reads_page = e_search | e_extend | e_lcopy
        if STRICT:
            want_pos = jnp.where(
                e_bt0, jnp.maximum(mstart - emr - CB, 0), want_pos
            )
            reads_page = reads_page | e_bt0
        gb, stall = ensure(page_ref, gb, want_pos, reads_page, granted)

        # ---- SEARCH ----------------------------------------------------
        searching = e_search
        ended = searching & (cur + 12 > n)
        # tail: final literal-only sequence (always emitted, even empty)
        lit_tail = n - anchor
        tail = tail | ended
        ph = jnp.where(ended, PH_TOK, ph)
        mlen = jnp.where(ended, 4, mlen)  # match nibble contributes 0
        mstart = jnp.where(ended, n, mstart)

        probing = searching & ~ended & ~stall
        # one CW-word (32 B) read at the cursor covers every probe word:
        # the probe schedule is span-capped at CB-8 bytes below
        RW = 2 if PROBES == 1 else CW
        if "noprobeword" in TIMING:
            wv = jnp.zeros((RW, LANES), jnp.int32)
        elif not STRICT:
            wv = read_words(page_ref, gb, jnp.where(probing, cur, 0), RW)

        # probe schedule.  Non-strict: q[j+1] = q[j] + ((miss+j) >> TRIGGER)
        # (approximate C walk).  STRICT: the exact C schedule — per-probe
        # step with the one-miss lag (`anchor+1 != next` rule), the
        # step-aware tail bail (cursor + step > n-11), and saved resume
        # state for tag false hits (tools/sim_c128_strict.py).
        curs1 = cur[0:1, :]
        probe1 = probing[0:1, :]
        n1 = n[0:1, :]
        anchor1 = anchor[0:1, :]
        if STRICT:
            span_cap = RW * 4 - 8 - 4  # read base shifted 4 for cursor-2
            qs = [curs1]
            valids = []
            qnexts = []
            scs = []
            sts = []
            sc_c = miss[0:1, :]
            st_c = stepv[0:1, :]
            for j in range(PROBES):
                vj = (
                    probe1
                    & (qs[j] + st_c <= n1 - 11)
                    & (qs[j] - curs1 <= span_cap)
                )
                valids.append(vj)
                qn = qs[j] + st_c
                upd = (anchor1 + 1) != qn
                nst = jnp.where(
                    upd, jax.lax.shift_right_logical(sc_c, SKIP_TRIGGER), st_c
                )
                nsc = jnp.where(upd, sc_c + 1, sc_c)
                qnexts.append(qn)
                scs.append(nsc)
                sts.append(nst)
                if j < PROBES - 1:
                    qs.append(qn)
                sc_c, st_c = nsc, nst
            # strict tail: the FIRST probe already fails the step-aware
            # bail (overrides the plain cur+12>n rule computed above)
            ended_s = searching & ~stall & ~jnp.broadcast_to(valids[0], S8)
            ended_new = ended_s & ~ended
            tail = tail | ended_s
            ph = jnp.where(ended_new, PH_TOK, ph)
            mlen = jnp.where(ended_new, 4, mlen)
            mstart = jnp.where(ended_new, n, mstart)
            # un-end lanes the plain rule ended but strict keeps probing
            # (cannot happen: strict bail is never later than cur+12>n at
            # step >= 1... it can be EARLIER under acceleration only)
        else:
            qs = [curs1]
            m_ctr = miss[0:1, :]
            for j in range(1, PROBES):
                st = jax.lax.shift_right_logical(m_ctr, SKIP_TRIGGER)
                qs.append(qs[-1] + st)
                m_ctr = m_ctr + 1
            nxt = qs[-1] + jax.lax.shift_right_logical(m_ctr, SKIP_TRIGGER)
            valids = [probe1]
            for j in range(1, PROBES):
                valids.append(
                    probe1
                    & (qs[j] + 12 <= n1)
                    & (qs[j] - curs1 <= RW * 4 - 8)
                )

        # probe words: funnel 4 bytes at q[j] out of the cursor read
        # (strict: the read is based at cur-4 so the pending cursor-2
        # reinsert's 8 hash bytes are in-span)
        read_base = jnp.maximum(curs1 - 4, 0) if STRICT else curs1
        if STRICT and "noprobeword" not in TIMING:
            wv = read_words(
                page_ref, gb,
                jnp.where(probing, jnp.maximum(cur - 4, 0), 0), RW,
            )

        def word_at(d1):
            """4 LE bytes at read-relative byte offset d1 (1,128)."""
            wi = d1 >> 2
            shb = (d1 & 3) * 8
            lo = jnp.zeros((1, LANES), jnp.int32)
            hi = jnp.zeros((1, LANES), jnp.int32)
            for k in range(RW):
                lo = lo + wv[k : k + 1] * (wi == k).astype(jnp.int32)
                if k >= 1:
                    hi = hi + wv[k : k + 1] * (wi == k - 1).astype(jnp.int32)
            return jnp.where(
                shb == 0,
                lo,
                jax.lax.shift_right_logical(lo, shb) | (hi << ((32 - shb) & 31)),
            )

        vs = []
        for j in range(PROBES):
            d = jnp.where(valids[j], qs[j] - read_base, 0)
            vs.append(word_at(d))

        def h5_of(j_word, j_b4):
            """Reference 5-byte hash, 32-bit-limb form (kernels/compress.py):
            bucket = hi32 >> (32 - HASHLOG)."""
            b0 = j_word & 0xFF
            w1 = jax.lax.shift_right_logical(j_word, 8) | ((j_b4 & 0xFF) << 24)
            m0 = jnp.int32(np.int32(_SM0))
            hi32 = (
                b0 * jnp.int32(np.int32(_SM0 >> 8))
                + jax.lax.shift_right_logical(b0 * jnp.int32(_SM0 & 0xFF), 8)
                + (((b0 * jnp.int32(_SM1)) & 0xFF) << 24)
                + w1 * m0
            )
            return jax.lax.shift_right_logical(hi32, 32 - hashlog)

        hsj = []
        tags = []
        pk = []
        for j in range(PROBES):
            vm = vs[j] * jnp.int32(np.int32(HASH_MUL))
            tj = jax.lax.shift_right_logical(vm, 6) & 0x7FFF
            if STRICT:
                b4 = word_at(
                    jnp.where(valids[j], qs[j] - read_base + 4, 0)
                )
                hj = h5_of(vs[j], b4) & (T_ROWS - 1)
            else:
                hj = jax.lax.shift_right_logical(vm, 32 - hashlog) & (T_ROWS - 1)
            hsj.append(jnp.where(valids[j], hj, 0))
            tags.append(tj)
            pk.append(qs[j] | (tj << 17))  # packed entry: pos17 | tag15

        if STRICT:
            # pending cursor-2 reinsert (C inserts it at match accept;
            # deferred to the next search round, read-fixed-up below so
            # probes see it exactly as C would)
            pnd1 = (pnd[0:1, :] != 0) & probe1 & (curs1 >= 2)
            dp = jnp.where(pnd1, curs1 - 2 - read_base, 0)
            wpnd = word_at(dp)
            b4p = word_at(jnp.where(pnd1, dp + 4, 0))
            tpnd = (
                jax.lax.shift_right_logical(
                    wpnd * jnp.int32(np.int32(HASH_MUL)), 6
                ) & 0x7FFF
            )
            hpnd = h5_of(wpnd, b4p) & (T_ROWS - 1)
            pkpnd = (curs1 - 2) | (tpnd << 17)
            pnd = jnp.where(jnp.broadcast_to(pnd1, S8), 0, pnd)

        rowcmps = [
            (rowi8 == jnp.broadcast_to(hsj[j] & 7, S8)) for j in range(PROBES)
        ]
        sbhs = [hsj[j] >> 3 for j in range(PROBES)]
        pkb = [jnp.broadcast_to(p1, S8) for p1 in pk]
        validb = [jnp.broadcast_to(valids[j], S8) for j in range(PROBES)]
        # two-level gather: level 1 accumulates each probe's whole 8-row
        # slab (ONE mask-FMA per slab per probe — the row compare moves
        # OUT of the scan); level 2 extracts the bucket row afterwards.
        # ~3x fewer vreg ops than the row-precise in-scan gather.
        accs = [jnp.zeros(S8, jnp.int32) for _ in range(PROBES)]
        if STRICT:
            # ONE fused sweep: gather this round's probes + apply the
            # DEFERRED inserts (last search round's hit-gated probe
            # entries, oldest first, then the pending cursor-2 reinsert
            # — chronological order, newest wins on bucket collisions).
            # C never probes past a hit, so this round's own inserts are
            # hit-gated below and land in the NEXT round's sweep; every
            # read in between is fixed up against the pending entries.
            ppc = []  # (rowmask8, sb1, value8) per pending entry
            for j in range(PROBES):
                okp = pp_h[j] >= 0
                ppc.append((
                    (rowi8 == jnp.broadcast_to(pp_h[j] & 7, S8))
                    & jnp.broadcast_to(okp, S8),
                    pp_h[j] >> 3,
                    jnp.broadcast_to(pp_v[j], S8),
                ))
            rowp = rowi8 == jnp.broadcast_to(hpnd & 7, S8)
            sbp = hpnd >> 3
            pndb = jnp.broadcast_to(pnd1, S8)
            pkpb = jnp.broadcast_to(pkpnd, S8)
            for st_ in range(0 if "nosweep" in TIMING else T_ROWS // 8):
                slab = table_ref[st_ * 8 : st_ * 8 + 8, :]
                for j in range(PROBES):
                    m = jnp.broadcast_to(sbhs[j] == st_, S8)
                    accs[j] = accs[j] + slab * m.astype(jnp.int32)
                if "noinsert" in TIMING:
                    continue
                news = slab
                for rm, sb1, val in ppc:
                    news = jnp.where(
                        rm & jnp.broadcast_to(sb1 == st_, S8), val, news
                    )
                news = jnp.where(
                    rowp & jnp.broadcast_to(sbp == st_, S8) & pndb,
                    pkpb, news,
                )
                table_ref[st_ * 8 : st_ * 8 + 8, :] = news
        else:
            # non-strict: in-sweep inserts (all valid probes insert — the
            # documented non-strict approximation).  Deferring them like
            # strict mode measured SLOWER here (86.6 vs 99.8 MB/s): with
            # no second sweep to eliminate, the deferral only adds fixup
            # and state traffic.
            for st_ in range(0 if "nosweep" in TIMING else T_ROWS // 8):
                slab = table_ref[st_ * 8 : st_ * 8 + 8, :]
                news = slab
                for j in range(PROBES):
                    m = jnp.broadcast_to(sbhs[j] == st_, S8)
                    accs[j] = accs[j] + slab * m.astype(jnp.int32)
                    news = jnp.where(
                        rowcmps[j] & m & validb[j], pkb[j], news
                    )
                table_ref[st_ * 8 : st_ * 8 + 8, :] = news
        cands = [
            jnp.sum(accs[j] * rowcmps[j].astype(jnp.int32), axis=0,
                    keepdims=True)
            for j in range(PROBES)
        ]
        # fix-ups: probe j must see the deferred probe entries (applied
        # in THIS sweep, after the gather read them), the pending
        # reinsert, and probes i<j — in chronological order (newest wins)
        if STRICT:
            for j in range(PROBES):
                for i in range(PROBES):
                    eqd = (
                        valids[j] & (pp_h[i] >= 0) & (pp_h[i] == hsj[j])
                    )
                    cands[j] = jnp.where(eqd, pp_v[i], cands[j])
            for j in range(PROBES):
                eqp = pnd1 & valids[j] & (hpnd == hsj[j])
                cands[j] = jnp.where(eqp, pkpnd, cands[j])
        for j in range(1, PROBES):
            for i in range(j):
                eq = valids[i] & valids[j] & (hsj[i] == hsj[j])
                cands[j] = jnp.where(eq, pk[i], cands[j])

        hits = []
        for j in range(PROBES):
            cpos = cands[j] & 0x1FFFF
            ctag = jax.lax.shift_right_logical(cands[j], 17) & 0x7FFF
            # positions reach 96 KiB in window mode, so the LZ4 offset
            # bound is explicit; the init sentinel pos 0x1FFFF never
            # satisfies cpos < q (buffers are <= 96 KiB + margin).  In
            # strict mode position 0 is a REAL candidate (zero-init
            # quirk) and only the first cursor position is excluded.
            ok_j = (
                valids[j] & (cpos < qs[j]) & (qs[j] - cpos <= 0xFFFF)
                & (ctag == tags[j])
            )
            if STRICT:
                ok_j = ok_j & (qs[j] > 0)
            hits.append(ok_j)
            cands[j] = cpos
        anyhit1 = hits[0]
        for j in range(1, PROBES):
            anyhit1 = anyhit1 | hits[j]
        hitq, hitc = qs[0], cands[0]
        for j in range(PROBES - 1, -1, -1):  # earliest hit wins (greedy)
            hitq = jnp.where(hits[j], qs[j], hitq)
            hitc = jnp.where(hits[j], cands[j], hitc)

        if STRICT:
            # this round's probe inserts — up to (and incl.) the first
            # tag hit — become the NEXT round's deferred entries: lanes
            # that probed replace their pending set, everyone else keeps
            # theirs (reapplication is idempotent, see above)
            ins_ok = []
            no_hit_before = jnp.ones_like(valids[0])
            for j in range(PROBES):
                ins_ok.append(valids[j] & no_hit_before)
                no_hit_before = no_hit_before & ~hits[j]
            pp_h = [
                jnp.where(
                    probe1, jnp.where(ins_ok[j], hsj[j], -1), pp_h[j]
                )
                for j in range(PROBES)
            ]
            pp_v = [
                jnp.where(probe1 & ins_ok[j], pk[j], pp_v[j])
                for j in range(PROBES)
            ]
        if STRICT:
            # all-miss / false-hit resume points (prefix-valid selects)
            res_q, res_sc, res_st = qnexts[0], scs[0], sts[0]
            for j in range(1, PROBES):
                res_q = jnp.where(valids[j], qnexts[j], res_q)
                res_sc = jnp.where(valids[j], scs[j], res_sc)
                res_st = jnp.where(valids[j], sts[j], res_st)
            # the resume triple AT the hit probe (for EXTEND tag rejects)
            hq_n, hq_sc, hq_st = qnexts[0], scs[0], sts[0]
            for j in range(PROBES - 1, -1, -1):
                hq_n = jnp.where(hits[j], qnexts[j], hq_n)
                hq_sc = jnp.where(hits[j], scs[j], hq_sc)
                hq_st = jnp.where(hits[j], sts[j], hq_st)
        else:
            nvalid = valids[0].astype(jnp.int32)
            for j in range(1, PROBES):
                nvalid = nvalid + valids[j].astype(jnp.int32)
            for j in range(PROBES - 1, 0, -1):  # stop at first unprobed position
                nxt = jnp.where(~valids[j], qs[j], nxt)

        hit = jnp.broadcast_to(anyhit1, S8)
        hq8 = jnp.broadcast_to(hitq, S8)
        hc8 = jnp.broadcast_to(hitc, S8)
        moff = jnp.where(hit, hq8 - hc8, moff)
        mstart = jnp.where(hit, hq8, mstart)
        # mlen starts at 0: the first EXTEND round verifies the candidate
        # (tag hits are probabilistic) — < MINMATCH after round 1 rejects
        mlen = jnp.where(hit, 0, mlen)
        ph = jnp.where(hit, PH_EXTEND, ph)
        missed = probing & ~hit
        if STRICT:
            missed = missed & jnp.broadcast_to(valids[0], S8)
            cur = jnp.where(missed, jnp.broadcast_to(res_q, S8), cur)
            miss = jnp.where(missed, jnp.broadcast_to(res_sc, S8), miss)
            stepv = jnp.where(missed, jnp.broadcast_to(res_st, S8), stepv)
            # save the false-hit resume triple for EXTEND's verify reject
            rq = jnp.where(hit, jnp.broadcast_to(hq_n, S8), rq)
            rsc = jnp.where(hit, jnp.broadcast_to(hq_sc, S8), rsc)
            rst = jnp.where(hit, jnp.broadcast_to(hq_st, S8), rst)
        else:
            cur = jnp.where(missed, jnp.broadcast_to(nxt, S8), cur)
            miss = jnp.where(missed, miss + jnp.broadcast_to(nvalid, S8), miss)

        # ---- EXTEND ----------------------------------------------------
        extending = active & (ph == PH_EXTEND) & ~stall
        a_pos = mstart + mlen
        b_pos = mstart + mlen - moff
        avail = jnp.clip((n - 5) - a_pos, 0, CB)
        if "noextend" in TIMING:
            d = jnp.ones((CW, LANES), jnp.int32)
        else:
            # candidate-side page: ungated by default (candidate groups
            # are random-access per fresh hit, so gating stalls nearly
            # every sequence — measured 121.7 vs 143.5 MB/s at K=4)
            g2 = granted if GATE2 else jnp.bool_(True)
            gb2, stall2 = ensure(page2_ref, gb2, b_pos, extending, g2)
            extending = extending & ~stall2
            aw = read_words(page_ref, gb, jnp.where(extending, a_pos, 0), CW)
            bw = read_words(page2_ref, gb2, jnp.where(extending, b_pos, 0), CW)
            d = aw ^ bw
        m1 = jnp.full(S8, CW, jnp.int32)
        for k in range(CW - 1, -1, -1):
            nz = jnp.broadcast_to(d[k : k + 1] != 0, S8)
            m1 = jnp.where(nz, k, m1)
        dw = jnp.zeros((1, LANES), jnp.int32)
        for k in range(CW):
            dw = dw + d[k : k + 1] * (m1[0:1] == k).astype(jnp.int32)
        dwb = jnp.broadcast_to(dw, S8)
        b0 = (dwb & 0xFF) == 0
        b1 = (dwb & 0xFF00) == 0
        b2 = (dwb & 0xFF0000) == 0
        tz = jnp.where(b0, jnp.where(b1, jnp.where(b2, 3, 2), 1), 0)
        lcp = jnp.minimum(m1 * 4 + jnp.where(m1 < CW, tz, 0), avail)
        mlen = jnp.where(extending, mlen + lcp, mlen)
        ext_done = extending & ((lcp < CB) | (avail < CB))
        # candidate verify: a tag false-positive (or genuine <4-byte LCP)
        # is rejected here; the search resumes one past the match start.
        # avail >= 7 on the first EXTEND round (probes need q+12 <= n), so
        # a true >=4-byte match always reaches mlen >= 4 in one round.
        false_hit = ext_done & (mlen < 4)
        ph = jnp.where(ext_done, jnp.where(false_hit, PH_SEARCH, PH_TOK), ph)
        if STRICT:
            # resume the exact skip-accelerated walk where C would after
            # its byte verify fails (saved at the tag hit)
            cur = jnp.where(false_hit, rq, cur)
            miss = jnp.where(false_hit, rsc, miss)
            stepv = jnp.where(false_hit, rst, stepv)
        else:
            cur = jnp.where(false_hit, mstart + 1, cur)
            miss = jnp.where(false_hit, miss + 1, miss)

        # ---- opportunistic backward extension (reference backtrack,
        # raw/compress/mod.rs:211-214): pending literals that also match
        # just before the candidate join the match.  OPPORTUNISTIC: only
        # when both CB-byte backward windows are in the resident pages
        # (~94% of matches at GROUP_W=256); page-boundary matches skip it
        # — still valid LZ4, marginal ratio cost (simulated 0.6002 vs
        # 0.5995 unbounded on the bench corpus).  Runs in the ext_done
        # round itself, so it costs two gathers per round and NO extra
        # rounds.
        def backward_count(da, w_ok_bytes):
            """Matched-byte count from the TOP of the XOR window ``da``,
            ignoring the top (CB - w_ok_bytes) bytes (per-lane)."""
            # zero the diff above the valid top so the scan skips it
            wp = jax.lax.broadcasted_iota(jnp.int32, (CW, LANES), 0)
            okb = jnp.broadcast_to(w_ok_bytes[0:1, :], (CW, LANES))
            masked = da
            for jj in range(4):
                bi = wp * 4 + jj
                bytemask = jnp.int32(np.int32(np.uint32(0xFF) << (8 * jj)))
                masked = jnp.where(bi >= okb, masked & ~bytemask, masked)
            kmax = jnp.full(S8, -1, jnp.int32)
            for k in range(CW):
                nz = jnp.broadcast_to(masked[k : k + 1] != 0, S8)
                kmax = jnp.where(nz, k, kmax)
            dwb2 = jnp.zeros((1, LANES), jnp.int32)
            for k in range(CW):
                dwb2 = dwb2 + masked[k : k + 1] * (kmax[0:1] == k).astype(
                    jnp.int32
                )
            dwb2 = jnp.broadcast_to(dwb2, S8)
            hb3 = (dwb2 & jnp.int32(np.int32(np.uint32(0xFF000000)))) == 0
            hb2 = (dwb2 & 0xFF0000) == 0
            hb1 = (dwb2 & 0xFF00) == 0
            hz = jnp.where(hb3, jnp.where(hb2, jnp.where(hb1, 3, 2), 1), 0)
            cnt = jnp.where(kmax < 0, CB, (CW - 1 - kmax) * 4 + hz)
            # bytes counted above the valid top are the (known-equal or
            # zeroed) skip region; subtract it
            return jnp.clip(cnt - (CB - w_ok_bytes), 0, None)

        if BACKTRACK:
            mc_pos = mstart - moff
            bt_en = (
                ext_done & ~false_hit
                & (mstart > anchor) & (mstart >= CB) & (mc_pos >= CB)
                & ((((mstart - CB) >> 2) // GROUP_W) == gb)
                & ((((mc_pos - CB) >> 2) // GROUP_W) == gb2)
            )
            ab = read_words(page_ref, gb, jnp.where(bt_en, mstart - CB, 0), CW)
            bb = read_words(page2_ref, gb2, jnp.where(bt_en, mc_pos - CB, 0), CW)
            db = ab ^ bb
            full_w = jnp.full(S8, CB, jnp.int32)
            bt_all = backward_count(db, full_w)
            bt = jnp.minimum(bt_all, mstart - anchor)
            if STRICT:
                # the reference also stops at candidate position 0
                bt = jnp.minimum(bt, mc_pos)
            bt = jnp.where(bt_en, bt, 0)
            if STRICT:
                # exact mode: a saturated or page-gated backward extension
                # continues in PH_BT rounds instead of being dropped
                saturated = bt_en & (bt == CB) & (bt < mstart - anchor) & (
                    bt < mc_pos
                )
                gated = (
                    ext_done & ~false_hit & ~bt_en
                    & (mstart > anchor) & (mc_pos > 0)
                )
                to_bt = saturated | gated
                emr = jnp.where(to_bt, jnp.where(bt_en, bt, 0), emr)
                ph = jnp.where(to_bt, PH_BT, ph)
                bt = jnp.where(to_bt, 0, bt)
            mstart = mstart - bt
            mlen = mlen + bt

        # ---- PH_BT: exact backward-extension continuation (strict) -----
        if STRICT:
            e_btp = active & (ph == PH_BT)
            mc_bt = mstart - moff
            bt0 = emr
            baseA = mstart - bt0 - CB
            baseB = mc_bt - bt0 - CB
            # shift both windows up equally so neither starts below 0 —
            # pairing is preserved; the skipped top bytes are masked out
            # of the count (they lie inside the already-matched span or
            # beyond it)
            shb_ = jnp.clip(-jnp.minimum(baseA, baseB), 0, CB)
            okb = CB - shb_
            gb, _st_bt = ensure(
                page_ref, gb, jnp.where(e_btp, baseA + shb_, cur),
                e_btp, jnp.bool_(True),
            )
            gb2, _st_bt2 = ensure(
                page2_ref, gb2, jnp.where(e_btp, baseB + shb_, cur),
                e_btp, jnp.bool_(True),
            )
            ab2 = read_words(
                page_ref, gb, jnp.where(e_btp, baseA + shb_, 0), CW
            )
            bb2 = read_words(
                page2_ref, gb2, jnp.where(e_btp, baseB + shb_, 0), CW
            )
            cnt = backward_count(ab2 ^ bb2, okb)
            cap = jnp.minimum(
                jnp.minimum(okb, mstart - anchor - bt0), mc_bt - bt0
            )
            bt_add = jnp.where(e_btp, jnp.minimum(cnt, cap), 0)
            emr = jnp.where(e_btp, emr + bt_add, emr)
            done_bt = e_btp & ((bt_add < cap) | (cap <= 0) | (
                (bt0 + bt_add >= mstart - anchor)
                | (bt0 + bt_add >= mc_bt)
            ))
            # a full-cap round with room left continues next round
            mstart = jnp.where(done_bt, mstart - emr, mstart)
            mlen = jnp.where(done_bt, mlen + emr, mlen)
            emr = jnp.where(done_bt, 0, emr)
            ph = jnp.where(done_bt, PH_TOK, ph)

        # ---- emission ---        # ---- emission --------------------------------------------------
        lit = jnp.where(tail, n - anchor, mstart - anchor)
        mv = mlen - 4
        litx = jnp.clip(lit - 15, 0, None)
        emr0_l = jnp.where(lit >= 15, litx // 255 + 1, 0)
        rem_l = litx - 255 * (litx // 255)
        mvx = jnp.clip(mv - 15, 0, None)
        emr0_m = jnp.where(mv >= 15, mvx // 255 + 1, 0)
        rem_m = mvx - 255 * (mvx // 255)
        token = (jnp.minimum(lit, 15) << 4) | jnp.where(
            tail, 0, jnp.minimum(mv, 15)
        )

        at_tok = active & (ph == PH_TOK)
        # fused single-round emission for the common compact sequence:
        # token + <=15 literals + offset all in one <=18-byte span (and
        # the analogous short tail).  Longer sequences take the phase
        # path (TOK -> EXT_L -> LCOPY -> MHDR -> EXT_M).
        fusible = (lit < 15) & (tail | (mv < 15))
        # opportunistic fusion: the fused literal read at ``anchor`` is
        # only legal when the anchor's group is the resident page group
        # (cascade lanes from SEARCH/ended ensured it; a gated lane that
        # reached TOK through a stalled EXTEND may not have it — those
        # take the constructed TOK path, which reads no page)
        gbok = ((anchor >> 2) // GROUP_W) == gb
        in_fuse = at_tok & fusible & gbok
        in_tok = at_tok & ~(fusible & gbok)
        in_extl = active & (ph == PH_EXT_L)
        in_lcopy = active & (ph == PH_LCOPY) & ~stall
        in_mhdr = active & (ph == PH_MHDR)
        in_extm = active & (ph == PH_EXT_M)
        emitting = in_fuse | in_tok | in_extl | in_lcopy | in_mhdr | in_extm

        # flush before placing (decode128 invariant)
        ring0 = ring_ref[:, :]
        do_flush = emitting & (out - flushed >= FLUSH_THRESH)

        if "noflush" not in TIMING:

            @pl.when(jnp.any(do_flush))
            def _():
                fw = flushed >> 2
                nw = jnp.where(do_flush, FLUSH_B >> 2, 0)
                sweep_flush(ring0, fw, nw)

        flushed = jnp.where(do_flush, flushed + FLUSH_B, flushed)

        # constructed header/run bytes (words 0..CW-1): byte i of the
        # emitted span, by phase
        take_tok = jnp.where(in_tok, 1 + jnp.minimum(emr0_l, 7), 0)
        take_extl = jnp.where(in_extl, jnp.minimum(emr, CB), 0)
        take_mhdr = jnp.where(in_mhdr, 2 + jnp.minimum(emr0_m, 6), 0)
        take_extm = jnp.where(in_extm, jnp.minimum(emr, CB), 0)
        take_lcopy = jnp.where(in_lcopy, jnp.minimum(lrem, CB), 0)
        take_fuse = jnp.where(in_fuse, 1 + lit + jnp.where(tail, 0, 2), 0)
        take = (take_tok + take_extl + take_mhdr + take_extm + take_lcopy
                + take_fuse)

        # output-capacity guard: a lane about to overrun its transposed
        # output column stops and reports failure (host falls back)
        newfail = emitting & ((out + take) > (ro * 4 - 4))
        take = jnp.where(newfail, 0, take)
        take_lcopy = jnp.where(newfail, 0, take_lcopy)
        fail = fail | newfail
        done = done | newfail

        lit_pos = jnp.where(in_fuse, anchor, lsrc)
        if "nolit" in TIMING:
            lit_w = jnp.zeros((CW, LANES), jnp.int32)
        else:
            lit_w = read_words(
                page_ref, gb, jnp.where(in_lcopy | in_fuse, lit_pos, 0), CW
            )

        # header/run span construction, built NATIVELY as (CW=8, 128)
        # vregs — the former per-(word, byte) loops did ~190 ops on
        # (1, 128) slices, each occupying a full vreg at 1/8 utilization
        # (measured: the always-on emission construction dominated the
        # round's 42% bookkeeping residual).
        # TOK: [token][lit-ext stream...]; MHDR: [off lo][off hi]
        # [match-ext stream...]; EXT_*: pure stream at emr
        assert CW == 8  # byte-index grids below are (8, LANES)
        tok8 = jnp.broadcast_to(token[0:1, :], S8)
        offl8 = jnp.broadcast_to((moff & 0xFF)[0:1, :], S8)
        offh8 = jnp.broadcast_to(
            (jax.lax.shift_right_logical(moff, 8) & 0xFF)[0:1, :], S8
        )
        e0l8 = jnp.broadcast_to(emr0_l[0:1, :], S8)
        e0m8 = jnp.broadcast_to(emr0_m[0:1, :], S8)
        reml8 = jnp.broadcast_to(rem_l[0:1, :], S8)
        remm8 = jnp.broadcast_to(rem_m[0:1, :], S8)
        emr8 = jnp.broadcast_to(emr[0:1, :], S8)
        it8 = jnp.broadcast_to(in_tok[0:1, :], S8)
        im8 = jnp.broadcast_to(in_mhdr[0:1, :], S8)
        iel8 = jnp.broadcast_to(in_extl[0:1, :], S8)
        row4 = rowi8 * 4
        hb = []
        for j in range(4):
            i = row4 + j  # byte index within the span, per output row
            b_tok = jnp.where(i == 0, tok8, jnp.where(i - 1 < e0l8 - 1, 0xFF, reml8))
            b_mhdr = jnp.where(
                i == 0, offl8,
                jnp.where(i == 1, offh8, jnp.where(i - 2 < e0m8 - 1, 0xFF, remm8)),
            )
            b_ext = jnp.where(i < emr8 - 1, 0xFF, jnp.where(iel8, reml8, remm8))
            hb.append(
                jnp.where(it8, b_tok, jnp.where(im8, b_mhdr, b_ext)) & 0xFF
            )
        hdr_w = hb[0] | (hb[1] << 8) | (hb[2] << 16) | (hb[3] << 24)

        # fused span: [token][<=15 literal bytes][off lo][off hi] —
        # literals shifted right one byte via a static row slice; token
        # and the two offset bytes (at the per-lane position 1+lit)
        # overlaid with byte-index-grid selects
        lit_prev = jnp.concatenate(
            [jnp.zeros((1, LANES), jnp.int32), lit_w[: CW - 1]], axis=0
        )
        fw = (lit_w << 8) | (
            jax.lax.shift_right_logical(lit_prev, 24) & 0xFF
        )
        fw = jnp.where(rowi8 == 0, (fw & ~0xFF) | tok8, fw)
        b2f8 = 1 + lit  # S8 already
        ntail8 = jnp.broadcast_to(~tail[0:1, :], S8)
        for j in range(4):
            i = row4 + j
            bytemask = jnp.int32(np.int32(np.uint32(0xFF) << (8 * j)))
            fw = jnp.where(
                (i == b2f8) & ntail8, (fw & ~bytemask) | (offl8 << (8 * j)), fw
            )
            fw = jnp.where(
                (i == b2f8 + 1) & ntail8, (fw & ~bytemask) | (offh8 << (8 * j)), fw
            )
        fused_w = fw

        span_w = jnp.where(
            jnp.broadcast_to(in_lcopy[0:1], (CW, LANES)),
            lit_w,
            jnp.where(
                jnp.broadcast_to(in_fuse[0:1], (CW, LANES)), fused_w, hdr_w
            ),
        )
        if "noplace" not in TIMING:
            ring_ref[:, :] = place(ring0, span_w, out, take)
        out = out + take

        # ---- phase transitions after the emit ---------------------------
        # TOK -> EXT_L (leftover lit-ext) | LCOPY
        tok_left = emr0_l - jnp.minimum(emr0_l, 7)
        ph = jnp.where(
            in_tok, jnp.where(tok_left > 0, PH_EXT_L, PH_LCOPY), ph
        )
        emr = jnp.where(in_tok, tok_left, emr)
        lrem = jnp.where(in_tok, lit, lrem)
        lsrc = jnp.where(in_tok, anchor, lsrc)
        # EXT_L -> LCOPY
        emr = jnp.where(in_extl, emr - take_extl, emr)
        ph = jnp.where(in_extl & (emr == 0), PH_LCOPY, ph)
        # LCOPY -> MHDR | DONE(tail)
        lrem = jnp.where(in_lcopy, lrem - take_lcopy, lrem)
        lsrc = jnp.where(in_lcopy, lsrc + take_lcopy, lsrc)
        lc_done = in_lcopy & (lrem == 0)
        done = done | (lc_done & tail) | (in_fuse & tail)
        ph = jnp.where(lc_done & ~tail, PH_MHDR, ph)
        # MHDR -> EXT_M | SEARCH
        mh_left = emr0_m - jnp.minimum(emr0_m, 6)
        seq_end_m = in_mhdr & (mh_left == 0)
        ph = jnp.where(in_mhdr, jnp.where(mh_left > 0, PH_EXT_M, PH_SEARCH), ph)
        emr = jnp.where(in_mhdr, mh_left, emr)
        # EXT_M -> SEARCH
        emr = jnp.where(in_extm, emr - take_extm, emr)
        seq_end_x = in_extm & (emr == 0)
        ph = jnp.where(seq_end_x, PH_SEARCH, ph)
        seq_end = seq_end_m | seq_end_x | (in_fuse & ~tail)
        ph = jnp.where(in_fuse & ~tail, PH_SEARCH, ph)
        cur = jnp.where(seq_end, mstart + mlen, cur)
        anchor = jnp.where(seq_end, mstart + mlen, anchor)
        miss = jnp.where(seq_end, 1 << SKIP_TRIGGER, miss)
        if STRICT:
            stepv = jnp.where(seq_end, 1, stepv)
            pnd = jnp.where(seq_end, 1, pnd)

        new_rows = [cur, anchor, ph, out, flushed, gb, gb2, moff, mstart,
                    mlen, emr, lrem, lsrc, tail.astype(jnp.int32),
                    done.astype(jnp.int32), fail.astype(jnp.int32), miss,
                    stepv, rq, rsc, rst, pnd]
        for j in range(PROBES):
            new_rows.append(pp_h[j])
            new_rows.append(pp_v[j])
        assert len(new_rows) == NSTATE
        state_ref[:, :] = jnp.concatenate([x[0:1] for x in new_rows], axis=0)
        return 0

    # ---- init + run + drain -------------------------------------------
    z1 = jnp.zeros((1, LANES), jnp.int32)
    c01 = cur0_ref[0:1, :]
    _pp_init = [jnp.full((1, LANES), -1, jnp.int32), z1] * PROBES
    state_ref[:, :] = jnp.concatenate(
        [c01, c01, z1, z1, z1, jnp.full((1, LANES), -1, jnp.int32),
         jnp.full((1, LANES), -1, jnp.int32), jnp.full((1, LANES), 1, jnp.int32),
         z1, jnp.full((1, LANES), 4, jnp.int32), z1, z1, z1, z1,
         z1, z1, jnp.full((1, LANES), 1 << SKIP_TRIGGER, jnp.int32),
         jnp.full((1, LANES), 1, jnp.int32), z1,
         jnp.full((1, LANES), 1 << SKIP_TRIGGER, jnp.int32),
         jnp.full((1, LANES), 1, jnp.int32), z1] + _pp_init,
        axis=0,
    )
    ring_ref[:, :] = jnp.zeros((RING_W, LANES), jnp.int32)
    if prime:
        # host-primed window/dictionary entries (step-3 insertion,
        # framed/compress.rs:205-214, already in packed pos|tag form)
        table_ref[:, :] = tinit_ref[:, :]
    elif STRICT:
        # C's zero-init quirk: an unwritten slot reads as position 0 —
        # a REAL candidate whenever the bytes there match — so empty
        # entries carry word-0's tag (compress/mod.rs:196-206 semantics)
        w0 = words_ref[0:1, :]
        t0 = (
            jax.lax.shift_right_logical(
                w0 * jnp.int32(np.int32(HASH_MUL)), 6
            )
            & 0x7FFF
        )
        table_ref[:, :] = jnp.broadcast_to(t0 << 17, (T_ROWS, LANES))
    else:
        # sentinel: pos 0x1FFFF (> any valid buffer position), tag 0
        table_ref[:, :] = jnp.full((T_ROWS, LANES), 0x1FFFF, jnp.int32)

    n_chunks = -(-max_rounds // 64)

    def chunk_cond(c):
        i, all_done = c
        if "fixed" in TIMING:
            return i < n_chunks
        return (i < n_chunks) & (~all_done)

    def chunk_body(c):
        i, _ = c
        jax.lax.fori_loop(0, 64, round_body, 0)
        st = state_ref[:, :]
        return i + 1, ~jnp.any(st[C_DONE : C_DONE + 1] == 0)

    jax.lax.while_loop(chunk_cond, chunk_body, (jnp.int32(0), jnp.bool_(False)))

    st = state_ref[:, :]
    out_f = jnp.broadcast_to(st[C_OUT : C_OUT + 1], S8)
    flushed_f = jnp.broadcast_to(st[C_FLUSH : C_FLUSH + 1], S8)
    sweep_flush(
        ring_ref[:, :], flushed_f >> 2,
        jnp.clip(((out_f - flushed_f) + 3) >> 2, 0, RING_W),
    )
    # lanes still live at the cap, or failed, report length 0 (host
    # falls back to the native engine)
    bad = (st[C_DONE : C_DONE + 1] == 0) | (st[C_FAIL : C_FAIL + 1] != 0)
    out_len_ref[:, :] = jnp.where(bad, 0, st[C_OUT : C_OUT + 1])


@functools.partial(
    jax.jit, static_argnames=("ri", "ro", "max_rounds", "hashlog")
)
def _compress128_jit(words, n, cur0=None, tinit=None, *, ri, ro, max_rounds,
                     hashlog):
    prime = tinit is not None
    if cur0 is None:
        cur0 = jnp.zeros((1, LANES), jnp.int32)
    if tinit is None:
        tinit = jnp.zeros((8, LANES), jnp.int32)
    return pl.pallas_call(
        functools.partial(
            _compress128_kernel,
            ri=ri,
            ro=ro,
            max_rounds=max_rounds,
            hashlog=hashlog,
            prime=prime,
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[
            jax.ShapeDtypeStruct((ro, LANES), jnp.int32),
            jax.ShapeDtypeStruct((1, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((PAGE_W, LANES), jnp.int32),
            pltpu.VMEM((PAGE_W, LANES), jnp.int32),
            pltpu.VMEM((1 << hashlog, LANES), jnp.int32),
            pltpu.VMEM((RING_W, LANES), jnp.int32),
            pltpu.VMEM((NSTATE, LANES), jnp.int32),
        ],
        # explicit scoped-vmem stack claim (see decode128: the XLA
        # default is 16 MiB of v5e's 128 MiB and drifted across
        # remote-compile service sessions)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(
                _os.environ.get("LZ4TPU_C128_VMEM_LIMIT", str(96 << 20))
            ),
        ),
        interpret=_interpret(),
    )(words, n, cur0, tinit)


def prime_tables_packed(prefixes, hashlog: int) -> np.ndarray:
    """Host-side per-lane table priming: insert every 3rd window position
    (the reference's dictionary insertion order, framed/compress.rs:
    205-214) as packed ``pos17 | tag15`` entries in BUFFER coordinates.
    Returns int32 (2^hashlog, LANES); unused lanes keep the sentinel."""
    t_rows = 1 << hashlog
    tables = np.full((t_rows, LANES), 0x1FFFF, np.int32)
    for i, p in enumerate(prefixes):
        if p is None or len(p) < 16:
            continue
        b = np.frombuffer(p, np.uint8).astype(np.uint32)
        pos = np.arange(0, len(p) - 12 + 1, 3, dtype=np.int64)
        if len(pos) == 0:
            continue
        v = (
            b[pos] | (b[pos + 1] << 8) | (b[pos + 2] << 16)
            | (b[pos + 3] << 24)
        ).astype(np.uint32)
        vm = (v * np.uint32(HASH_MUL)).astype(np.uint32)
        hj = (vm >> np.uint32(32 - hashlog)).astype(np.int64)
        tag = ((vm >> np.uint32(6)) & np.uint32(0x7FFF)).astype(np.int64)
        # later positions overwrite earlier ones (sequential insert order)
        tables[hj, i] = (pos | (tag << 17)).astype(np.int32)
    return tables


VMEM_ROWSUM_BUDGET = 15_800_000


def lanes_eligible(
    block_len: int, prefix_len: int = 0, hashlog: int | None = None
) -> bool:
    """True when the lane compressor's transposed VMEM footprint for this
    (block, window) shape fits the per-core budget; callers shrink the
    emitted chunk size (valid LZ4 — BD is a maximum) until it does."""
    hl = HASHLOG if hashlog is None else hashlog
    maxbuf = block_len + prefix_len
    ri = -(-maxbuf // 4)
    ri = -(-ri // GROUP_W) * GROUP_W + PAGE_W
    maxout = block_len + block_len // 255 + 16
    ro = (-(-maxout // 4) // RING_W + 2) * RING_W
    t_rows = (1 << hl) * (2 if prefix_len else 1)  # init input + scratch
    rows = ri + ro + t_rows + 2 * PAGE_W + RING_W + NSTATE + 16
    return rows * LANES * 4 <= VMEM_ROWSUM_BUDGET


@functools.partial(jax.jit, static_argnames=("k", "ri"))
def _build_windowed_words(flat2d, start_row, *, k, ri):
    """Device-side [window|block] lane buffers for the linked frame
    path: lane i's buffer is rows [start_row + i, start_row + i + k] of
    the (n_blocks + k, chunk) padded block matrix — the 64 KiB window is
    exactly the previous ``k = window//chunk`` blocks, so the whole
    batch assembles from k+1 static slices + one concat (no per-lane
    gather, no redundant H2D: the flat data uploads ONCE instead of
    window+block per lane, a ~(k+1)x transfer saving)."""
    lanes = LANES
    win = jax.lax.dynamic_slice_in_dim(flat2d, start_row, lanes + k, 0)
    parts = [win[j : j + lanes] for j in range(k + 1)]
    buf = jnp.concatenate(parts, axis=1)  # (128, (k+1)*chunk)
    pad = ri * 4 - buf.shape[1]
    if pad:
        buf = jnp.pad(buf, ((0, 0), (0, pad)))
    w = jax.lax.bitcast_convert_type(
        buf.reshape(lanes, ri, 4), jnp.int32
    )
    return w.T  # (ri, 128) transposed LE words


class _LazyWindows:
    """Per-lane window bytes materialized only on the (rare) round-cap
    native fallback in ``collect_compress_128``."""

    def __init__(self, data, starts, wlen):
        self._data, self._starts, self._wlen = data, starts, wlen

    def __len__(self):
        return len(self._starts)

    def __bool__(self):
        return True

    def __getitem__(self, i):
        s = self._starts[i]
        return self._data[max(0, s - self._wlen) : s]


def prime_tables_batched(data, plan, lens, *, chunk: int, window: int,
                         hashlog: int | None = None):
    """Host-prime the window tables for EVERY windowed batch of a plan
    and upload them as one chunked array (device handle).  Per-batch
    ``jnp.asarray(tinit)`` is a synchronous ~2 MB transfer on the caller
    thread — at 33 batches it serialized ~3 s that no pipeline depth
    could hide (the round-5 compressbig wall); one stacked upload rides
    the fast chunked H2D path instead and batches slice it on device."""
    import jax

    from ..hostpack import to_device_chunked
    from ..native import prime_tables_native

    hl = HASHLOG if hashlog is None else hashlog
    t_rows = 1 << hl
    parts = []
    order = {}
    for item in plan:
        if item[0] != "w":
            continue
        _, s, nb = item
        gstarts = np.array(
            [(s + j) * chunk for j in range(nb)], np.int64
        )
        parts.append(prime_tables_native(
            data, gstarts, np.full(nb, window, np.int64),
            np.zeros(nb, np.int64), hl,
        ))
        order[s] = len(order)
    if not parts:
        return None
    stacked = to_device_chunked(np.concatenate(parts, axis=0))

    @jax.jit
    def take(t, b):
        return jax.lax.dynamic_slice_in_dim(t, b * t_rows, t_rows, 0)

    return stacked, take, order


def dispatch_compress_windowed(
    flat_dev, data, start_block: int, nb: int, lens, *,
    chunk: int, window: int, hashlog: int | None = None,
    tinit_batched=None,
):
    """Dispatch one linked-mode lane batch with device-built windowed
    buffers.  ``flat_dev``: (n_blocks + k, chunk) uint8 padded block
    matrix already on device (upload once per frame); ``start_block``:
    first block of this batch (must be >= k so every lane's window is
    FULL — partial-window leading blocks go through the host-packed
    path, which also carries the per-lane backtrack floor they need);
    ``lens``: per-block byte lengths."""
    hl = HASHLOG if hashlog is None else hashlog
    assert not STRICT, "strict parity mode has no window support"
    assert window % chunk == 0 and chunk <= MAX_B
    k = window // chunk
    assert start_block >= k and 0 < nb <= LANES
    # the device build slices LANES+k rows at start_block-k regardless of
    # nb; XLA dynamic_slice would CLAMP an out-of-range start and shift
    # every lane's window+block silently
    assert start_block - k + LANES + k <= flat_dev.shape[0], (
        start_block, flat_dev.shape,
    )
    maxbuf = chunk + window
    ri = -(-maxbuf // 4)
    ri = -(-ri // GROUP_W) * GROUP_W + PAGE_W
    maxout = chunk + chunk // 255 + 16
    ro = (-(-maxout // 4) // RING_W + 2) * RING_W
    max_rounds = chunk + maxout // CB + chunk // CB + 256

    words = _build_windowed_words(
        flat_dev, jnp.int32(start_block - k), k=k, ri=ri
    )
    n = np.zeros((1, LANES), np.int32)
    cur0 = np.full((1, LANES), window, np.int32)
    cur0[0, nb:] = 0  # unused lanes: same idle state as the host pack
    gstarts = np.zeros(nb, np.int64)
    for j in range(nb):
        n[0, j] = window + int(lens[start_block + j])
        gstarts[j] = (start_block + j) * chunk

    if tinit_batched is not None:
        stacked, take, order = tinit_batched
        tinit_dev = take(stacked, jnp.int32(order[start_block]))
    else:
        from ..hostpack import to_device_chunked
        from ..native import prime_tables_native

        tinit_dev = to_device_chunked(prime_tables_native(
            data, gstarts, np.full(nb, window, np.int64),
            np.zeros(nb, np.int64), hl,
        ))
    out_t, out_len = _compress128_jit_t(
        words, jnp.asarray(n), jnp.asarray(cur0), tinit_dev,
        ri=ri, ro=ro, max_rounds=max_rounds, hashlog=hl,
    )
    try:
        out_len.copy_to_host_async()  # streams as the kernel finishes
    except Exception:
        pass
    blocks = [
        data[(start_block + j) * chunk :
             (start_block + j) * chunk + int(lens[start_block + j])]
        for j in range(nb)
    ]
    return _DispatchedCompressBatch(
        out_t=out_t, out_len=out_len, blocks=blocks,
        prefixes=_LazyWindows(data, [s * chunk for s in
                                     range(start_block, start_block + nb)],
                              window),
    )


class _DispatchedCompressBatch:
    """In-flight lane-compress batch (device handles + metadata); see
    decode128._DispatchedBatch for the pipelining rationale."""

    __slots__ = ("out_t", "out_len", "blocks", "prefixes")

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


@functools.partial(
    jax.jit, static_argnames=("ri", "ro", "max_rounds", "hashlog")
)
def _compress128_jit_t(words, n, cur0=None, tinit=None, **kw):
    """_compress128_jit + on-device transpose (host unpack becomes a
    contiguous row slice per lane)."""
    out_w, out_len = _compress128_jit(words, n, cur0, tinit, **kw)
    return out_w.T, out_len


def compress_blocks_128(blocks, *, hashlog: int | None = None, prefixes=None):
    """Compress up to 128 raw blocks (each <= 32 KiB) lane-parallel;
    returns a list of LZ4 block byte strings.  Lanes that hit the round
    cap (shouldn't happen for well-formed sizing) fall back to the
    native engine.

    ``prefixes`` (optional, per block): window/dictionary bytes (<= 64
    KiB each) the block's matches may reach back into — the reference's
    linked-block / preset-dictionary compress semantics
    (``framed/compress.rs:202-218,271-275``): the lane buffer becomes
    ``[prefix | block]``, the parse starts past the prefix, and the
    per-lane table is host-primed with every 3rd prefix position."""
    return collect_compress_128(
        dispatch_compress_128(blocks, hashlog=hashlog, prefixes=prefixes)
    )


def dispatch_compress_128(blocks, *, hashlog: int | None = None, prefixes=None):
    """Pack + launch one <=128-block lane-compress batch; returns a
    ``_DispatchedCompressBatch`` immediately (kernel runs async)."""
    assert len(blocks) <= LANES
    blocks = [bytes(b) for b in blocks]
    nb = len(blocks)
    if nb == 0:
        return None
    hl = HASHLOG if hashlog is None else hashlog
    if STRICT:
        assert hl == 12, "strict parity mode is defined for the C table size"
        assert not prefixes or not any(prefixes), (
            "strict parity mode covers independent blocks (no window)"
        )
    if prefixes is not None:
        prefixes = [bytes(p or b"")[-65536:] for p in prefixes]
        assert len(prefixes) == nb
        if not any(prefixes):
            prefixes = None
    maxlen = max(max(len(b) for b in blocks), 4)
    assert maxlen <= MAX_B, f"blocks must be <= {MAX_B} bytes"
    max_plen = max((len(p) for p in prefixes), default=0) if prefixes else 0
    maxbuf = maxlen + max_plen
    ri = -(-maxbuf // 4)
    ri = -(-ri // GROUP_W) * GROUP_W + PAGE_W
    maxout = maxlen + maxlen // 255 + 16
    ro = (-(-maxout // 4) // RING_W + 2) * RING_W
    # rounds: <= 1/input byte (search) + emission + extend slack
    max_rounds = maxlen + maxout // CB + maxlen // CB + 256

    arr = np.zeros((LANES, ri * 4), np.uint8)
    n = np.zeros((1, LANES), np.int32)
    cur0 = np.zeros((1, LANES), np.int32)
    for i, b in enumerate(blocks):
        p = prefixes[i] if prefixes else b""
        arr[i, : len(p)] = np.frombuffer(p, np.uint8)
        arr[i, len(p) : len(p) + len(b)] = np.frombuffer(b, np.uint8)
        n[0, i] = len(p) + len(b)
        cur0[0, i] = len(p)
    from ..hostpack import pack_words_le

    words = pack_words_le(arr)

    from ..hostpack import to_device_chunked

    kw = {}
    if prefixes:
        kw["cur0"] = jnp.asarray(cur0)
        kw["tinit"] = to_device_chunked(prime_tables_packed(prefixes, hl))
    out_t, out_len = _compress128_jit_t(
        to_device_chunked(words), jnp.asarray(n),
        ri=ri, ro=ro, max_rounds=max_rounds, hashlog=hl, **kw,
    )
    try:
        out_len.copy_to_host_async()  # streams as the kernel finishes
    except Exception:
        pass
    return _DispatchedCompressBatch(
        out_t=out_t, out_len=out_len, blocks=blocks, prefixes=prefixes,
    )


def collect_compress_128(batch):
    """Fetch + unpack one dispatched compress batch; empty blocks emit
    the literal-only token, round-cap lanes fall back to the native
    window-mode engine."""
    if batch is None:
        return []
    blocks, prefixes = batch.blocks, batch.prefixes
    nb = len(blocks)
    out_len = np.asarray(batch.out_len)[0]
    # fetch only the rows any lane actually emitted, quantized to
    # power-of-two fractions of ro (as decode128's collect): every
    # distinct device-slice shape is a separate remote compile on this
    # backend, and the full out_t is mostly padding (compressed output
    # ~= ratio x capacity) — the un-sliced fetch dominated the
    # compressbig end-to-end wall
    need_rows = (int(max((int(out_len[i]) for i in range(nb)), default=0)) + 3) // 4
    ro = batch.out_t.shape[1]
    # eighths: at most 8 distinct slice shapes per ro (each is a separate
    # remote compile), fetching ceil(need/ (ro/8)) eighths
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
    for i in range(nb):
        ln = int(out_len[i])
        if len(blocks[i]) == 0:
            results.append(b"\x00")  # literal-only empty token
            continue
        if ln <= 0:
            from ..native import compress_block as _native_compress
            from ..spec.table import U16Table, U32Table

            if prefixes and prefixes[i]:
                # native window-mode fallback: same [prefix|block] buffer,
                # cursor past the prefix, step-3 primed table
                from ..spec.table import prime_u32_table

                t = U32Table()
                prime_u32_table(t, prefixes[i])
                results.append(
                    bytes(
                        _native_compress(
                            prefixes[i] + blocks[i], len(prefixes[i]), t
                        )
                    )
                )
            else:
                results.append(
                    bytes(_native_compress(blocks[i], 0, U32Table()))
                )
            continue
        results.append(out_b[i, :ln].tobytes())
    return results
