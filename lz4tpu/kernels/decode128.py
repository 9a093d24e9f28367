"""EXPERIMENTAL: full lane-parallel LZ4 decoder — 128 blocks per step.

Builds on the measured parse128 result (33 ns/sequence, PERF_NOTES.md):
the same lockstep-round + one-hot bounded-window machinery now carries
the DATA PLANE too, so the whole decode runs one-sequence-per-lane-per-
round with no per-lane dynamic addressing:

* compressed streams AND outputs live TRANSPOSED in VMEM
  (``words[j, l]`` = word j of lane l);
* literal bytes extract from the comp page by a per-lane row-gather
  (one-hot over the 64-row page) + a per-lane byte funnel;
* each lane's newest output bytes live in a 64-word staging RING
  addressed by ``(word mod 64)`` — because that address is UNIFORM
  across lanes, flushing is a plain masked sweep of the main output
  (``out[p,l] = ring[p mod 64, l] where fw_l <= p < fw_l+32``) with no
  per-lane gather at all;
* near matches gather from the ring; far matches from a 64-row far page
  one-hot-gathered out of the flushed main output (one sweep serves all
  lanes, gated on any lane needing it);
* chunk placement into the ring is a bounded row scatter + byte funnel
  with select-merge byte masks.

Per round each lane advances: one parsed sequence, up to CB literal
bytes and up to CB match bytes (longer runs take extra rounds;
tiny-offset RLE uses the v2/v3 lag-doubling bootstrap).  LSIC chains
longer than the unrolled window suspend and RESUME next round through
the same parse path (a per-lane phase: none / literal-length /
match-length continuation), so arbitrarily long length fields cost one
extra round per LSIC_STEPS continuation bytes with no per-round tax and
no host fallback; the fallback sentinel remains only as the round-cap
defense (``decompress_blocks_128`` wrapper).

Prefix/dictionary mode: per-lane prefixes arrive right-aligned in the
seeded head of the transposed output, decoding starts pre-flushed just
past them, and the far-page machinery serves prefix bytes exactly like
flushed output (no extra code path in the round).  Block size and
prefix together are bounded by the transposed-VMEM budget
(``lanes_eligible``; ~64 KiB output/lane without a prefix).
Semantics: ``/root/reference/src/raw/decompress.rs:59-138`` (prefix
resolution ``:84-99``).  The gather/funnel/place/sweep machinery is
shared with compress128/decodebig in ``kernels/lanes.py``.
"""

from __future__ import annotations

import functools

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

import os as _os1

LANES = 128
GROUP_W = int(_os1.environ.get("LZ4TPU_D128_GROUPW", "256"))  # comp page group
import os as _os2

FAR_G = int(_os2.environ.get("LZ4TPU_D128_FARG", "256"))  # far group granularity (measured best)
# mid-history page: a mod-addressed mirror of the last mid_w*4 flushed
# bytes, written during the flush sweep at lane-uniform addresses (no
# rebuild, unlike the far page); serves match offsets up to ~mid_w*4.
# The actual mid_w is chosen PER BATCH SHAPE to fill the VMEM headroom
# left by the comp/output buffers (pick_mid_w); this is the cap.
# Pre-SEQ2 the unconditional mid gather measured -7% (PERF_NOTES round
# 2); under SEQ2 the economics flipped: the host round model shows ~60%
# of rounds carry a match because the PHASE-2 far want lost the single
# per-round far rebuild, and a 2 KiB mid window serves most of those
# wants rebuild-free (sim: rounds_max 5206 -> 4287 on the bench corpus,
# tools/sim_d128_seqk.py) — so a small mid is now ON by default.
# Cap sweep on the Silesia 48 KiB-bucket batches (tools/chip_mid_ab.py,
# same session): mid 384 = 621.0 MB/s (4.72 us/round), 960 = 652.2
# (4.70 — the gather over 120 slabs is issue-FREE at this round size),
# 1344 = 643.6 (4.85 — past the knee).  960 is the sweet spot, so the
# cap is 1024 (RING_W-aligned pick lands on 960).
MID_CAP = int(_os1.environ.get("LZ4TPU_D128_MIDW", "1024"))
# VMEM row-sum budget (bytes of transposed rows) for the MID MIRROR
# grant (pick_mid_w) and for lane eligibility (lanes_eligible).  History:
# rounds 2-5 fought a ~16 MB scoped-vmem compile edge — that edge was
# the XLA TPU compiler's DEFAULT stack budget
# (--xla_tpu_scoped_vmem_limit_kib=16384), not the hardware: v5e has
# 128 MiB VMEM/core and this kernel is the chip's sole tenant, so
# _decode128_jit now claims the stack explicitly via
# pltpu.CompilerParams(vmem_limit_bytes).  Measured with the raised
# limit: worst-case 64 KiB-block comp (65856 B) WITH mid 960 (18.1 MB
# rowsum) and the 64 KiB-dictionary prefix shape (30.3 MB) compile and
# run on both CB variants.  40 MB covers every 64 KiB-block shape incl.
# 96 KiB linked windows; bigger blocks route to decodebig.
VMEM_ROWSUM_BUDGET = int(
    _os1.environ.get("LZ4TPU_D128_VMEM", "40_000_000").replace("_", "")
)
import os as _os

# bytes per chunk per round.  16 measured best on mixed corpora (271.7
# vs 255 MB/s at 32): the batch-gating lanes are SEQUENCE-dense (~8.5 B
# output/sequence, so chunk width doesn't change their round count) while
# every lane pays the chunk-width gather/place rows every round.  Corpora
# dominated by long matches/literals (pure RLE, pattern logs) prefer 32
# or 64 — chunk rounds halve per doubling; env-tune for such data.
CB = int(_os.environ.get("LZ4TPU_D128_CB", "16"))
CW = CB // 4  # chunk words
assert CB in (8, 16, 32, 64), CB
# eligibility limit: same budget by default (kept as a separate env
# knob for A/Bs — e.g. forcing the mid mirror off below a shape class
# while still admitting it)
MID0_ROWSUM_LIMIT = int(
    _os.environ.get("LZ4TPU_D128_VMEM0", "40_000_000").replace("_", "")
)
# phase-2 second sequence per round: when the round's record DRAINS
# mid-round (the gating lanes are sequence-dense: ~8.5 B/sequence means
# one sequence per round caps them at ~8.5 B/round), parse the NEXT
# sequence in the same round and execute as much of it as is servable:
# its literal chunk always (opportunistic on page residency), its match
# chunk when the source is in the pre-place ring below the round-start
# ``out`` or in the far page (whose single rebuild folds in phase-2
# wants on lanes whose phase-1 record needs no far group).  Unservable
# remainders carry as the next round's record — correctness never
# depends on servability.  Host model (tools/sim_d128_seq2.py):
# max-lane rounds 7750 -> ~4300-5300 on the bench corpus.
SEQ2 = _os.environ.get("LZ4TPU_D128_SEQ2", "1") == "1"
# page margins beyond the group: the widest in-page read is a chunk
# gather (CW+1 rows + funnel spill) or a 12-byte parse span (4 rows),
# from a base inside the group — slab-rounded.  Every margin row rides
# along in one-hot refills/rebuilds, so trim to the actual read-ahead.
_MARGIN = -(-max(CW + 2, 5) // 8) * 8
PAGE_W = GROUP_W + _MARGIN  # comp page rows: group + parse/chunk margin
FAR_W = FAR_G + _MARGIN  # far page rows: group + chunk margin
# staging ring rows (words).  Two invariants bound the geometry:
# a flush may only drain bytes already written (FLUSH_THRESH >= FLUSH_B,
# else the sweep publishes never-written rows that are never re-flushed)
# and place2's word-granular slop tail must not lap unflushed bytes
# (fill + 2*CB + 3 <= ring bytes — see the slop-invariant note).  At
# CB=64 both cannot hold in a 256 B ring, hence the bigger default.
# The round-4 flush gating (FLUSH_K) needs extra headroom: fill can
# overshoot the threshold by FLUSH_K-1 rounds of _NCHUNK*CB bytes.
RING_W = int(
    _os1.environ.get(
        "LZ4TPU_D128_RINGW", {8: "128", 16: "192", 32: "192", 64: "256"}[CB]
    )
)
# flush-sweep gating: the sweep's cost is its firing lanes' fw SPREAD in
# ring-block RMWs and it fired nearly every round (measured 35.5% of the
# round, chip decomposition r4).  Granting flushes only on rounds
# r % FLUSH_K == 0 and draining each firing lane DOWN TO a fixed
# residual (instead of a fixed FLUSH_B quantum) cuts invocations ~K-fold
# at the same average drain rate; the ring holds the overshoot.
FLUSH_K = int(
    _os1.environ.get(
        "LZ4TPU_D128_FLUSHK", {8: "2", 16: "4", 32: "2", 64: "2"}[CB]
    )
)
# ring flush granularity (bytes; FLUSH_B/4 word rows).  The flush sweep
# (and its mid-mirror write) fires on ANY lane crossing the threshold
# and costs the firing lanes' fw SPREAD in ring-block RMWs, so coarser
# flushes with a bigger ring fire it half as often, trading a few
# place/near slab ops — measured 378.4 vs 371.8 MB/s at RING_W 128 with
# FLUSH_B 256 under SEQ2+mid (the pre-SEQ2 tuning preferred RING_W 64).
# phase-2 rounds place up to FOUR chunks (litA|mA|litB|mB), so the slop
# tail extends up to 4*CB+3 past the round-start fill
_NCHUNK = 4 if SEQ2 else 2
FLUSH_THRESH = min(
    int(_os1.environ.get("LZ4TPU_D128_FLUSHT", "400")),
    RING_W * 4 - _NCHUNK * CB - 4,
)
FLUSH_B = min(
    int(_os1.environ.get("LZ4TPU_D128_FLUSHB", "256")),
    (FLUSH_THRESH // 64) * 64,
)
# drain-to-residual: a firing lane drains to this fill level (word-
# granular), re-crossing the threshold only after FLUSH_THRESH -
# FLUSH_RESID more output bytes.  The residual is what stays "near"
# (served from the pre-place ring): draining too deep reclassifies
# recent sources as far/mid and inflates far rebuilds.
FLUSH_RESID = int(_os1.environ.get("LZ4TPU_D128_FLUSHR", "144"))
assert 0 <= FLUSH_RESID <= FLUSH_THRESH - 64
assert FLUSH_THRESH >= FLUSH_B, (RING_W, CB)
# gated-overshoot capacity: fill can reach FLUSH_THRESH + (FLUSH_K-1)
# rounds of _NCHUNK*CB bytes before the next grant, plus the place slop
assert (
    FLUSH_THRESH - 1 + FLUSH_K * _NCHUNK * CB + 3 <= RING_W * 4
), (RING_W, CB, FLUSH_K)
LSIC_STEPS = int(_os.environ.get("LZ4TPU_D128_LSIC", "8"))  # unrolled LSIC ext bytes/field
# comp-page refill gating (same scheme as compress128): the cursor-side
# page advances monotonically with the parse, so with 128 desynced lanes
# some lane crosses a group boundary nearly every round and the one-hot
# page rebuild (~n_groups * PAGE_W/8 vreg FMAs) fires almost always.
# Refills are granted only on rounds r % K == 0; a lane whose round-start
# group is absent idles its parse/literal work for the round.  The
# mid-round ensure sites (match header after a long literal run, literal
# source after a page move) stay ungated — they fire rarely.  K=1
# disables gating.  The far page is NOT gated: far groups are
# random-access per match, so stalls there would inflate rounds.
REFILL_K = int(_os.environ.get("LZ4TPU_D128_REFILL_K", "4"))
assert 2 + LSIC_STEPS <= 12  # read_span12 provides 12 bytes
STATUS_FALLBACK = 100  # lane needs the scalar fallback (not an error kind)

# state rows (R_PPH..R_SOFF: re-entrant LSIC parse continuation)
(R_POS, R_OUT, R_ST, R_DONE, R_GB, R_FLUSH,
 R_LREM, R_LSRC, R_MREM, R_MOFF, R_MLAG, R_TAIL, R_FGB, R_PGF,
 R_RND, R_DONEAT, R_PPH, R_PV, R_SLIT, R_SSRC, R_SOFF) = range(21)
NSTATE = 24
PH_NONE, PH_LIT, PH_MATCH = 0, 1, 2


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _decode128_kernel(
    words_ref,  # VMEM (Rw, 128) int32 — transposed comp streams
    n_ref,  # VMEM (1, 128) int32
    prefix_ref,  # VMEM (max(pr,8), 128) int32 — transposed, right-aligned prefixes
    plen_ref,  # VMEM (1, 128) int32 — per-lane prefix byte lengths
    out_words_ref,  # VMEM (Ro, 128) int32 OUT — transposed outputs
    out_len_ref,  # VMEM (3, 128) int32 OUT: len / done-at-round / rounds run
    status_ref,  # VMEM (1, 128) int32 OUT
    page_ref,  # scratch (PAGE_W, 128) — comp page
    far_ref,  # scratch (FAR_W, 128) — far-match page
    ring_ref,  # scratch (RING_W, 128) — output staging ring
    mid_ref,  # scratch (max(mid_w,8), 128) — mod-addressed flush mirror
    state_ref,  # scratch (NSTATE, 128)
    *,
    rw: int,
    ro: int,
    pr: int,
    max_rounds: int,
    output_limit: int,
    mid_w: int,
    variant: str = "full",
):
    """Prefix/dictionary mode (pr > 0): the first ``pr`` output rows are
    seeded with each lane's right-aligned prefix (decompress prefix
    semantics, ``/root/reference/src/raw/decompress.rs:84-99``) and
    decoding starts at byte ``pr*4``, pre-flushed — the far-page
    machinery then serves prefix bytes exactly like flushed output, and
    offsets validate against decoded + per-lane prefix length."""
    S8 = (8, LANES)
    n = jnp.broadcast_to(n_ref[0:1, :], S8)
    n_groups = max((rw - PAGE_W) // GROUP_W + 1, 1)
    far_groups = max((ro - FAR_W) // FAR_G + 1, 1)
    pstart = pr * 4  # absolute byte position where decoding begins
    plen = jnp.broadcast_to(plen_ref[0:1, :], S8)

    rowi8 = jax.lax.broadcasted_iota(jnp.int32, S8, 0)

    # ---------------- comp page machinery (as parse128) ----------------
    def refill_page(gbase):
        acc = jnp.zeros((PAGE_W, LANES), jnp.int32)
        gb = gbase[0:1, :]
        for g in range(n_groups):
            mask = (gb == g).astype(jnp.int32)
            acc = acc + words_ref[g * GROUP_W : g * GROUP_W + PAGE_W, :] * mask
        page_ref[:, :] = acc

    def ensure_page(gbase, pos, active):
        want = jnp.clip((pos >> 2) // GROUP_W, 0, n_groups - 1)
        new_gbase = jnp.where(active, want, gbase)
        need = jnp.any(new_gbase != gbase)

        @pl.when(need)
        def _():
            refill_page(new_gbase)
            if variant == "refill2x":  # timing probe: pay refill twice,
                refill_page(new_gbase)  # delta vs full = refill share

        return new_gbase

    def ensure_page_gated(gbase, pos, active, granted):
        """Round-start gated ensure: refill only when ``granted``; lanes
        whose wanted group is absent otherwise report ``stalled`` and idle
        this round.  Returns (new_gbase, stalled)."""
        want = jnp.clip((pos >> 2) // GROUP_W, 0, n_groups - 1)
        need = active & (want != gbase)
        take = need & granted
        new_gbase = jnp.where(take, want, gbase)

        @pl.when(jnp.any(take))
        def _():
            refill_page(new_gbase)
            if variant == "refill2x":
                refill_page(new_gbase)

        return new_gbase, need & ~take

    def read_span12(page, gbase, p):
        """12 consecutive bytes starting at per-lane byte position ``p``
        as a list of (8,128) byte values — ONE bounded row gather + word
        funnel instead of 12 separate one-hot byte reads (the parse's
        header bytes are contiguous, so this is the parse hot path)."""
        base_row = jnp.clip((p >> 2) - gbase * GROUP_W, 0, PAGE_W - 5)
        w4 = gather_rows(page, PAGE_W, base_row, 4, 0)
        ws = funnel(w4, p)  # 3 word rows = 12 bytes from p
        out = []
        for k in range(12):
            word = jnp.broadcast_to(ws[k // 4 : k // 4 + 1], S8)
            out.append(
                jax.lax.shift_right_logical(word, (k % 4) * 8) & 0xFF
            )
        return out

    def lsic_from(span, k0, initial, p, enable, status, cont):
        """Branchless LSIC over pre-gathered continuation bytes
        span[k0:k0+LSIC_STEPS].  ``cont`` lanes resume a field that was
        suspended in an earlier round: ``initial`` is the saved
        accumulator and continuation is unconditional (a lane only
        suspends while its chain is still hungry).  Lanes still hungry
        after the unrolled steps return ``need`` — the caller records
        the phase/accumulator state rows and they re-enter here next
        round with ``cont`` set."""
        need = ((initial == 0xF) | cont) & enable
        v = initial
        for k in range(LSIC_STEPS):
            eof = need & (p >= n)
            status = jnp.where((eof != 0) & (status == OK), ERR_UNEXPECTED_END, status)
            need = need & (~eof)
            b = span[k0 + k]
            v = v + jnp.where(need, b, 0)
            p = p + need.astype(jnp.int32)
            need = need & (b == 0xFF)
        return v, p, status, need

    # -------- per-lane bounded row gather (one-hot over a window) -------
    def gather_rows(src, src_rows, base_row, k_rows, modulo):
        return _lanes_gather_rows(
            src, src_rows, base_row, k_rows, modulo, rowi8=rowi8
        )

    def place_multi(ring, chunks, dst):
        """One contiguous span (litA|mA[|litB|mB]) scattered + merged into
        the staging ring; machinery + slop invariant in kernels/lanes.py."""
        return _lanes_place_multi(ring, chunks, dst, cb=CB, ring_w=RING_W)

    def sweep_flush(ring, fw, nwords):
        """Publish ring rows to the transposed main output (and the mid
        mirror when enabled) — lane-uniform masked sweep, kernels/lanes.py."""
        _lanes_sweep_flush(
            out_words_ref, ring, fw, nwords, ring_w=RING_W, out_rows=ro,
            mid_ref=mid_ref,
            mid_w=(mid_w if (mid_w and variant != "nomid") else 0),
        )

    # ---------------- main loop ----------------------------------------
    def round_body(r, _):
        st = state_ref[:, :]

        if variant == "floor":
            # structural floor probe: full state read + write and the loop
            # machinery, nothing else (lanes never finish — time it with
            # max_rounds set to the real run's round count)
            state_ref[:, :] = jnp.concatenate(
                [st[:R_RND], st[R_RND : R_RND + 1] + 1, st[R_RND + 1 :]],
                axis=0,
            )
            return 0

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

        active = (~done) & (status == OK)

        pph, pv = row(R_PPH), row(R_PV)
        slit, ssrc, soff = row(R_SLIT), row(R_SSRC), row(R_SOFF)

        # ---- parse a new sequence when the current record is drained ----
        # round-start gated ensure: parsing lanes want their cursor group,
        # literal-copy lanes their literal-source group; match-only lanes
        # read no comp bytes this round and never stall
        need_rec = active & (lit_rem == 0) & (m_rem == 0)
        granted = jax.lax.rem(r, REFILL_K) == 0
        reads_page = active & (need_rec | (lit_rem > 0))
        # cont lanes re-read their span from 1 (PH_LIT) / 2 (PH_MATCH)
        # bytes BEFORE the cursor so the unrolled span indices match the
        # fresh path; the page must be ensured at that base — pages have
        # forward margin only, so a cursor exactly on a group boundary
        # would otherwise clip the span into the wrong group
        pbase = (
            pos
            - (pph == PH_LIT).astype(jnp.int32)
            - 2 * (pph == PH_MATCH).astype(jnp.int32)
        )
        gbase, pstall = ensure_page_gated(
            gbase, jnp.where(need_rec, pbase, lit_src), reads_page, granted
        )
        # a lane suspended mid-LSIC whose cursor sits at EOF is a
        # truncated stream, not a completed block
        cont_pending = pph != PH_NONE
        status = jnp.where(
            need_rec & cont_pending & (pos >= n) & (status == OK),
            ERR_UNEXPECTED_END, status,
        )
        parse_ok = need_rec & (pos < n) & ~pstall & (status == OK)
        fresh = parse_ok & (pph == PH_NONE)
        cont_lit = parse_ok & (pph == PH_LIT)
        cont_match = parse_ok & (pph == PH_MATCH)
        page = page_ref[:, :]

        # literal-length field: fresh lanes read token+ext at pos;
        # cont_lit lanes resume ext bytes AT pos (span base pos-1 keeps
        # the unrolled span indices identical for both)
        lit_en = fresh | cont_lit
        span1 = read_span12(page, gbase, jnp.where(lit_en, pbase, 0))
        tok = span1[0]
        nib = jnp.where(cont_lit, soff, tok & 0xF)
        lit_init = jnp.where(cont_lit, pv, jax.lax.shift_right_logical(tok, 4))
        p = pos + fresh.astype(jnp.int32)
        litv, p, status, lneed = lsic_from(
            span1, 1, jnp.where(lit_en, lit_init, 0), p, lit_en, status,
            cont=cont_lit,
        )
        susp_lit = lneed & (status == OK)
        adv = lit_en & ~lneed & (status == OK)  # literal field complete
        new_lsrc = jnp.where(cont_match, ssrc, p)
        litv = jnp.where(cont_match, slit, litv)
        p = jnp.where(cont_match, pos, p + jnp.where(adv, litv, 0))
        status = jnp.where(
            adv & (p > n) & (status == OK), ERR_UNEXPECTED_END, status
        )
        adv = adv & (status == OK)

        # match field: fresh/cont_lit lanes read offset+ext at p;
        # cont_match lanes resume ext bytes AT pos (span base pos-2)
        m_en = adv & (n - p >= 2)
        m_parse = m_en | cont_match
        span2_base = jnp.where(cont_match, pbase, p)
        gbase = ensure_page(gbase, jnp.where(m_parse, span2_base, pos), m_parse)
        page = page_ref[:, :]
        span2 = read_span12(page, gbase, jnp.where(m_parse, span2_base, 0))
        offv = jnp.where(
            cont_match, soff,
            jnp.where(m_en, span2[0] | (span2[1] << 8), 1),
        )
        p = p + 2 * m_en.astype(jnp.int32)
        m_init = jnp.where(cont_match, pv, jnp.where(m_en, nib, 0))
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
        # tail acceptance gate: the reference's output_limit is SOFT for
        # the final literal-only sequence — it may exceed the limit by up
        # to input.len() bytes (decompress.rs:57-58; the check at :72-74
        # fires on matches only), so spec/native/v4 all RETURN such
        # output.  The transposed output buffer is static, though: lanes
        # whose tail would overrun it (and be silently clipped by the
        # flush sweep) re-decode on the host instead, preserving exact
        # soft-limit semantics.
        ok = status == OK
        buf_cap = ro * 4 - _NCHUNK * CB - 8  # absolute bytes; slop-safe margin
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
        seq_done = (adv & ~m_en) | m_done
        accept = seq_done & (status == OK)

        lit_rem = jnp.where(accept, litv, lit_rem)
        lit_src = jnp.where(accept, new_lsrc, lit_src)
        m_rem = jnp.where(accept, mlenv, m_rem)
        m_off = jnp.where(accept, offv, m_off)
        m_lag = jnp.where(accept, offv, m_lag)
        tail_only = jnp.where(accept, (~m_done).astype(jnp.int32), tail_only)
        pos = jnp.where(accept | susp_lit | susp_match, p, pos)
        pph = jnp.where(
            susp_lit, PH_LIT,
            jnp.where(susp_match, PH_MATCH, jnp.where(accept, PH_NONE, pph)),
        )
        pv = jnp.where(susp_lit, litv, jnp.where(susp_match, mv, pv))
        soff = jnp.where(susp_lit, nib, jnp.where(susp_match, offv, soff))
        slit = jnp.where(susp_match, litv, slit)
        ssrc = jnp.where(susp_match, new_lsrc, ssrc)

        active = active & (status == OK)

        # ---- ring flush (before placement so space always suffices).
        # Gated to rounds r % FLUSH_K == 0 (the ring holds the
        # overshoot), and firing lanes drain DOWN TO the fixed residual
        # in one sweep — ~K-fold fewer sweep invocations at the same
        # average drain rate (the sweep costs its firing lanes' fw
        # spread in ring-block RMWs regardless of the drain size) ----
        ring0 = ring_ref[:, :]
        do_flush = (
            active & (out - flushed >= FLUSH_THRESH)
            & (jax.lax.rem(r, FLUSH_K) == 0)
        )
        nwf = jnp.where(
            do_flush, (out - flushed - FLUSH_RESID) >> 2, 0
        )

        @pl.when(jnp.any(do_flush))
        def _():
            fw = flushed >> 2
            sweep_flush(ring0, fw, nwf)
            if variant == "flush2x":  # timing probe: idempotent re-sweep,
                sweep_flush(ring0, fw, nwf)  # delta vs full = flush share

        flushed = flushed + nwf * 4

        # ---- literal chunk ----
        # a lane stalled on its literal-source group idles its copy too
        lit_take = jnp.where(pstall, 0, jnp.clip(lit_rem, 0, CB))
        gbase = ensure_page(
            gbase, jnp.where(lit_take > 0, lit_src, pos), active & (lit_take > 0)
        )
        page = page_ref[:, :]
        lsrc_row = jnp.clip((lit_src >> 2) - gbase * GROUP_W, 0, PAGE_W - CW - 2)
        if variant == "nogather":
            lit_bytes = jnp.zeros((CW, LANES), jnp.int32)
        else:
            litw = gather_rows(page, PAGE_W, lsrc_row, CW + 1, 0)
            lit_bytes = funnel(litw, lit_src)

        # ---- match chunk (source gathers read the PRE-place ring; a
        # match whose source overlaps this round's literal chunk defers
        # those bytes one round — see the m_take clamp below) ----
        lit_take1 = jnp.where(active, lit_take, 0)
        m_ready = active & (lit_rem - lit_take == 0) & (m_rem > 0)
        src_abs = out + lit_take - m_lag
        near = m_ready & (src_abs >= flushed)
        # phase 1 never reads the mid mirror: it always wins the round's
        # far rebuild anyway, so mid service saves it no rounds (host
        # model: B-only mid 4293 vs A+B 4287 rounds) — the mirror serves
        # PHASE 2, whose far want loses the rebuild to phase 1
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

        # ---- phase 2: speculative parse of the NEXT sequence (SEQ2) ----
        # Runs before the far rebuild so an idle lane's far page can be
        # rebuilt for the second sequence's group.  All state commitment
        # is deferred to ``acceptB`` below, gated on the EXACT drain of
        # the phase-1 record; aborted lanes re-parse identically next
        # round (the parse has no side effects).
        seq2_on = SEQ2 and variant == "full"
        if seq2_on:
            rowB = (pos >> 2) - gbase * GROUP_W
            ph2s = (
                active
                & (lit_rem - lit_take == 0)
                & (m_rem - m_take_pre == 0)
                & (pos < n)
                & (pph == PH_NONE)
                & (tail_only == 0)
                & (rowB >= 0) & (rowB <= PAGE_W - 5)
            )
            statusB = status
            span1B = read_span12(page, gbase, jnp.where(ph2s, pos, 0))
            tokB = span1B[0]
            pB = pos + ph2s.astype(jnp.int32)
            litvB, pB, statusB, lneedB = lsic_from(
                span1B, 1, jnp.where(
                    ph2s, jax.lax.shift_right_logical(tokB, 4), 0
                ), pB, ph2s, statusB, cont=ph2s & False,
            )
            advB = ph2s & ~lneedB & (statusB == OK)
            lsrcB = pB
            pB = pB + jnp.where(advB, litvB, 0)
            statusB = jnp.where(
                advB & (pB > n) & (statusB == OK), ERR_UNEXPECTED_END, statusB
            )
            advB = advB & (statusB == OK)
            # B's literal reads must sit in the resident page (no mid-
            # round ensure for phase 2 — out-of-page lanes abort)
            lrowB_raw = (lsrcB >> 2) - gbase * GROUP_W
            advB = advB & (lrowB_raw >= 0) & (lrowB_raw <= PAGE_W - CW - 2)
            # tail only when the stream genuinely has < 2 bytes left; a
            # lane whose match header merely left the page window aborts
            # (neither tail nor m_en), never mis-parses as a tail
            tailB = advB & (n - pB < 2)
            m_enB = advB & (n - pB >= 2)
            rowB2 = (pB >> 2) - gbase * GROUP_W
            m_enB = m_enB & (rowB2 >= 0) & (rowB2 <= PAGE_W - 5)
            span2B = read_span12(page, gbase, jnp.where(m_enB, pB, 0))
            offvB = jnp.where(m_enB, span2B[0] | (span2B[1] << 8), 1)
            pB = pB + 2 * m_enB.astype(jnp.int32)
            mvB, pB, statusB, mneedB = lsic_from(
                span2B, 2, jnp.where(m_enB, tokB & 0xF, 0), pB, m_enB,
                statusB, cont=m_enB & False,
            )
            m_doneB = m_enB & ~mneedB & (statusB == OK)
            mlenvB = jnp.where(m_doneB, mvB + 4, 0)
            lit_takeB_pre = jnp.where(advB, jnp.minimum(litvB, CB), 0)
            outB_pre = out + lit_take1 + m_take_pre
            src_absB_pre = outB_pre + lit_takeB_pre - offvB
            farB_pre = (
                m_doneB & (src_absB_pre < flushed) & (src_absB_pre >= 0)
            )
            if mid_w:
                # mid-servable wants need no far page: keep them out of
                # the fold so they never burn the round's single rebuild
                farB_pre = farB_pre & (
                    src_absB_pre < flushed - (mid_w * 4 - 4)
                )
            fwantB = jnp.clip(
                (jnp.clip(src_absB_pre, 0, None) >> 2) // FAR_G,
                0, far_groups - 1,
            )
        else:
            farB_pre = active & False
            fwantB = fgb

        nsrc_row = jax.lax.rem(jnp.clip(src_abs, 0, None) >> 2, RING_W)
        if variant in ("nogather", "nonear"):
            near_bytes = jnp.zeros((CW, LANES), jnp.int32)
        else:
            nearw = gather_rows(ring0, RING_W, nsrc_row, CW + 1, RING_W)
            near_bytes = funnel(nearw, src_abs)

        fwant = jnp.clip(
            (jnp.clip(src_abs, 0, None) >> 2) // FAR_G, 0, far_groups - 1
        )
        # a reused page is valid only for rows flushed BEFORE it was built
        # (the main output is append-only); rebuild when a lane moved
        # groups or wants bytes beyond its page's build watermark.
        # Phase-2 wants fold into the SAME single rebuild on lanes whose
        # phase-1 record needs no far group this round.
        foldB = farB_pre & ~far
        rebuild = far & ((fwant != fgb) | (src_abs + CB > pgf))
        if seq2_on:
            rebuild = rebuild | (
                foldB & ((fwantB != fgb) | (src_absB_pre + CB > pgf))
            )

        if variant == "nofar":
            rebuild = rebuild & False

        want_all = jnp.where(far, fwant, jnp.where(foldB, fwantB, fgb))

        @pl.when(jnp.any(rebuild))
        def _():
            fw1 = want_all[0:1, :]
            acc = jnp.zeros((FAR_W, LANES), jnp.int32)
            for g in range(far_groups):
                mask = (fw1 == g).astype(jnp.int32)
                acc = acc + out_words_ref[g * FAR_G : g * FAR_G + FAR_W, :] * mask
            far_ref[:, :] = acc

        fgb = want_all
        pgf = jnp.where(rebuild, flushed, pgf)
        if variant in ("nofar", "nogather"):
            far_bytes = jnp.zeros((CW, LANES), jnp.int32)
        else:
            farp = far_ref[:, :]
            fsrc_row = jnp.clip((src_abs >> 2) - fgb * FAR_G, 0, FAR_W - CW - 2)
            farw = gather_rows(farp, FAR_W, fsrc_row, CW + 1, 0)
            far_bytes = funnel(farw, src_abs)

        m_bytes = jnp.where(
            jnp.broadcast_to(near[0:1], (CW, LANES)), near_bytes, far_bytes
        )
        m_take = m_take_pre
        if variant != "nofar":  # timing variant: keep progress guaranteed
            m_take = jnp.where(
                far, jnp.clip(jnp.minimum(m_take, pgf - src_abs), 0, None),
                m_take,
            )

        # ---- phase 2 commitment + execution ------------------------------
        if seq2_on:
            # exact drain of the phase-1 record (the speculation above used
            # m_take_pre; they differ only when the far watermark clamped)
            drained = (
                active & (lit_rem - lit_take1 == 0) & (m_rem - m_take == 0)
            )
            commitB = ph2s & drained & (m_take == m_take_pre)
            statusB = jnp.where(commitB, statusB, status)
            # B status checks (only on committed lanes; an aborted B would
            # see a LARGER ``out`` when it really parses, so early errors
            # here would be wrong)
            okB = statusB == OK
            statusB = jnp.where(
                commitB & m_doneB & okB
                & (out + lit_take1 + m_take - pstart + litvB + mlenvB
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
                commitB & m_doneB & okB & (offvB == 0), ERR_ZERO_OFFSET, statusB
            )
            okB = statusB == OK
            statusB = jnp.where(
                commitB & m_doneB & okB
                & (offvB > out + lit_take1 + m_take - pstart + plen + litvB),
                ERR_INVALID_OFFSET, statusB,
            )
            status = jnp.where(commitB, statusB, status)
            acceptB = commitB & (tailB | m_doneB) & (status == OK)

            out1 = out + lit_take1 + m_take
            lit_takeB = jnp.where(acceptB, jnp.minimum(litvB, CB), 0)
            m_readyB = acceptB & (litvB == lit_takeB) & (mlenvB > 0)
            src_absB = out1 + lit_takeB - offvB
            # span: source bytes placed THIS round (phase-1/2 literal or
            # phase-1 match chunks) — gathered from the in-register span
            # window below; the dominant phase-2 source on sequence-dense
            # lanes (short offsets reference just-written bytes)
            spanB = m_readyB & (src_absB >= out)
            nearB = m_readyB & (src_absB >= flushed) & ~spanB
            farB = m_readyB & (src_absB < flushed)
            if mid_w:
                # the mod-addressed flush mirror serves phase-2 sources
                # within its window with no rebuild at all — the dominant
                # carried-match case in the host round model
                midB = farB & (src_absB >= flushed - (mid_w * 4 - 4))
                farB = farB & ~midB
            else:
                midB = farB & False
            m_takeB = jnp.where(
                m_readyB, jnp.minimum(jnp.minimum(mlenvB, CB), offvB), 0
            )
            # near: only bytes already in the pre-place ring (below the
            # round-start out); the rest carries to the next round
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
            fwantB_x = jnp.clip(
                (jnp.clip(src_absB, 0, None) >> 2) // FAR_G, 0, far_groups - 1
            )
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

            # span window: scatter the three already-known chunks, so the
            # phase-2 match can gather this round's bytes before the last
            # chunk lands (litB's tail is zeroed — chunk 4 lands after it)
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
            # from idxB>>2, so legitimate indices reach (PW_-CW-1)*4+3
            # (start byte <= 31 + dspan <= 3*CB-1); the old (PW_-CW-2)*4
            # cap clipped real reads at idxB in (72, 78] — wrong bytes
            # for short-offset phase-2 matches far into the span
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
            if variant == "noplace":
                ring2 = ring0
            else:
                winW, totW = window_extend(
                    winW, [(mB_bytes, m_takeB)], shW, baseW, cumW,
                    zero_tails=False,
                )
                ring2 = window_merge(
                    ring0, winW, shW, baseW, totW, ring_w=RING_W
                )
        else:
            lit_takeB = jnp.zeros(S8, jnp.int32)
            m_takeB = jnp.zeros(S8, jnp.int32)
            acceptB = active & False
            chunks = [(lit_bytes, lit_take1), (m_bytes, m_take)]
            if variant == "noplace":
                ring2 = ring0
            else:
                ring2 = place_multi(ring0, chunks, out)
        ring_ref[:, :] = ring2

        out = out + lit_take1 + m_take + lit_takeB + m_takeB
        if seq2_on:
            lit_rem = jnp.where(
                acceptB, litvB - lit_takeB, lit_rem - lit_take1
            )
            lit_src = jnp.where(
                acceptB, lsrcB + lit_takeB, lit_src + lit_take1
            )
            m_rem = jnp.where(acceptB, mlenvB - m_takeB, m_rem - m_take)
        else:
            lit_rem = lit_rem - lit_take1
            lit_src = lit_src + lit_take1
            m_rem = m_rem - m_take
        m_lag = jnp.where(
            (m_take > 0) & (m_take == m_lag) & (m_lag < CB), m_lag * 2, m_lag
        )
        if seq2_on:
            lagB = jnp.where(
                (m_takeB > 0) & (m_takeB == offvB) & (offvB < CB),
                offvB * 2, offvB,
            )
            m_lag = jnp.where(acceptB, lagB, m_lag)
            m_off = jnp.where(acceptB, offvB, m_off)
            tail_only = jnp.where(
                acceptB, tailB.astype(jnp.int32), tail_only
            )
            pos = jnp.where(acceptB, pB, pos)

        # a literal-only record ends the block ONLY at exact EOF: the
        # reference's failed u16 offset read consumes nothing (Cursor::
        # read_exact early-returns on EOF, decompress.rs:70), so ONE
        # leftover byte is re-read as a fresh token on the next iteration
        # — usually erroring on its literal field (found by the
        # generative fuzzer, test_fuzz_generative.py)
        done = done | (
            active & (tail_only != 0) & (lit_rem == 0) & (pos >= n)
        ) | (
            (pos >= n) & (lit_rem == 0) & (m_rem == 0) & (pph == PH_NONE)
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

    # ---- init + run + final drain ----
    if pr:
        # seed the outputs with the right-aligned prefixes: rows below
        # pstart behave exactly like flushed output for the far pages
        out_words_ref[0:pr, :] = prefix_ref[0:pr, :]
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
    mid_ref[:, :] = jnp.zeros((max(mid_w, 8), LANES), jnp.int32)

    # early exit: chunks of 64 rounds under a while with SCALAR-only carry
    # (vector carries fail Mosaic layout legalization; predicated no-op
    # rounds cost the same as real ones, so a loose static bound would
    # waste most of the runtime)
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
    # defense in depth: a lane still live at the round cap must never
    # pass off truncated output as success — flag the scalar fallback
    live = (st[R_DONE : R_DONE + 1] == 0) & (st[R_ST : R_ST + 1] == OK)
    state_ref[R_ST : R_ST + 1, :] = jnp.where(
        live, STATUS_FALLBACK, st[R_ST : R_ST + 1]
    )
    st = state_ref[:, :]
    out_f = jnp.broadcast_to(st[R_OUT : R_OUT + 1], S8)
    flushed_f = jnp.broadcast_to(st[R_FLUSH : R_FLUSH + 1], S8)
    # drain whatever is still staged (up to RING_W words per lane)
    sweep_flush(
        ring_ref[:, :], flushed_f >> 2,
        jnp.clip(((out_f - flushed_f) + 3) >> 2, 0, RING_W),
    )
    out_len_ref[:, :] = jnp.concatenate(
        [st[R_OUT : R_OUT + 1] - pstart, st[R_DONEAT : R_DONEAT + 1],
         st[R_RND : R_RND + 1]], axis=0,
    )
    status_ref[:, :] = st[R_ST : R_ST + 1]


def pick_mid_w(rw: int, ro: int) -> int:
    """Largest mid-history size (rows, RING_W-aligned, <= MID_CAP) whose
    VMEM row sum stays under the empirical budget for this batch shape."""
    base = rw + ro + PAGE_W + FAR_W + RING_W + NSTATE
    w = min(MID_CAP, max(VMEM_ROWSUM_BUDGET // (LANES * 4) - base, 0))
    return (w // RING_W) * RING_W


@functools.partial(
    jax.jit,
    static_argnames=(
        "rw", "ro", "pr", "max_rounds", "output_limit", "mid_w", "variant"
    ),
)
def _decode128_jit(
    words, n, prefix=None, plen=None, *, rw, ro, pr=0,
    max_rounds, output_limit, mid_w=None, variant="full",
):
    if prefix is None:
        assert pr == 0
        prefix = jnp.zeros((8, LANES), jnp.int32)
        plen = jnp.zeros((1, LANES), jnp.int32)
    if mid_w is None:
        # the mid mirror never holds prefix bytes, so it stays off in
        # prefix mode
        mid_w = 0 if pr else pick_mid_w(rw, ro)
    assert mid_w % RING_W == 0  # flush blocks never wrap the mid page
    # the XLA TPU compiler's default scoped-vmem budget is 16 MiB
    # (--xla_tpu_scoped_vmem_limit_kib=16384) out of v5e's 128 MiB
    # physical VMEM; this kernel IS the chip's sole tenant, so claim a
    # bigger stack explicitly instead of hugging the default's edge
    # (the remote-compile service's effective default drifted between
    # sessions: a 16.95 MB-rowsum shape compiled one day and scoped-OOMed
    # the next)
    params = pltpu.CompilerParams(
        vmem_limit_bytes=int(
            _os.environ.get("LZ4TPU_D128_VMEM_LIMIT", str(96 << 20))
        ),
    )
    return pl.pallas_call(
        functools.partial(
            _decode128_kernel,
            rw=rw, ro=ro, pr=pr, max_rounds=max_rounds,
            output_limit=output_limit, mid_w=mid_w, variant=variant,
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((ro, LANES), jnp.int32),
            jax.ShapeDtypeStruct((3, LANES), jnp.int32),  # len/done-at/rounds
            jax.ShapeDtypeStruct((1, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((PAGE_W, LANES), jnp.int32),
            pltpu.VMEM((FAR_W, LANES), jnp.int32),
            pltpu.VMEM((RING_W, LANES), jnp.int32),
            pltpu.VMEM((max(mid_w, 8), LANES), jnp.int32),
            pltpu.VMEM((NSTATE, LANES), jnp.int32),
        ],
        compiler_params=params,
        interpret=_interpret(),
    )(words, n, prefix, plen)


def buffer_rows(max_comp_len: int, block_maxsize: int, prefix_len: int = 0):
    """(rw, ro, pr) buffer row counts for a batch shape (shared with the
    eligibility check so callers and the wrapper agree).  ``pr`` prefix
    rows precede the decoded output in the same transposed buffer."""
    # pad = exactly one page beyond the last full group: the last group
    # slice [C, C+PAGE_W) then ends exactly at rw (same for the far page)
    rw = -(-max(max_comp_len, 4) // 4)
    rw = -(-rw // GROUP_W) * GROUP_W + PAGE_W
    pr = -(-prefix_len // 4)
    # keep flush blocks aligned: decoding starts at a RING_W row multiple
    pr = -(-pr // RING_W) * RING_W
    ro = pr + -(-block_maxsize // 4)
    ro = -(-ro // FAR_G) * FAR_G + FAR_W
    # the flush sweep covers whole RING_W blocks (out_rows // ring_w of
    # them) — pad ro to a RING_W multiple so tail rows stay sweepable
    ro = -(-ro // RING_W) * RING_W
    return rw, ro, pr


def round_bound(max_comp_len: int, block_maxsize: int) -> int:
    """Worst-case lockstep rounds for a batch shape: every parse or
    LSIC-continuation round consumes >=1 comp byte, every chunk round
    emits up to CB output bytes, RLE lag-doubling adds ~log2(CB)
    bootstrap rounds per tiny-offset match, and gated refills can idle a
    lane up to REFILL_K-1 rounds per group crossing.  The while-of-fori
    exits early, so generosity is free; a lane still live at the cap is
    flagged for the scalar fallback (defense in depth)."""
    return 3 * max_comp_len + block_maxsize // CB + 256


def lanes_eligible(
    max_comp_len: int, block_maxsize: int, prefix_len: int = 0
) -> bool:
    """True when this batch shape rides the 128-lane kernel: blocks up
    to 64 KiB (any comp size, incl. worst-case expansion, and linked/
    dictionary prefixes) whose transposed VMEM footprint (comp streams +
    outputs incl. prefix rows + pages/ring/mid/state scratch) fits the
    explicit vmem_limit_bytes stack claim.  Bigger blocks ride the
    HBM-staged decodebig engine (256 KiB-4 MiB) or the scalar v4
    pipeline."""
    if block_maxsize > 1 << 16:
        return False  # big-block shapes are decodebig's domain
    rw, ro, pr = buffer_rows(max_comp_len, block_maxsize, prefix_len)
    # prefix rows count twice: once as the seeding input, once inside ro
    rows = rw + ro + max(pr, 8) + PAGE_W + FAR_W + RING_W + NSTATE
    return rows * LANES * 4 <= MID0_ROWSUM_LIMIT


def _pack_transposed(rows, width_bytes, items):
    """uint8 item list -> transposed little-endian int32 words
    (rows, LANES), right-padded with zeros."""
    from ..hostpack import pack_words_le

    arr = np.zeros((LANES, rows * 4), np.uint8)
    for i, (b, align_right) in enumerate(items):
        if align_right:
            arr[i, width_bytes - len(b) : width_bytes] = np.frombuffer(b, np.uint8)
        else:
            arr[i, : len(b)] = np.frombuffer(b, np.uint8)
    return pack_words_le(arr)


class _DispatchedBatch:
    """In-flight lane-kernel batch: device handles + unpack metadata.
    Produced by ``dispatch_blocks_128``; resolved by
    ``collect_blocks_128``.  Keeping several in flight overlaps host
    packing and H2D of later batches with kernel execution of earlier
    ones (JAX dispatch is async; only the collect fetch blocks)."""

    __slots__ = ("out_t", "meta", "blocks", "prefixes",
                 "block_maxsize", "pr")

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


@functools.partial(jax.jit, static_argnames=("rw", "ro", "pr", "max_rounds",
                                             "output_limit"))
def _decode128_jit_t(words, n, prefix=None, plen=None, **kw):
    """_decode128_jit + on-device transpose so the host unpack is a
    contiguous row slice per lane instead of 128 strided column copies;
    out_len and status concatenate into ONE meta array so the collect
    pays a single round-trip for both (the tunnel costs ~25 ms per
    fetch no matter the size)."""
    out_w, out_len, status = _decode128_jit(words, n, prefix, plen, **kw)
    return out_w.T, jnp.concatenate([out_len, status], axis=0)


def quantize_maxlen(m: int) -> int:
    """Round a batch's max comp length up to the {1024*2^k, 1536*2^k}
    ladder: every distinct (rw, ro, mid) triple is a separate Mosaic
    kernel, and remote compiles on this backend cost minutes — so the
    dispatch shape universe must stay logarithmic in comp size (waste
    <= 33% of rw; refill-scan cost scales with rw, which is why the
    ladder is geometric rather than one max shape).  The 32768/49152
    rungs are the bench's measured bucket anchors (mid mirror still
    fits at 49152: tools/chip_mid_ab.py)."""
    s = 1024
    while True:
        if m <= s:
            return s
        if m <= s + (s >> 1):
            return s + (s >> 1)
        s <<= 1


def dispatch_blocks_128(blocks, block_maxsize: int = 1 << 14, prefixes=None):
    """Pack + launch one <=128-block lane-decode batch; returns a
    ``_DispatchedBatch`` immediately (kernel runs async on device)."""
    assert len(blocks) <= LANES
    blocks = [bytes(b) for b in blocks]
    nb = len(blocks)
    if nb == 0:
        return None
    if prefixes is not None:
        prefixes = [bytes(p) for p in prefixes]
        assert len(prefixes) == nb
        max_plen = max((len(p) for p in prefixes), default=0)
    else:
        max_plen = 0
    maxlen = max(max(len(b) for b in blocks), 4)
    # quantize up the ladder, but never past the LZ4 worst-case comp
    # bound for this block size (no valid stream is longer, so a rung
    # past it only inflates the refill-scan cost ~ rw) and only while
    # the bigger shape still fits the VMEM envelope the caller's
    # eligibility check approved (the envelope is env-narrowable)
    worst = block_maxsize + block_maxsize // 255 + 16
    mq = min(quantize_maxlen(maxlen), max(worst, maxlen))
    if lanes_eligible(mq, block_maxsize, max_plen):
        maxlen = mq
    else:
        # between the last fitting rung and the eligibility edge: 4 KiB
        # granularity (a handful of shapes) instead of exact lengths
        m4 = min(-(-maxlen // 4096) * 4096, max(worst, maxlen))
        if lanes_eligible(m4, block_maxsize, max_plen):
            maxlen = m4
    rw, ro, pr = buffer_rows(maxlen, block_maxsize, max_plen)
    max_rounds = round_bound(maxlen, block_maxsize)

    words = _pack_transposed(
        rw, rw * 4, [(b, False) for b in blocks]
        + [(b"", False)] * (LANES - nb)
    )
    n = np.zeros((1, LANES), np.int32)
    for i, b in enumerate(blocks):
        n[0, i] = len(b)

    kw = {}
    if pr:
        plen = np.zeros((1, LANES), np.int32)
        for i, p in enumerate(prefixes):
            plen[0, i] = len(p)
        kw["prefix"] = jnp.asarray(
            _pack_transposed(
                pr, pr * 4, [(p, True) for p in prefixes]
                + [(b"", True)] * (LANES - nb)
            )
        )
        kw["plen"] = jnp.asarray(plen)

    from ..hostpack import to_device_chunked

    out_t, meta = _decode128_jit_t(
        to_device_chunked(words), jnp.asarray(n),
        rw=rw, ro=ro, pr=pr, max_rounds=max_rounds,
        output_limit=block_maxsize, **kw,
    )
    try:
        # stream the tiny meta array down as soon as the kernel finishes
        # (collect's blocking read then costs ~0 extra round-trips)
        meta.copy_to_host_async()
    except Exception:
        pass
    return _DispatchedBatch(
        out_t=out_t, meta=meta, blocks=blocks,
        prefixes=prefixes, block_maxsize=block_maxsize, pr=pr,
    )


def collect_blocks_128(batch):
    """Fetch + unpack one dispatched batch (blocks until its kernel and
    D2H finish); applies the per-lane scalar fallback / typed errors."""
    if batch is None:
        return []
    meta = np.asarray(batch.meta)
    out_len, status = meta[:3], meta[3]
    nb = len(batch.blocks)
    pr = batch.pr
    # fetch only the rows any lane actually produced (short decodes of
    # a large block_maxsize skip most of the D2H).  Quantized to power-
    # of-two fractions of ro: every distinct device-slice shape is a
    # separately compiled XLA program (remote compiles on this backend),
    # so the slice universe must stay tiny.
    need_rows = pr + (int(
        max((int(out_len[0, i]) for i in range(nb) if status[i] == OK),
            default=0)
    ) + 3) // 4
    ro = batch.out_t.shape[1]
    # eighths: at most 8 distinct slice shapes per ro (each is a separate
    # remote compile), fetching ceil(need / (ro/8)) eighths
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
        s = int(status[i])
        if s == OK:
            results.append(
                out_b[i, pr * 4 : pr * 4 + out_len[0, i]].tobytes()
            )
        elif s == STATUS_FALLBACK:
            from .decompress_v4 import decompress_blocks_v4

            results.append(
                decompress_blocks_v4(
                    [batch.blocks[i]],
                    block_maxsize=batch.block_maxsize,
                    prefixes=(
                        [batch.prefixes[i]]
                        if batch.prefixes is not None else None
                    ),
                )[0]
            )
        else:
            raise DecodeError(STATUS_TO_KIND[s])
    return results


def decompress_blocks_128(blocks, block_maxsize: int = 1 << 14, prefixes=None):
    """Decode up to 128 independent raw blocks lane-parallel; lanes that
    error with real format errors raise ``DecodeError`` (first blocking
    lane); lanes flagged with the fallback sentinel re-decode through the
    scalar v4 kernel.

    ``prefixes`` (optional, per block): dictionary / carryover-window
    bytes each block's match offsets may reach back into
    (``decompress.rs:84-99`` semantics); at most 64 KiB each."""
    return collect_blocks_128(
        dispatch_blocks_128(blocks, block_maxsize, prefixes)
    )


_VARIANTS: dict = {}


def load_variant(cb: int):
    """A decode128 module instance compiled for chunk size ``cb``.

    CB is load-time geometry (chunk words, ring/flush/margins all derive
    from it), so a second chunk size means a second module: re-import
    this file with LZ4TPU_D128_CB scoped to the import.  The per-batch
    scheduler routes sequence-dense batches to CB=16 and long-run
    batches to CB=32 (chunk rounds halve; measured per-round cost only
    ~5% higher — tools/sim_d128_seqk.py and the calibration in
    parallel/sched.py)."""
    import importlib.util
    import os
    import sys

    if cb == CB:
        return sys.modules[__name__]
    if cb in _VARIANTS:
        return _VARIANTS[cb]
    name = f"{__name__}_cb{cb}"
    old = os.environ.get("LZ4TPU_D128_CB")
    os.environ["LZ4TPU_D128_CB"] = str(cb)
    try:
        spec = importlib.util.spec_from_file_location(name, __file__)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        try:
            spec.loader.exec_module(mod)
        except BaseException:
            sys.modules.pop(name, None)
            raise
    finally:
        if old is None:
            del os.environ["LZ4TPU_D128_CB"]
        else:
            os.environ["LZ4TPU_D128_CB"] = old
    _VARIANTS[cb] = mod
    return mod
