"""Host model of decodebig's SEQ2 round machine (parse positions only).

Replays one block's window-aligned packed stream through the kernel's
round logic (phase-1 re-entrant parse incl. PH_MHDR + win_r jumps, and
the phase-2 speculative second sequence) and asserts every parse reads
at the TRUE header position derived independently from the repack.
Used to localize the on-chip ERR_ZERO_OFFSET seen in the first SEQ2
port (96 x 1 MiB corpus, 24 bad lanes).

Usage: python tools/sim_dbig_seq2.py /tmp/dbig_bad_1.bin <block_maxsize>
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from lz4tpu.kernels.decodebig import CB, FLUSH_B, FLUSH_THRESH, WS_LOG, _repack_block

MINMATCH = 4


def true_layout(comp: bytes, output_limit: int, win_r: int, ws_log: int):
    """Walk the ORIGINAL stream and compute, for each sequence, its
    header/match-field positions in the packed layout (mirrors
    _repack_block's construction) plus (lit, off, mlen)."""
    W = 1 << ws_log
    fill = {}  # chunk index -> bytes appended so far

    def put(k, nb):
        p = fill.get(k, 0)
        fill[k] = p + nb
        return k * win_r + p

    seqs = []
    pos, out, n = 0, 0, len(comp)
    while pos < n:
        s0 = pos
        tok = comp[pos]; pos += 1
        lit = tok >> 4
        if lit == 0xF:
            while True:
                b = comp[pos]; pos += 1; lit += b
                if b != 0xFF:
                    break
        hdr_len = pos - s0
        pos += lit
        k0 = out >> ws_log
        hpos = put(k0, hdr_len)
        first = min(lit, ((k0 + 1) << ws_log) - out)
        put(k0, first)
        x, j = first, k0 + 1
        while x < lit:
            t = min(W, lit - x)
            put(j, t)
            x += t; j += 1
        out += lit
        if pos >= n:
            seqs.append((hpos, None, lit, 0, 0, out))
            break
        if pos + 2 > n:
            mpos = put(out >> ws_log, n - pos)
            seqs.append((hpos, mpos, lit, 0, 0, out))
            pos = n
            break
        m0 = pos
        pos += 2
        ml = tok & 0xF
        if ml == 0xF:
            while True:
                b = comp[pos]; pos += 1; ml += b
                if b != 0xFF:
                    break
        mpos = put(out >> ws_log, pos - m0)
        seqs.append((hpos, mpos, lit, comp[m0] | (comp[m0 + 1] << 8), ml + MINMATCH, out))
        out += ml + MINMATCH
    return seqs, out


def parse_packed(packed: bytes, p: int):
    """Parse one sequence's header at packed position p (no window
    semantics — the caller guarantees contiguity)."""
    tok = packed[p]; p += 1
    lit = tok >> 4
    if lit == 0xF:
        while True:
            b = packed[p]; p += 1; lit += b
            if b != 0xFF:
                break
    return tok, lit, p


def simulate(comp: bytes, output_limit: int, verbose: bool = False):
    ws_log = WS_LOG
    chunks, total_out = _repack_block(comp, output_limit, ws_log)
    maxchunk = max(len(c) for c in chunks)
    win_r = -(-(maxchunk + 16) // 512) * 512
    n = (len(chunks) - 1) * win_r + len(chunks[-1])
    packed = bytearray(n)
    for k, c in enumerate(chunks):
        packed[k * win_r : k * win_r + len(c)] = c
    packed = bytes(packed)

    seqs, _ = true_layout(comp, output_limit, win_r, ws_log)
    hdr_at = {s[0]: i for i, s in enumerate(seqs)}
    mhdr_at = {s[1]: i for i, s in enumerate(seqs) if s[1] is not None}

    # round machine (positions only; far servability modeled as always
    # servable after the rebuild — pgf == flushed)
    pos, out = 0, 0
    lit_rem = m_rem = 0
    m_lag = 1
    tail_only = False
    pph = 0  # 0 none, 3 = PH_MHDR (suspensions not modeled: LSIC always completes)
    mhdr_saved = None
    flushed = 0
    rounds = 0
    si = 0  # next sequence index expected

    def check_hdr(p, who):
        assert p in hdr_at, (who, p, rounds, si, "expected", seqs[si][0] if si < len(seqs) else None)
        assert hdr_at[p] == si, (who, p, rounds, "hdr idx", hdr_at[p], "expected", si)

    while lit_rem or m_rem or pos < n or pph:
        rounds += 1
        assert rounds < 4 * len(comp) + total_out // CB + 4096, "livelock"
        out0 = out
        # ---- phase 1 parse ----
        need_rec = lit_rem == 0 and m_rem == 0
        accepted = False
        if need_rec and pph == 0 and pos < n:
            wk_out = out >> ws_log
            if wk_out > pos // win_r:
                pos = wk_out * win_r
            check_hdr(pos, "P1")
            tok, lit, p = parse_packed(packed, pos)
            oe = out + lit
            if (oe >> ws_log) > p // win_r:
                # PH_MHDR: accept literal part, defer match field
                lit_rem, lit_src = lit, p
                pos = (oe >> ws_log) * win_r + (oe & ((1 << ws_log) - 1))
                pph = 3
                mhdr_saved = tok & 0xF
                accepted = True
            else:
                p += lit
                if n - p < 2:
                    lit_rem = lit
                    m_rem = 0
                    tail_only = True
                    pos = n
                else:
                    assert p in mhdr_at and mhdr_at[p] == si, ("P1 mfield", p, rounds)
                    off = packed[p] | (packed[p + 1] << 8)
                    p += 2
                    ml = tok & 0xF
                    if ml == 0xF:
                        while True:
                            b = packed[p]; p += 1; ml += b
                            if b != 0xFF:
                                break
                    assert off == seqs[si][3] and ml + MINMATCH == seqs[si][4], ("P1 semantic", si)
                    lit_rem, m_rem, m_lag = lit, ml + MINMATCH, off
                    pos = p
                    accepted = True
                    si += 1
                if tail_only:
                    si += 1
        elif need_rec and pph == 3:
            if n - pos < 2:
                tail_only = True
                pph = 0
                pos = n
                si += 1
            else:
                assert pos in mhdr_at and mhdr_at[pos] == si, ("MHDR", pos, rounds, si)
                off = packed[pos] | (packed[pos + 1] << 8)
                p = pos + 2
                ml = mhdr_saved
                if ml == 0xF:
                    while True:
                        b = packed[p]; p += 1; ml += b
                        if b != 0xFF:
                            break
                assert off == seqs[si][3] and ml + MINMATCH == seqs[si][4], ("MHDR semantic", si)
                m_rem, m_lag = ml + MINMATCH, off
                pos = p
                pph = 0
                si += 1
        # accepted-this-round records execute their chunks the same round
        # ---- literal chunk ----
        lit_take = min(lit_rem, CB)
        to_b = (((out >> ws_log) + 1) << ws_log) - out
        lit_take = min(lit_take, to_b)
        out += lit_take
        lit_rem -= lit_take
        if lit_rem and (out & ((1 << ws_log) - 1)) == 0 and lit_take:
            pass  # lit_src jump — positions only, not tracked
        # ---- match chunk ----
        m_take = 0
        if lit_rem == 0 and m_rem:
            m_take = min(m_rem, CB, m_lag)
            out += m_take
            m_rem -= m_take
            if m_take == m_lag and m_lag < CB:
                m_lag *= 2
        # ---- phase 2 ----
        if (
            lit_rem == 0 and m_rem == 0 and pos < n and pph == 0
            and not tail_only
        ):
            out1 = out
            wkB = out1 >> ws_log
            posB = wkB * win_r if wkB > pos // win_r else pos
            check_hdr(posB, "P2")
            tok, lit, p = parse_packed(packed, posB)
            oeB = out1 + lit
            if (oeB >> ws_log) > p // win_r:
                pass  # abort — phase 1 next round
            else:
                lsrcB = p
                p += lit
                if n - p < 2:
                    # tail via B
                    lit_takeB = min(lit, CB, (((out1 >> ws_log) + 1) << ws_log) - out1)
                    lit_rem = lit - lit_takeB
                    out += lit_takeB
                    tail_only = True
                    pos = p
                    si += 1
                else:
                    assert p in mhdr_at and mhdr_at[p] == si, ("P2 mfield", p, rounds, si)
                    off = packed[p] | (packed[p + 1] << 8)
                    p += 2
                    ml = tok & 0xF
                    if ml == 0xF:
                        while True:
                            b = packed[p]; p += 1; ml += b
                            if b != 0xFF:
                                break
                    assert off == seqs[si][3] and ml + MINMATCH == seqs[si][4], ("P2 semantic", si)
                    si += 1
                    lit_takeB = min(lit, CB, (((out1 >> ws_log) + 1) << ws_log) - out1)
                    out += lit_takeB
                    lit_rem = lit - lit_takeB
                    m_rem = ml + MINMATCH
                    m_lag = off
                    pos = p
                    m_takeB = 0
                    if lit_rem == 0:
                        m_takeB = min(m_rem, CB, off)
                        out += m_takeB
                        m_rem -= m_takeB
                        if m_takeB == off and off < CB:
                            m_lag = off * 2
        while out - flushed >= FLUSH_THRESH:
            flushed += FLUSH_B
        if tail_only and lit_rem == 0:
            break
        if pos >= n and lit_rem == 0 and m_rem == 0 and pph == 0:
            break
    assert si == len(seqs), (si, len(seqs))
    assert out == total_out, (out, total_out)
    return rounds, out


if __name__ == "__main__":
    path = sys.argv[1]
    limit = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 20
    comp = open(path, "rb").read()
    rounds, out = simulate(comp, limit, verbose=True)
    print(f"ok: {rounds} rounds, {out} bytes")
