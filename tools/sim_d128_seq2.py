"""Host model: does a 2-sequences-per-round decode128 pay?

Replays each bench block's sequence stream through a round-accurate
state machine in two configurations:

* seq1 — the shipping round: parse when the record drains, then one
  CB-byte literal chunk + one match chunk (lag-doubling RLE bootstrap).
* seq2 — phase-2 extension: whenever the record drains mid-round and
  stream bytes remain, parse the NEXT sequence in the same round, copy
  its literal chunk, and execute its match chunk if servable under a
  far-page/near-ring model:
    - near: source >= flushed watermark AND strictly below the round's
      starting out (phase-1 placed bytes are not in the pre-place ring);
    - far: source group must equal the group the far page was rebuilt
      for this round (the phase-1 record's group when it went far, else
      B's own group rebuilds).

Wall time = max over lanes of rounds; the gain estimate assumes the
phase-2 round costs `COST2` x the phase-1-only round (vector work for
parse B + B's gathers + a wider place window).
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from bench import BLOCK, make_corpus  # noqa: E402
from lz4tpu.native import compress_block  # noqa: E402
from lz4tpu.spec.table import U32Table  # noqa: E402

CB = 16
FLUSH_THRESH = min(176, 64 * 4 - 2 * CB - 4)
FLUSH_B = 128
FAR_G_BYTES = 256 * 4


def parse_sequences(comp: bytes):
    seqs = []
    pos, n = 0, len(comp)
    while pos < n:
        tok = comp[pos]
        pos += 1
        lit = tok >> 4
        if lit == 0xF:
            while True:
                b = comp[pos]
                pos += 1
                lit += b
                if b != 0xFF:
                    break
        pos += lit
        if pos >= n - 2:
            seqs.append((lit, 0, 0))
            break
        off = comp[pos] | (comp[pos + 1] << 8)
        pos += 2
        ml = tok & 0xF
        if ml == 0xF:
            while True:
                b = comp[pos]
                pos += 1
                ml += b
                if b != 0xFF:
                    break
        seqs.append((lit, off, ml + 4))
    return seqs


def simulate(seqs, two_seq: bool, servable_mode: str = "grp"):
    rounds = 0
    p2_rounds = 0  # rounds that ran a phase-2 parse (wider/costlier)
    out = 0
    flushed = 0
    fgb = -1
    k = 0  # next sequence index
    lit_rem = m_rem = lag = off = 0

    def exec_match_chunk(m_rem, lag, served_far_group):
        nonlocal fgb
        take = min(m_rem, CB, lag)
        if take == lag and lag < CB:
            lag *= 2
        return m_rem - take, lag, take

    while k < len(seqs) or lit_rem or m_rem:
        rounds += 1
        out0 = out
        placed = 0
        # phase 1: parse if drained
        if not lit_rem and not m_rem:
            lit_rem, off, mlen = seqs[k]
            m_rem, lag = mlen, off
            k += 1
        # phase 1 execute
        lt = min(lit_rem, CB)
        lit_rem -= lt
        out += lt
        placed += lt
        a_far_group = None
        if not lit_rem and m_rem:
            src = out - lag if lag <= off else out - off  # approx source
            if src < flushed:
                g = src // FAR_G_BYTES
                if g != fgb:
                    fgb = g
                a_far_group = fgb
            m_rem, lag, take = exec_match_chunk(m_rem, lag, None)
            out += take
            placed += take
        # phase 2
        if two_seq and not lit_rem and not m_rem and k < len(seqs):
            litB, offB, mlenB = seqs[k]
            if litB <= CB:  # only fully-copyable literals join phase 2
                k += 1
                p2_rounds += 1
                out += litB
                placed += litB
                lit_rem, m_rem, lag, off = 0, mlenB, offB, offB
                if m_rem:
                    srcB = out - lag
                    if servable_mode == "opt":
                        ok = True
                    else:
                        if srcB >= out0:
                            ok = False  # phase-1 bytes not in pre-place ring
                        elif srcB >= flushed:
                            ok = True  # near ring
                        else:
                            g = srcB // FAR_G_BYTES
                            ok = (
                                g == (a_far_group if a_far_group is not None else g)
                            )
                            if a_far_group is None and ok:
                                fgb = g
                    if ok:
                        m_rem, lag, take = exec_match_chunk(m_rem, lag, None)
                        out += take
                        placed += take
        # flush model
        while out - flushed >= FLUSH_THRESH:
            flushed += FLUSH_B
    return rounds, p2_rounds


def main() -> None:
    data = make_corpus(8.0)
    blocks = [data[i : i + BLOCK] for i in range(0, len(data), BLOCK)][:128]
    comp = [bytes(compress_block(b, 0, U32Table())) for b in blocks]
    allseqs = [parse_sequences(c) for c in comp]

    r1 = np.array([simulate(s, False)[0] for s in allseqs])
    for mode in ("grp", "opt"):
        res = [simulate(s, True, mode) for s in allseqs]
        r2 = np.array([r for r, _ in res])
        p2 = np.array([p for _, p in res])
        for cost2 in (1.2, 1.35, 1.5):
            # effective wall: every round costs 1, phase-2 rounds cost2;
            # batch gated by slowest lane
            eff2 = r2 + (cost2 - 1.0) * p2
            gain = r1.max() / eff2.max()
            print(
                f"mode={mode} cost2={cost2}: rounds max {r1.max()} -> {r2.max()} "
                f"(p50 {np.percentile(r1,50):.0f} -> {np.percentile(r2,50):.0f}), "
                f"p2-share {p2.sum()/r2.sum():.2f}, projected gain x{gain:.2f}"
            )


if __name__ == "__main__":
    main()
