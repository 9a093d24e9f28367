"""Host model: K-sequences-per-round decode128 + balanced batching.

Extends tools/sim_d128_seq2.py (whose seq2 prediction matched the chip:
modelled rounds_max 5291 vs measured 5312) along the two round-4 axes:

1. K phases per round (K = 1..4): whenever the running record drains
   mid-round and stream bytes remain, parse the NEXT sequence in the
   same round under the same servability model as phase 2 — literal
   chunk must be fully copyable (<= CB) and page-resident, match chunk
   executes when near (below the ROUND-START out, pre-place ring) or
   when its far group matches the round's single rebuilt group (first
   far want wins the rebuild; later phases fold only on agreement).

2. Balanced batching: with >128 blocks, sort blocks by modelled rounds
   (descending) so each 128-lane batch groups similar-cost lanes; wall
   time = sum of per-batch maxima instead of n_batches * global max.

Projected throughput calibrates per-round cost against the two measured
points (K=1: 7808 rounds = 258.5 MB/s, K=2: 5312 rounds = 336.2 MB/s on
the same 8 MiB batch, PERF_NOTES round 3) and extrapolates phase width
linearly (+12.9 % per phase), plus an extra +8 % at K=4 for the bigger
staging ring (RING_W 64 -> 96: place/near-gather slabs grow).
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from bench import BLOCK, make_corpus  # noqa: E402
from lz4tpu.native import compress_block  # noqa: E402
from lz4tpu.spec.table import U32Table  # noqa: E402
from tools.sim_d128_seq2 import parse_sequences  # noqa: E402

CB = 16
FLUSH_B = 128
FAR_G_BYTES = 256 * 4


def flush_thresh(k_phases: int, ring_w: int) -> int:
    return min(176, ring_w * 4 - 2 * k_phases * CB - 4)


def simulate_k(seqs, k_phases: int, ring_w: int = 64, span_src: bool = False):
    """Rounds to decode one lane's sequence stream with up to k_phases
    sequences started per round.  ``span_src``: later phases may also
    gather match bytes from THIS round's already-built span (a small
    register-window gather in the kernel), removing the out0 blocker;
    sources crossing the out0 boundary clamp to one side."""
    ft = flush_thresh(k_phases, ring_w)
    assert ft >= FLUSH_B, (k_phases, ring_w)
    rounds = 0
    out = 0
    flushed = 0
    fgb = -1
    k = 0
    lit_rem = m_rem = lag = off = 0

    while k < len(seqs) or lit_rem or m_rem:
        rounds += 1
        out0 = out
        round_far_group = None  # the single group rebuilt this round

        def far_ok(src):
            nonlocal round_far_group, fgb
            g = src // FAR_G_BYTES
            if round_far_group is None:
                # first far want this round wins the rebuild (or the page
                # already holds the group from an earlier round)
                round_far_group = g
                fgb = g
                return True
            return g == round_far_group

        # phase 1: the carried record (parse if drained)
        if not lit_rem and not m_rem:
            lit_rem, off, mlen = seqs[k]
            m_rem, lag = mlen, off
            k += 1
        lt = min(lit_rem, CB)
        lit_rem -= lt
        out += lt
        if not lit_rem and m_rem:
            src = out - lag
            ok = True
            if src < flushed:
                ok = far_ok(src)
            if ok:
                take = min(m_rem, CB, lag)
                if take == lag and lag < CB:
                    lag *= 2
                m_rem -= take
                out += take

        # phases 2..K
        for _ in range(k_phases - 1):
            if lit_rem or m_rem or k >= len(seqs):
                break
            litB, offB, mlenB = seqs[k]
            k += 1
            ltB = min(litB, CB)
            out += ltB
            lit_rem, m_rem, lag, off = litB - ltB, mlenB, offB, offB
            if lit_rem:
                break  # literal carries; match next round
            if m_rem:
                srcB = out - lag
                take = min(m_rem, CB, lag)
                if srcB >= out0:
                    if not span_src:
                        take = 0  # this round's bytes not in pre-place ring
                elif span_src and srcB + take > out0:
                    take = out0 - srcB  # clamp to the ring side
                elif srcB < flushed:
                    if not far_ok(srcB):
                        take = 0
                if take:
                    if take == lag and lag < CB:
                        lag *= 2
                    m_rem -= take
                    out += take

        while out - flushed >= ft:
            flushed += FLUSH_B
    return rounds


# calibration: (K, rounds_max, MB/s) measured on the 8 MiB 128-lane batch
C1_US = (8 * 1024 * 1024 / 258.5e6) * 1e9 / 7808 / 1000  # us per K=1 round
PHASE_W = ((8 * 1024 * 1024 / 336.2e6) * 1e9 / 5312 / 1000) / C1_US - 1.0


def cost_us(k_phases: int) -> float:
    c = C1_US * (1.0 + PHASE_W * (k_phases - 1))
    if k_phases >= 4:
        c *= 1.08  # RING_W 64 -> 96
    return c


def main() -> None:
    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 32.0
    data = make_corpus(mb)
    blocks = [data[i : i + BLOCK] for i in range(0, len(data), BLOCK)]
    blocks = [b for b in blocks if len(b) == BLOCK]
    print(f"corpus {mb} MiB -> {len(blocks)} blocks")
    comp = [bytes(compress_block(b, 0, U32Table())) for b in blocks]
    allseqs = [parse_sequences(c) for c in comp]
    total = sum(len(b) for b in blocks)

    for K, span_src in ((1, False), (2, False), (2, True), (3, False),
                        (3, True), (4, True)):
        ring_w = 96 if K >= 4 else 64
        r = np.array([simulate_k(s, K, ring_w, span_src) for s in allseqs])
        c = cost_us(K)
        # unsorted: batches in corpus order; sorted: descending rounds
        order_nat = np.arange(len(r))
        order_srt = np.argsort(-r)
        walls = {}
        for name, order in (("natural", order_nat), ("sorted", order_srt)):
            rr = r[order]
            batch_max = [
                rr[i : i + 128].max() for i in range(0, len(rr), 128)
            ]
            walls[name] = sum(batch_max)
        mbps_nat = total / (walls["natural"] * c * 1e-6) / 1e6
        mbps_srt = total / (walls["sorted"] * c * 1e-6) / 1e6
        print(
            f"K={K}{'+span' if span_src else ''} ring={ring_w}: "
            f"rounds max {r.max()} p50 {np.percentile(r, 50):.0f} "
            f"mean {r.mean():.0f} | wall nat {walls['natural']} srt {walls['sorted']} "
            f"| cost {c:.2f} us | proj {mbps_nat:.0f} -> sorted {mbps_srt:.0f} MB/s"
        )


if __name__ == "__main__":
    main()
