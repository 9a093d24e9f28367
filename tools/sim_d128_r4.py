"""Round-4 host model: phase-1 mid service + gated far rebuilds (FAR_K).

The measured round-3 kernel (SEQ2, CB=16, mid=512 rows) spends ~20-25%
of every round rebuilding the far page (a full scan of the ro-row output
buffer), and it fires nearly every round because *some* lane wants a far
group almost always.  Two structural levers, modeled here per lane with
kernel-faithful K=2 semantics (phases, flush cadence, pgf watermark,
lag doubling), then composed into batch walls (lockstep: a batch runs
its slowest lane's rounds; a rebuild costs the batch only on rounds
where >=1 lane triggers it):

* P1MID — phase 1 serves match sources within the mid mirror window
  (src >= flushed - mid_bytes) from the mod-addressed mirror, no far
  page needed (today only phase 2 reads mid).
* FAR_K — far rebuilds are granted only on rounds r % K == 0 (same
  scheme as the comp-page REFILL_K): a lane whose want isn't covered by
  the cached group idles that match take until the next grant round.
  Cuts worst-case rebuild frequency to 1/K at the price of stall
  rounds on far-heavy lanes.

Cost model per round: C_BASE + C_FAR (when any lane rebuilds that
round) + C_MID1 (P1MID's extra phase-1 mid gather, always), calibrated
so the V0 column reproduces the measured 4.70 us/round at ~100% fired.
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
FLUSH_THRESH = 400
FLUSH_B = 256
FAR_G_BYTES = 256 * 4
MID_BYTES = 512 * 4 - 4

C_FAR = 1.05e-6  # rebuild cost when fired (ro-scan; 64 KiB blocks)
C_BASE = 4.70e-6 - C_FAR  # everything else at K=2/CB=16 (measured total 4.70)
C_MID1 = 0.12e-6  # extra phase-1 mid gather+funnel (P1MID only)


def simulate(seqs, p1mid: bool, far_k: int):
    """Returns (rounds, rebuild_round_indices:set)."""
    rounds = 0
    out = flushed = 0
    fgb = -1  # cached far group
    pgf = -1  # its flush watermark
    k = 0
    lit_rem = m_rem = lag = 0
    rebuilds = set()

    def serve_far(src, want_take, r):
        """Far service for one want; returns take (0 = stall)."""
        nonlocal fgb, pgf
        g = src // FAR_G_BYTES
        if g == fgb and src + want_take <= pgf:
            return want_take
        if far_k <= 1 or r % far_k == 0:
            fgb, pgf = g, flushed
            rebuilds.add(r)
            return min(want_take, max(pgf - src, 0))
        # cached-group partial service while waiting for a grant
        if g == fgb:
            return min(want_take, max(pgf - src, 0))
        return 0

    while k < len(seqs) or lit_rem or m_rem:
        r = rounds
        rounds += 1
        out0 = out
        if out0 - flushed >= FLUSH_THRESH:
            flushed += FLUSH_B
        rebuilt_this_round = False

        # ---- phase 1 ----
        if not lit_rem and not m_rem:
            lit_rem, off, m_rem = seqs[k]
            lag = off
            k += 1
        lt = min(lit_rem, CB)
        lit_rem -= lt
        out += lt
        if not lit_rem and m_rem:
            src = out - lag
            take = min(m_rem, CB, lag)
            if src >= flushed:
                pass  # near ring
            elif p1mid and src >= flushed - MID_BYTES:
                take = min(take, flushed - src)
            else:
                t0 = take
                take = serve_far(src, take, r)
                rebuilt_this_round = take != t0 or r in rebuilds
            if take:
                if take == lag and lag < CB:
                    lag *= 2
                m_rem -= take
                out += take

        # ---- phase 2 (only on exact drain) ----
        if not lit_rem and not m_rem and k < len(seqs):
            litB, offB, mlenB = seqs[k]
            k += 1
            ltB = min(litB, CB)
            out += ltB
            lit_rem, m_rem, lag = litB - ltB, mlenB, offB
            if not lit_rem and m_rem:
                srcB = out - lag
                take = min(m_rem, CB, lag)
                if srcB >= out0:
                    take = 0  # span path exists in-kernel; conservative
                elif srcB >= flushed:
                    pass  # near
                elif srcB >= flushed - MID_BYTES:
                    take = min(take, flushed - srcB)
                else:
                    g = srcB // FAR_G_BYTES
                    if g == fgb and srcB + take <= pgf:
                        pass
                    elif not rebuilt_this_round and (
                        far_k <= 1 or r % far_k == 0
                    ):
                        fgb, pgf = g, flushed
                        rebuilds.add(r)
                        take = min(take, max(pgf - srcB, 0))
                    else:
                        take = 0
                if take:
                    if take == lag and lag < CB:
                        lag *= 2
                    m_rem -= take
                    out += take
    return rounds, rebuilds


def main() -> None:
    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 32.0
    data = make_corpus(mb)
    blocks = [data[i : i + BLOCK] for i in range(0, len(data), BLOCK)]
    blocks = [b for b in blocks if len(b) == BLOCK]
    comp = [bytes(compress_block(b, 0, U32Table())) for b in blocks]
    allseqs = [parse_sequences(c) for c in comp]
    total = sum(len(b) for b in blocks)
    print(f"corpus {mb} MiB -> {len(blocks)} blocks")

    for name, p1mid, far_k in (
        ("V0 current", False, 1),
        ("V1 p1mid", True, 1),
        ("V2 p1mid+far2", True, 2),
        ("V2 p1mid+far4", True, 4),
        ("V2 p1mid+far8", True, 8),
        ("far4 only", False, 4),
    ):
        res = [simulate(s, p1mid, far_k) for s in allseqs]
        r = np.array([x[0] for x in res])
        order = np.argsort(-r)
        wall_us = 0.0
        fired_tot = rounds_tot = 0
        for b0 in range(0, len(r), 128):
            idx = order[b0 : b0 + 128]
            bmax = int(r[idx].max())
            fired = set()
            for i in idx:
                fired |= res[i][1]
            nf = len([x for x in fired if x < bmax])
            cost = (
                C_BASE * bmax
                + C_FAR * nf
                + (C_MID1 * bmax if p1mid else 0.0)
            )
            wall_us += cost * 1e6
            fired_tot += nf
            rounds_tot += bmax
        mbps = total / (wall_us * 1e-6) / 1e6
        print(
            f"{name:16s}: rounds max {r.max()} p50 {np.percentile(r,50):.0f} "
            f"mean {r.mean():.0f} | fired {fired_tot}/{rounds_tot} "
            f"({fired_tot/max(rounds_tot,1):.2f}) | wall {wall_us/1e3:.1f} ms "
            f"| proj sorted {mbps:.0f} MB/s"
        )


if __name__ == "__main__":
    main()
