"""Host-side model of decode128 round counts per lane.

Walks each compressed block's sequence stream and charges rounds the way
the kernel does (one parse per drained record, CB-byte literal and match
chunks, lag-doubling RLE bootstrap).  Ignores refill gating and far-page
watermark clipping, so numbers are a lower bound per lane; the spread
across lanes is the quantity of interest: wall time = max(lane rounds),
useful work = mean(lane rounds).
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from bench import BLOCK, make_corpus  # noqa: E402
from lz4tpu.native import compress_block  # noqa: E402
from lz4tpu.spec.table import U32Table  # noqa: E402

CB = 32


def block_rounds(comp: bytes) -> tuple[int, int, int]:
    """(rounds, sequences, bytes_out) the kernel would spend on one lane."""
    pos, n = 0, len(comp)
    rounds = seqs = out = 0
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
        lit_pos = pos
        pos += lit
        seqs += 1
        if pos >= n:  # tail token
            rounds += max(1, -(-lit // CB))
            out += lit
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
        mlen = ml + 4
        out += lit + mlen
        # literal rounds; the last one can also carry the first match chunk
        lit_rounds = max(1, -(-lit // CB))
        m = mlen
        lag = off
        mrounds = 0
        first = True
        while m > 0:
            take = min(m, CB, lag)
            if not first:
                mrounds += 1
            else:
                first = False  # rides the last literal round
            m -= take
            if take == lag and lag < CB:
                lag *= 2
        rounds += lit_rounds + mrounds
    return rounds, seqs, out


def main() -> None:
    data = make_corpus(8.0)
    blocks = [data[i : i + BLOCK] for i in range(0, len(data), BLOCK)][:128]
    comp = [bytes(compress_block(b, 0, U32Table())) for b in blocks]
    r = np.array([block_rounds(c)[0] for c in comp])
    s = np.array([block_rounds(c)[1] for c in comp])
    print(f"lanes={len(r)}  rounds: mean={r.mean():.0f} p50={np.percentile(r,50):.0f} "
          f"p90={np.percentile(r,90):.0f} max={r.max()} min={r.min()}")
    print(f"sequences/lane: mean={s.mean():.0f} max={s.max()}")
    print(f"skew efficiency (mean/max): {r.mean()/r.max():.3f}")
    print(f"bytes/lane-round at max-gating: {BLOCK/r.max():.2f}  "
          f"(ungated ideal {BLOCK/r.mean():.2f})")
    order = np.argsort(r)
    print("worst 5 lanes:", [(int(i), int(r[i])) for i in order[-5:]])


if __name__ == "__main__":
    main()
