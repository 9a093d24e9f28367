"""Round-3 compress128 round-economics model.

Where do the lane compressor's rounds go at the shipping default
(hashlog 12, PROBES 4, packed table, backtrack), and what do the
candidate levers buy?  Cost model: per-round vreg-op estimate scaled
against the measured default (101.6 MB/s, tools/measure_r3.json).
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from bench import make_corpus

HASH_MUL = 2654435761
SKIP_TRIGGER = 6
MINMATCH = 4


def sim_block(data: bytes, hashlog: int, probes: int, cb: int, rw_words: int,
              backtrack: bool = True):
    n = len(data)
    t_rows = 1 << hashlog
    table = [-1] * t_rows
    tablew = [0] * t_rows
    mv32 = (1 << 32) - 1

    def word(p):
        return int.from_bytes(data[p : p + 4], "little")

    def h(v):
        return ((v * HASH_MUL) & mv32) >> (32 - hashlog)

    cat = {"search": 0, "extend": 0, "emit_fused": 0, "emit_phased": 0}
    out = 0
    cur = anchor = 0
    miss = 1 << SKIP_TRIGGER

    def emit(lit, mlen):
        nonlocal out
        mv = mlen - MINMATCH if mlen else 0
        tail = mlen == 0
        litx = max(lit - 15, 0)
        e0l = litx // 255 + 1 if lit >= 15 else 0
        mvx = max(mv - 15, 0)
        e0m = mvx // 255 + 1 if mv >= 15 else 0
        out_bytes = 1 + e0l + lit + (0 if tail else 2 + e0m)
        nonlocal_rounds = 0
        if lit < 15 and (tail or mv < 15):
            cat["emit_fused"] += 1
        else:
            r = 1  # TOK
            left = max(e0l - 7, 0)
            r += -(-left // cb) if left else 0
            r += -(-lit // cb) if lit else 0
            if not tail:
                r += 1
                leftm = max(e0m - 6, 0)
                r += -(-leftm // cb) if leftm else 0
            cat["emit_phased"] += r
        return out_bytes

    while True:
        if cur + 12 > n:
            out += emit(n - anchor, 0)
            cat["search"] += 1
            break
        cat["search"] += 1
        qs = []
        m = miss
        q = cur
        span_cap = rw_words * 4 - 8 if probes > 1 else 4
        for j in range(probes):
            if q + 12 > n or q - cur > span_cap:
                break
            qs.append(q)
            q += m >> SKIP_TRIGGER
            m += 1
        hit = None
        for qj in qs:
            v = word(qj)
            hj = h(v)
            cand, candw = table[hj], tablew[hj]
            table[hj] = qj
            tablew[hj] = v
            if hit is None and 0 <= cand < qj and qj - cand <= 0xFFFF and candw == v:
                hit = (qj, cand)
        if hit is None:
            if not qs:
                cur += 1
                continue
            cur = q
            miss += len(qs)
            continue
        mstart, mc = hit
        mlen = 0
        limit = n - 5
        while True:
            cat["extend"] += 1
            avail = min(limit - (mstart + mlen), cb)
            lcp = 0
            while lcp < avail and data[mstart + mlen + lcp] == data[mc + mlen + lcp]:
                lcp += 1
            mlen += lcp
            if lcp < cb or avail < cb:
                break
        if mlen < MINMATCH:
            cur = mstart + 1
            miss += 1
            continue
        if backtrack:
            bt = 0
            while (
                bt < cb
                and mstart - bt > anchor
                and mc - bt > 0
                and data[mstart - bt - 1] == data[mc - bt - 1]
            ):
                bt += 1
            mstart -= bt
            mc -= bt
            mlen += bt
        out += emit(mstart - anchor, mlen)
        cur = mstart + mlen
        anchor = cur
        miss = 1 << SKIP_TRIGGER
    return cat, out


def round_cost(hashlog: int, probes: int, cb: int, rw_words: int) -> float:
    t_vregs = (1 << hashlog) // 8
    cw = cb // 4
    sweep = t_vregs * (2 + probes * 1.2)  # packed single-array sweep
    probe_words = probes * (rw_words * 2)
    read = 36 * 2 + (rw_words + 1) * 2
    extend = 2 * (36 * 2 + (cw + 1) * 2) + 8 * cw
    backtrack = 2 * (36 * 2 + (cw + 1) * 2) + 6 * cw
    place = (cw + 1) * 8 * 2.5
    emission = 150
    state = 100
    return (
        sweep + probe_words + read + extend + backtrack + place + emission + state
    )


def main():
    data = make_corpus(8.0)
    blk = 32 << 10
    blocks = [data[i : i + blk] for i in range(0, len(data), blk)][:128]
    total = sum(len(b) for b in blocks)
    MEASURED_DEFAULT = 101.6
    configs = [
        ("default hl12 P4 CB32", 12, 4, 32, 8),
        ("P8 RW8", 12, 8, 32, 8),
        ("P8 RW16", 12, 8, 32, 16),
        ("P16 RW16", 12, 16, 32, 16),
        ("CB64", 12, 4, 64, 8),
        ("P8 RW16 CB64", 12, 8, 64, 16),
        ("hl13 P8 RW16", 13, 8, 32, 16),
    ]
    base_work = None
    for name, hl, p, cb, rw in configs:
        cats = {"search": 0, "extend": 0, "emit_fused": 0, "emit_phased": 0}
        out = 0
        for b in blocks:
            c, o = sim_block(b, hl, p, cb, rw)
            for k in c:
                cats[k] += c[k]
            out += o
        rounds = sum(cats.values())
        cost = round_cost(hl, p, cb, rw)
        work = rounds * cost
        if base_work is None:
            base_work = work
        print(
            f"{name}: ratio={out/total:.4f} rounds={rounds} "
            f"({', '.join(f'{k}={v}' for k, v in cats.items())}) "
            f"cost={cost:.0f} -> projected {MEASURED_DEFAULT * base_work / work:.0f} MB/s"
        )


if __name__ == "__main__":
    main()
