"""Table-geometry / parse-heuristic ratio simulator for compress128.

The ratio contract is `compressed size <= reference greedy` (BASELINE);
the speed problem is that the 2^12 direct-mapped table's probe sweep
scans 512 slabs/round (~40% of the round, calibrated from the measured
hl10/11/12 speeds: 140.3 / 126.9 / 99.1 MB/s).  Candidates that shrink
the scanned rows while keeping ratio <= ref:

* 2-way buckets at hl10/hl11 (scan cost ~ rows, retention ~ 2x rows)
* cursor-2 reinsert (C semantics, free-ish in-kernel)
* round-cascaded round counting (search rounds dominate; extend/emit
  cascade into the hit round)

Cost model calibrated on the three measured points; reports projected
MB/s + exact ratio per candidate.
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from bench import make_corpus

HASH_MUL = 2654435761
SKIP_TRIGGER = 6
MINMATCH = 4
CB = 32


def sim_block(data: bytes, hashlog: int, probes: int, ways: int,
              cursor2: bool, backtrack: bool = True):
    """Returns (cascaded_rounds, out_bytes)."""
    n = len(data)
    t_rows = 1 << hashlog
    table = [[-1] * ways for _ in range(t_rows)]
    tablew = [[0] * ways for _ in range(t_rows)]
    tick = [[0] * ways for _ in range(t_rows)]
    clock = 0
    mv32 = (1 << 32) - 1

    def word(p):
        return int.from_bytes(data[p : p + 4], "little")

    def h(v):
        return ((v * HASH_MUL) & mv32) >> (32 - hashlog)

    def insert(p):
        nonlocal clock
        clock += 1
        v = word(p)
        hj = h(v)
        row, roww, rowt = table[hj], tablew[hj], tick[hj]
        # replace the oldest way (FIFO)
        w = min(range(ways), key=lambda i: rowt[i])
        row[w], roww[w], rowt[w] = p, v, clock

    def probe(p):
        v = word(p)
        hj = h(v)
        best = None
        for w in range(ways):
            cand = table[hj][w]
            if 0 <= cand < p and p - cand <= 0xFFFF and tablew[hj][w] == v:
                if best is None or cand > best:
                    best = cand  # most recent candidate (shortest offset)
        insert(p)
        return best

    rounds = 0
    out = 0
    cur = anchor = 0
    miss = 1 << SKIP_TRIGGER

    def emit_bytes(lit, mlen):
        mv = mlen - MINMATCH if mlen else 0
        tail = mlen == 0
        litx = max(lit - 15, 0)
        e0l = litx // 255 + 1 if lit >= 15 else 0
        mvx = max(mv - 15, 0)
        e0m = mvx // 255 + 1 if mv >= 15 else 0
        return 1 + e0l + lit + (0 if tail else 2 + e0m)

    def emit_extra_rounds(lit, mlen):
        """Rounds beyond the cascaded hit round."""
        mv = mlen - MINMATCH if mlen else 0
        tail = mlen == 0
        if lit < 15 and (tail or mv < 15):
            return 0  # fused into the hit round
        litx = max(lit - 15, 0)
        e0l = litx // 255 + 1 if lit >= 15 else 0
        r = 1  # TOK round (not cascaded with hit? it is - ph cascades)
        left = max(e0l - 7, 0)
        r += -(-left // CB) if left else 0
        r += -(-lit // CB) if lit else 0
        mvx = max(mv - 15, 0)
        e0m = mvx // 255 + 1 if mv >= 15 else 0
        if not tail:
            r += 1
            leftm = max(e0m - 6, 0)
            r += -(-leftm // CB) if leftm else 0
        return r - 1  # TOK cascades into the hit round

    while True:
        if cur + 12 > n:
            out += emit_bytes(n - anchor, 0)
            rounds += 1 + emit_extra_rounds(n - anchor, 0)
            break
        rounds += 1  # search round (hit cascades extend+emit into it)
        qs = []
        m = miss
        q = cur
        span_cap = 8 * 4 - 8 if probes > 1 else 4
        for j in range(probes):
            if q + 12 > n or q - cur > span_cap:
                break
            qs.append(q)
            q += m >> SKIP_TRIGGER
            m += 1
        hit = None
        for qj in qs:
            c = probe(qj)
            if hit is None and c is not None:
                hit = (qj, c)
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
        first = True
        while True:
            if not first:
                rounds += 1  # extend continuation rounds
            first = False
            avail = min(limit - (mstart + mlen), CB)
            lcp = 0
            while lcp < avail and data[mstart + mlen + lcp] == data[mc + mlen + lcp]:
                lcp += 1
            mlen += lcp
            if lcp < CB or avail < CB:
                break
        if mlen < MINMATCH:
            cur = mstart + 1
            miss += 1
            continue
        if backtrack:
            bt = 0
            while (
                bt < CB and mstart - bt > anchor and mc - bt > 0
                and data[mstart - bt - 1] == data[mc - bt - 1]
            ):
                bt += 1
            mstart -= bt
            mc -= bt
            mlen += bt
        out += emit_bytes(mstart - anchor, mlen)
        rounds += emit_extra_rounds(mstart - anchor, mlen)
        cur = mstart + mlen
        anchor = cur
        if cursor2:
            if cur - 2 > 0 and cur + 10 <= n:
                insert(cur - 2)
        miss = 1 << SKIP_TRIGGER
    return rounds, out


def main():
    data = make_corpus(8.0)
    blk = 32 << 10
    blocks = [data[i : i + blk] for i in range(0, len(data), blk)][:128]
    total = sum(len(b) for b in blocks)

    # reference greedy ratio on this corpus (native C-sized table)
    from lz4tpu.native import compress_block
    from lz4tpu.spec.table import U32Table

    ref = sum(len(bytes(compress_block(b, 0, U32Table()))) for b in blocks)
    print(f"reference greedy ratio: {ref/total:.4f}")

    configs = [
        ("hl12 1way P4 (default)", 12, 4, 1, False),
        ("hl12 1way P4 + cur2", 12, 4, 1, True),
        ("hl11 1way P4 + cur2", 11, 4, 1, True),
        ("hl10 2way P4", 10, 4, 2, False),
        ("hl10 2way P4 + cur2", 10, 4, 2, True),
        ("hl11 2way P4 + cur2", 11, 4, 2, True),
        ("hl9 4way P4 + cur2", 9, 4, 4, True),
        ("hl10 2way P8 + cur2", 10, 8, 2, True),
    ]
    # cost calibration: wall = rmax * (base + slabscan * slabs_equiv)
    # measured: hl10 140.3, hl11 126.9, hl12 99.1 MB/s (1-way, P4, bt)
    results = {}
    for name, hl, p, ways, c2 in configs:
        rr = [sim_block(b, hl, p, ways, c2) for b in blocks]
        rmax = max(r for r, _ in rr)
        rmean = int(np.mean([r for r, _ in rr]))
        out = sum(o for _, o in rr)
        results[name] = (rmax, rmean, out / total, hl, p, ways)
        print(f"{name}: ratio={out/total:.4f} rounds max={rmax} mean={rmean}")

    # calibrate base & per-slab-scan cost from measured 1-way points
    m = {10: 140.3, 11: 126.9, 12: 99.1}
    t4 = 4 << 20
    walls = {hl: t4 / (v * 1e6) for hl, v in m.items()}  # seconds
    r10 = results["hl10 2way P4"][0]  # ~same rounds across hl (approx)
    # use sim rmax per hl from the 1-way entries where present
    def rmax_of(hl):
        for name, (rmax, _, _, h, p, w) in results.items():
            if h == hl and w == 1 and p == 4:
                return rmax
        return r10
    import numpy as _np
    A, y = [], []
    for hl in (11, 12):
        rm = rmax_of(hl)
        A.append([rm, rm * (1 << hl) // 8])
        y.append(walls[hl])
    # 2 eq, 2 unknowns
    (a1, b1), (a2, b2) = A
    det = a1 * b2 - a2 * b1
    base = (y[0] * b2 - y[1] * b1) / det
    slab = (a1 * y[1] - a2 * y[0]) / det
    print(f"calibrated: base={base*1e6:.2f}us/round, slab-scan={slab*1e9:.2f}ns/slab")
    for name, (rmax, rmean, ratio, hl, p, ways) in results.items():
        slabs = (1 << hl) // 8 * ways * (1 if p <= 4 else 1.6)
        wall = rmax * (base + slab * slabs)
        ok = "<=REF" if ratio <= ref / total else "OVER"
        print(f"{name}: projected {t4/wall/1e6:.0f} MB/s ratio={ratio:.4f} {ok}")


if __name__ == "__main__":
    main()


def sim_stride(data: bytes, hashlog: int, probes: int, stride: int,
               bt_cap: int = 32):
    """Probe every `stride`-th position (P probes/round => P*stride
    positions covered), insert ALL positions, recover missed match starts
    via bounded backward extension."""
    n = len(data)
    t_rows = 1 << hashlog
    table = [-1] * t_rows
    tablew = [0] * t_rows
    mv32 = (1 << 32) - 1

    def word(p):
        return int.from_bytes(data[p : p + 4], "little")

    def h(v):
        return ((v * HASH_MUL) & mv32) >> (32 - hashlog)

    def insert(p):
        v = word(p)
        hj = h(v)
        table[hj], tablew[hj] = p, v

    rounds = 0
    out = 0
    cur = anchor = 0
    miss = 1 << SKIP_TRIGGER

    def emit_bytes(lit, mlen):
        mv = mlen - MINMATCH if mlen else 0
        tail = mlen == 0
        litx = max(lit - 15, 0)
        e0l = litx // 255 + 1 if lit >= 15 else 0
        mvx = max(mv - 15, 0)
        e0m = mvx // 255 + 1 if mv >= 15 else 0
        return 1 + e0l + lit + (0 if tail else 2 + e0m)

    def emit_extra_rounds(lit, mlen):
        mv = mlen - MINMATCH if mlen else 0
        tail = mlen == 0
        if lit < 15 and (tail or mv < 15):
            return 0
        litx = max(lit - 15, 0)
        e0l = litx // 255 + 1 if lit >= 15 else 0
        r = 1
        left = max(e0l - 7, 0)
        r += -(-left // CB) if left else 0
        r += -(-lit // CB) if lit else 0
        mvx = max(mv - 15, 0)
        e0m = mvx // 255 + 1 if mv >= 15 else 0
        if not tail:
            r += 1
            leftm = max(e0m - 6, 0)
            r += -(-leftm // CB) if leftm else 0
        return r - 1

    while True:
        if cur + 12 > n:
            out += emit_bytes(n - anchor, 0)
            rounds += 1 + emit_extra_rounds(n - anchor, 0)
            break
        rounds += 1
        # probe schedule: stride*step walk; insert every position covered
        qs = []
        m = miss
        q = cur
        span_cap = 8 * 4 - 8
        for j in range(probes):
            if q + 12 > n or q - cur > span_cap:
                break
            qs.append(q)
            q += stride * max(m >> SKIP_TRIGGER, 1)
            m += 1
        hit = None
        hi_ins = min(q, n - 12 + 1)
        for p in range(cur, hi_ins):  # insert-all over the covered span
            pass  # inserts interleave with probes below (order matters)
        for qj in qs:
            # insert positions in [prev, qj) then probe qj (probe sees
            # candidates strictly before it)
            pass
        prev = cur
        for qj in qs:
            for p in range(prev, qj):
                if p + 12 <= n:
                    insert(p)
            prev = qj
            v = word(qj)
            hj = h(v)
            cand, candw = table[hj], tablew[hj]
            if p := 1:  # insert qj itself after probing
                pass
            if hit is None and 0 <= cand < qj and qj - cand <= 0xFFFF and candw == v:
                hit = (qj, cand)
            insert(qj)
        for p in range(prev + 1, hi_ins):
            if p + 12 <= n:
                insert(p)
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
        first = True
        while True:
            if not first:
                rounds += 1
            first = False
            avail = min(limit - (mstart + mlen), CB)
            lcp = 0
            while lcp < avail and data[mstart + mlen + lcp] == data[mc + mlen + lcp]:
                lcp += 1
            mlen += lcp
            if lcp < CB or avail < CB:
                break
        if mlen < MINMATCH:
            cur = mstart + 1
            miss += 1
            continue
        bt = 0
        while (
            bt < bt_cap and mstart - bt > anchor and mc - bt > 0
            and data[mstart - bt - 1] == data[mc - bt - 1]
        ):
            bt += 1
        mstart -= bt
        mc -= bt
        mlen += bt
        out += emit_bytes(mstart - anchor, mlen)
        rounds += emit_extra_rounds(mstart - anchor, mlen)
        cur = mstart + mlen
        anchor = cur
        miss = 1 << SKIP_TRIGGER
    return rounds, out


def main_stride():
    data = make_corpus(8.0)
    blk = 32 << 10
    blocks = [data[i : i + blk] for i in range(0, len(data), blk)][:128]
    total = sum(len(b) for b in blocks)
    from lz4tpu.native import compress_block
    from lz4tpu.spec.table import U32Table
    ref = sum(len(bytes(compress_block(b, 0, U32Table()))) for b in blocks)
    print(f"reference greedy ratio: {ref/total:.4f}")
    import numpy as np
    for name, hl, p, s in [
        ("hl12 P4 s1", 12, 4, 1),
        ("hl12 P4 s2", 12, 4, 2),
        ("hl12 P4 s3", 12, 4, 3),
        ("hl12 P4 s4", 12, 4, 4),
        ("hl12 P6 s2", 12, 6, 2),
        ("hl12 P8 s2-cleanins", 12, 8, 2),
    ]:
        rr = [sim_stride(b, hl, p, s) for b in blocks]
        rmax = max(r for r, _ in rr)
        out = sum(o for _, o in rr)
        ok = "<=REF" if out <= ref else "OVER"
        print(f"{name}: ratio={out/total:.4f} {ok} rounds max={rmax} "
              f"mean={int(np.mean([r for r,_ in rr]))}")


if __name__ == "__main__" and "--stride" in sys.argv:
    main_stride()
