"""Byte-parity validation of the STRICT lane-compressor flow.

Simulates compress128's strict mode round-for-round decisions (K probes
per round against the 5-byte reference hash, tag-gated with 4-byte-word
tags, insert suppression after the first tag hit, exact false-hit
resume, candidate-0 empty-slot quirk, unbounded backtrack, cursor-2
reinsert, step-lag tail bail) and asserts byte equality with the spec
oracle on mixed corpora.  Green here means the kernel translation is
mechanical; divergence pinpoints the failing rule cheaply.
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from lz4tpu.spec.block import compress_block
from lz4tpu.spec.table import HASH64_MUL, U32Table

HASHLOG = 12
MINMATCH = 4
SKIP_TRIGGER = 6
PROBES = 4
TAG_MUL = 2654435761


def strict_compress(data: bytes, probes: int = PROBES) -> bytes:
    n = len(data)
    # table: position | tag<<17; empty slots read as position 0 with the
    # tag of the word AT position 0 (the reference's zero-init quirk:
    # an unwritten slot is a real candidate at position 0)
    def word(p):
        return int.from_bytes(data[p : p + 4], "little")

    def tag(v):
        return ((v * TAG_MUL) & 0xFFFFFFFF) >> 6 & 0x7FFF

    def h5(p):
        v = int.from_bytes(data[p : p + 8].ljust(8, b"\0"), "little")
        return ((v << 24) * HASH64_MUL >> (64 - HASHLOG)) & 0xFFF

    tag0 = tag(word(0)) if n >= 4 else 0
    table = [(0, tag0)] * (1 << HASHLOG)

    out = bytearray()
    cursor = 0
    anchor = 0

    def emit(lit_start, lit_end, offset, extra):
        tok = (min(lit_end - lit_start, 15) << 4) | min(extra, 15)
        out.append(tok)
        v = lit_end - lit_start
        if v >= 15:
            v -= 15
            out.extend(b"\xff" * (v // 255))
            out.append(v % 255)
        out.extend(data[lit_start:lit_end])
        out.extend(offset.to_bytes(2, "little"))
        v = extra
        if v >= 15:
            v -= 15
            out.extend(b"\xff" * (v // 255))
            out.append(v % 255)

    def emit_tail(lit_start):
        v = n - lit_start
        out.append(min(v, 15) << 4)
        if v >= 15:
            v -= 15
            out.extend(b"\xff" * (v // 255))
            out.append(v % 255)
        out.extend(data[lit_start:n])

    while True:
        # SEARCH "rounds": schedule up to K probes with exact step lag
        step_counter = 1 << SKIP_TRIGGER
        step = 1
        q = cursor
        found = None
        while found is None:
            # one lane round: schedule K probes
            qs = []
            steps = []
            qq, sc, st = q, step_counter, step
            bail = False
            for j in range(probes):
                if qq + st > n - 11:
                    bail = True
                    break
                qs.append(qq)
                steps.append(st)
                qq = qq + st
                if anchor + 1 != qq:
                    st = sc >> SKIP_TRIGGER
                    sc += 1
            # probe: reads against the pre-round table + earlier probes
            hit = None
            for j, pj in enumerate(qs):
                cpos, ctag = table[h5(pj)]
                # same-round earlier inserts
                for i in range(j):
                    if h5(qs[i]) == h5(pj):
                        cpos, ctag = qs[i], tag(word(qs[i]))
                ok = (
                    pj != 0
                    and pj - cpos <= 0xFFFF
                    and ctag == tag(word(pj))
                )
                if hit is None and ok:
                    hit = j
            # inserts: only probes <= hit
            lim = len(qs) if hit is None else hit + 1
            for j in range(lim):
                table[h5(qs[j])] = (qs[j], tag(word(qs[j])))
            if bail and (hit is None) and len(qs) == 0:
                emit_tail(anchor)
                return bytes(out)
            if hit is not None:
                pj = qs[hit]
                cpos, ctag = None, None
                # recompute the candidate seen (pre-insert of j..)
                # (the verify uses bytes, so just re-derive via h5 pre-state
                #  — emulate by byte compare against the accepted cpos)
                # recompute cpos as the probe saw it:
                cpos2 = None
                # rebuild: pre-round table state is gone; we tracked inserts
                # in order, so replay: the accepted cpos was captured above
                # — store it during the loop instead:
                found = ("replay", hit, qs, steps)
            elif bail:
                emit_tail(anchor)
                return bytes(out)
            else:
                q = qq
                step_counter, step = sc, st
        # --- replay properly with captured candidates -------------------
        # (restructured below for clarity)
        raise RuntimeError("unreachable")


def strict_compress2(data: bytes, probes: int = PROBES) -> bytes:
    """Cleaner restructure: same rules, candidates captured in-loop."""
    n = len(data)

    def word(p):
        return int.from_bytes(data[p : p + 4], "little")

    def tag(v):
        return ((v * TAG_MUL) & 0xFFFFFFFF) >> 6 & 0x7FFF

    def h5(p):
        v = int.from_bytes(data[p : p + 8].ljust(8, b"\0"), "little")
        return ((v << 24) * HASH64_MUL >> (64 - HASHLOG)) & 0xFFF

    tag0 = tag(word(0)) if n >= 4 else 0
    table = [(0, tag0)] * (1 << HASHLOG)
    out = bytearray()
    anchor = 0
    cursor = 0

    def lsic(v):
        b = bytearray()
        if v >= 15:
            v -= 15
            b.extend(b"\xff" * (v // 255))
            b.append(v % 255)
        return b

    while True:
        step_counter = 1 << SKIP_TRIGGER
        step = 1
        q = cursor
        match = None
        ended = False
        while match is None and not ended:
            # ---- one kernel round ----
            qs, steps = [], []
            qq, sc, st = q, step_counter, step
            for j in range(probes):
                if qq + st > n - 11:
                    break
                qs.append(qq)
                qq2 = qq + st
                if anchor + 1 != qq2:
                    st2 = sc >> SKIP_TRIGGER
                    sc2 = sc + 1
                else:
                    st2, sc2 = st, sc
                steps.append((qq2, sc2, st2))
                qq, sc, st = qq2, sc2, st2
            if not qs:
                ended = True
                break
            hit = None
            cand = None
            for j, pj in enumerate(qs):
                cpos, ctag = table[h5(pj)]
                for i in range(j):
                    if h5(qs[i]) == h5(pj):
                        cpos, ctag = qs[i], tag(word(qs[i]))
                if (
                    hit is None
                    and pj != 0
                    and pj - cpos <= 0xFFFF
                    and ctag == tag(word(pj))
                ):
                    hit, cand = j, cpos
            lim = len(qs) if hit is None else hit + 1
            for j in range(lim):
                table[h5(qs[j])] = (qs[j], tag(word(qs[j])))
            if hit is None:
                if len(qs) < probes:
                    ended = True
                else:
                    q, step_counter, step = steps[-1]
                continue
            # EXTEND verify (byte-exact; cap at n-5)
            pj = qs[hit]
            limit = n - 5
            m = 0
            while pj + m < limit and data[pj + m] == data[cand + m]:
                m += 1
            if m < MINMATCH:
                # false tag hit: resume the walk exactly where C would
                q, step_counter, step = steps[hit]
                continue
            # unbounded backtrack
            bt = 0
            while (
                bt < pj - anchor
                and cand - bt > 0
                and data[pj - bt - 1] == data[cand - bt - 1]
            ):
                bt += 1
            match = (pj, cand, m, bt)
        if ended:
            v = n - anchor
            out.append(min(v, 15) << 4)
            out.extend(lsic(v))
            out.extend(data[anchor:n])
            return bytes(out)
        pj, cand, m, bt = match
        extra = m - MINMATCH + bt
        lit_end = pj - bt
        tok = (min(lit_end - anchor, 15) << 4) | min(extra, 15)
        out.append(tok)
        out.extend(lsic(lit_end - anchor))
        out.extend(data[anchor:lit_end])
        out.extend((pj - cand).to_bytes(2, "little"))
        out.extend(lsic(extra))
        cursor = pj + m
        anchor = cursor
        if cursor - 2 > 0:
            table[h5(cursor - 2)] = (cursor - 2, tag(word(cursor - 2)))
    return bytes(out)


def main():
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tests"))
    from conftest import make_corpus_sample

    import numpy as np

    rng = np.random.default_rng(9)
    samples = [make_corpus_sample(5000 + s, 8000 + 311 * s) for s in range(8)]
    samples.append(rng.integers(0, 256, 6000, dtype=np.uint8).tobytes())
    samples.append(b"\x00" * 4000 + samples[0][:2000])
    samples.append(pathlib.Path("/usr/bin/g++").read_bytes()[:30000])
    ok = 0
    for i, d in enumerate(samples):
        ref = bytes(compress_block(d, 0, U32Table()))
        got = strict_compress2(d)
        if got == ref:
            ok += 1
        else:
            # locate first divergence
            k = next(
                (j for j in range(min(len(ref), len(got))) if ref[j] != got[j]),
                min(len(ref), len(got)),
            )
            print(f"sample {i}: DIVERGES at byte {k} (ref {len(ref)}B, got {len(got)}B)")
    print(f"byte parity: {ok}/{len(samples)}")


if __name__ == "__main__":
    main()
