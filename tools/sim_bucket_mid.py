"""Model study (round 5): per-batch rw buckets x mid size on the sched
walls — Silesia-eligible + 64 MiB mixed corpora.

The wall of a batch is max(model rounds at the batch's geometry) x
ROUND_COST[cb].  rw buckets change geometry two ways the kernel already
implements: refill scans shrink (not modeled here — cost side) and
pick_mid_w may grant a mid mirror (modeled: mid_bytes feeds the native
round machine).  This script answers: which bucket boundaries / MID_CAP
would reduce the SUM of batch walls, before paying any chip compiles.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import BLOCK, make_corpus
from lz4tpu.kernels import decode128 as d128
from lz4tpu.native import compress_block, model_decode_rounds
from lz4tpu.parallel import sched
from lz4tpu.spec.table import U32Table

LANES = 128


def corpus_silesia():
    from lz4tpu.utils import silesia

    data = b"".join(silesia.corpus(1.0).values())
    blocks = [data[i : i + BLOCK] for i in range(0, len(data), BLOCK)]
    comp = [bytes(compress_block(b, 0, U32Table())) for b in blocks]
    lens = np.array([len(b) for b in blocks])
    clens = np.array([len(c) for c in comp])
    stored = clens >= lens
    elig = (~stored) & (clens <= 60448)
    return (
        [b for b, e in zip(blocks, elig) if e],
        [c for c, e in zip(comp, elig) if e],
    )


def corpus_mixed():
    data = make_corpus(64.0)
    blocks = [data[i : i + BLOCK] for i in range(0, len(data), BLOCK)]
    comp = [bytes(compress_block(b, 0, U32Table())) for b in blocks]
    return blocks, comp


def mid_for(mod, mlen, mid_cap):
    rw, ro, _ = mod.buffer_rows(mlen, BLOCK)
    base = rw + ro + mod.PAGE_W + mod.FAR_W + mod.RING_W + mod.NSTATE
    w = min(mid_cap, max(mod.VMEM_ROWSUM_BUDGET // (LANES * 4) - base, 0))
    w = (w // mod.RING_W) * mod.RING_W
    return max(w * 4 - 4, 0)


def study(blocks, comp, buckets, mid_cap, plan, repick_cb=False):
    """Sum of batch walls (s) for a fixed plan under bucket/mid geometry.
    ``repick_cb``: re-choose each batch's chunk size by its bucket-mid
    modeled wall instead of keeping the plan's global-geometry pick."""
    total = sum(len(b) for b in blocks)
    wall = 0.0
    cache = {}
    counts = {}

    def rounds(i, cb, midb):
        key = (i, cb, midb)
        if key not in cache:
            mod = d128.load_variant(cb)
            cache[key] = model_decode_rounds(
                comp[i], cb=cb, flush_thresh=mod.FLUSH_THRESH,
                flush_b=mod.FLUSH_B, far_g_bytes=mod.FAR_G * 4,
                mid_bytes=midb,
            )
        return cache[key]

    for idx, cb in plan:
        batch_maxlen = max(len(comp[i]) for i in idx)
        mlen = next(b for b in buckets if b >= batch_maxlen)
        if repick_cb:
            walls = {}
            for c in sched.CBS:
                midb = mid_for(d128.load_variant(c), mlen, mid_cap)
                walls[c] = (
                    max(rounds(i, c, midb) for i in idx)
                    * sched.ROUND_COST[c]
                )
            cb = min(walls, key=walls.get)
        mod = d128.load_variant(cb)
        midb = mid_for(mod, mlen, mid_cap)
        counts[(mlen, midb, cb)] = counts.get((mlen, midb, cb), 0) + 1
        rmax = max(rounds(i, cb, midb) for i in idx)
        wall += rmax * sched.ROUND_COST[cb]
    return total / wall / 1e6, counts


def main():
    for name, (blocks, comp) in (
        ("silesia", corpus_silesia()),
        ("mixed64", corpus_mixed()),
    ):
        maxlen = max(len(c) for c in comp)
        plan = sched.plan_batches(comp, BLOCK)
        print(f"== {name}: {len(blocks)} blocks, maxlen {maxlen}, "
              f"{len(plan)} batches")
        base_buckets = [32768, max(maxlen, 60448)]
        for label, buckets, cap in (
            ("current  [32k,top] cap512", base_buckets, 512),
            ("cap1024  [32k,top]", base_buckets, 1024),
            ("3bkt     [32k,48k,top] cap512",
             [32768, 49152, max(maxlen, 60448)], 512),
            ("3bkt cap1024", [32768, 49152, max(maxlen, 60448)], 1024),
            ("4bkt     [32k,44k,52k,top] cap512",
             [32768, 45056, 53248, max(maxlen, 60448)], 512),
            ("4bkt cap1024",
             [32768, 45056, 53248, max(maxlen, 60448)], 1024),
            ("4bkt cap2048",
             [32768, 45056, 53248, max(maxlen, 60448)], 2048),
            ("3bkt cap1024 repick",
             [32768, 49152, max(maxlen, 60448)], 1024),
        ):
            mbps, counts = study(blocks, comp, buckets, cap, plan,
                                 repick_cb=label.endswith("repick"))
            cdesc = " ".join(
                f"{k[0]//1024}k/mid{(k[1]+4)//4}/cb{k[2]}x{v}"
                for k, v in sorted(counts.items())
            )
            print(f"  {label:32s} model {mbps:7.1f} MB/s  [{cdesc}]")


if __name__ == "__main__":
    main()
