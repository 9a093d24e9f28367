"""Experiment: decodebig as the 64 KiB-block engine (round 5).

decode128 keeps comp+output fully in VMEM; at the headline batch shape
(60 KB comp / 64 KiB out per lane) that exhausts the ~16 MB VMEM budget,
so pick_mid_w = 0 — the mid mirror (model: ~8-10% fewer rounds) never
runs, and the refill one-hot scans all ~15K comp rows (~21% of the
round).  decodebig stages comp in HBM: at bb = 64 KiB with a full-block
output band (never advances; window reach = whole block) the row sum is
~22K rows ≈ 11 MB — freeing ~5 MB for mid/geometry — and refills scan a
3K-row comp band instead.

This script measures decodebig at 128 x 64 KiB on the standard 8 MiB
bench corpus vs decode128's same-shape number, chained protocol.
Usage: python tools/chip_dbig64.py [oband] [cband]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

from bench import make_corpus, BLOCK


def main():
    import jax
    import jax.numpy as jnp

    import lz4tpu.kernels.decodebig as dbig
    from lz4tpu.hostpack import pack_words_le
    from lz4tpu.native import compress_block, repack_window_into, repack_window_lens
    from lz4tpu.spec.table import U32Table

    oband = int(sys.argv[1]) if len(sys.argv) > 1 else 18432
    cband = int(sys.argv[2]) if len(sys.argv) > 2 else 3072
    assert oband % dbig.OHALF == 0 and oband % dbig.RING_W == 0
    bb = BLOCK

    data = make_corpus(8.0)
    blocks = [data[i : i + bb] for i in range(0, len(data), bb)][:128]
    comp = [bytes(compress_block(b, 0, U32Table())) for b in blocks]

    # correctness through the wrapper first
    outs = dbig.decompress_blocks_big(
        comp, block_maxsize=bb, _oband=oband, _cband=cband
    )
    assert outs == blocks, "decodebig 64KiB mismatch"
    print("wrapper roundtrip ok")

    # chained timing on the window-aligned layout (mirrors bench_tpu_decodebig)
    chunk_lens = [repack_window_lens(c, bb, dbig.WS_LOG) for c in comp]
    maxchunk = max(int(cl.max()) for cl, _ in chunk_lens)
    win_r = -(-(maxchunk + 16) // 512) * 512
    lens = [(len(cl) - 1) * win_r + int(cl[-1]) for cl, _ in chunk_lens]
    maxlen = max(lens)
    rw = -(-maxlen // 4)
    rw_pad = -(-rw // dbig.CHALF) * dbig.CHALF + cband + dbig.CHALF
    ro_pad = -(-bb // 4 // dbig.OHALF) * dbig.OHALF + oband + dbig.OHALF
    mr = dbig.round_bound(maxlen, bb)
    arr = np.zeros((128, rw_pad * 4), np.uint8)
    n = np.zeros((1, 128), np.int32)
    for i, c in enumerate(comp):
        repack_window_into(c, bb, dbig.WS_LOG, win_r, arr[i])
        n[0, i] = lens[i]
    d_words = jnp.asarray(pack_words_le(arr))
    d_n = jnp.asarray(n)

    @jax.jit
    def chain(wds):
        _, ol, st = dbig._decodebig_jit(
            wds, d_n, oband=oband, cband=cband, rw_pad=rw_pad,
            ro_pad=ro_pad, max_rounds=mr, output_limit=bb,
            win_r=win_r, ws_log=dbig.WS_LOG,
        )
        return wds ^ (st.sum() * 0), ol, st

    _, ol, st = chain(d_words)
    ol_h = np.asarray(ol)
    st_h = np.asarray(st)[0][: len(blocks)]
    in_kernel = int((st_h == 0).sum())
    rounds = ol_h[2]
    print(f"in-kernel {in_kernel}/128, rounds max {int(rounds.max())} "
          f"p50 {int(np.percentile(rounds[:len(blocks)], 50))}")
    total = sum(len(b) for b in blocks)
    m = 2
    best = 0.0
    for _ in range(3):
        a = d_words
        t0 = time.perf_counter()
        for _ in range(m):
            a, ol, st_ = chain(a)
        np.asarray(ol[:1])
        best = max(best, total / ((time.perf_counter() - t0) / m))
    print(f"decodebig@64KiB oband={oband} cband={cband}: "
          f"{best/1e6:.1f} MB/s (decode128 same shape ~= 395)")


if __name__ == "__main__":
    main()
