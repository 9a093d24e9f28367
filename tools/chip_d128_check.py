"""On-chip check of decode128 with the re-entrant LSIC parse: bit-exact
wrapper roundtrip, per-lane status histogram (expect ZERO fallback
lanes), and the chained timing protocol.  Usage: python tools/chip_d128_check.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import BLOCK, make_corpus  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from lz4tpu.kernels import decode128 as d128
    from lz4tpu.native import compress_block
    from lz4tpu.spec.table import U32Table

    print("backend:", jax.default_backend(), flush=True)
    data = make_corpus(8.0)
    blocks = [data[i : i + BLOCK] for i in range(0, len(data), BLOCK)][:128]
    comp = [compress_block(b, 0, U32Table()) for b in blocks]
    maxlen = max(len(b) for b in comp)
    rw, ro, _pr = d128.buffer_rows(maxlen, BLOCK)
    max_rounds = d128.round_bound(maxlen, BLOCK)
    print(f"blocks={len(blocks)} maxlen={maxlen} rw={rw} ro={ro} "
          f"max_rounds={max_rounds}", flush=True)

    arr = np.zeros((128, rw * 4), np.uint8)
    n = np.zeros((1, 128), np.int32)
    for i, b in enumerate(comp):
        arr[i, : len(b)] = np.frombuffer(b, np.uint8)
        n[0, i] = len(b)
    w = arr.reshape(128, rw, 4).astype(np.uint32)
    words = (
        w[:, :, 0] | (w[:, :, 1] << 8) | (w[:, :, 2] << 16) | (w[:, :, 3] << 24)
    ).astype(np.int32).T
    d_words = jnp.asarray(np.ascontiguousarray(words))
    d_n = jnp.asarray(n)

    t0 = time.time()
    out_w, out_len, status = d128._decode128_jit(
        d_words, d_n, rw=rw, ro=ro, max_rounds=max_rounds, output_limit=BLOCK
    )
    out_w = np.asarray(out_w)
    out_len3 = np.asarray(out_len)
    status = np.asarray(status)[0]
    print(f"compile+run: {time.time()-t0:.1f}s", flush=True)
    uniq, cnt = np.unique(status, return_counts=True)
    print("status histogram:", dict(zip(uniq.tolist(), cnt.tolist())), flush=True)
    print("rounds run:", out_len3[2].max(), "done-at p50/p90/max:",
          np.percentile(out_len3[1], 50), np.percentile(out_len3[1], 90),
          out_len3[1].max(), flush=True)

    ok = 0
    for i, b in enumerate(blocks):
        ww = out_w[:, i].astype(np.uint32)
        by = np.empty((ro, 4), np.uint8)
        by[:, 0] = ww & 0xFF
        by[:, 1] = (ww >> 8) & 0xFF
        by[:, 2] = (ww >> 16) & 0xFF
        by[:, 3] = (ww >> 24) & 0xFF
        got = by.reshape(-1)[: out_len3[0][i]].tobytes()
        if got == b:
            ok += 1
        elif ok == i:
            print(f"lane {i}: MISMATCH len {len(got)} vs {len(b)}", flush=True)
    print(f"bit-exact: {ok}/{len(blocks)}", flush=True)
    assert (status == 0).all(), "non-OK lanes"
    assert ok == len(blocks)

    @jax.jit
    def chain(wds):
        _, ol, st = d128._decode128_jit(
            wds, d_n, rw=rw, ro=ro, max_rounds=max_rounds, output_limit=BLOCK
        )
        return wds ^ (st.sum() * 0), ol

    _, ol = chain(d_words)
    np.asarray(ol)
    stot = sum(len(b) for b in blocks)
    best = 0.0
    for _ in range(3):
        a = d_words
        t0 = time.perf_counter()
        for _ in range(4):
            a, ol = chain(a)
        np.asarray(ol[:1])
        best = max(best, stot / ((time.perf_counter() - t0) / 4))
    print(f"decode128 re-entrant: {best/1e6:.1f} MB/s", flush=True)


if __name__ == "__main__":
    main()
