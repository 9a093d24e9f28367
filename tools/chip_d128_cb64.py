"""Calibrate the CB=64 decode128 variant on chip: time the sparsest
128-block batch of the 32 MiB bench corpus (the batch the scheduler
would route to the widest chunks) and derive its per-round cost for
parallel/sched.py's ROUND_COST table."""

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"),
)

import numpy as np  # noqa: E402

from bench import BLOCK, make_corpus  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from lz4tpu.hostpack import pack_words_le
    from lz4tpu.kernels import decode128 as d128
    from lz4tpu.native import compress_block
    from lz4tpu.parallel import sched
    from lz4tpu.spec.table import U32Table

    cb = int(os.environ.get("D128_CB", "64"))
    mod = d128.load_variant(cb)
    data = make_corpus(32.0)
    blocks = [data[i : i + BLOCK] for i in range(0, len(data), BLOCK)]
    comp = [bytes(compress_block(b, 0, U32Table())) for b in blocks]
    rounds = sched.model_rounds(comp, cb, BLOCK)
    order = np.argsort(rounds, kind="stable")  # sparsest first
    idx = order[:128]
    print(
        f"CB={cb}: batch model rounds max {rounds[idx].max()} "
        f"p50 {int(np.percentile(rounds[idx], 50))}", flush=True,
    )
    bc = [comp[i] for i in idx]
    sub = [blocks[i] for i in idx]

    out = mod.decompress_blocks_128(bc, block_maxsize=BLOCK)
    assert out == sub, "variant decode mismatch"
    print("wrapper bit-exact 128/128", flush=True)

    maxlen = max(len(c) for c in bc)
    rw, ro, _ = mod.buffer_rows(maxlen, BLOCK)
    mr = mod.round_bound(maxlen, BLOCK)
    arr = np.zeros((128, rw * 4), np.uint8)
    n1 = np.zeros((1, 128), np.int32)
    for j, c in enumerate(bc):
        arr[j, : len(c)] = np.frombuffer(c, np.uint8)
        n1[0, j] = len(c)
    d_w = jnp.asarray(pack_words_le(arr))
    d_n = jnp.asarray(n1)

    @jax.jit
    def chain(w):
        _, ol, st = mod._decode128_jit(
            w, d_n, rw=rw, ro=ro, max_rounds=mr, output_limit=BLOCK
        )
        return w ^ (st.sum() * 0), ol, st

    t0 = time.perf_counter()
    _, ol, st = chain(d_w)
    olh = np.asarray(ol)
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    sth = np.asarray(st)[0]
    assert (sth == 0).all(), f"statuses {np.unique(sth)}"
    rounds_max = int(olh[2].max())
    total = sum(len(b) for b in sub)
    best = 0.0
    for _ in range(3):
        a = d_w
        t0 = time.perf_counter()
        for _ in range(4):
            a, ol, st = chain(a)
        np.asarray(ol[:1])
        best = max(best, total / ((time.perf_counter() - t0) / 4))
    per_round = total / best / rounds_max
    print(
        f"RESULT cb{cb}_mbps={best/1e6:.1f} rounds_max={rounds_max} "
        f"cost_per_round={per_round*1e6:.2f}us "
        f"(model rounds_max {rounds[idx].max()})", flush=True,
    )


if __name__ == "__main__":
    main()
