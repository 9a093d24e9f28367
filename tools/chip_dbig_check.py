"""On-chip decodebig check: 1 MiB blocks decoded bit-exact via the
HBM-staged banded kernel (default bands, real 64 KiB window), plus a
chained-throughput reading.  Run with JAX_PLATFORMS unset (axon chip).
"""

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
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import make_corpus  # noqa: E402
from lz4tpu.native import compress_block  # noqa: E402
from lz4tpu.spec.table import U32Table  # noqa: E402
import lz4tpu.kernels.decodebig as dbig  # noqa: E402


def main() -> None:
    block = int(os.environ.get("DBIG_BLOCK", str(1 << 20)))
    data = make_corpus(float(os.environ.get("DBIG_MB", "8")))
    blocks = [data[i : i + block] for i in range(0, len(data), block)]
    blocks = [b for b in blocks if len(b) == block][:128]
    comp = [bytes(compress_block(b, 0, U32Table())) for b in blocks]
    total = sum(len(b) for b in blocks)
    print(f"{len(blocks)} x {block>>10} KiB blocks, comp ratio "
          f"{sum(len(c) for c in comp)/total:.4f}", flush=True)

    t0 = time.perf_counter()
    out = dbig.decompress_blocks_big(comp, block_maxsize=block)
    print(f"first call (incl. compile): {time.perf_counter()-t0:.1f}s",
          flush=True)
    exact = sum(1 for o, b in zip(out, blocks) if o == b)
    print(f"bit-exact: {exact}/{len(blocks)}", flush=True)
    assert exact == len(blocks)

    # chained throughput (fetch-forced) on the window-aligned layout
    from lz4tpu.native import repack_window_into, repack_window_lens

    chunk_lens = [repack_window_lens(c, block, dbig.WS_LOG) for c in comp]
    maxchunk = max(int(cl.max()) for cl, _ in chunk_lens)
    win_r = -(-(maxchunk + 16) // 512) * 512
    lens = [(len(cl) - 1) * win_r + int(cl[-1]) for cl, _ in chunk_lens]
    maxlen = max(lens)
    rw = -(-maxlen // 4)
    rw_pad = -(-rw // dbig.CHALF) * dbig.CHALF + dbig.CBAND + dbig.CHALF
    ro_pad = (
        -(-block // 4 // dbig.OHALF) * dbig.OHALF + dbig.OBAND + dbig.OHALF
    )
    mr = dbig.round_bound(maxlen, block)
    arr = np.zeros((len(comp), rw_pad * 4), np.uint8)
    n = np.zeros((1, 128), np.int32)
    for i, c in enumerate(comp):
        repack_window_into(c, block, dbig.WS_LOG, win_r, arr[i])
        n[0, i] = lens[i]
    if len(comp) < 128:
        arr = np.concatenate(
            [arr, np.zeros((128 - len(comp), rw_pad * 4), np.uint8)]
        )
    from lz4tpu.hostpack import pack_words_le, to_device_chunked

    d_words = to_device_chunked(pack_words_le(arr))
    d_n = jnp.asarray(n)
    print(f"repacked: win_r={win_r} maxlen={maxlen}", flush=True)

    @jax.jit
    def chain(wds):
        _, ol, st = dbig._decodebig_jit(
            wds, d_n, oband=dbig.OBAND, cband=dbig.CBAND, rw_pad=rw_pad,
            ro_pad=ro_pad, max_rounds=mr, output_limit=block,
            win_r=win_r, ws_log=dbig.WS_LOG,
        )
        return wds ^ (st.sum() * 0), ol, st

    _, ol, st = chain(d_words)
    ol = np.asarray(ol)
    st = np.asarray(st)[0]
    print(f"statuses ok={int((st[:len(blocks)]==0).sum())}/{len(blocks)} "
          f"fallback={int((st[:len(blocks)]==100).sum())} "
          f"rounds_max={int(ol[2].max())}", flush=True)
    M = 2
    best = 0.0
    for _ in range(3):
        a = d_words
        t0 = time.perf_counter()
        for _ in range(M):
            a, ol, st = chain(a)
        np.asarray(ol[:1])
        best = max(best, total / ((time.perf_counter() - t0) / M))
    print(f"RESULT dbig_mbps={best/1e6:.1f}", flush=True)


if __name__ == "__main__":
    main()
