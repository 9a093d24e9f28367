"""Per-round component costs of compress128 via TIMING variants.

Uses TIMING="fixed,..." so every variant runs exactly the same number of
(predicated, full-price) rounds — output is wrong, deltas are clean.
Each variant needs its own process (TIMING is read at import), so this
script re-execs itself per variant.
"""

import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, ".")

VARIANTS = [
    "", "nosweep", "noinsert", "noplace", "noflush", "noextend",
    "noprobeword", "nolit",
]
ROUNDS = 4096


def run_one(variant):
    import jax
    import jax.numpy as jnp

    from bench import make_corpus
    from lz4tpu.kernels import compress128 as c128

    data = make_corpus(8.0)
    blk = int(os.environ.get("C128_BLK", str(c128.MAX_B)))
    blocks = [data[i : i + blk] for i in range(0, len(data), blk)][:128]
    maxlen = max(len(b) for b in blocks)
    ri = -(-maxlen // 4)
    ri = -(-ri // c128.GROUP_W) * c128.GROUP_W + c128.PAGE_W
    maxout = maxlen + maxlen // 255 + 16
    ro = (-(-maxout // 4) // c128.RING_W + 2) * c128.RING_W
    arr = np.zeros((c128.LANES, ri * 4), np.uint8)
    n = np.zeros((1, c128.LANES), np.int32)
    for i, b in enumerate(blocks):
        arr[i, : len(b)] = np.frombuffer(b, np.uint8)
        n[0, i] = len(b)
    w = arr.reshape(c128.LANES, ri, 4).astype(np.uint32)
    words = (
        w[:, :, 0] | (w[:, :, 1] << 8) | (w[:, :, 2] << 16) | (w[:, :, 3] << 24)
    ).astype(np.int32).T
    d_words = jnp.asarray(np.ascontiguousarray(words))
    d_n = jnp.asarray(n)

    @jax.jit
    def chain(wds):
        _, ol = c128._compress128_jit(
            wds, d_n, ri=ri, ro=ro, max_rounds=ROUNDS, hashlog=c128.HASHLOG
        )
        return wds ^ (ol.sum() * 0), ol

    _, ol = chain(d_words)
    np.asarray(ol)
    best = 1e9
    for _ in range(3):
        a = d_words
        t0 = time.perf_counter()
        for _ in range(4):
            a, ol = chain(a)
        np.asarray(ol[:1])
        best = min(best, (time.perf_counter() - t0) / 4)
    print(f"RESULT {variant or 'full'} {best*1e3:.2f} ms "
          f"({best/ROUNDS*1e9:.0f} ns/round)", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        run_one(sys.argv[1].replace("fixed,", "").replace("fixed", ""))
    else:
        for v in VARIANTS:
            env = dict(os.environ)
            env["LZ4TPU_C128_TIMING"] = ("fixed," + v) if v else "fixed"
            subprocess.run(
                [sys.executable, __file__, "fixed," + v], env=env, check=False
            )
