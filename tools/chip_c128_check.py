"""On-chip compress128 check: roundtrip via native decode, ratio, and
chained timing.  Respects the LZ4TPU_C128_* env knobs."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import make_corpus  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from lz4tpu.kernels import compress128 as c128
    from lz4tpu.native import decompress_block as native_decompress

    print("backend:", jax.default_backend(),
          f"hashlog={c128.HASHLOG} probes={c128.PROBES}", flush=True)
    import os
    data = make_corpus(8.0)
    blk = int(os.environ.get("C128_BLK", str(c128.MAX_B)))
    blocks = [data[i : i + blk] for i in range(0, len(data), blk)][:128]
    comp = c128.compress_blocks_128(blocks)
    for b, c in zip(blocks, comp):
        assert bytes(native_decompress(c, b"", output_limit=blk)) == b
    total = sum(len(b) for b in blocks)
    ratio = sum(len(c) for c in comp) / total
    print(f"roundtrip ok  ratio={ratio:.4f}", flush=True)
    if c128.STRICT:
        from lz4tpu.native import compress_block as native_compress
        from lz4tpu.spec.table import U32Table

        parity = sum(
            1 for b, c in zip(blocks, comp)
            if c == bytes(native_compress(b, 0, U32Table()))
        )
        print(f"STRICT parity: {parity}/{len(blocks)}", flush=True)
        assert parity == len(blocks)

    maxlen = max(len(b) for b in blocks)
    ri = -(-maxlen // 4)
    ri = -(-ri // c128.GROUP_W) * c128.GROUP_W + c128.PAGE_W
    maxout = maxlen + maxlen // 255 + 16
    ro = (-(-maxout // 4) // c128.RING_W + 2) * c128.RING_W
    max_rounds = maxlen + maxout // c128.CB + maxlen // c128.CB + 256
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
            wds, d_n, ri=ri, ro=ro, max_rounds=max_rounds, hashlog=c128.HASHLOG
        )
        return wds ^ (ol.sum() * 0), ol

    _, ol = chain(d_words)
    np.asarray(ol)
    best = 0.0
    for _ in range(3):
        a = d_words
        t0 = time.perf_counter()
        for _ in range(4):
            a, ol = chain(a)
        np.asarray(ol[:1])
        best = max(best, total / ((time.perf_counter() - t0) / 4))
    print(f"compress128: {best/1e6:.1f} MB/s  ratio={ratio:.4f}", flush=True)


if __name__ == "__main__":
    main()
