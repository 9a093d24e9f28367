"""Phase timing of the compressbig end-to-end path (round 5).

Replicates compress_frame_parallel's lane section for the 32 MiB /
4 MiB-block shape with wall-clock stamps per phase: flat upload, per
windowed batch (prime, dispatch, collect), head batch, splice+assembly —
to find where the 6.2 s (5.2 MB/s) wall actually goes.
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

from bench import make_corpus


def main():
    import jax.numpy as jnp

    from lz4tpu.hostpack import to_device_chunked
    from lz4tpu.kernels import compress128 as c128
    from lz4tpu.kernels.compress128 import (
        collect_compress_128, dispatch_compress_128,
        dispatch_compress_windowed,
    )
    from lz4tpu.parallel.pipeline import plan_lane_compress_batches

    data = make_corpus(32.0)
    block_size = 4 << 20
    # mirror compress_frame_parallel's eligibility shrink: [window|chunk]
    # must fit the lane VMEM budget
    chunk = c128.MAX_B
    while chunk > 2048 and not c128.lanes_eligible(chunk, 1 << 16):
        chunk //= 2
    print("chunk", chunk)
    cpb = block_size // chunk
    k = (1 << 16) // chunk
    n_blocks = len(data) // chunk
    lens = np.full(n_blocks, chunk, np.int64)

    t0 = time.perf_counter()
    arr = np.frombuffer(data, np.uint8).reshape(n_blocks, chunk)
    rows = (-(-n_blocks // 128)) * 128 + 128
    flat = np.concatenate(
        [arr, np.zeros((rows - n_blocks, chunk), np.uint8)]
    )
    t_pack = time.perf_counter() - t0

    t0 = time.perf_counter()
    flat_dev = to_device_chunked(flat)
    flat_dev.block_until_ready()
    t_upload = time.perf_counter() - t0

    plan = plan_lane_compress_batches(n_blocks, cpb, k, False)
    raw_blocks = [data[i * chunk : (i + 1) * chunk] for i in range(n_blocks)]
    dtail = b""
    lane_prefixes = [
        (dtail + data[(i // cpb) * cpb * chunk : i * chunk])[-65536:]
        for i in range(n_blocks)
    ]

    t_dispatch = t_collect = 0.0
    payloads = [None] * n_blocks
    handles = []
    # serialize phases for attribution (the real path pipelines)
    for item in plan:
        t0 = time.perf_counter()
        if item[0] == "w":
            _, s, nb = item
            idxs = list(range(s, s + nb))
            h = dispatch_compress_windowed(
                flat_dev, data, s, nb, lens, chunk=chunk, window=1 << 16
            )
        else:
            idxs = item[1]
            h = dispatch_compress_128(
                [raw_blocks[i] for i in idxs],
                prefixes=[lane_prefixes[i] for i in idxs],
            )
        t_dispatch += time.perf_counter() - t0
        handles.append((item[0], idxs, h))
    t0 = time.perf_counter()
    for kind, idxs, h in handles:
        tc = time.perf_counter()
        for i, p in zip(idxs, collect_compress_128(h)):
            payloads[i] = p
        print(f"  collect {kind} x{len(idxs)}: {time.perf_counter()-tc:.3f}s")
    t_collect = time.perf_counter() - t0

    t0 = time.perf_counter()
    from lz4tpu.native import splice_streams

    parts = []
    for ob in range(0, n_blocks, cpb):
        parts.append(splice_streams(payloads[ob : ob + cpb]))
    t_splice = time.perf_counter() - t0

    total = t_pack + t_upload + t_dispatch + t_collect + t_splice
    print(f"pack {t_pack:.3f}s upload {t_upload:.3f}s dispatch {t_dispatch:.3f}s "
          f"collect {t_collect:.3f}s splice {t_splice:.3f}s  total {total:.3f}s "
          f"-> {len(data)/total/1e6:.1f} MB/s serialized")
    print(f"compressed {sum(map(len, parts))/len(data):.4f} ratio")


if __name__ == "__main__":
    main()
