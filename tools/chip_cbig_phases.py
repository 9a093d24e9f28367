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
    from lz4tpu.kernels.compress128 import prime_tables_batched

    t0 = time.perf_counter()
    tinit_batched = prime_tables_batched(
        data, plan, lens, chunk=chunk, window=1 << 16
    )
    print(f"batched tinit prime+upload {time.perf_counter()-t0:.3f}s",
          flush=True)
    raw_blocks = [data[i * chunk : (i + 1) * chunk] for i in range(n_blocks)]
    dtail = b""
    lane_prefixes = [
        (dtail + data[(i // cpb) * cpb * chunk : i * chunk])[-65536:]
        for i in range(n_blocks)
    ]

    # finer dispatch attribution: time prime_tables_native and the tinit
    # upload inside dispatch_compress_windowed via wrappers
    import lz4tpu.kernels.compress128 as c128m
    import lz4tpu.native as natmod

    t_sub = {"prime": 0.0, "tinit_h2d": 0.0}
    real_prime = natmod.prime_tables_native
    real_tdc = to_device_chunked

    def timed_prime(*a, **kw):
        t0 = time.perf_counter()
        r = real_prime(*a, **kw)
        t_sub["prime"] += time.perf_counter() - t0
        return r

    def timed_tdc(x, *a, **kw):
        t0 = time.perf_counter()
        r = real_tdc(x, *a, **kw)
        r.block_until_ready()
        t_sub["tinit_h2d"] += time.perf_counter() - t0
        return r

    natmod.prime_tables_native = timed_prime

    from lz4tpu.native import splice_streams

    for it in range(2):  # pass 0 = cold (compiles), pass 1 = warm
        for k_ in t_sub:
            t_sub[k_] = 0.0
        # patch the hostpack symbol the dispatcher imports lazily
        import lz4tpu.hostpack as hp

        hp.to_device_chunked = timed_tdc
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
                    flat_dev, data, s, nb, lens, chunk=chunk, window=1 << 16,
                    tinit_batched=tinit_batched,
                )
            else:
                idxs = item[1]
                h = dispatch_compress_128(
                    [raw_blocks[i] for i in idxs],
                    prefixes=[lane_prefixes[i] for i in idxs],
                )
            t_dispatch += time.perf_counter() - t0
            handles.append((item[0], idxs, h))
        hp.to_device_chunked = real_tdc
        t0 = time.perf_counter()
        for kind, idxs, h in handles:
            tc = time.perf_counter()
            for i, p in zip(idxs, collect_compress_128(h)):
                payloads[i] = p
            if it:
                print(f"  collect {kind} x{len(idxs)}: "
                      f"{time.perf_counter()-tc:.3f}s")
        t_collect = time.perf_counter() - t0

        t0 = time.perf_counter()
        parts = []
        for ob in range(0, n_blocks, cpb):
            parts.append(splice_streams(payloads[ob : ob + cpb]))
        t_splice = time.perf_counter() - t0

        total = t_pack + t_upload + t_dispatch + t_collect + t_splice
        print(f"pass{it}: pack {t_pack:.3f}s upload {t_upload:.3f}s "
              f"dispatch {t_dispatch:.3f}s (prime {t_sub['prime']:.3f}s "
              f"tinit_h2d {t_sub['tinit_h2d']:.3f}s) "
              f"collect {t_collect:.3f}s splice {t_splice:.3f}s  "
              f"total {total:.3f}s -> {len(data)/total/1e6:.1f} MB/s "
              f"serialized", flush=True)
    print(f"compressed {sum(map(len, parts))/len(data):.4f} ratio")


if __name__ == "__main__":
    main()
