"""Link probe 2: finer D2H piece-size sweep + jax.device_get batching.
Follow-up to chip_link_probe: async 512 KiB pieces measured 40.1 MB/s
vs 30.8 whole — find the knee."""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    import jax

    from lz4tpu.hostpack import to_device_chunked

    mb = 16
    rng = np.random.default_rng(13)

    def fresh():
        a = rng.integers(0, 256, mb << 20, np.uint8).reshape(-1, 1024)
        d = to_device_chunked(a, 2 << 20) + 0
        d.block_until_ready()
        return d

    rows = (mb << 20) // 1024
    for pieces in (4, 8, 16, 32, 64, 128):
        pr = rows // pieces

        @jax.jit
        def split(d, pr=pr, pieces=pieces):
            return [d[i * pr : (i + 1) * pr] for i in range(pieces)]

        best_a = best_g = 0.0
        for _ in range(3):
            d = fresh()
            t0 = time.perf_counter()
            ps = split(d)
            for p in ps:
                p.copy_to_host_async()
            for p in ps:
                np.asarray(p)
            best_a = max(best_a, mb / (time.perf_counter() - t0))
        for _ in range(3):
            d = fresh()
            t0 = time.perf_counter()
            ps = split(d)
            jax.device_get(ps)
            best_g = max(best_g, mb / (time.perf_counter() - t0))
        print(f"  {pieces:3d} x {mb*1024//pieces:5d} KiB: async "
              f"{best_a:6.1f} MB/s  device_get {best_g:6.1f} MB/s",
              flush=True)


if __name__ == "__main__":
    main()
