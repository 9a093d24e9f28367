"""Link probe (round 5): can piecewise/async transfers beat the
single-buffer tunnel rates that currently cap the frame end-to-end
paths (h2d 34.4 / d2h 32.6 MB/s in BENCH_r04)?

Measures, for 16 MiB payloads:
  h2d: jnp.asarray whole; to_device_chunked at 2 MiB / 1 MiB / 512 KiB
  d2h: np.asarray whole; equal-shape device slices fetched serially;
       the same slices with copy_to_host_async issued for ALL pieces
       before any blocking fetch (true overlap).
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from lz4tpu.hostpack import to_device_chunked

    mb = 16
    rng = np.random.default_rng(11)

    print("== H2D", flush=True)
    for label, fn in (
        ("whole jnp.asarray", lambda a: jnp.asarray(a)),
        ("chunked 2MiB", lambda a: to_device_chunked(a, 2 << 20)),
        ("chunked 1MiB", lambda a: to_device_chunked(a, 1 << 20)),
        ("chunked 512KiB", lambda a: to_device_chunked(a, 512 << 10)),
    ):
        best = 0.0
        for _ in range(3):
            a = rng.integers(0, 256, mb << 20, np.uint8).reshape(-1, 1024)
            t0 = time.perf_counter()
            d = fn(a)
            d.block_until_ready()
            best = max(best, mb / (time.perf_counter() - t0))
        print(f"  {label:24s} {best:7.1f} MB/s", flush=True)

    print("== D2H", flush=True)

    def fresh():
        a = rng.integers(0, 256, mb << 20, np.uint8).reshape(-1, 1024)
        d = to_device_chunked(a, 2 << 20) + 0
        d.block_until_ready()
        return d

    best = 0.0
    for _ in range(3):
        d = fresh()
        t0 = time.perf_counter()
        np.asarray(d)
        best = max(best, mb / (time.perf_counter() - t0))
    print(f"  {'whole np.asarray':24s} {best:7.1f} MB/s", flush=True)

    for pieces in (8, 16, 32):
        rows = (mb << 20) // 1024
        pr = rows // pieces

        @jax.jit
        def split(d):
            return [d[i * pr : (i + 1) * pr] for i in range(pieces)]

        best_s = best_a = 0.0
        for _ in range(3):
            d = fresh()
            t0 = time.perf_counter()
            ps = split(d)
            for p in ps:
                np.asarray(p)
            best_s = max(best_s, mb / (time.perf_counter() - t0))
        for _ in range(3):
            d = fresh()
            t0 = time.perf_counter()
            ps = split(d)
            for p in ps:
                p.copy_to_host_async()
            for p in ps:
                np.asarray(p)
            best_a = max(best_a, mb / (time.perf_counter() - t0))
        print(f"  {pieces:2d} pieces ({mb*1024//pieces} KiB): serial "
              f"{best_s:7.1f} MB/s  async {best_a:7.1f} MB/s", flush=True)


if __name__ == "__main__":
    main()
