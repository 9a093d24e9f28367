"""On-chip cost decomposition of decode128 via timing variants.

Each variant disables (or doubles, for the 2x probes) one component of
the round; deltas vs `full` give the component's share.  Output is wrong
for the disabling variants — timing only.
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
    stot = sum(len(b) for b in blocks)

    variants = [a for a in sys.argv[1:]] or [
        "full", "noplace", "nogather", "nonear", "nofar", "flush2x", "refill2x",
    ]
    results = {}
    rounds_real = None
    for v in variants:
        # the floor variant never finishes lanes; cap it at the real
        # run's round count so its time is comparable
        mr = max_rounds
        if v == "floor":
            mr = int(rounds_real) if rounds_real else 7808

        def run(wds, v=v, mr=mr):
            _, ol, st = d128._decode128_jit(
                wds, d_n, rw=rw, ro=ro, max_rounds=mr,
                output_limit=BLOCK, variant=v,
            )
            return wds ^ (st.sum() * 0), ol

        chain = jax.jit(run)
        t0 = time.time()
        _, ol = chain(d_words)
        olh = np.asarray(ol)
        if v == "full":
            rounds_real = olh[2].max()
        tc = time.time() - t0
        best = 1e9
        for _ in range(3):
            a = d_words
            t0 = time.perf_counter()
            for _ in range(4):
                a, ol = chain(a)
            np.asarray(ol[:1])
            best = min(best, (time.perf_counter() - t0) / 4)
        results[v] = best
        print(f"{v:10s} {best*1e3:8.2f} ms  {stot/best/1e6:7.1f} MB/s "
              f"(compile {tc:.0f}s)", flush=True)

    if "full" in results:
        f = results["full"]
        for v, t in results.items():
            if v == "full":
                continue
            sign = "+" if t > f else "-"
            print(f"{v:10s} delta {sign}{abs(t-f)*1e3:7.2f} ms "
                  f"({abs(t-f)/f*100:5.1f}% of full)", flush=True)


if __name__ == "__main__":
    main()
