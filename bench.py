"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: raw-block decode throughput on the TPU Pallas kernel over a
deterministic mixed-compressibility corpus (64 KiB blocks), GB/s per chip.
``vs_baseline`` compares against the C reference implementation's
single-core decompression (~4.5 GB/s, BASELINE.md) — the bar the reference
library claims to match (``/root/reference/README.md:11``).

Measurement protocol: the tunneled TPU backend executes lazily and
``block_until_ready`` does not force execution, so every timed run chains
M dispatches through a data dependency and fetches a scalar at the end
(amortising the ~25 ms tunnel round-trip), calibrated in-session against
known matmul/HBM costs.

Details (host engine, TPU compress, ratios) ride along in ``extra``.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(pathlib.Path(__file__).parent / ".jax_cache"))

import numpy as np

BASELINE_DECODE_GBPS = 4.5  # C lz4 single-core decompress (BASELINE.md)
BLOCK = 1 << 16
CAP = BLOCK + 512


def make_corpus(target_mb: float = 8.0) -> bytes:
    """Deterministic Silesia-stand-in: mix of real binaries from the image
    and synthetic text-like/repetitive/random spans (no network egress)."""
    parts = []
    for p in [
        "/usr/bin/g++",
        "/usr/lib/x86_64-linux-gnu/libc.so.6",
        "/usr/lib/x86_64-linux-gnu/libstdc++.so.6",
    ]:
        try:
            parts.append(open(p, "rb").read())
        except OSError:
            pass
    rng = np.random.default_rng(0)
    motifs = [
        b"the quick brown fox jumps over the lazy dog. ",
        bytes(range(64)) * 4,
        b"<xml attr='value'><nested>text</nested></xml>\n",
    ]
    syn = bytearray()
    while len(syn) < 4 << 20:
        syn.extend(motifs[int(rng.integers(len(motifs)))] * int(rng.integers(1, 30)))
        syn.extend(rng.integers(0, 256, int(rng.integers(10, 300)), dtype=np.uint8).tobytes())
    parts.append(bytes(syn))
    data = b"".join(parts)
    n = int(target_mb * (1 << 20))
    return (data * (n // len(data) + 1))[:n]


def bench_tpu(blocks, comp):
    """Chained on-device decode + compress throughput; returns dict."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    from lz4tpu.kernels.compress import _compress_batch_jit
    from lz4tpu.kernels.decompress_v3 import _decompress_batch_v3_jit

    nb = len(blocks)
    total = sum(len(b) for b in blocks)

    arr = np.zeros((nb, CAP), np.uint8)
    lens = np.zeros(nb, np.int32)
    for i, c in enumerate(comp):
        arr[i, : len(c)] = np.frombuffer(c, np.uint8)
        lens[i] = len(c)
    d_arr = jnp.asarray(arr)
    d_lens = jnp.asarray(lens)
    pref = jnp.zeros((nb, 128), jnp.uint8)
    plen = jnp.zeros(nb, jnp.int32)
    dkw = dict(block_maxsize=BLOCK, comp_capacity=CAP, prefix_rows=0)

    @jax.jit
    def dec_chain(a, l):
        out, ol, st = _decompress_batch_v3_jit(a, l, pref, plen, **dkw)
        return a ^ (st.sum() * 0).astype(jnp.uint8), l, out, ol, st

    # correctness first
    _, _, out, ol, st = dec_chain(d_arr, d_lens)
    out_h, ol_h, st_h = np.asarray(out), np.asarray(ol), np.asarray(st)
    assert (st_h == 0).all(), "TPU decode status errors"
    for i, b in enumerate(blocks):
        assert out_h[i, : ol_h[i]].tobytes() == b, f"TPU decode mismatch block {i}"

    a, l = d_arr, d_lens
    m = 6
    t0 = time.perf_counter()
    for _ in range(m):
        a, l, out, ol, st = dec_chain(a, l)
    np.asarray(ol[:2])
    t_decode = (time.perf_counter() - t0) / m

    # compress
    barr = np.zeros((nb, BLOCK), np.uint8)
    blens = np.zeros(nb, np.int32)
    for i, b in enumerate(blocks):
        barr[i, : len(b)] = np.frombuffer(b, np.uint8)
        blens[i] = len(b)
    d_barr = jnp.asarray(barr)
    d_blens = jnp.asarray(blens)
    zz = jnp.zeros(nb, jnp.int32)
    caps = jnp.full(nb, -1, jnp.int32)
    acc = jnp.ones(nb, jnp.int32)
    tbl = jnp.zeros((nb, 4096), jnp.uint32)
    ckw = dict(data_capacity=BLOCK, out_capacity=BLOCK + BLOCK // 255 + 18, u16_table=False)

    @jax.jit
    def comp_chain(a):
        outc, olen, stc, _ = _compress_batch_jit(
            a, d_blens, zz, caps, acc, zz, zz, tbl, **ckw
        )
        return a ^ (stc.sum() * 0).astype(jnp.uint8), outc, olen, stc

    _, outc, olen, stc = comp_chain(d_barr)
    outc_h, olen_h = np.asarray(outc), np.asarray(olen)
    for i, c in enumerate(comp):
        assert outc_h[i, : olen_h[i]].tobytes() == c, f"TPU compress mismatch block {i}"

    a = d_barr
    t0 = time.perf_counter()
    for _ in range(m):
        a, outc, olen, stc = comp_chain(a)
    np.asarray(olen[:2])
    t_compress = (time.perf_counter() - t0) / m

    return {
        "decode_bps": total / t_decode,
        "compress_bps": total / t_compress,
    }


def bench_native(data):
    from lz4tpu import CompressionSettings, decompress_frame

    s = CompressionSettings().engine("native").block_size(BLOCK)
    frame = s.compress_bytes(data)
    t0 = time.perf_counter()
    frame = s.compress_bytes(data)
    t_c = time.perf_counter() - t0
    out = decompress_frame(frame, engine="native")
    t0 = time.perf_counter()
    out = decompress_frame(frame, engine="native")
    t_d = time.perf_counter() - t0
    assert out == data
    return len(data) / t_c, len(data) / t_d, len(frame) / len(data)


def main() -> None:
    size_mb = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    data = make_corpus(size_mb)
    blocks = [data[i : i + BLOCK] for i in range(0, len(data), BLOCK)]
    # batch must divide k_blocks=4
    while len(blocks) % 4:
        blocks.append(b"\x00" * BLOCK)

    from lz4tpu.native import compress_block
    from lz4tpu.spec.table import U32Table

    comp = [compress_block(b, 0, U32Table()) for b in blocks]
    ratio = sum(len(c) for c in comp) / sum(len(b) for b in blocks)

    native_c, native_d, native_ratio = bench_native(data)

    extra = {
        "corpus_mb": round(sum(len(b) for b in blocks) / (1 << 20), 2),
        "block_ratio": round(ratio, 4),
        "frame_ratio": round(native_ratio, 4),
        "native_compress_mbps": round(native_c / 1e6, 1),
        "native_decompress_mbps": round(native_d / 1e6, 1),
    }

    tpu = None
    try:
        import jax

        if jax.default_backend() == "tpu":
            tpu = bench_tpu(blocks, comp)
            extra["tpu_decode_mbps"] = round(tpu["decode_bps"] / 1e6, 1)
            extra["tpu_compress_mbps"] = round(tpu["compress_bps"] / 1e6, 1)
    except Exception as e:  # pragma: no cover
        extra["tpu_error"] = str(e)[:160]

    if tpu is not None:
        value = tpu["decode_bps"] / 1e9
        metric = "tpu_decode_gbps_per_chip"
    else:
        value = native_d / 1e9
        metric = "native_decode_gbps_fallback"

    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 4),
                "unit": "GB/s",
                "vs_baseline": round(value / BASELINE_DECODE_GBPS, 4),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
