"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: raw-block decode throughput on the TPU Pallas kernel over a
deterministic mixed-compressibility corpus (64 KiB blocks), GB/s per chip.
``vs_baseline`` compares against the C reference implementation's
single-core decompression (~4.5 GB/s, BASELINE.md) — the bar the reference
library claims to match (``/root/reference/README.md:11``).

Details (host engine, TPU compress, ratios) ride along in ``extra``.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent))

import numpy as np

BASELINE_DECODE_GBPS = 4.5  # C lz4 single-core decompress (BASELINE.md)
BLOCK = 1 << 16


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


def bench_tpu_decode(blocks, comp):
    from lz4tpu.kernels.decompress import decompress_blocks

    out = decompress_blocks(comp, block_maxsize=BLOCK)  # compile + correctness
    assert out == blocks, "TPU decode mismatch"
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        decompress_blocks(comp, block_maxsize=BLOCK)
        dt = time.perf_counter() - t0
        best = max(best, sum(len(b) for b in blocks) / dt)
    return best


def bench_tpu_compress(blocks, comp_ref):
    from lz4tpu.kernels.compress import compress_blocks
    from lz4tpu.spec.table import U32Table

    outs, _ = compress_blocks(blocks, tables=[U32Table() for _ in blocks])
    assert [o for o in outs] == comp_ref, "TPU compress mismatch"
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        compress_blocks(blocks, tables=[U32Table() for _ in blocks])
        dt = time.perf_counter() - t0
        best = max(best, sum(len(b) for b in blocks) / dt)
    return best


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
    size_mb = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    data = make_corpus(size_mb)
    blocks = [data[i : i + BLOCK] for i in range(0, len(data), BLOCK)]

    from lz4tpu.native import compress_block
    from lz4tpu.spec.table import U32Table

    comp = [compress_block(b, 0, U32Table(), cap=None) for b in blocks]
    ratio = sum(len(c) for c in comp) / len(data)

    native_c, native_d, native_ratio = bench_native(data)

    extra = {
        "corpus_mb": round(len(data) / (1 << 20), 2),
        "block_ratio": round(ratio, 4),
        "frame_ratio": round(native_ratio, 4),
        "native_compress_mbps": round(native_c / 1e6, 1),
        "native_decompress_mbps": round(native_d / 1e6, 1),
    }

    tpu_decode = None
    try:
        import jax

        if jax.default_backend() == "tpu":
            tpu_decode = bench_tpu_decode(blocks, comp)
            extra["tpu_decode_mbps"] = round(tpu_decode / 1e6, 1)
            try:
                tpu_comp = bench_tpu_compress(blocks, comp)
                extra["tpu_compress_mbps"] = round(tpu_comp / 1e6, 1)
            except Exception as e:  # pragma: no cover
                extra["tpu_compress_error"] = str(e)[:120]
    except Exception as e:  # pragma: no cover
        extra["tpu_error"] = str(e)[:120]

    if tpu_decode is not None:
        value = tpu_decode / 1e9
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
