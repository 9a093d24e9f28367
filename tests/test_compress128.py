"""Lane-parallel compressor experiment (kernels/compress128.py).

The lane compressor emits VALID LZ4 (verified against the spec decoder
and, when present, the real liblz4) but not byte-identical output to the
reference greedy parse: its per-lane hash table is a size/ratio knob and
v1 has no skip acceleration.  Interpret-mode tests use a small table
(hashlog=6) to keep the one-hot table sweep cheap on CPU.
"""

import numpy as np
import pytest

from lz4tpu.spec.block import decompress_block


def _roundtrip(payloads, hashlog=6):
    from lz4tpu.kernels.compress128 import compress_blocks_128

    comp = compress_blocks_128(payloads, hashlog=hashlog)
    assert len(comp) == len(payloads)
    for p, c in zip(payloads, comp):
        assert bytes(decompress_block(c, b"", None, 1 << 22)) == p
    return comp


@pytest.mark.slow
def test_compress128_roundtrip(corpus_sample):
    rng = np.random.default_rng(7)
    payloads = [
        b"to live or not to live, to be or not to be! " * 12,
        bytes(range(256)),
        b"\x00" * 600,  # offset-1 RLE
        rng.integers(0, 256, 500, dtype=np.uint8).tobytes(),
        b"ab" * 200,
        b"hello",
        b"",
        bytes(range(64)) * 8,
        corpus_sample(300, 2500),
        corpus_sample(301, 1200),
        b"x" * 13,
    ]
    _roundtrip(payloads)


@pytest.mark.slow
def test_compress128_long_lsic_paths():
    """EXT_L (literal run > inline token budget) and EXT_M (match run
    beyond the inline MHDR budget)."""
    rng = np.random.default_rng(8)
    payloads = [
        rng.integers(0, 256, 3000, dtype=np.uint8).tobytes(),
        b"\x00" * 12000,
        b"Q" * 9000 + rng.integers(0, 256, 2200, dtype=np.uint8).tobytes(),
    ]
    _roundtrip(payloads)


@pytest.mark.slow
def test_compress128_liblz4_oracle(corpus_sample):
    from lz4tpu.interop import liblz4

    if not liblz4.available():
        pytest.skip("liblz4 not present")
    from lz4tpu.kernels.compress128 import compress_blocks_128

    payloads = [corpus_sample(310 + i, 2000 + 137 * i) for i in range(8)]
    comp = compress_blocks_128(payloads, hashlog=6)
    for p, c in zip(payloads, comp):
        assert liblz4.lz4_decompress_safe(c, len(p)) == p


@pytest.mark.slow
def test_compress128_frame_lane_kernel(monkeypatch, corpus_sample):
    """compress_frame_parallel(lane_kernel=True) emits a valid frame the
    streaming reader (and the frame one-shot) decodes back to the input,
    including an incompressible block handled by the host-side cap."""
    import numpy as np

    from lz4tpu import decompress_frame
    from lz4tpu.kernels import compress128
    from lz4tpu.parallel.mesh import make_mesh
    from lz4tpu.parallel.pipeline import compress_frame_parallel

    monkeypatch.setattr(compress128, "HASHLOG", 6)
    # shrink the lane kernel's per-block budget so the pipeline chunks at
    # 4 KiB under the 64 KiB declared block-maxsize (valid: BD is a max)
    monkeypatch.setattr(compress128, "MAX_B", 4096)
    rng = np.random.default_rng(42)
    data = (
        corpus_sample(330, 9000)
        + rng.integers(0, 256, 4500, dtype=np.uint8).tobytes()  # stored block
        + corpus_sample(331, 2000)
    )
    mesh = make_mesh(1)
    frame = compress_frame_parallel(
        data, block_size=1 << 16, mesh=mesh, lane_kernel=True
    )
    assert decompress_frame(frame) == data


@pytest.mark.slow
def test_compress128_gated_refill_stall_paths(monkeypatch, corpus_sample):
    """Regression: with refill gating (REFILL_K > 1) a lane can stall in
    EXTEND and later reach the fused emission with its anchor in a group
    that is no longer resident; fusion must then fall back to the
    constructed TOK path (gbok check) instead of reading a stale page.
    Multi-KiB mixed payloads cross many GROUP_W*4 = 1 KiB group
    boundaries, which is what fires the stall+fuse interaction."""
    import lz4tpu.kernels.compress128 as c128

    for K in (2, 4):
        monkeypatch.setattr(c128, "REFILL_K", K)
        c128._compress128_jit.clear_cache()
        rng = np.random.default_rng(100 + K)
        payloads = [
            corpus_sample(400 + K, 6000),
            corpus_sample(401 + K, 5000),
            (b"abcdefgh" * 40 + rng.integers(0, 256, 90, dtype=np.uint8).tobytes()) * 24,
            rng.integers(0, 256, 5500, dtype=np.uint8).tobytes(),
        ]
        _roundtrip(payloads, hashlog=6)
    c128._compress128_jit.clear_cache()


def test_compress128_ratio_vs_native(corpus_sample):
    """The small-table lane parse must stay within a sane ratio band of
    the reference-exact greedy parse (it misses some matches)."""
    from lz4tpu.kernels.compress128 import compress_blocks_128
    from lz4tpu.native import compress_block as native_compress

    payloads = [corpus_sample(320 + i, 4000) for i in range(4)]
    comp = compress_blocks_128(payloads, hashlog=8)
    for p, c in zip(payloads, comp):
        ref = native_compress(p)
        # measured ~1.0-1.14x at hashlog 8 (1.01-1.08 at the default 10)
        assert len(c) <= max(int(len(ref) * 1.3), len(ref) + 64)


def test_compress128_shipping_default_ratio_le_reference(corpus_sample):
    """BASELINE contract: at the SHIPPING default (hashlog 12 + backward
    extension) the lane compressor's aggregate output must be <= the
    reference greedy parse's on real block shapes (32 KiB blocks, mixed
    corpus).  The property needs real block sizes — the backward
    extension's gains only dominate once the table works a full block —
    so this runs on the chip (LZ4TPU_TEST_PLATFORM=tpu, part of the
    recorded per-round chip matrix); CPU interpret mode would take ~20
    min for the same shapes.  Measured r3: 0.5718 vs 0.5743."""
    import os

    if os.environ.get("LZ4TPU_TEST_PLATFORM", "cpu") != "tpu":
        pytest.skip("shipping-default ratio pin runs in the on-chip matrix")
    from bench import make_corpus
    from lz4tpu.kernels.compress128 import MAX_B, compress_blocks_128
    from lz4tpu.native import compress_block as native_compress
    from lz4tpu.spec.table import U32Table

    data = make_corpus(4.0)
    blocks = [data[i : i + MAX_B] for i in range(0, len(data), MAX_B)][:128]
    comp = compress_blocks_128(blocks)
    ours = sum(len(c) for c in comp)
    ref = sum(len(bytes(native_compress(b, 0, U32Table()))) for b in blocks)
    assert ours <= ref, (ours, ref, ours / ref)


@pytest.mark.slow
def test_compress128_bucket_tag_collision():
    """Two different 4-byte words whose hash agrees in BOTH the bucket
    and the packed-entry tag bits (bits [6..31] of v*2654435761): a
    packed-table probe accepts the candidate, and the EXTEND verify must
    reject it (first-LCP < MINMATCH) without corrupting the stream.
    Harmless for the word-key table (probe rejects directly)."""
    v1 = bytes([99, 116, 232, 245])   # 0xf5e87463
    v2 = bytes([180, 163, 115, 4])    # 0x0473a3b4 — same bucket+tag @ hl=10
    rng = np.random.default_rng(11)
    filler = lambda n, s: np.random.default_rng(s).integers(
        0, 256, n, dtype=np.uint8
    ).tobytes()
    payload = filler(40, 1) + v1 + filler(40, 2) + v2 + filler(40, 3)
    # and a variant where a real match follows the false candidate
    payload2 = payload + payload[:60]
    _roundtrip([payload, payload2], hashlog=10)
