"""Smoke tier: tiny-shape coverage of every engine in ~a minute.

Run just this file (``pytest -k smoke``) or the quick tier
(``pytest -m "not slow"``) while iterating; the full suite replays the
reference fuzz corpora and the heavyweight lane-kernel suites and takes
~20 min under CPU interpret mode.
"""

from lz4tpu.spec.block import compress_block, decompress_block
from lz4tpu.spec.table import U16Table

PAYLOADS = [
    b"smoke smoke smoke smoke!" * 6,
    bytes(range(64)),
    b"\x00" * 300,
    b"",
]


def _comp():
    return [bytes(compress_block(p, 0, U16Table())) for p in PAYLOADS]


def test_smoke_spec_roundtrip():
    for p, c in zip(PAYLOADS, _comp()):
        assert bytes(decompress_block(c)) == p


def test_smoke_native_roundtrip():
    from lz4tpu.native import compress_block as nc, decompress_block as nd
    from lz4tpu.spec.table import U32Table

    for p in PAYLOADS:
        if not p:
            continue
        c = bytes(nc(p, 0, U32Table()))
        assert bytes(nd(c, b"", output_limit=1 << 14)) == p


def test_smoke_decode128():
    from lz4tpu.kernels.decode128 import decompress_blocks_128

    assert decompress_blocks_128(_comp(), block_maxsize=1 << 11) == PAYLOADS


def test_smoke_decode_v4():
    from lz4tpu.kernels.decompress_v4 import decompress_blocks_v4

    assert decompress_blocks_v4(_comp(), block_maxsize=1 << 11) == PAYLOADS


def test_smoke_compress128():
    from lz4tpu.kernels.compress128 import compress_blocks_128

    comp = compress_blocks_128(PAYLOADS, hashlog=8)
    for p, c in zip(PAYLOADS, comp):
        assert bytes(decompress_block(c)) == p


def test_smoke_scalar_compress_kernel():
    from lz4tpu.kernels.compress import compress_blocks

    datas = [p for p in PAYLOADS if p]
    comp, _ = compress_blocks(datas)
    for p, c in zip(datas, comp):
        assert bytes(decompress_block(c)) == p


def test_smoke_frame_roundtrip():
    from lz4tpu import CompressionSettings, decompress_frame

    data = b"frame smoke " * 40
    frame = CompressionSettings().block_size(1 << 16).compress_bytes(data)
    assert decompress_frame(frame) == data
