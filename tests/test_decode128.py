"""Lane-parallel full decoder experiment (kernels/decode128.py)."""

import pytest

from lz4tpu.spec.block import DecodeError, compress_block
from lz4tpu.spec.table import U16Table


def test_decode128_roundtrip(corpus_sample):
    from lz4tpu.kernels.decode128 import decompress_blocks_128

    payloads = [
        b"to live or not to live, to live or not to live! " * 8,
        bytes(range(256)),
        b"ab" * 150,
        b"hello",
        corpus_sample(140, 3000),
        b"\x00" * 1000,  # offset-1 RLE with lag doubling
        b"xyz" * 600,
        corpus_sample(141, 5000),
        bytes(range(64)) * 100,  # offset-64 periodic
        b"",
    ]
    comp = [bytes(compress_block(p, 0, U16Table())) for p in payloads]
    out = decompress_blocks_128(comp, block_maxsize=1 << 14)
    assert out == payloads


def test_decode128_error_kinds():
    from lz4tpu.kernels.decode128 import decompress_blocks_128

    for bad, kind in [
        (bytes([0x10, ord("a"), 2, 0]), DecodeError.KIND_INVALID_OFFSET),
        (bytes([0x10, ord("a"), 0, 0]), DecodeError.KIND_ZERO_OFFSET),
        (bytes([0x50, ord("a")]), DecodeError.KIND_UNEXPECTED_END),
    ]:
        with pytest.raises(DecodeError) as e:
            decompress_blocks_128([bad], block_maxsize=4096)
        assert e.value.kind == kind


def test_decode128_sentinel_fallback():
    """Long LSIC chains fall back to the scalar v4 kernel transparently."""
    from lz4tpu.kernels.decode128 import decompress_blocks_128

    data = b"\x00" * 12_000  # match LSIC chain beyond the static bound
    comp = bytes(compress_block(data, 0, U16Table()))
    assert decompress_blocks_128([comp], block_maxsize=1 << 14) == [data]
