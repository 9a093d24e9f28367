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


def test_frame_parallel_uses_lane_decoder_on_single_device(corpus_sample):
    """decompress_frame_parallel routes through decode128 on a 1-device
    mesh; output must match the streaming reader."""
    import jax

    from lz4tpu import decompress_frame
    from lz4tpu.parallel.mesh import make_mesh
    from lz4tpu.parallel.pipeline import (
        compress_frame_parallel,
        decompress_frame_parallel,
    )

    mesh = make_mesh(1)
    # compressible content keeps interpret-mode round counts small
    data = (b"lane parallel frames! " * 4000)[: 80_000]
    frame = compress_frame_parallel(data, block_size=1 << 16, mesh=mesh)
    assert decompress_frame_parallel(frame, mesh=mesh) == data
    assert decompress_frame(frame, engine="native") == data
