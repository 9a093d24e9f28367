"""Frame-layer tests: header codec, flag-combination roundtrips, linked
blocks + dictionary, the incompressible fallback, and the issue-15
regression analogue (``/root/reference/tests/issue-15.rs``)."""

import io
import itertools
import random

import pytest

from lz4tpu.frame.errors import (
    BlockChecksumFail,
    FrameChecksumFail,
    HeaderChecksumFail,
    HeaderParseError,
    InvalidBlockSize,
    WrongMagic,
)
from lz4tpu.frame.header import BlockDescriptor, Flags
from lz4tpu import CompressionSettings, LZ4FrameReader, decompress_frame

ENGINE = "spec"


def settings() -> CompressionSettings:
    return CompressionSettings().engine(ENGINE)


def frame_roundtrip(data: bytes, s: CompressionSettings, dictionary: bytes = b"") -> bytes:
    frame = s.compress_bytes(data)
    assert decompress_frame(frame, dictionary=dictionary, engine=ENGINE) == data
    return frame


# -- header codec ------------------------------------------------------------


def test_flags_roundtrip():
    for bits in itertools.product([0, 1], repeat=5):
        f = Flags(*map(bool, bits))
        assert Flags.parse(f.encode()) == f


def test_flags_reject_bad_version_and_reserved():
    with pytest.raises(HeaderParseError):
        Flags.parse(0b1000_0000)  # version 2
    with pytest.raises(HeaderParseError):
        Flags.parse(0b0100_0010)  # reserved bit


def test_block_descriptor():
    for code, size in [(4, 1 << 16), (5, 1 << 18), (6, 1 << 20), (7, 1 << 22)]:
        bd = BlockDescriptor.for_block_maxsize(size)
        assert bd is not None and bd.byte == code << 4
        assert BlockDescriptor.parse(bd.byte).block_maxsize() == size
    for bad in (0, 1, 1 << 10, 3 << 16, 1 << 24):
        assert BlockDescriptor.for_block_maxsize(bad) is None
    with pytest.raises(HeaderParseError):
        BlockDescriptor.parse(0b0000_0001)
    with pytest.raises(HeaderParseError):
        BlockDescriptor.parse(0b1000_0000)


def test_invalid_block_size_rejected():
    with pytest.raises(InvalidBlockSize):
        settings().block_size(12345).compress_bytes(b"hello")


# -- frame roundtrips over the full flag space -------------------------------


@pytest.mark.parametrize("independent", [True, False])
@pytest.mark.parametrize("block_checksums", [True, False])
@pytest.mark.parametrize("content_checksum", [True, False])
@pytest.mark.parametrize("with_size", [True, False])
def test_flag_combinations(corpus_sample, independent, block_checksums, content_checksum, with_size):
    data = corpus_sample(99, 150_000)
    s = (
        settings()
        .independent_blocks(independent)
        .block_checksums(block_checksums)
        .content_checksum(content_checksum)
        .block_size(64 * 1024)
    )
    frame = s.compress_bytes(data, with_size=with_size)
    assert decompress_frame(frame, engine=ENGINE) == data


@pytest.mark.parametrize("block_size", [1 << 16, 1 << 18, 1 << 20, 1 << 22])
def test_block_sizes(corpus_sample, block_size):
    data = corpus_sample(3, 300_000)
    frame_roundtrip(data, settings().block_size(block_size))


def test_empty_input():
    frame = settings().compress_bytes(b"")
    assert decompress_frame(frame, engine=ENGINE) == b""


def test_linked_blocks_better_ratio(corpus_sample):
    data = corpus_sample(5, 400_000)
    independent = settings().independent_blocks(True).block_size(1 << 16).compress_bytes(data)
    linked = settings().independent_blocks(False).block_size(1 << 16).compress_bytes(data)
    assert decompress_frame(linked, engine=ENGINE) == data
    assert len(linked) <= len(independent)


def test_issue15_regression():
    """Linked blocks + 64 KiB block size on a low-compressibility ~128 KiB
    payload (the carry-over-window + table-slide path)."""
    r = random.Random(15)
    data = bytes(r.getrandbits(8) for _ in range(128 * 1024 + 37))
    s = settings().independent_blocks(False).block_size(64 * 1024)
    frame_roundtrip(data, s)


def test_incompressible_fallback(rng):
    """Random data must be stored raw: frame size ≈ input + header overhead."""
    data = bytes(rng.getrandbits(8) for _ in range(70_000))
    frame = settings().block_size(1 << 16).compress_bytes(data)
    # magic(4)+flg/bd(2)+size(8)+hc(1) + 2 blocks*(4 len) + endmark(4) + checksum(4)
    assert len(frame) <= len(data) + 32
    assert decompress_frame(frame, engine=ENGINE) == data


def test_dictionary_roundtrip():
    dictionary = (b"the common words dictionary payload " * 300)[:8000]
    data = b"the common words dictionary payload appears, the common words again"
    s = settings().dictionary(0x1234, dictionary)
    frame = s.compress_bytes(data)
    reader = LZ4FrameReader(frame, engine=ENGINE)
    assert reader.dictionary_id == 0x1234
    assert reader.read_all(dictionary=dictionary) == data
    nodict = settings().compress_bytes(data)
    assert len(frame) < len(nodict)  # dictionary must help


def test_dictionary_linked_mode(corpus_sample):
    dictionary = corpus_sample(11, 30_000)
    data = corpus_sample(11, 200_000)  # same distribution -> dictionary helps
    s = settings().dictionary(7, dictionary).independent_blocks(False).block_size(1 << 16)
    frame = s.compress_bytes(data)
    assert decompress_frame(frame, dictionary=dictionary, engine=ENGINE) == data


def test_dictionary_id_nonsense_override():
    s = settings().dictionary(1, b"x" * 100).dictionary_id_nonsense_override(None)
    frame = s.compress_bytes(b"hello world hello world hello")
    reader = LZ4FrameReader(frame, engine=ENGINE)
    assert reader.dictionary_id is None
    assert reader.read_all(dictionary=b"x" * 100) == b"hello world hello world hello"


# -- corruption detection ----------------------------------------------------


def test_wrong_magic():
    with pytest.raises(WrongMagic):
        LZ4FrameReader(b"\x00\x00\x00\x00rest")


def test_header_checksum_detects_corruption():
    frame = bytearray(settings().compress_bytes(b"payload data here"))
    frame[5] ^= 0x10  # flip a flag bit -> header checksum mismatch
    with pytest.raises((HeaderChecksumFail, HeaderParseError)):
        LZ4FrameReader(bytes(frame))


def test_content_checksum_detects_corruption(corpus_sample):
    data = corpus_sample(8, 5000)
    frame = bytearray(settings().compress_bytes(data))
    # flip one byte in the middle of the payload
    frame[len(frame) // 2] ^= 0xFF
    with pytest.raises(Exception) as e:
        decompress_frame(bytes(frame), engine=ENGINE)
    from lz4tpu.frame.errors import LZ4Error

    assert isinstance(e.value, LZ4Error)


def test_block_checksum_detects_corruption(corpus_sample):
    data = corpus_sample(9, 5000)
    frame = bytearray(
        settings().block_checksums(True).content_checksum(False).compress_bytes(data)
    )
    frame[len(frame) // 2] ^= 0x01
    from lz4tpu.frame.errors import LZ4Error

    with pytest.raises(LZ4Error):
        decompress_frame(bytes(frame), engine=ENGINE)


def test_truncated_frame(corpus_sample):
    data = corpus_sample(10, 5000)
    frame = settings().compress_bytes(data)
    from lz4tpu.frame.errors import LZ4Error

    for cut in (5, len(frame) // 2, len(frame) - 2):
        with pytest.raises(LZ4Error):
            decompress_frame(frame[:cut], engine=ENGINE)


# -- io adapter --------------------------------------------------------------


def test_io_reader_interface(corpus_sample):
    data = corpus_sample(12, 200_000)
    frame = settings().block_size(1 << 16).compress_bytes(data)
    stream = LZ4FrameReader(io.BytesIO(frame), engine=ENGINE).into_read()
    out = bytearray()
    while True:
        chunk = stream.read(777)
        if not chunk:
            break
        out.extend(chunk)
    assert bytes(out) == data


def test_back_to_back_frames(corpus_sample):
    """The frame format is self-terminating: two concatenated frames decode
    one at a time, leaving the stream positioned at the second."""
    d1, d2 = corpus_sample(1, 10_000), corpus_sample(2, 12_000)
    buf = io.BytesIO(settings().compress_bytes(d1) + settings().compress_bytes(d2))
    assert LZ4FrameReader(buf, engine=ENGINE).read_all() == d1
    assert LZ4FrameReader(buf, engine=ENGINE).read_all() == d2


def test_tpu_engine_streaming_roundtrip(corpus_sample):
    """The 'tpu' engine plugs into the streaming frame API (interpret mode
    on CPU here; the batch pipeline is the high-throughput path)."""
    data = corpus_sample(55, 3000)
    s = CompressionSettings().engine("tpu").block_size(1 << 16)
    frame = s.compress_bytes(data)
    ref = CompressionSettings().engine("spec").block_size(1 << 16).compress_bytes(data)
    assert frame == ref  # bit-exact across engines
    assert decompress_frame(frame, engine="tpu") == data
