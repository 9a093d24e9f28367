"""Threaded host frame paths: the independent-block thread-pool writer
(``CompressionSettings.threads``) and the threaded ``read_all`` fast
path must be byte-identical to the serial loops in output AND error
kinds — independent blocks are the format's own parallelism seam
(``/root/reference/src/framed/compress.rs:57-66``); the reference
itself is single-threaded, so serial behavior is the spec."""

import os

import numpy as np
import pytest

from lz4tpu import CompressionSettings, decompress_frame
from lz4tpu.frame.decompress import LZ4FrameReader
from lz4tpu.frame.errors import BlockChecksumFail, CodecError
from lz4tpu.frame.header import MAGIC
from lz4tpu.spec.xxhash32 import xxh32


def _corpus(n=6 << 20, seed=2):
    r = np.random.default_rng(seed)
    out = bytearray()
    while len(out) < n:
        pat = r.integers(0, 256, int(r.integers(24, 200)), np.uint8).tobytes()
        out += pat * int(r.integers(2, 9))
        out += r.integers(0, 256, int(r.integers(8, 99)), np.uint8).tobytes()
    return bytes(out[:n])


DATA = _corpus()


def _force_threads(n):
    os.environ["LZ4TPU_HOST_THREADS"] = str(n)


@pytest.fixture(autouse=True)
def _reset_threads():
    yield
    os.environ.pop("LZ4TPU_HOST_THREADS", None)


@pytest.mark.parametrize("bs", [1 << 16, 1 << 20])
@pytest.mark.parametrize("bchk", [False, True])
@pytest.mark.parametrize("with_size", [True, False])
def test_threaded_writer_and_reader_identity(bs, bchk, with_size):
    pytest.importorskip("lz4tpu.native")
    dic = _corpus(30000, seed=9)
    for d in (None, dic):
        s1 = (CompressionSettings().engine("native").block_size(bs)
              .block_checksums(bchk).threads(1))
        s4 = (CompressionSettings().engine("native").block_size(bs)
              .block_checksums(bchk).threads(4))
        if d is not None:
            s1.dictionary(5, d)
            s4.dictionary(5, d)
        f1 = s1.compress_bytes(DATA, with_size=with_size)
        f4 = s4.compress_bytes(DATA, with_size=with_size)
        assert f1 == f4
        _force_threads(1)
        serial = decompress_frame(f1, dictionary=d or b"")
        _force_threads(4)
        fast = decompress_frame(f1, dictionary=d or b"")
        assert serial == fast == DATA


def _hand_frame(payload_blocks, content_size):
    """Assemble an independent-blocks frame (content size, no content
    checksum) from pre-compressed raw block payloads."""
    from lz4tpu.native import compress_block
    from lz4tpu.spec.table import U32Table

    header = bytearray()
    header.extend(MAGIC.to_bytes(4, "little"))
    header.append(0b01101000)  # v1, independent, content_size
    header.append(0x70)  # BD: 4 MiB (a maximum, not a promise)
    header.extend(int(content_size).to_bytes(8, "little"))
    header.append((xxh32(header[4:]) >> 8) & 0xFF)
    parts = [bytes(header)]
    for raw in payload_blocks:
        comp = bytes(compress_block(raw, 0, U32Table()))
        parts.append(len(comp).to_bytes(4, "little"))
        parts.append(comp)
    parts.append(b"\x00\x00\x00\x00")
    return b"".join(parts)


def test_threaded_reader_layout_miss():
    """Interior blocks shorter than block_maxsize defeat the zero-copy
    offset prediction; the join fallback must still produce exact
    bytes."""
    pytest.importorskip("lz4tpu.native")
    bs = 4 << 20
    b0 = DATA[: bs - 13]  # interior block short of the maxsize
    b1 = DATA[bs - 13 : bs - 13 + 77777]
    frame = _hand_frame([b0, b1], len(b0) + len(b1))
    _force_threads(4)
    assert decompress_frame(frame) == b0 + b1


def test_threaded_reader_lying_content_size():
    """A content-size field inconsistent with the actual output must not
    corrupt the result (the reference treats content size as
    informational; so does the serial loop)."""
    pytest.importorskip("lz4tpu.native")
    b0 = DATA[: 1 << 20]
    frame = _hand_frame([b0], (1 << 20) + 999)  # lies by +999
    _force_threads(4)
    assert decompress_frame(frame) == b0


def test_threaded_reader_error_kinds_match_serial():
    pytest.importorskip("lz4tpu.native")
    s = (CompressionSettings().engine("native").block_size(1 << 16)
         .block_checksums(True))
    frame = bytearray(s.compress_bytes(DATA[: 1 << 20]))
    frame[len(frame) // 2] ^= 0xFF  # corrupt a block payload
    kinds = []
    for n in (1, 4):
        _force_threads(n)
        with pytest.raises((BlockChecksumFail, CodecError)) as ei:
            decompress_frame(bytes(frame))
        kinds.append(type(ei.value))
    assert kinds[0] is kinds[1]


def test_linked_mode_ignores_threading():
    pytest.importorskip("lz4tpu.native")
    s1 = (CompressionSettings().engine("native").independent_blocks(False)
          .block_size(1 << 16).threads(4))
    frame = s1.compress_bytes(DATA[: 1 << 20])
    ref = (CompressionSettings().engine("spec").independent_blocks(False)
           .block_size(1 << 16).compress_bytes(DATA[: 1 << 20]))
    assert frame == ref  # linked mode stays the serial writer
    _force_threads(4)
    assert decompress_frame(frame) == DATA[: 1 << 20]
