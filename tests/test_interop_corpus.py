"""Corpus-scale interop_decode replay (VERDICT r4 item 5).

The reference's ``interop_decode`` fuzz target compresses each corpus file
with the C ``lz4`` crate and asserts its own decoder inverts it
(``/root/reference/fuzz/fuzz_targets/interop_decode.rs:1-31``).  Here every
file of the 197-file ``interop_decode`` corpus AND the 304-file
``roundtrip_fuzz`` corpus is compressed with liblz4 (both the raw block
API and the streaming LZ4F frame API) and decoded with ALL of our decode
engines — spec, native C++, and the lane kernel (``decode128``) — asserting
byte equality against the original plaintext.
"""

import pathlib

import pytest

from lz4tpu import decompress_frame
from lz4tpu.interop import liblz4
from lz4tpu.spec.block import decompress_block as spec_decompress_block
from lz4tpu import native

CORPUS = pathlib.Path("/root/reference/fuzz/corpus")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not CORPUS.exists(), reason="reference corpus not mounted"),
    pytest.mark.skipif(not liblz4.available(), reason="liblz4 not installed"),
]


def _corpus_payloads():
    out = []
    for name in ("interop_decode", "roundtrip_fuzz"):
        for path in sorted((CORPUS / name).iterdir()):
            out.append((f"{name}/{path.name}", path.read_bytes()))
    assert len(out) == 197 + 304
    return out


def test_interop_corpus_raw_blocks_all_engines():
    """liblz4 raw-compress every corpus file; spec + native + decode128
    must all invert it byte-for-byte."""
    from lz4tpu.kernels.decode128 import decompress_blocks_128

    payloads = _corpus_payloads()
    comp = [liblz4.lz4_compress_default(data) for _, data in payloads]

    # scalar oracles, file by file
    for (name, data), c in zip(payloads, comp):
        assert bytes(spec_decompress_block(c)) == data, name
        assert native.decompress_block(c) == data, name

    # lane kernel in 128-wide batches (max corpus file is 24,582 B -> 32 KiB)
    maxsize = 1 << 15
    expected = [data for _, data in payloads]
    got = []
    for base in range(0, len(comp), 128):
        got.extend(decompress_blocks_128(comp[base : base + 128], block_maxsize=maxsize))
    assert got == expected


@pytest.mark.parametrize("independent", [True, False])
def test_interop_corpus_frames(independent):
    """liblz4 LZ4F-compress every corpus file (64 KiB blocks, both block
    modes); our frame decoder (spec engine, exercising the full header /
    checksum / window stack) must invert it."""
    for name, data in _corpus_payloads():
        frame = liblz4.lz4f_compress_frame_streaming(
            data,
            block_size=1 << 16,
            independent_blocks=independent,
            content_checksum=True,
        )
        assert decompress_frame(frame, engine="spec") == data, name


def test_interop_corpus_frames_native_engine():
    """Same direction through the native block engine under the frame layer."""
    for name, data in _corpus_payloads()[::3]:
        frame = liblz4.lz4f_compress_frame_streaming(
            data, block_size=1 << 16, independent_blocks=True
        )
        assert decompress_frame(frame, engine="native") == data, name
