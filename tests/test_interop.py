"""Byte-for-byte interop vs the installed C liblz4 (ctypes oracle).

Replicates the reference's bit-exactness oracle
(``/root/reference/tests/output_equivalence.rs:58-101``), which shells out
to the ``lz4`` CLI.  This image has no CLI but ships ``liblz4.so.1.9.4``;
``lz4tpu.interop`` reproduces the CLI's output through the **streaming**
LZ4F API (one-shot ``LZ4F_compressFrame`` auto-shrinks the block size for
small inputs, so it is NOT the right oracle).

Matrix axes = the reference's {content checksum, linked blocks, content
size, dictionary} plus block sizes and block checksums.  Parity
expectations mirror the reference's own documented behavior
(``/root/reference/README.md:14-15``):

* byte-for-byte EQUAL in every linked-block cell, every 4 MiB-block cell,
  and the dictionary cells (verified here against liblz4 1.9.4);
* independent blocks at non-default block sizes (64 KiB / 256 KiB) are the
  reference's known exception — its own suite ``continue``s past ``-B5``
  (``output_equivalence.rs:72-75``).  There we assert valid LZ4 in both
  cross-decode directions instead, like the reference documents.
"""

import itertools

import pytest

from lz4tpu import CompressionSettings, decompress_frame
from lz4tpu import interop
from lz4tpu.spec.block import compress_block, decompress_block
from lz4tpu.spec.table import U16Table, U32Table

pytestmark = pytest.mark.skipif(
    not interop.available(), reason="liblz4 not installed in this image"
)

# the reference's interop input is "the test executable itself"
# (output_equivalence.rs:83); ours is a real binary from the image
INPUT = open("/usr/bin/g++", "rb").read()[:300_000]
DICT = INPUT[100_000:100_000 + 65_536]

# cells where liblz4 and the lineage (reference = this repo) are
# byte-identical; independent × non-default block size is the documented
# known exception
def expect_parity(linked: bool, block_size: int) -> bool:
    return linked or block_size == (1 << 22)


def our_frame(data, *, linked=False, block_size=1 << 22, content_checksum=True,
              block_checksums=False, content_size=False, dictionary=None,
              dict_id=0, engine="native"):
    s = CompressionSettings().engine(engine)
    s.independent_blocks(not linked)
    s.block_size(block_size)
    s.content_checksum(content_checksum)
    s.block_checksums(block_checksums)
    if dictionary is not None:
        s.dictionary(dict_id, dictionary)
    return s.compress_bytes(data, with_size=content_size)


@pytest.mark.parametrize(
    "content_checksum,linked,content_size,block_size",
    list(itertools.product([True, False], [False, True], [False, True],
                           [1 << 22, 1 << 16, 1 << 18])),
)
def test_output_equivalence_matrix(content_checksum, linked, content_size, block_size):
    frame_c = interop.lz4f_compress_frame_streaming(
        INPUT,
        block_size=block_size,
        independent_blocks=not linked,
        content_checksum=content_checksum,
        content_size=content_size,
    )
    frame_us = our_frame(
        INPUT,
        linked=linked,
        block_size=block_size,
        content_checksum=content_checksum,
        content_size=content_size,
    )
    if expect_parity(linked, block_size):
        assert frame_c == frame_us
    else:
        # known exception: both must still be valid LZ4 in both directions
        assert frame_c != frame_us  # if this starts passing, tighten the matrix
    assert interop.lz4f_decompress_frame(frame_us) == INPUT
    assert decompress_frame(frame_c) == INPUT


@pytest.mark.parametrize("linked", [False, True])
def test_output_equivalence_dictionary(linked):
    """The reference's ``-D`` axis (output_equivalence.rs:78-81)."""
    frame_c = interop.lz4f_compress_frame_streaming(
        INPUT, dictionary=DICT, dictionary_id=7, independent_blocks=not linked
    )
    frame_us = our_frame(INPUT, linked=linked, dictionary=DICT, dict_id=7)
    assert frame_c == frame_us
    assert interop.lz4f_decompress_frame(frame_us, dictionary=DICT) == INPUT
    assert decompress_frame(frame_c, dictionary=DICT) == INPUT


def test_output_equivalence_block_checksums():
    frame_c = interop.lz4f_compress_frame_streaming(INPUT, block_checksums=True)
    frame_us = our_frame(INPUT, block_checksums=True)
    assert frame_c == frame_us
    assert interop.lz4f_decompress_frame(frame_us) == INPUT
    assert decompress_frame(frame_c) == INPUT


def test_output_equivalence_spec_engine_sample():
    """The pure-NumPy spec engine hits the same bytes as liblz4 (smaller
    input: the spec engine is the slow oracle).  The input must exceed
    64 KiB: below that liblz4 switches to its byU16 parse inside frames,
    while the reference lineage always uses the U32 table in frames —
    part of the documented small-block non-parity."""
    data = INPUT[:100_000]
    frame_c = interop.lz4f_compress_frame_streaming(data)
    assert our_frame(data, engine="spec") == frame_c


def test_raw_block_parity_and_cross_decode(corpus_sample):
    """Raw blocks: LZ4_compress_default == compress_block with the
    lib.rs:24-32 U16/U32 size dispatch, plus both decode directions."""
    samples = [
        INPUT[:50_000],          # binary, U16 table
        INPUT,                   # binary, U32 table
        corpus_sample(5, 30_000),
        corpus_sample(6, 120_000),
        b"a" * 10_000,
    ]
    for data in samples:
        table = U16Table() if len(data) <= 0xFFFF else U32Table()
        ours = bytes(compress_block(data, 0, table))
        theirs = interop.lz4_compress_default(data)
        assert ours == theirs, len(data)
        assert interop.lz4_decompress_safe(ours, len(data)) == data
        assert bytes(decompress_block(theirs, output_limit=len(data) or 1)) == data


def test_raw_block_empty_input_known_difference():
    """Empty raw block: the reference emits nothing (the compress2 loop
    body never runs, ``compress/mod.rs:171``) while C emits a lone 0x00
    token.  We follow the reference; both decode to empty, and the frame
    layer never emits zero-length blocks so frames still agree."""
    assert bytes(compress_block(b"", 0, U16Table())) == b""
    c = interop.lz4_compress_default(b"")
    assert c == b"\x00"
    assert bytes(decompress_block(c, output_limit=16)) == b""


@pytest.mark.parametrize("accel", [1, 2, 9, 33])
def test_raw_block_acceleration_parity(accel, corpus_sample):
    data = corpus_sample(7, 80_000)
    ours = bytes(compress_block(data, 0, U32Table(), acceleration=accel))
    theirs = interop.lz4_compress_fast(data, acceleration=accel)
    assert ours == theirs


def test_native_engine_matches_c_on_every_block_size():
    """The C++ native engine (the default) hits liblz4's bytes through the
    full frame path for the parity cells."""
    for block_size in (1 << 16, 1 << 18, 1 << 20, 1 << 22):
        frame_c = interop.lz4f_compress_frame_streaming(
            INPUT, block_size=block_size, independent_blocks=False
        )
        frame_us = our_frame(INPUT, linked=True, block_size=block_size)
        assert frame_c == frame_us, block_size
