"""Replay of the reference's libFuzzer corpus as deterministic tests
(``/root/reference/fuzz/fuzz_targets/{decode,interop_decode,roundtrip_fuzz}.rs``).

* ``decode`` corpus (1022 files): arbitrary bytes fed to the frame
  decoder — must either succeed or raise a typed LZ4Error, never crash
  or balloon memory.
* ``roundtrip_fuzz`` + ``interop_decode`` corpora (304 + 197 files):
  treated as plaintext — compress → decompress must be the identity,
  for both frame mode and raw-block mode.
"""

import os
import pathlib

import pytest

from lz4tpu import CompressionSettings, decompress_frame
from lz4tpu.frame.errors import LZ4Error
from lz4tpu.spec.block import DecodeError, compress_block, decompress_block
from lz4tpu.spec.table import U16Table, U32Table

CORPUS = pathlib.Path("/root/reference/fuzz/corpus")

pytestmark = pytest.mark.skipif(not CORPUS.exists(), reason="reference corpus not mounted")


def corpus_files(name):
    files = sorted((CORPUS / name).iterdir())
    assert files, name
    return files


def test_decode_corpus_total_safety():
    """Hostile input must fail cleanly (the reference's fuzz `decode` target)."""
    import collections

    outcomes = collections.Counter()
    for path in corpus_files("decode"):
        data = path.read_bytes()
        try:
            decompress_frame(data, engine="spec")
            outcomes["ok"] += 1
        except LZ4Error as e:
            outcomes[type(e).__name__] += 1
        # anything else (IndexError, MemoryError, ...) propagates = test failure
    # the corpus is frozen, so the outcome histogram is fully deterministic —
    # pin it exactly so a regression that flips failure KINDS (not just
    # success/failure) cannot slip through
    assert dict(outcomes) == {
        "WrongMagic": 661,
        "BlockSizeOverflow": 92,
        "InputTruncated": 99,
        "CodecError": 137,
        "BlockChecksumFail": 12,
        "FrameChecksumFail": 7,
        "ok": 4,
        "ReservedFlagBitsSet": 3,
        "UnsupportedVersion": 1,
        "HeaderChecksumFail": 3,
        "UnimplementedBlocksize": 2,
        "ReservedBdBitsSet": 1,
    }


@pytest.mark.parametrize("corpus", ["roundtrip_fuzz", "interop_decode"])
def test_roundtrip_corpora(corpus):
    total = 0
    for path in corpus_files(corpus):
        data = path.read_bytes()
        frame = CompressionSettings().engine("spec").compress_bytes(data)
        assert decompress_frame(frame, engine="spec") == data, path.name
        total += len(data)
    assert total > 0


def test_raw_block_roundtrip_sample():
    """Raw-block (frameless) roundtrip over a sample of corpus payloads,
    using the size-dispatched table choice of ``lib.rs:24-32``."""
    for path in corpus_files("roundtrip_fuzz")[::7]:
        data = path.read_bytes()
        if len(data) > (1 << 20):
            continue
        table = U16Table() if len(data) <= 0xFFFF else U32Table()
        compressed = compress_block(data, 0, table)
        assert bytes(decompress_block(compressed)) == data, path.name


def test_decode_corpus_raw_block_safety():
    """Raw decoder safety on arbitrary bytes with an output limit."""
    for path in corpus_files("decode")[::11]:
        data = path.read_bytes()
        try:
            decompress_block(data, output_limit=8 << 20)
        except DecodeError:
            pass
