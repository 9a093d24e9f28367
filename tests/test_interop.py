"""Byte-for-byte interop vs the system ``lz4`` CLI, when present.

Replicates the reference's bit-exactness oracle
(``/root/reference/tests/output_equivalence.rs``): compress the same input
with the C implementation and with every engine here over the flag matrix
{content checksum, linked blocks, content size} and assert identical
archives.  The build image has no ``lz4`` binary, so these tests skip
there — the three in-repo engines are still pairwise differentially
tested (tests/test_native.py, tests/test_kernels*.py), which pins them
to the executable spec of the same parse the C implementation uses.
"""

import itertools
import shutil
import subprocess
import tempfile

import pytest

from lz4tpu import CompressionSettings, decompress_frame

LZ4_BIN = shutil.which("lz4")

pytestmark = pytest.mark.skipif(LZ4_BIN is None, reason="system lz4 CLI not installed")


def lz4_cli(data: bytes, args) -> bytes:
    with tempfile.NamedTemporaryFile() as fin:
        fin.write(data)
        fin.flush()
        out = subprocess.run(
            [LZ4_BIN, "-z", "-q", *args, fin.name, "-c"],
            check=True,
            capture_output=True,
        )
        return out.stdout


@pytest.mark.parametrize("content_checksum", [True, False])
@pytest.mark.parametrize("linked", [True, False])
@pytest.mark.parametrize("content_size", [True, False])
def test_output_equivalence(corpus_sample, content_checksum, linked, content_size):
    data = corpus_sample(1, 200_000)
    args = []
    if not content_checksum:
        args.append("--no-frame-crc")
    if linked:
        args.append("-BD")
    if content_size:
        args.append("--content-size")

    reference = lz4_cli(data, args)
    ours = (
        CompressionSettings()
        .engine("native")
        .content_checksum(content_checksum)
        .independent_blocks(not linked)
        .compress_bytes(data, with_size=content_size)
    )
    assert ours == reference


def test_cli_decodes_our_frames(corpus_sample):
    data = corpus_sample(2, 100_000)
    frame = CompressionSettings().engine("native").compress_bytes(data)
    out = subprocess.run(
        [LZ4_BIN, "-d", "-q", "-c"], input=frame, check=True, capture_output=True
    )
    assert out.stdout == data


def test_we_decode_cli_frames(corpus_sample):
    data = corpus_sample(3, 100_000)
    reference = lz4_cli(data, [])
    assert decompress_frame(reference, engine="native") == data
