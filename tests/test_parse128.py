"""Lane-parallel parser experiment (experiments/parse128.py) vs a host oracle."""

import pytest

from lz4tpu.spec.block import compress_block
from lz4tpu.spec.table import U16Table


def host_records(comp: bytes):
    """Reference record extraction mirroring raw/decompress.rs:59-78."""
    recs = []
    pos, n = 0, len(comp)
    out_len = 0
    while pos < n:
        token = comp[pos]
        pos += 1
        lit = token >> 4
        if lit == 0xF:
            while True:
                b = comp[pos]
                pos += 1
                lit += b
                if b != 0xFF:
                    break
        lit_src = pos
        pos += lit
        if n - pos < 2:
            recs.append((lit_src, lit, 1, 0))
            break
        off = comp[pos] | (comp[pos + 1] << 8)
        pos += 2
        ml = token & 0xF
        if ml == 0xF:
            while True:
                b = comp[pos]
                pos += 1
                ml += b
                if b != 0xFF:
                    break
        recs.append((lit_src, lit, off, ml + 4))
        out_len += lit + ml + 4
    return recs


def test_parse128_matches_host_oracle(corpus_sample):
    from lz4tpu.experiments.parse128 import parse_blocks_128

    payloads = [
        corpus_sample(130 + s, 1500 + 211 * s) for s in range(6)
    ] + [b"\x00" * 2000, b"ab" * 700, bytes(range(256)) * 4, b"xyz"]
    comp = [bytes(compress_block(p, 0, U16Table())) for p in payloads]
    got, status = parse_blocks_128(comp, output_limit=1 << 16)
    for i, c in enumerate(comp):
        assert status[i] == 0, (i, status[i])
        assert got[i] == host_records(c), i


def test_parse128_long_lsic_sentinel():
    """LSIC chains beyond the static bound flag the fallback sentinel."""
    from lz4tpu.experiments.parse128 import parse_blocks_128

    big_rle = bytes(compress_block(b"\x00" * 60_000, 0, U16Table()))
    _, status = parse_blocks_128([big_rle], output_limit=1 << 16)
    assert status[0] != 0  # host fallback path


def test_parse128_detects_errors():
    from lz4tpu.experiments.parse128 import parse_blocks_128
    from lz4tpu.spec.block import DecodeError  # noqa: F401

    bad = [
        bytes([0x10, ord("a"), 2, 0]),  # invalid offset
        bytes([0x10, ord("a"), 0, 0]),  # zero offset
        bytes([0x5F, ord("a")]),  # truncated LSIC
    ]
    _, status = parse_blocks_128(bad, output_limit=4096)
    assert all(s != 0 for s in status), status
