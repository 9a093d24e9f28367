"""Raw block codec spec tests.

Includes the reference's own executable-spec vectors
(``/root/reference/src/raw/decompress.rs:141-176``) and the crate-root
roundtrip suite (``/root/reference/src/lib.rs:18-107``).
"""

import pytest

from lz4tpu.spec.block import (
    DecodeError,
    Incompressible,
    compress_block,
    decompress_block,
)
from lz4tpu.spec.table import U16Table, U32Table, prime_u32_table


def compress(data: bytes) -> bytes:
    """Size-dispatched table choice, mirroring ``lib.rs:24-32``."""
    table = U16Table() if len(data) <= 0xFFFF else U32Table()
    return bytes(compress_block(data, 0, table))


def roundtrip(data: bytes):
    compressed = compress(data)
    assert bytes(decompress_block(compressed)) == data
    return compressed


# -- reference decode vectors (raw/decompress.rs:154-175) -------------------


def test_lots_of_aaaaaa():
    assert bytes(decompress_block(bytes([0x11, ord("a"), 1, 0]))) == b"aaaaaa"


def test_multiple_repeated_blocks():
    assert (
        bytes(decompress_block(bytes([0x11, ord("a"), 1, 0, 0x22, ord("b"), ord("c"), 2, 0])))
        == b"aaaaaabcbcbcbc"
    )


def test_all_literal():
    assert bytes(decompress_block(b"\x30a49")) == b"a49"


def test_offset_oob():
    with pytest.raises(DecodeError):
        decompress_block(bytes([0x10, ord("a"), 2, 0]))
    with pytest.raises(DecodeError):
        decompress_block(bytes([0x40, ord("a"), 1, 0]))


def test_zero_offset():
    with pytest.raises(DecodeError) as e:
        decompress_block(bytes([0x10, ord("a"), 0, 0]))
    assert e.value.kind == DecodeError.KIND_ZERO_OFFSET


def test_memory_limit():
    # match of ~64KB against limit
    data = bytes([0x1F, ord("a"), 1, 0, 0xFF, 0xFF, 0xFF, 0x10])
    with pytest.raises(DecodeError) as e:
        decompress_block(data, output_limit=500)
    assert e.value.kind == DecodeError.KIND_MEMORY_LIMIT


def test_truncated_literals():
    with pytest.raises(DecodeError):
        decompress_block(bytes([0x50, ord("a")]))


def test_trailing_single_byte_token_semantics():
    # after a complete sequence, 1 leftover byte is re-read as a token:
    # high nibble 0 -> clean EOF; nonzero -> UnexpectedEnd
    ok = bytes([0x11, ord("a"), 1, 0, 0x00])
    assert bytes(decompress_block(ok)) == b"aaaaaa"
    bad = bytes([0x11, ord("a"), 1, 0, 0x20])
    with pytest.raises(DecodeError):
        decompress_block(bad)


# -- prefix / dictionary behaviour ------------------------------------------


def test_prefix_resolution():
    # offset reaches entirely into the prefix (token 0x00: 0 literals, match_len 4)
    out = decompress_block(bytes([0x00, 4, 0]), prefix=b"wxyz")
    assert bytes(out) == b"wxyz"
    # offset spans prefix boundary: 2 from prefix then 4 from output
    out = decompress_block(bytes([0x12, ord("Q"), 2, 0]), prefix=b"ab")
    # literals: 'Q'; match offset 2 len 6: needs 1 byte of prefix ('b'),
    # then continues within output: b,Q,b,Q,b
    assert bytes(out) == b"QbQbQbQ"


def test_prefix_insufficient():
    with pytest.raises(DecodeError) as e:
        decompress_block(bytes([0x00, 10, 0]), prefix=b"abc")
    assert e.value.kind == DecodeError.KIND_INVALID_OFFSET


# -- roundtrip suite (lib.rs:18-107) ----------------------------------------


@pytest.mark.parametrize(
    "s",
    [
        "to live or not to live",
        "Love is a wonderful terrible thing",
        "There is nothing either good or bad, but thinking makes it so.",
        "I burn, I pine, I perish.",
        "To cute to die! Save the red panda!",
        "You are 60% water. Save 60% of yourself!",
        "Save water, it doesn't grow on trees.",
        "The panda bear has an amazing black-and-white fur.",
        "The average panda eats as much as 9 to 14 kg of bamboo shoots a day.",
        "The Empress Dowager Bo was buried with a panda skull in her vault",
        "as6yhol.;jrew5tyuikbfewedfyjltre22459ba",
        "jhflkdjshaf9p8u89ybkvjsdbfkhvg4ut08yfrr",
        "ahhd",
        "ahd",
        "x-29",
        "x",
        "k",
        ".",
        "ajsdh",
        "",
        "\0\0\0\0\0\0\0\0\0\0\0\0\0",
    ],
)
def test_inverse(s):
    roundtrip(s.encode())


def test_compression_works():
    s = (
        b"The Read trait allows for reading bytes from a source. Implementors "
        b"of the Read trait are called 'readers'. Readers are defined by one "
        b"required method, read()."
    )
    compressed = roundtrip(s)
    assert len(compressed) < len(s)


def test_big_compression():
    # scaled-down version of lib.rs:98-106 (80 MB there; pattern is periodic)
    n = 300_000
    s = bytes(((i * 0xA + 33) ^ 0xA2) & 0xFF for i in range(n))
    assert bytes(decompress_block(compress(s))) == s


def test_mixed_corpus_roundtrip(corpus_sample):
    for seed in range(6):
        data = corpus_sample(seed, 40_000 + seed * 7919)
        roundtrip(data)


def test_acceleration_roundtrips(corpus_sample):
    data = corpus_sample(42, 60_000)
    base = compress_block(data, 0, U16Table())
    for acc in (2, 4, 17, 65):
        fast = compress_block(data, 0, U16Table(), acceleration=acc)
        assert bytes(decompress_block(fast)) == data
        # higher acceleration may never beat the default parse
        assert len(fast) >= len(base) or acc == 1


def test_cap_incompressible(rng):
    data = bytes(rng.getrandbits(8) for _ in range(5000))
    with pytest.raises(Incompressible):
        compress_block(data, 0, U16Table(), cap=len(data))


def test_linked_blocks_with_table_slide(corpus_sample):
    """Two-block linked-mode compression: block 2's matches may reach into
    block 1's trailing window, with table positions remapped via slide()."""
    window = 1 << 16
    data = corpus_sample(7, 200_000)
    table = U32Table()
    blocks = []
    buf = bytearray()
    pos = 0
    block_size = 65536
    while pos < len(data):
        chunk = data[pos : pos + block_size]
        pos += len(chunk)
        cursor = len(buf)
        buf.extend(chunk)
        blocks.append(bytes(compress_block(bytes(buf), cursor, table)))
        if len(buf) > window:
            forget = len(buf) - window
            table.slide(forget)
            del buf[:forget]

    # decode with carry-over window
    out = bytearray()
    windowbuf = bytearray()
    for blk in blocks:
        block_out = decompress_block(blk, prefix=bytes(windowbuf))
        out.extend(block_out)
        windowbuf.extend(block_out)
        if len(windowbuf) > window:
            del windowbuf[: len(windowbuf) - window]
    assert bytes(out) == data


def test_dictionary_priming_matches_sequential():
    """Vectorised priming == sequential reference insertion order."""
    import numpy as np

    rngdata = bytes((i * 31 + (i >> 3)) & 0xFF for i in range(5000))
    fast = U32Table()
    prime_u32_table(fast, rngdata)
    slow = U32Table()
    for off in range(0, len(rngdata) - 7, 3):
        slow.replace(rngdata, off)
    assert np.array_equal(fast.dict, slow.dict)


def test_dictionary_compress_decompress():
    dictionary = b"some very common shared words appear in this dictionary " * 10
    data = b"common shared words appear here too, very common indeed"
    table = U32Table()
    prime_u32_table(table, dictionary)
    buf = dictionary + data
    compressed = bytes(compress_block(buf, len(dictionary), table))
    plain = bytes(compress_block(data, 0, U32Table()))
    assert len(compressed) < len(plain)  # dictionary must actually help
    out = decompress_block(compressed, prefix=dictionary)
    assert bytes(out) == data
