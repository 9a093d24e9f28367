"""HBM-staged big-block lane decoder (kernels/decodebig.py).

CPU interpret tests shrink the bands and the offset window (with data
whose offsets respect it) so the banding machinery — half-band DMAs,
lane pauses, the far-page-over-band, the cross-band deadlock backstop —
runs at tractable sizes; the real 64 KiB window / 1-4 MiB shapes run in
the on-chip matrix (tools/chip_dbig_check.py)."""

import random

import pytest

from lz4tpu.spec.block import DecodeError, compress_block
from lz4tpu.spec.table import U32Table


def local_data(seed: int, size: int) -> bytes:
    """Locally-repetitive data: match offsets stay well under 4 KiB, so
    a shrunken window_bound is honest."""
    r = random.Random(seed)
    out = bytearray()
    while len(out) < size:
        pat = bytes(r.getrandbits(8) for _ in range(r.randint(20, 180)))
        out.extend(pat * r.randint(2, 8))
        out.extend(bytes(r.getrandbits(8) for _ in range(r.randint(5, 120))))
    return bytes(out[:size])


@pytest.mark.slow
def test_decodebig_banded_roundtrip():
    """Blocks several times the output band: both bands advance many
    times; every lane must finish in-kernel."""
    import lz4tpu.kernels.decodebig as dbig
    import lz4tpu.native as native

    payloads = [local_data(1000 + s, 60_000) for s in range(5)]
    comp = [bytes(compress_block(p, 0, U32Table())) for p in payloads]

    orig = native.decompress_block

    def no_fallback(*a, **k):
        raise AssertionError("host fallback used for a homogeneous batch")

    native.decompress_block = no_fallback
    try:
        out = dbig.decompress_blocks_big(
            comp, block_maxsize=1 << 16, _window_bound=8192,
            _oband=6144, _cband=2048,
        )
    finally:
        native.decompress_block = orig
    assert out == payloads


@pytest.mark.slow
def test_decodebig_divergent_ratio_backstop():
    """A heavy-RLE lane races ahead in output while pinning the comp
    band (cross-band deadlock); the no-progress backstop must hand the
    blocking lanes to the host fallback and the batch must still decode
    exactly."""
    import lz4tpu.kernels.decodebig as dbig

    payloads = [local_data(1000 + s, 60_000) for s in range(5)]
    payloads.append(b"\x07" * 50_000 + local_data(1010, 10_000))
    comp = [bytes(compress_block(p, 0, U32Table())) for p in payloads]
    out = dbig.decompress_blocks_big(
        comp, block_maxsize=1 << 16, _window_bound=8192,
        _oband=6144, _cband=2048,
    )
    assert out == payloads


@pytest.mark.slow
def test_decodebig_window_repack_divergent_mix():
    """With the window-aligned comp layout, divergent-ratio lanes share
    the comp band without cross-band stalls: the RLE + incompressible mix
    that wedges the raw layout must stay in-kernel (small-offset lanes)
    and still decode exactly."""
    import lz4tpu.kernels.decodebig as dbig
    import lz4tpu.native as native

    payloads = [local_data(1000 + s, 60_000) for s in range(4)]
    payloads.append(b"\x07" * 50_000 + local_data(1010, 10_000))
    comp = [bytes(compress_block(p, 0, U32Table())) for p in payloads]

    orig = native.decompress_block

    def no_fallback(*a, **k):
        raise AssertionError("fallback used despite window repack")

    native.decompress_block = no_fallback
    try:
        out = dbig.decompress_blocks_big(
            comp, block_maxsize=1 << 16, repack=True,
            _window_bound=8192, _oband=6144, _cband=6144,
        )
    finally:
        native.decompress_block = orig
    assert out == payloads


@pytest.mark.slow
def test_decodebig_repack_oracle():
    """_repack_block reassembles to the original output through the spec
    decoder chunk-math: decoding the repacked layout via the kernel
    equals the raw decode, for data with long literal runs crossing
    windows and long matches leaving windows empty."""
    import numpy as np

    import lz4tpu.kernels.decodebig as dbig

    rng = np.random.default_rng(12)
    payloads = [
        rng.integers(0, 256, 20_000, dtype=np.uint8).tobytes(),  # one huge lit run
        b"\x00" * 30_000 + local_data(1020, 5_000),  # windows emptied by a match
        local_data(1021, 9_000) + rng.integers(0, 256, 9_000, dtype=np.uint8).tobytes(),
    ]
    comp = [bytes(compress_block(p, 0, U32Table())) for p in payloads]
    out = dbig.decompress_blocks_big(
        comp, block_maxsize=1 << 16, repack=True,
        _window_bound=8192, _oband=6144, _cband=6144,
    )
    assert out == payloads
    # hostile inputs validate during repack with typed errors
    with pytest.raises(DecodeError):
        dbig.decompress_blocks_big(
            [b"\xf0\xff\xff"], block_maxsize=1 << 16, repack=True,
            _oband=6144, _cband=6144,
        )


@pytest.mark.slow
def test_decodebig_error_kinds_and_tail():
    import lz4tpu.kernels.decodebig as dbig

    for bad, kind in [
        (bytes([0x10, ord("a"), 2, 0]), DecodeError.KIND_INVALID_OFFSET),
        (bytes([0x10, ord("a"), 0, 0]), DecodeError.KIND_ZERO_OFFSET),
        (bytes([0x50, ord("a")]), DecodeError.KIND_UNEXPECTED_END),
    ]:
        with pytest.raises(DecodeError) as e:
            dbig.decompress_blocks_big(
                [bad], block_maxsize=1 << 16, _window_bound=8192,
                _oband=6144, _cband=2048,
            )
        assert e.value.kind == kind


def test_native_repack_matches_python_oracle():
    """The C++ window repack (lz4tpu_repack_window, the shipping host
    layout pass) is byte-identical to the Python ``_repack_block`` oracle
    — chunk lengths, chunk bytes, total output, and error kinds on
    hostile inputs."""
    import numpy as np

    import lz4tpu.kernels.decodebig as dbig
    from lz4tpu.native import repack_window_into, repack_window_lens

    rng = np.random.default_rng(7)
    payloads = [
        local_data(99, 40_000),
        rng.integers(0, 256, 20_000, dtype=np.uint8).tobytes(),
        b"\x00" * 30_000 + local_data(1020, 5_000),
        b"",
    ]
    comp = [bytes(compress_block(p, 0, U32Table())) for p in payloads]
    for c, p in zip(comp, payloads):
        ch, tot = dbig._repack_block(c, 1 << 16)
        lens, tot2 = repack_window_lens(c, 1 << 16, dbig.WS_LOG)
        assert tot2 == tot == len(p)
        assert [len(x) for x in ch] == lens.tolist()
        win_r = -(-(int(lens.max(initial=0)) + 16) // 512) * 512
        out = np.zeros(max(len(lens), 1) * win_r, np.uint8)
        nc = repack_window_into(c, 1 << 16, dbig.WS_LOG, win_r, out)
        assert nc == len(ch)
        for k, x in enumerate(ch):
            assert out[k * win_r : k * win_r + len(x)].tobytes() == bytes(x)
    # hostile inputs raise the same typed kinds
    r = random.Random(3)
    for _ in range(300):
        c = bytes(r.randrange(256) for _ in range(r.randrange(1, 64)))
        k1 = k2 = None
        try:
            dbig._repack_block(c, 4096)
        except DecodeError as e:
            k1 = e.kind
        try:
            repack_window_lens(c, 4096, dbig.WS_LOG)
        except DecodeError as e:
            k2 = e.kind
        assert k1 == k2


@pytest.mark.slow
def test_decodebig_prefix_mode():
    """Dictionary/window prefixes seeded into the initial output band
    (decompress.rs:84-99 semantics at big-block geometry): blocks whose
    offsets reach back into per-lane prefixes must decode in-kernel,
    including across band advances."""
    import lz4tpu.kernels.decodebig as dbig
    import lz4tpu.native as native
    from lz4tpu.spec.table import prime_u32_table

    prefixes, payloads, comp = [], [], []
    for s in range(4):
        pfx = local_data(7000 + s, 3000)
        # body leads with prefix substrings so early matches MUST reach
        # back into the seeded prefix rows
        body = pfx[500:1800] + pfx[2000:2900] + local_data(7100 + s, 40_000)
        # compress [prefix | body] from cursor=len(prefix): matches may
        # reach into the prefix
        t = U32Table()
        prime_u32_table(t, pfx)
        c = bytes(compress_block(pfx + body, len(pfx), t))
        prefixes.append(pfx)
        payloads.append(body)
        comp.append(c)

    orig = native.decompress_block

    def no_fallback(*a, **k):
        raise AssertionError("host fallback used in prefix-mode batch")

    native.decompress_block = no_fallback
    try:
        out = dbig.decompress_blocks_big(
            comp, block_maxsize=1 << 16, prefixes=prefixes,
            _window_bound=8192, _oband=6144, _cband=2048,
        )
    finally:
        native.decompress_block = orig
    assert out == payloads
