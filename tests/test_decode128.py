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


@pytest.mark.slow
def test_decode128_tail_soft_limit():
    """The reference's output_limit is SOFT for the final literal-only
    sequence: it may exceed the limit by up to input-length bytes
    (decompress.rs:57-58 — the :72-74 check fires on matches only), and
    spec/native/v4 all return such output.  decode128 must match — small
    overruns fit the static buffer's slack; bigger ones must route to the
    host fallback rather than silently clip to the buffer."""

    def literal_block(payload: bytes) -> bytes:
        ext = len(payload) - 15
        lsic = bytearray()
        while ext >= 255:
            lsic.append(255)
            ext -= 255
        lsic.append(ext)
        return bytes([0xF0]) + bytes(lsic) + payload

    import numpy as np

    from lz4tpu.kernels.decode128 import decompress_blocks_128
    from lz4tpu.spec.block import decompress_block

    rng = np.random.default_rng(11)
    small = rng.integers(0, 256, 5000, dtype=np.uint8).tobytes()
    big = rng.integers(0, 256, 8000, dtype=np.uint8).tobytes()
    for payload in (small, big):
        block = literal_block(payload)
        assert bytes(decompress_block(block, output_limit=4096)) == payload
        assert decompress_blocks_128([block], block_maxsize=4096) == [payload]
    # matches past the limit stay HARD errors
    bad = literal_block(small) + bytes([0x14, 1, 0])
    with pytest.raises(DecodeError) as e:
        decompress_blocks_128([bad], block_maxsize=4096)
    assert e.value.kind == DecodeError.KIND_MEMORY_LIMIT


@pytest.mark.slow
def test_decode128_reentrant_lsic(monkeypatch, corpus_sample):
    """LSIC chains longer than the unrolled window suspend and resume
    in-kernel across rounds (PH_LIT / PH_MATCH continuation) — no host
    fallback.  Covers: long match chains (RLE runs), long literal chains
    (incompressible runs > 15+LSIC_STEPS*255 bytes), several long fields
    per block, and normal lanes sharing the batch."""
    import numpy as np

    import lz4tpu.kernels.decode128 as d128

    rng = np.random.default_rng(77)
    incompressible = rng.integers(0, 256, 6000, dtype=np.uint8).tobytes()
    payloads = [
        b"\x00" * 12_000,  # match LSIC ~47 ext bytes => ~6 resume rounds
        incompressible,  # literal LSIC ~23 ext bytes
        incompressible[:3000] + b"\x07" * 5000 + incompressible[3000:],
        b"ordinary lane " * 40,
        corpus_sample(142, 4000),
        b"\xff" * 2_100,  # literal-ish boundary: matches on 0xff runs
    ]
    comp = [bytes(compress_block(p, 0, U16Table())) for p in payloads]

    def no_fallback(*a, **k):  # the wrapper must never need the v4 engine
        raise AssertionError("host fallback invoked for a long-LSIC lane")

    import lz4tpu.kernels.decompress_v4 as v4

    monkeypatch.setattr(v4, "decompress_blocks_v4", no_fallback)
    assert d128.decompress_blocks_128(comp, block_maxsize=1 << 14) == payloads


@pytest.mark.slow
def test_decode128_prefix_dictionary(corpus_sample):
    """Lane-parallel prefix/dictionary decode: outputs are seeded with
    right-aligned per-lane prefixes and offsets resolve into them
    (decompress.rs:84-99), differential vs the spec engine."""
    from lz4tpu.kernels.decode128 import decompress_blocks_128
    from lz4tpu.spec.table import U32Table, prime_u32_table

    # trivial hand vector: match entirely from the prefix
    out = decompress_blocks_128(
        [bytes([0x12, ord("Q"), 2, 0])], prefixes=[b"ab"], block_maxsize=4096
    )
    assert out == [b"QbQbQbQ"]

    dictionary = corpus_sample(95, 30_000)
    payloads, prefixes, comp = [], [], []
    for s in range(5):
        data = corpus_sample(96 + s, 6_000) + dictionary[s * 100 : s * 100 + 2_000]
        table = U32Table()
        prime_u32_table(table, dictionary)
        comp.append(bytes(compress_block(dictionary + data, len(dictionary), table)))
        payloads.append(data)
        prefixes.append(dictionary)
    # mixed prefix lengths in one batch (incl. empty)
    payloads.append(b"plain lane " * 40)
    comp.append(bytes(compress_block(payloads[-1], 0, U32Table())))
    prefixes.append(b"")
    out = decompress_blocks_128(comp, block_maxsize=1 << 14, prefixes=prefixes)
    assert out == payloads


def test_decode128_prefix_invalid_offset(corpus_sample):
    """An offset reaching beyond decoded+prefix must raise the typed
    error, not read the zero padding below the prefix."""
    import pytest

    from lz4tpu.kernels.decode128 import decompress_blocks_128

    # offset 5 at position 1 with a 2-byte prefix: 1 + 2 < 5 -> invalid
    bad = bytes([0x12, ord("Q"), 5, 0])
    with pytest.raises(DecodeError) as e:
        decompress_blocks_128([bad], prefixes=[b"ab"], block_maxsize=4096)
    assert e.value.kind == DecodeError.KIND_INVALID_OFFSET


@pytest.mark.slow
def test_decode128_cb_knob_variants(corpus_sample):
    """Every allowed LZ4TPU_D128_CB (8/32/64 here; 16 is the default the
    rest of the suite runs) must decode correctly — the fused place
    window, ring size and FLUSH_THRESH are all CB-dependent (regression:
    a fixed 16-row window silently truncated matches at CB=32, and a
    FLUSH_THRESH below FLUSH_B published never-written rows at CB=64)."""
    import importlib
    import os

    import lz4tpu.kernels.decode128 as d128

    payloads = [
        corpus_sample(210, 5000),
        b"\x00" * 9000,  # long RLE: multi-round match chunks
        b"chunky " * 700,
        bytes(range(256)) * 16,
    ]
    from lz4tpu.spec.table import U32Table as _U32

    comp = [bytes(compress_block(p, 0, _U32())) for p in payloads]
    old = os.environ.get("LZ4TPU_D128_CB")
    try:
        for cb in ("8", "32", "64"):
            os.environ["LZ4TPU_D128_CB"] = cb
            importlib.reload(d128)
            assert (
                d128.decompress_blocks_128(comp, block_maxsize=1 << 14)
                == payloads
            ), f"CB={cb}"
    finally:
        if old is None:
            os.environ.pop("LZ4TPU_D128_CB", None)
        else:
            os.environ["LZ4TPU_D128_CB"] = old
        importlib.reload(d128)


@pytest.mark.slow
def test_decode128_seq2_knob(corpus_sample):
    """SEQ2=0 (single-sequence rounds) must decode identically — the
    phase-2 machinery is a pure round-count optimization."""
    import importlib
    import os

    import lz4tpu.kernels.decode128 as d128
    from lz4tpu.spec.table import U32Table as _U32

    payloads = [
        corpus_sample(300, 4000),
        b"\x00" * 5000,
        bytes(range(256)) * 8,
        b"seq2 " * 500,
    ]
    comp = [bytes(compress_block(p, 0, _U32())) for p in payloads]
    old = os.environ.get("LZ4TPU_D128_SEQ2")
    try:
        os.environ["LZ4TPU_D128_SEQ2"] = "0"
        importlib.reload(d128)
        assert not d128.SEQ2
        assert d128.decompress_blocks_128(comp, block_maxsize=1 << 14) == payloads
    finally:
        if old is None:
            os.environ.pop("LZ4TPU_D128_SEQ2", None)
        else:
            os.environ["LZ4TPU_D128_SEQ2"] = old
        importlib.reload(d128)


@pytest.mark.slow
def test_decode128_gated_refill_stall_paths(monkeypatch, corpus_sample):
    """Regression guard for comp-page refill gating (REFILL_K > 1): lanes
    stalled at a group boundary must idle their parse AND literal copy
    for the round and resume identically after the next granted refill.
    Multi-KiB payloads cross several GROUP_W*4-byte comp groups."""
    import numpy as np

    import lz4tpu.kernels.decode128 as d128
    from lz4tpu.spec.table import U32Table

    rng = np.random.default_rng(55)
    payloads = [
        corpus_sample(150, 9000),
        corpus_sample(151, 7000),
        rng.integers(0, 256, 6000, dtype=np.uint8).tobytes(),  # incompressible
        (b"abcdefgh" * 50 + rng.integers(0, 256, 120, dtype=np.uint8).tobytes()) * 14,
    ]
    comp = [bytes(compress_block(p, 0, U32Table())) for p in payloads]
    for K in (2, 4):
        monkeypatch.setattr(d128, "REFILL_K", K)
        d128._decode128_jit.clear_cache()
        assert d128.decompress_blocks_128(comp, block_maxsize=1 << 14) == payloads
    d128._decode128_jit.clear_cache()


@pytest.mark.slow
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


@pytest.mark.slow
def test_frame_parallel_dictionary_uses_lane_decoder(monkeypatch, corpus_sample):
    """Dictionary frames route through decode128 (per-lane right-aligned
    prefixes) on a 1-device mesh — the scalar engines must not be
    needed."""
    from lz4tpu.parallel.mesh import make_mesh
    from lz4tpu.parallel.pipeline import (
        compress_frame_parallel,
        decompress_frame_parallel,
    )

    mesh = make_mesh(1)
    dictionary = corpus_sample(200, 10_000)
    # compressible content keeps per-block comp sizes inside the lane
    # eligibility budget at 64 KiB block-maxsize + prefix rows
    data = (dictionary * 4 + b"the quick brown fox " * 3000)[:100_000]
    frame = compress_frame_parallel(
        data, block_size=1 << 16, mesh=mesh, dictionary=dictionary
    )

    import lz4tpu.kernels.decompress_v4 as v4

    def no_v4(*a, **k):
        raise AssertionError("scalar fallback used for a dict lane batch")

    monkeypatch.setattr(v4, "decompress_blocks_v4", no_v4)
    assert decompress_frame_parallel(frame, mesh=mesh, dictionary=dictionary) == data


@pytest.mark.slow
def test_decode128_hostile_corpus_safety():
    """Raw-block decode of arbitrary bytes through the lane decoder must
    produce per-lane typed statuses or valid output, never crash — and
    must agree with the spec engine (one batched kernel call; statuses
    read directly so per-lane outcomes are observable)."""
    import pathlib

    import numpy as np

    from lz4tpu.kernels import decode128 as d128
    from lz4tpu.kernels.status import OK
    from lz4tpu.spec.block import decompress_block

    corpus = pathlib.Path("/root/reference/fuzz/corpus/decode")
    if not corpus.exists():
        import pytest as _pytest

        _pytest.skip("reference corpus not mounted")
    files = sorted(corpus.iterdir())[::17]
    payloads = [p.read_bytes()[: 8 << 10] for p in files if p.stat().st_size > 0]
    payloads = payloads[:128]
    maxsize = 1 << 14

    import jax.numpy as jnp

    maxlen = max(max(len(b) for b in payloads), 4)
    rw = -(-maxlen // 4)
    rw = -(-rw // d128.GROUP_W) * d128.GROUP_W + 2 * d128.PAGE_W
    ro = -(-maxsize // 4)
    ro = -(-ro // d128.FAR_G) * d128.FAR_G + 2 * d128.FAR_W
    max_rounds = maxlen // 3 + maxsize // d128.CB // 4 + 64
    arr = np.zeros((d128.LANES, rw * 4), np.uint8)
    n = np.zeros((1, d128.LANES), np.int32)
    for i, b in enumerate(payloads):
        arr[i, : len(b)] = np.frombuffer(b, np.uint8)
        n[0, i] = len(b)
    w = arr.reshape(d128.LANES, rw, 4).astype(np.uint32)
    words = (
        w[:, :, 0] | (w[:, :, 1] << 8) | (w[:, :, 2] << 16) | (w[:, :, 3] << 24)
    ).astype(np.int32).T
    out_w, out_len, status = d128._decode128_jit(
        jnp.asarray(np.ascontiguousarray(words)), jnp.asarray(n),
        rw=rw, ro=ro, max_rounds=max_rounds, output_limit=maxsize,
    )
    out_w = np.asarray(out_w)
    out_len = np.asarray(out_len)[0]
    status = np.asarray(status)[0]

    agree = 0
    for i, raw in enumerate(payloads):
        try:
            expected = bytes(decompress_block(raw, output_limit=maxsize))
        except DecodeError:
            expected = None
        s = int(status[i])
        if s == d128.STATUS_FALLBACK:
            continue  # host falls back to the scalar engine for these
        if expected is None:
            assert s != OK, (i, s)
        else:
            assert s == OK, (i, s, len(expected))
            ww = out_w[:, i].astype(np.uint32)
            by = np.empty((ro, 4), np.uint8)
            by[:, 0] = ww & 0xFF
            by[:, 1] = (ww >> 8) & 0xFF
            by[:, 2] = (ww >> 16) & 0xFF
            by[:, 3] = (ww >> 24) & 0xFF
            assert by.reshape(-1)[: out_len[i]].tobytes() == expected, i
            agree += 1
    assert agree >= 1


def test_dispatch_shape_ladder_respects_vmem_envelope():
    """dispatch_blocks_128 quantizes batch maxlen up a geometric ladder
    for compile-universe hygiene, and must never quantize past the VMEM
    eligibility envelope.  With the explicit vmem_limit_bytes stack
    claim (the historical ~16 MB edge was the XLA default scoped budget,
    not hardware) every 64 KiB-block comp shape is eligible — incl. the
    worst-case expansion rung — while big-block shapes stay decodebig's
    domain.  The quantize-fallback logic remains live for env-narrowed
    envelopes (LZ4TPU_D128_VMEM0)."""
    from lz4tpu.kernels import decode128 as d128

    bs = 1 << 16
    # worst-case 64 KiB-block comp (incompressible + LZ4 expansion)
    worst = bs + bs // 255 + 16
    assert d128.lanes_eligible(d128.quantize_maxlen(worst), bs)
    # the scheduler plans edge batches onto SOME eligible variant
    from lz4tpu.parallel.sched import CBS, plan_batches

    plan = plan_batches([b"\x00" * 58541] * 4, bs)
    for idxs, cb in plan:
        assert cb in CBS
        assert d128.load_variant(cb).lanes_eligible(58541, bs)
    # big blocks are decodebig's domain regardless of comp size
    assert not d128.lanes_eligible(4096, 1 << 18)
    # small lengths ride the ladder
    assert d128.quantize_maxlen(20000) == 24576
    assert d128.quantize_maxlen(33000) == 49152
    assert d128.lanes_eligible(49152, bs)
