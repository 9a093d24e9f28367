"""Mesh-sharded pipeline tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax

from lz4tpu import decompress_frame
from lz4tpu.parallel.mesh import make_mesh
from lz4tpu.parallel.pipeline import (
    compress_frame_parallel,
    decompress_frame_parallel,
)


@pytest.fixture(scope="module")
def mesh():
    n = min(len(jax.devices()), 8)
    return make_mesh(n)


def test_independent_parallel_roundtrip(mesh, corpus_sample):
    data = corpus_sample(31, 700_000)
    frame = compress_frame_parallel(data, block_size=1 << 16, mesh=mesh)
    # decodes with the ordinary streaming reader (format compatibility)
    assert decompress_frame(frame, engine="native") == data
    # and with the parallel reader
    assert decompress_frame_parallel(frame, mesh=mesh) == data


def test_independent_parallel_is_bit_exact_with_streaming(mesh, corpus_sample):
    from lz4tpu import CompressionSettings

    data = corpus_sample(32, 500_000)
    frame_parallel = compress_frame_parallel(data, block_size=1 << 16, mesh=mesh)
    frame_serial = (
        CompressionSettings().engine("native").block_size(1 << 16).compress_bytes(data)
    )
    assert frame_parallel == frame_serial


def test_parallel_linked_roundtrip(mesh, corpus_sample):
    data = corpus_sample(33, 900_000)
    frame = compress_frame_parallel(
        data, block_size=1 << 16, mesh=mesh, parallel_linked=True
    )
    # a valid linked-block frame, decodable by the ordinary reader
    assert decompress_frame(frame, engine="native") == data
    # the ring halo should beat independent mode on ratio for self-similar data
    frame_indep = compress_frame_parallel(data, block_size=1 << 16, mesh=mesh)
    assert len(frame) <= len(frame_indep)


def test_parallel_oversized_blocks_route_to_streaming_writer(mesh, corpus_sample):
    """Blocks beyond the scalar kernel's SMEM windows (e.g. the 4 MiB
    BASELINE config) must still produce the byte-identical frame the
    parity contract promises — via the native streaming writer."""
    from lz4tpu import CompressionSettings

    data = corpus_sample(34, 700_000)
    frame = compress_frame_parallel(data, block_size=1 << 22, mesh=mesh)
    serial = (
        CompressionSettings().engine("native").block_size(1 << 22).compress_bytes(data)
    )
    assert frame == serial
    assert decompress_frame_parallel(frame, mesh=mesh) == data


def test_parallel_linked_shrinks_chunks_to_kernel_budget(mesh, corpus_sample):
    """parallel_linked at block sizes whose [window|block] exceeds the
    kernel step emits smaller chunks under the declared block-maxsize —
    still a valid linked frame for any decoder."""
    data = corpus_sample(35, 800_000)
    for bs in (1 << 16, 1 << 18):
        frame = compress_frame_parallel(
            data, block_size=bs, mesh=mesh, parallel_linked=True
        )
        assert decompress_frame(frame, engine="native") == data


@pytest.mark.slow
def test_parallel_dictionary_lane_decode_on_mesh(mesh, corpus_sample):
    """Dictionary frames decode through the SHARDED lane kernel on a
    multi-device mesh (shared dict broadcast as per-lane prefixes)."""
    from lz4tpu import decompress_frame

    dictionary = corpus_sample(37, 10_000)
    data = (dictionary * 3 + b"mesh dict lanes " * 4000)[:180_000]
    frame = compress_frame_parallel(
        data, block_size=1 << 16, mesh=mesh, dictionary=dictionary
    )
    assert decompress_frame_parallel(
        frame, mesh=mesh, dictionary=dictionary, lane_kernel=True
    ) == data
    assert decompress_frame(frame, dictionary=dictionary, engine="native") == data


def test_parallel_linked_with_dictionary_roundtrips(mesh, corpus_sample):
    """Linked mode + preset dictionary: the host dict template must NOT
    ride along (its dict-coordinate positions are wrong in the
    [window-tail | block] buffers — with window < dict_len they sit
    at/ahead of the cursor and can emit zero/forward offsets).
    Regression for the zero_deduplication_offset bench failure."""
    from lz4tpu import decompress_frame

    data = corpus_sample(36, 600_000)
    for dict_len in (1 << 16, 10_000):  # full window and short (unprimed)
        dictionary = data[:dict_len]
        fl = compress_frame_parallel(
            data, block_size=1 << 16, mesh=mesh,
            parallel_linked=True, dictionary=dictionary,
        )
        assert decompress_frame(fl, dictionary=dictionary, engine="native") == data


def test_parallel_incompressible_fallback(mesh):
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, 300_000, dtype=np.uint8).tobytes()
    frame = compress_frame_parallel(data, block_size=1 << 16, mesh=mesh)
    assert len(frame) <= len(data) + 64
    assert decompress_frame_parallel(frame, mesh=mesh) == data


def test_parallel_small_input(mesh):
    for data in (b"", b"x", b"hello world " * 3):
        frame = compress_frame_parallel(data, block_size=1 << 16, mesh=mesh)
        assert decompress_frame_parallel(frame, mesh=mesh) == data


def test_graft_entry_single_chip():
    import __graft_entry__ as g

    fn, args = g.entry()
    out_w, out_len, status = [np.asarray(x) for x in fn(*args)]
    # decode128 contract: transposed words out, (1, LANES) statuses,
    # (3, LANES) lens/done-at-round/rounds-run diagnostics
    assert (status == 0).all()
    assert status.shape == (1, out_w.shape[1])
    assert out_len.shape == (3, out_w.shape[1])
    n = np.asarray(args[1])
    assert (out_len[0, n[0] > 0] > 0).all()  # real lanes decoded bytes


# ---------------------------------------------------------------------------
# hostile-input hardening of the parallel frame walker
# (reference contract: clean typed failure, raw/decompress.rs:53-57)
# ---------------------------------------------------------------------------


def test_parallel_rejects_oversized_stored_block(mesh):
    from lz4tpu.frame.errors import BlockSizeOverflow
    from lz4tpu.frame.header import INCOMPRESSIBLE

    # a frame declaring 64 KiB max with a 100,000-byte stored block
    frame = compress_frame_parallel(b"seed", block_size=1 << 16, mesh=mesh)
    header_end = 4 + 1 + 1 + 8 + 1  # magic+FLG+BD+content_size+HC
    stored = (100_000 | INCOMPRESSIBLE).to_bytes(4, "little") + b"\xaa" * 100_000
    bad = frame[:header_end] + stored + (0).to_bytes(4, "little")
    with pytest.raises(BlockSizeOverflow):
        decompress_frame_parallel(bad, mesh=mesh, verify_checksums=False)


def test_parallel_rejects_truncated_frame(mesh):
    from lz4tpu.frame.errors import InputTruncated

    data = b"the quick brown fox " * 2000
    frame = compress_frame_parallel(data, block_size=1 << 16, mesh=mesh)
    for cut in (len(frame) - 5, len(frame) // 2, 12):
        with pytest.raises(InputTruncated):
            decompress_frame_parallel(frame[:cut], mesh=mesh)


def test_runner_rejects_truncated_archive(mesh, tmp_path):
    from lz4tpu.frame.errors import InputTruncated
    from lz4tpu.parallel.runner import run_sharded_compress, run_sharded_decompress

    src = tmp_path / "input.bin"
    src.write_bytes(b"abcdef" * 50_000)
    out = tmp_path / "out.lz4"
    run_sharded_compress(src, out, shard_bytes=100_000, block_size=1 << 16, mesh=mesh)
    whole = out.read_bytes()
    trunc = tmp_path / "trunc.lz4"
    trunc.write_bytes(whole[: len(whole) - 7])
    with pytest.raises(InputTruncated):
        run_sharded_decompress(trunc, tmp_path / "x.bin", mesh=mesh)


@pytest.mark.parametrize("n_dev", [1, 8])
@pytest.mark.slow
def test_parallel_decode_corpus_safety(n_dev):
    """Replay the reference decode fuzz corpus through the parallel path
    (1-device mesh = the lane decoder; 8-device = shard_map/v4): typed
    errors or success, never a crash; successes must match the spec
    engine's output."""
    import pathlib

    from lz4tpu.frame.errors import LZ4Error
    from lz4tpu.spec.block import DecodeError

    mesh = make_mesh(min(n_dev, len(jax.devices())))
    corpus = pathlib.Path("/root/reference/fuzz/corpus/decode")
    if not corpus.exists():
        pytest.skip("reference corpus not mounted")
    files = sorted(corpus.iterdir())[::5]
    ok = 0
    for path in files:
        raw = path.read_bytes()
        try:
            expected = decompress_frame(raw, engine="spec")
        except (LZ4Error, DecodeError):
            expected = None
        try:
            got = decompress_frame_parallel(raw, mesh=mesh)
        except (LZ4Error, DecodeError):
            got = None
        # outcomes must agree with the spec engine: same success set, same bytes
        assert (got is None) == (expected is None), path.name
        if expected is not None:
            assert got == expected, path.name
            ok += 1
    assert ok >= 1


# ---------------------------------------------------------------------------
# preset-dictionary broadcast (BASELINE config #3; framed/compress.rs:202-218)
# ---------------------------------------------------------------------------


def test_parallel_dictionary_bit_exact_with_streaming(mesh, corpus_sample):
    from lz4tpu import CompressionSettings

    data = corpus_sample(60, 400_000)
    dictionary = corpus_sample(61, 30_000)
    frame_parallel = compress_frame_parallel(
        data, block_size=1 << 16, mesh=mesh, dictionary=dictionary, dictionary_id=5
    )
    frame_serial = (
        CompressionSettings()
        .engine("native")
        .block_size(1 << 16)
        .dictionary(5, dictionary)
        .compress_bytes(data)
    )
    assert frame_parallel == frame_serial
    # the dictionary must pay for itself on dictionary-similar data
    data2 = dictionary * 3 + data[:100_000]
    with_dict = compress_frame_parallel(
        data2, block_size=1 << 16, mesh=mesh, dictionary=dictionary
    )
    without = compress_frame_parallel(data2, block_size=1 << 16, mesh=mesh)
    assert len(with_dict) < len(without)


def test_parallel_dictionary_roundtrip_on_mesh(mesh, corpus_sample):
    data = corpus_sample(62, 300_000)
    dictionary = data[:40_000]
    frame = compress_frame_parallel(
        data, block_size=1 << 16, mesh=mesh, dictionary=dictionary
    )
    # parallel decode with the broadcast dictionary prefix
    assert decompress_frame_parallel(frame, mesh=mesh, dictionary=dictionary) == data
    # and the ordinary streaming reader agrees
    assert decompress_frame(frame, dictionary=dictionary, engine="native") == data


def test_parallel_linked_dictionary_first_window(mesh, corpus_sample):
    dictionary = bytes(range(256)) * 256  # 64 KiB, fully primes the window
    data = dictionary[:30_000] + bytes(corpus_sample(63, 200_000))
    frame = compress_frame_parallel(
        data,
        block_size=1 << 16,
        mesh=mesh,
        parallel_linked=True,
        dictionary=dictionary,
    )
    assert decompress_frame(frame, dictionary=dictionary, engine="native") == data
    no_dict = compress_frame_parallel(
        data, block_size=1 << 16, mesh=mesh, parallel_linked=True
    )
    assert len(frame) <= len(no_dict)


@pytest.mark.slow
def test_lane_kernels_sharded_roundtrip(mesh, corpus_sample):
    """Lane-parallel codec under shard_map on the multi-device mesh:
    tiny raw blocks spread one-per-SIMD-lane across every device."""
    from lz4tpu.native import compress_block, decompress_block
    from lz4tpu.parallel.pipeline import _lane_compress_batch, _lane_decode_batch
    from lz4tpu.spec.table import U32Table

    n_dev = mesh.shape["blocks"]
    # more blocks than one device's 128 lanes only if the mesh is real;
    # keep counts tiny — interpret mode runs the lockstep rounds eagerly
    blocks = [corpus_sample(200 + i, 300 + 17 * i) for i in range(min(4 * n_dev, 12))]
    blocks.append(b"")
    comp = _lane_compress_batch(blocks, mesh)
    for b, c in zip(blocks, comp):
        assert bytes(decompress_block(c, b"", output_limit=max(len(b), 64))) == b

    ref_comp = [bytes(compress_block(b, 0, U32Table())) for b in blocks if b]
    outs = _lane_decode_batch(ref_comp, 1 << 10, mesh)
    assert outs == [b for b in blocks if b]


def test_sched_plan_and_decode():
    """Model-driven batch scheduling (parallel/sched.py): the plan
    partitions every block exactly once into <=128-lane batches with a
    valid chunk-size pick, and the scheduled decode routes each batch
    through the matching decode128 variant (CB geometry re-import)."""
    import numpy as np

    from lz4tpu.kernels.decode128 import load_variant
    from lz4tpu.parallel.sched import CBS, decode_scheduled, plan_batches
    from lz4tpu.native import compress_block
    from lz4tpu.spec.table import U32Table

    rng = np.random.default_rng(5)
    payloads = []
    for i in range(9):
        if i % 3 == 0:
            payloads.append(rng.integers(0, 256, 700, np.uint8).tobytes())
        elif i % 3 == 1:
            payloads.append(b"pattern!" * 120)
        else:
            payloads.append(bytes(range(200)) * 3)
    comp = [bytes(compress_block(p, 0, U32Table())) for p in payloads]
    plan = plan_batches(comp, 4096)
    seen = sorted(i for idxs, _ in plan for i in idxs)
    assert seen == list(range(len(payloads)))
    assert all(cb in CBS and len(idxs) <= 128 for idxs, cb in plan)
    assert decode_scheduled(comp, 4096) == payloads
    # the CB=32 variant is a real second geometry, not an alias
    m32 = load_variant(32)
    assert m32.CB == 32 and m32.CW == 8


@pytest.mark.slow
def test_scheduled_frame_decode_forced_on_cpu(monkeypatch, corpus_sample):
    """The production frame path through plan_batches/load_variant
    (pipeline's model-scheduled branch) exercised end-to-end on CPU:
    >128 independent blocks on a 1-device mesh with LZ4TPU_SCHED=1."""
    from lz4tpu import CompressionSettings

    monkeypatch.setenv("LZ4TPU_SCHED", "1")
    mesh1 = make_mesh(1)
    # >128 blocks of the smallest valid block size; compressible payload
    # keeps CPU-interpret kernel rounds tractable
    data = (b"scheduled-branch coverage! " * 97 + bytes(range(256))) * 1300
    data = data[: 130 * (1 << 16)]
    frame = (
        CompressionSettings().block_size(1 << 16).engine("native").compress_bytes(data)
    )
    assert decompress_frame_parallel(frame, mesh=mesh1) == data


@pytest.mark.slow
def test_pipeline_depth_mid_loop_drain(monkeypatch, corpus_sample):
    """With LZ4TPU_PIPELINE_DEPTH=1 a multi-batch frame must drain
    batches MID-LOOP (not only at the end) and still assemble in
    order."""
    import lz4tpu.parallel.pipeline as pp
    from lz4tpu import CompressionSettings

    monkeypatch.setenv("LZ4TPU_SCHED", "1")
    monkeypatch.setattr(pp, "PIPELINE_DEPTH", 1)
    mesh1 = make_mesh(1)
    data = (b"drain-order coverage " * 53 + bytes(range(47))) * 2600
    data = data[: 300 * (1 << 14)]
    frame = (
        CompressionSettings().block_size(1 << 16).engine("native")
        .compress_bytes(data)
    )
    assert decompress_frame_parallel(frame, mesh=mesh1) == data


@pytest.mark.slow
def test_chunk_windows_off_roundtrip(corpus_sample):
    """chunk_windows=False: merged independent blocks from WINDOWLESS
    chunks (throughput mode) stay valid LZ4 and only cost a little
    ratio vs the windowed default."""
    import lz4tpu

    mesh1 = make_mesh(1)
    data = corpus_sample(91, 220_000)
    f_off = compress_frame_parallel(
        data, block_size=1 << 18, mesh=mesh1, lane_kernel=True,
        chunk_windows=False,
    )
    assert lz4tpu.decompress_frame(f_off, engine="native") == data
