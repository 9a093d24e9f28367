"""Lane-compressor window/dictionary mode (compress128 prefixes).

BASELINE config #3 on-chip: linked-block frames and preset dictionaries
through the lane kernel — each lane's buffer is [window | block], the
parse starts past the window with a host-primed step-3 table
(framed/compress.rs:202-218,271-275 semantics), offsets explicitly
capped at 0xFFFF.  Valid-LZ4 contract (not byte-exact with the
streaming writer — documented).
"""

import pytest

from lz4tpu.spec.block import decompress_block


@pytest.mark.slow
def test_compress128_window_blocks_roundtrip(corpus_sample):
    from lz4tpu.kernels.compress128 import compress_blocks_128

    win = corpus_sample(700, 3000)
    blocks, prefixes = [], []
    for s in range(4):
        blocks.append(
            win[s * 200 : s * 200 + 900]
            + corpus_sample(710 + s, 1200)
            + win[1000:1600]
        )
        prefixes.append(win)
    blocks.append(corpus_sample(720, 1500))
    prefixes.append(b"")  # windowless lane in the same batch
    comp = compress_blocks_128(blocks, hashlog=8, prefixes=prefixes)
    for b, p, c in zip(blocks, prefixes, comp):
        assert bytes(decompress_block(c, prefix=p, output_limit=1 << 20)) == b
    # the window must actually help on window-heavy data
    solo = compress_blocks_128(blocks[:1], hashlog=8)
    assert len(comp[0]) < len(solo[0])


@pytest.mark.slow
def test_compress128_lane_linked_and_dict_frames(corpus_sample):
    """compress_frame_parallel(lane_kernel=True) covers parallel_linked
    and dictionary frames; any standard reader decodes them."""
    import lz4tpu.kernels.compress128 as c128
    from lz4tpu import decompress_frame
    from lz4tpu.parallel.mesh import make_mesh
    from lz4tpu.parallel.pipeline import compress_frame_parallel

    old_hl, old_maxb = c128.HASHLOG, c128.MAX_B
    c128.HASHLOG, c128.MAX_B = 8, 4096  # interpret-mode cost control
    try:
        mesh = make_mesh(1)
        data = corpus_sample(800, 40_000)
        f1 = compress_frame_parallel(
            data, block_size=1 << 16, mesh=mesh, lane_kernel=True,
            parallel_linked=True,
        )
        assert decompress_frame(f1, engine="native") == data

        dic = corpus_sample(801, 8000)
        data2 = dic[:3000] + data[:20_000] + dic[2000:6000]
        f2 = compress_frame_parallel(
            data2, block_size=1 << 16, mesh=mesh, lane_kernel=True,
            parallel_linked=True, dictionary=dic,
        )
        assert decompress_frame(f2, engine="native", dictionary=dic) == data2

        f3 = compress_frame_parallel(
            data2, block_size=1 << 16, mesh=mesh, lane_kernel=True,
            dictionary=dic,
        )
        assert decompress_frame(f3, engine="native", dictionary=dic) == data2

        # Independent frames with merged blocks now carry IN-BLOCK
        # windows, so they compress as well as linked frames on
        # single-block data; linked must never be worse
        f4 = compress_frame_parallel(
            data, block_size=1 << 16, mesh=mesh, lane_kernel=True
        )
        assert len(f1) <= len(f4)
    finally:
        c128.HASHLOG, c128.MAX_B = old_hl, old_maxb


@pytest.mark.slow
def test_compress128_lane_linked_frames_on_mesh(corpus_sample):
    """The windowed lane compressor shards over a multi-device mesh
    (cur0/tinit travel per lane)."""
    import jax
    import pytest as _p

    if len(jax.devices()) < 2:
        _p.skip("needs the virtual multi-device CPU mesh")
    import lz4tpu.kernels.compress128 as c128
    from lz4tpu import decompress_frame
    from lz4tpu.parallel.mesh import make_mesh
    from lz4tpu.parallel.pipeline import _lane_compress_batch, make_mesh as _mm

    old_hl = c128.HASHLOG
    c128.HASHLOG = 8
    try:
        mesh = make_mesh()  # all virtual devices
        win = corpus_sample(820, 2500)
        blocks = [
            win[100 * i : 100 * i + 700] + corpus_sample(830 + i, 600)
            for i in range(6)
        ]
        prefixes = [win] * 6
        comp = _lane_compress_batch(blocks, mesh, prefixes=prefixes)
        for b, c in zip(blocks, comp):
            assert (
                bytes(decompress_block(c, prefix=win, output_limit=1 << 20))
                == b
            )
    finally:
        c128.HASHLOG = old_hl


@pytest.mark.slow
def test_windowed_device_build_matches_host_pack(corpus_sample):
    """The device-built [window|block] batch (dispatch_compress_windowed:
    flat upload + static-slice assembly + native-primed tables) must
    produce byte-identical payloads to the host-packed path
    (compress_blocks_128 with explicit prefix bytes)."""
    import numpy as np

    from lz4tpu.hostpack import to_device_chunked
    from lz4tpu.kernels import compress128 as c128

    if c128.STRICT:
        pytest.skip("window mode is not defined in strict parity mode")
    chunk, window = 2048, 16384  # k = 8, CPU-interpret tractable
    data = corpus_sample(41, chunk * 24)
    n_blocks = 24
    lens = np.full(n_blocks, chunk, np.int32)
    arr = np.frombuffer(data, np.uint8).reshape(n_blocks, chunk)
    rows = 136  # builder slices a full 128+k row window
    flat = np.concatenate([arr, np.zeros((rows - n_blocks, chunk), np.uint8)])
    start, nb = 8, 16
    h = c128.dispatch_compress_windowed(
        to_device_chunked(flat), data, start, nb, lens,
        chunk=chunk, window=window,
    )
    dev_out = c128.collect_compress_128(h)
    blocks = [data[(start + j) * chunk : (start + j + 1) * chunk] for j in range(nb)]
    prefixes = [data[(start + j) * chunk - window : (start + j) * chunk] for j in range(nb)]
    host_out = c128.compress_blocks_128(blocks, prefixes=prefixes)
    assert dev_out == host_out


def test_splice_streams_merges_tails(corpus_sample):
    """native.splice_streams: standalone chunk streams merge into one
    valid stream decoding to the concatenated outputs (the interior
    literal-only tails fold into the next chunk's first sequence)."""
    from lz4tpu.native import compress_block, decompress_block, splice_streams
    from lz4tpu.spec.table import U32Table, prime_u32_table

    data = corpus_sample(55, 50_000)
    chunk, W = 4096, 16384
    n = len(data) // chunk
    payloads = []
    for i in range(n):
        pfx = data[max(0, i * chunk - W) : i * chunk]
        t = U32Table()
        prime_u32_table(t, pfx)
        payloads.append(
            bytes(compress_block(pfx + data[i * chunk : (i + 1) * chunk],
                                 len(pfx), t))
        )
    cat = splice_streams(payloads)
    assert bytes(decompress_block(cat, b"", output_limit=n * chunk * 2)) \
        == data[: n * chunk]
    # all-literal chunks splice too
    rnd = bytes(range(256)) * 8
    lit_payloads = [b"\xf0" + bytes([256 - 15]) + rnd[:256],
                    b"\x50" + rnd[256:261]]
    cat2 = splice_streams(lit_payloads)
    assert bytes(decompress_block(cat2, b"", output_limit=1024)) == rnd[:261]


@pytest.mark.slow
def test_big_block_merged_frame_roundtrip(corpus_sample):
    """compressbig: frame blocks larger than the lane kernel's chunk
    compress as spliced in-block-windowed chunk streams — ONE real block
    of the requested size per group, decodable by any LZ4 reader."""
    import lz4tpu
    from lz4tpu.parallel.mesh import make_mesh
    from lz4tpu.parallel.pipeline import compress_frame_parallel

    mesh = make_mesh(1)
    data = corpus_sample(60, 500_000)
    frame = compress_frame_parallel(
        data, block_size=1 << 18, mesh=mesh, lane_kernel=True
    )
    assert lz4tpu.decompress_frame(frame, engine="native") == data
    # block structure: true 256 KiB blocks (not chunk-sized)
    from lz4tpu.frame.decompress import LZ4FrameReader, _read_exact
    from lz4tpu.frame.header import INCOMPRESSIBLE

    r = LZ4FrameReader(frame, engine="native")
    sizes = []
    while True:
        bl = int.from_bytes(_read_exact(r.reader, 4), "little")
        if bl == 0:
            break
        bl &= ~INCOMPRESSIBLE & 0xFFFFFFFF
        _read_exact(r.reader, bl)
        sizes.append(bl)
    assert len(sizes) == 2  # 500 KB at 256 KiB blocks
