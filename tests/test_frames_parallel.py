"""Multi-frame wave decode (decompress_frames_parallel).

A single linked-block frame is a strictly serial chain (block i needs
block i-1's decoded 64 KiB tail — ``framed/decompress.rs:237-269``); the
TPU-parallel unit is therefore the FRAME: wave w decodes block w of
every linked frame lane-parallel with per-lane carryover windows handed
off between waves.  Independent frames fan out within the frame as
before.
"""

import pytest

from lz4tpu import CompressionSettings, decompress_frame
from lz4tpu.parallel.mesh import make_mesh
from lz4tpu.parallel.pipeline import decompress_frames_parallel


@pytest.mark.slow
def test_linked_frames_wave_decode(corpus_sample):
    mesh = make_mesh(1)
    frames, datas = [], []
    for s in range(5):
        data = corpus_sample(1100 + s, 40_000 + s * 9000)
        frames.append(
            CompressionSettings()
            .engine("native")
            .block_size(1 << 16)
            .independent_blocks(False)
            .compress_bytes(data)
        )
        datas.append(data)
    out = decompress_frames_parallel(frames, mesh=mesh)
    assert out == datas
    # cross-check one frame against the streaming reader
    assert decompress_frame(frames[2], engine="native") == datas[2]


@pytest.mark.slow
def test_linked_frames_wave_decode_with_dictionaries(corpus_sample):
    mesh = make_mesh(1)
    frames, datas, dicts = [], [], []
    for s in range(4):
        dic = corpus_sample(1300 + s, 6000)
        data = dic[:2000] + corpus_sample(1400 + s, 25_000) + dic[1000:4000]
        st = (
            CompressionSettings()
            .engine("native")
            .block_size(1 << 16)
            .independent_blocks(False)
            .dictionary(s + 1, dic)
        )
        frames.append(st.compress_bytes(data))
        datas.append(data)
        dicts.append(dic)
    out = decompress_frames_parallel(frames, mesh=mesh, dictionaries=dicts)
    assert out == datas


def test_mixed_frames_and_checksums(corpus_sample):
    mesh = make_mesh(1)
    frames, datas, dicts = [], [], []
    for s in range(4):
        data = corpus_sample(1500 + s, 20_000)
        st = (
            CompressionSettings()
            .engine("native")
            .block_size(1 << 16)
            .independent_blocks(s % 2 == 0)
            .block_checksums(s == 1)
        )
        frames.append(st.compress_bytes(data))
        datas.append(data)
        dicts.append(None)
    out = decompress_frames_parallel(frames, mesh=mesh, dictionaries=dicts)
    assert out == datas
    # corrupted content checksum must raise
    from lz4tpu.frame.errors import FrameChecksumFail

    bad = bytearray(frames[1])
    bad[-1] ^= 0xFF
    with pytest.raises(FrameChecksumFail):
        decompress_frames_parallel([bytes(bad)], mesh=mesh)


@pytest.mark.slow
def test_linked_frames_wave_decode_big_blocks(corpus_sample):
    """Linked chains at big-block geometry (>= 256 KiB blocks): on the
    TPU backend each wave rides decodebig's PREFIX mode (per-lane
    carryover windows seeded into the initial output band); on CPU the
    wave falls back to the host engine — both must be exact."""
    mesh = make_mesh(1)
    frames, datas = [], []
    for s in range(3):
        data = corpus_sample(2200 + s, 600_000 + s * 120_000)
        frames.append(
            CompressionSettings()
            .engine("native")
            .block_size(1 << 18)
            .independent_blocks(False)
            .compress_bytes(data)
        )
        datas.append(data)
    out = decompress_frames_parallel(frames, mesh=mesh)
    assert out == datas
