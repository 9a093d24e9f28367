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
    out_u8, out_len, status = [np.asarray(x) for x in fn(*args)]
    assert (status == 0).all()
    assert out_len.shape[0] == args[0].shape[0]
