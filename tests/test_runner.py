"""Resumable sharded runner tests on the virtual CPU mesh."""

import pathlib

import jax
import pytest

from lz4tpu.parallel.mesh import make_mesh
from lz4tpu.parallel.runner import run_sharded_compress, run_sharded_decompress


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(min(len(jax.devices()), 8))


def test_sharded_roundtrip_and_resume(tmp_path, mesh, corpus_sample):
    data = corpus_sample(77, 1_500_000)
    src = tmp_path / "input.bin"
    src.write_bytes(data)
    out = tmp_path / "out.lz4"

    stats = run_sharded_compress(
        src, out, shard_bytes=512 * 1024, block_size=1 << 16, mesh=mesh
    )
    assert stats["n_shards"] == 3
    assert stats["compressed_here"] == 3
    assert stats.get("finalized")

    # resume: delete one shard and the output; only that shard is redone
    workdir = tmp_path / "out.lz4.shards"
    (workdir / "shard-0000001.lz4").unlink()
    out.unlink()
    stats2 = run_sharded_compress(
        src, out, shard_bytes=512 * 1024, block_size=1 << 16, mesh=mesh
    )
    assert stats2["compressed_here"] == 1
    assert stats2["skipped"] == 2

    # decode the multi-frame file (parallel) and with the streaming reader
    dec = tmp_path / "roundtrip.bin"
    run_sharded_decompress(out, dec, mesh=mesh)
    assert dec.read_bytes() == data

    import io

    from lz4tpu import LZ4FrameReader

    stream = io.BytesIO(out.read_bytes())
    chunks = []
    for _ in range(stats["n_shards"]):
        chunks.append(LZ4FrameReader(stream, engine="native").read_all())
    assert b"".join(chunks) == data


def test_mismatched_manifest_rejected(tmp_path, mesh, corpus_sample):
    data = corpus_sample(78, 300_000)
    src = tmp_path / "input.bin"
    src.write_bytes(data)
    out = tmp_path / "out.lz4"
    run_sharded_compress(src, out, shard_bytes=256 * 1024, block_size=1 << 16, mesh=mesh)
    with pytest.raises(ValueError):
        run_sharded_compress(
            src, out, shard_bytes=128 * 1024, block_size=1 << 16, mesh=mesh
        )
