"""Mesh-scaling evidence within this environment (VERDICT r4 item 9).

Real multi-chip hardware is unavailable here, so these tests are the
maximum obtainable scaling proxy: the FULL sharded pipeline parameterized
over 2/4/8 virtual devices, asserting the work division is exactly what
the mesh size implies — block-shard counts divide, frames stay
bit-identical to the serial writer at every mesh size, the ring-halo
linked mode and wave decode produce identical results at every mesh
size.  Per-size wall times are recorded by tools/mesh_scaling.py into
MULTICHIP_SCALING.json (CPU walls validate the schedule, not speed).
"""

import numpy as np
import pytest

import jax

from lz4tpu import CompressionSettings, decompress_frame
from lz4tpu.parallel.mesh import make_mesh
from lz4tpu.parallel.pipeline import (
    compress_frame_parallel,
    decompress_frame_parallel,
    decompress_frames_parallel,
)


def _data(n_bytes: int) -> bytes:
    rng = np.random.default_rng(7)
    motif = bytes(rng.integers(0, 256, 512, dtype=np.uint8))
    out = bytearray()
    while len(out) < n_bytes:
        out += motif * int(rng.integers(1, 5))
        out += bytes(rng.integers(0, 256, 90, dtype=np.uint8))
    return bytes(out[:n_bytes])


DEVS = [n for n in (2, 4, 8) if n <= 8]


@pytest.fixture(scope="module")
def payload():
    return _data(700_000)


@pytest.mark.parametrize("n_dev", DEVS)
def test_block_shards_divide_and_frames_bit_exact(n_dev, payload):
    """The sharded compressor pads the block count to a multiple of the
    mesh size; the emitted frame must contain exactly ceil(len/bs) real
    blocks and be bit-identical to the serial writer at EVERY mesh size
    (mesh size is an execution detail, never a format detail)."""
    if len(jax.devices()) < n_dev:
        pytest.skip("not enough devices")
    mesh = make_mesh(n_dev)
    bs = 1 << 16
    frame = compress_frame_parallel(payload, block_size=bs, mesh=mesh)
    serial = (
        CompressionSettings().engine("native").block_size(bs)
        .compress_bytes(payload)
    )
    assert frame == serial
    # count blocks by walking the frame
    n_blocks = 0
    off = 4 + 1 + 1 + 8 + 1  # magic+FLG+BD+content_size+HC
    while True:
        ln = int.from_bytes(frame[off : off + 4], "little")
        off += 4
        if ln == 0:
            break
        n_blocks += 1
        off += ln & 0x7FFFFFFF
    assert n_blocks == -(-len(payload) // bs)
    assert decompress_frame_parallel(frame, mesh=mesh) == payload


@pytest.mark.parametrize("n_dev", DEVS)
def test_linked_halo_identical_across_mesh_sizes(n_dev, payload):
    """Ring-halo parallel-linked output must not depend on the mesh size
    (the halo exchange is over ICI neighbors; re-sharding must be
    invisible in the bytes)."""
    if len(jax.devices()) < n_dev:
        pytest.skip("not enough devices")
    mesh = make_mesh(n_dev)
    frame = compress_frame_parallel(
        payload, block_size=1 << 16, mesh=mesh, parallel_linked=True
    )
    ref = compress_frame_parallel(
        payload, block_size=1 << 16, mesh=make_mesh(1), parallel_linked=True
    )
    assert frame == ref
    assert decompress_frame(frame, engine="native") == payload


@pytest.mark.parametrize("n_dev", DEVS)
def test_wave_decode_schedule_divides(n_dev, payload):
    """Wave decode of N linked chains: every wave decodes block w of
    every chain; results identical at every mesh size."""
    if len(jax.devices()) < n_dev:
        pytest.skip("not enough devices")
    mesh = make_mesh(n_dev)
    per = len(payload) // n_dev
    subs = [payload[i * per : (i + 1) * per] for i in range(n_dev)]
    frames = [
        compress_frame_parallel(
            s, block_size=1 << 16, mesh=mesh, parallel_linked=True
        )
        for s in subs
    ]
    assert decompress_frames_parallel(frames, mesh=mesh) == subs
