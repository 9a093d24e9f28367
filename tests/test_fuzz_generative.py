"""Seeded generative fuzzer (VERDICT r4 item 6).

The reference runs libFuzzer continuously on its ``decode`` target
(``/root/reference/fuzz/fuzz_targets/decode.rs:1-17``); the frozen corpus
replay (test_fuzz_corpus.py) only reaches the states those 1,523 files
reach.  This suite GENERATES cases: seeded mutations of valid frames and
raw blocks (bit flips, byte substitution, truncation, length-field
corruption, slice insert/delete/duplicate, stacked mutations) plus pure
random buffers, replayed through the TPU engines —

* raw blocks through ``decode128`` (lane statuses checked per lane),
* big blocks through ``decodebig`` (host repack + banded kernel),
* whole frames through ``decompress_frame_parallel`` (1-dev lane path
  and the 8-dev shard_map path),

asserting SPEC-OUTCOME EQUIVALENCE throughout: the kernel path succeeds
exactly when the scalar spec engine succeeds, with identical bytes; every
failure is a typed error (never a crash, hang, or silent wrong output).

Counts are env-tunable (LZ4TPU_FUZZ_SCALE, default 1.0 ~= 10k cases
total); the deterministic seeds make every run reproducible.
"""

import os
import random

import numpy as np
import pytest

import jax

from lz4tpu import CompressionSettings, decompress_frame
from lz4tpu.frame.errors import LZ4Error
from lz4tpu.spec.block import DecodeError, compress_block, decompress_block
from lz4tpu.spec.table import U16Table, U32Table

pytestmark = pytest.mark.slow

SCALE = float(os.environ.get("LZ4TPU_FUZZ_SCALE", "1.0"))


def n_cases(n):
    return max(8, int(n * SCALE))


# ---------------------------------------------------------------------------
# mutation machinery
# ---------------------------------------------------------------------------


def mutate(r: random.Random, buf: bytes, depth: int = 0) -> bytes:
    b = bytearray(buf)
    if not b:
        return bytes(r.getrandbits(8) for _ in range(r.randrange(1, 8)))
    op = r.randrange(8)
    if op == 0:  # single bit flip
        p = r.randrange(len(b))
        b[p] ^= 1 << r.randrange(8)
    elif op == 1:  # byte substitution
        b[r.randrange(len(b))] = r.getrandbits(8)
    elif op == 2:  # truncation
        del b[r.randrange(len(b)) :]
    elif op == 3:  # length-field corruption: extreme LE value at any spot
        p = r.randrange(len(b))
        w = r.choice((1, 2, 4))
        val = r.choice((0, 1, 0xFE, 0xFFFF, 0x00FFFFFF, 0x7FFFFFFF, 1 << 31, 0xFFFFFFFF))
        b[p : p + w] = val.to_bytes(4, "little")[:w]
    elif op == 4:  # insert junk
        p = r.randrange(len(b) + 1)
        b[p:p] = bytes(r.getrandbits(8) for _ in range(r.randrange(1, 6)))
    elif op == 5:  # duplicate an internal slice elsewhere
        p = r.randrange(len(b))
        ln = r.randrange(1, min(64, len(b) - p) + 1)
        q = r.randrange(len(b) + 1)
        b[q:q] = b[p : p + ln]
    elif op == 6:  # delete a slice
        p = r.randrange(len(b))
        del b[p : p + r.randrange(1, min(32, len(b) - p) + 1)]
    elif depth < 3:  # stacked mutations
        return mutate(r, mutate(r, bytes(b), depth + 1), depth + 1)
    return bytes(b)


def _mixed_payload(r: random.Random, size: int) -> bytes:
    out = bytearray()
    motifs = [b"lz4 frames are end-delimited ", b"\x00" * 9, bytes(range(48)), b"ab"]
    while len(out) < size:
        c = r.random()
        if c < 0.4:
            out.extend(r.choice(motifs) * r.randint(1, 9))
        elif c < 0.6 and out:
            s = r.randrange(len(out))
            out.extend(out[s : s + r.randint(1, 120)])
        else:
            out.extend(bytes(r.getrandbits(8) for _ in range(r.randint(1, 50))))
    return bytes(out[:size])


def _spec_block_outcome(block: bytes, maxsize: int):
    try:
        return bytes(decompress_block(block, output_limit=maxsize))
    except DecodeError:
        return None


# ---------------------------------------------------------------------------
# raw blocks -> decode128 (per-lane status equivalence)
# ---------------------------------------------------------------------------


def test_generative_raw_blocks_decode128():
    from lz4tpu.kernels import decode128 as d128

    r = random.Random(0x51ED)
    seeds = [
        bytes(compress_block(_mixed_payload(r, 2048 + 512 * k), 0, U16Table()))
        for k in range(6)
    ]
    cases = [mutate(r, r.choice(seeds)) for _ in range(n_cases(6400))]
    cases += [  # pure-random buffers, reference decode-target style
        bytes(r.getrandbits(8) for _ in range(r.randrange(0, 400)))
        for _ in range(n_cases(1024))
    ]
    maxsize = 4096
    expected = [_spec_block_outcome(c, maxsize) for c in cases]
    ok_idx = [i for i, e in enumerate(expected) if e is not None]
    bad_idx = [i for i, e in enumerate(expected) if e is None]
    assert ok_idx and bad_idx  # the mix must exercise both sets

    # success set: the lane kernel must produce the spec engine's bytes
    for base in range(0, len(ok_idx), 128):
        idx = ok_idx[base : base + 128]
        got = d128.decompress_blocks_128(
            [cases[i] for i in idx], block_maxsize=maxsize
        )
        for j, i in enumerate(idx):
            assert got[j] == expected[i], f"case {i}: {cases[i].hex()}"

    # failure set: every lane's kernel status must be non-OK (a lane that
    # "succeeds" on a spec-rejected stream is silent wrong output)
    for base in range(0, len(bad_idx), 128):
        idx = bad_idx[base : base + 128]
        batch = d128.dispatch_blocks_128([cases[i] for i in idx], maxsize)
        status = np.asarray(batch.meta)[3][: len(idx)]
        for j, i in enumerate(idx):
            assert int(status[j]) != d128.OK, f"case {i}: {cases[i].hex()}"


# ---------------------------------------------------------------------------
# big blocks -> decodebig (host repack + banded kernel)
# ---------------------------------------------------------------------------


def _local_payload(r: random.Random, size: int) -> bytes:
    out = bytearray()
    while len(out) < size:
        pat = bytes(r.getrandbits(8) for _ in range(r.randint(20, 180)))
        out.extend(pat * r.randint(2, 8))
        out.extend(bytes(r.getrandbits(8) for _ in range(r.randint(5, 120))))
    return bytes(out[:size])


def test_generative_big_blocks_decodebig():
    import lz4tpu.kernels.decodebig as dbig

    r = random.Random(0xB16)
    seeds = [
        bytes(compress_block(_local_payload(r, 60_000), 0, U32Table()))
        for _ in range(3)
    ]
    cases = [mutate(r, r.choice(seeds)) for _ in range(n_cases(128))]
    maxsize = 1 << 16
    expected = [_spec_block_outcome(c, maxsize) for c in cases]
    kw = dict(
        block_maxsize=maxsize, _window_bound=8192, _oband=6144, _cband=2048
    )
    ok_idx = [i for i, e in enumerate(expected) if e is not None]
    got = dbig.decompress_blocks_big([cases[i] for i in ok_idx], **kw)
    for j, i in enumerate(ok_idx):
        assert got[j] == expected[i], f"case {i}"
    for i, e in enumerate(expected):
        if e is None:
            with pytest.raises(DecodeError):
                dbig.decompress_blocks_big([cases[i]], **kw)


# ---------------------------------------------------------------------------
# whole frames -> decompress_frame_parallel
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n_dev", [1, 8])
def test_generative_frames_parallel(n_dev):
    from lz4tpu.parallel.mesh import make_mesh
    from lz4tpu.parallel.pipeline import decompress_frame_parallel

    mesh = make_mesh(min(n_dev, len(jax.devices())))
    r = random.Random(0xF8A | n_dev)
    payload = _mixed_payload(r, 150_000)
    frames = [
        CompressionSettings().engine("spec").block_size(1 << 16).compress_bytes(payload),
        CompressionSettings()
        .engine("spec")
        .block_size(1 << 16)
        .independent_blocks(False)
        .block_checksums(True)
        .compress_bytes(payload),
        CompressionSettings().engine("spec").compress_bytes(payload[:30_000]),
        # no content checksum: benign literal flips survive decoding, so
        # the success-set comparison is exercised too
        CompressionSettings()
        .engine("spec")
        .block_size(1 << 16)
        .content_checksum(False)
        .compress_bytes(payload),
    ]
    n_hits = 0
    for k in range(n_cases(600)):
        f = mutate(r, r.choice(frames))
        try:
            expected = decompress_frame(f, engine="spec")
        except (LZ4Error, DecodeError):
            expected = None
        try:
            got = decompress_frame_parallel(f, mesh=mesh)
        except (LZ4Error, DecodeError):
            got = None
        assert (got is None) == (expected is None), f"case {k}"
        if expected is not None:
            assert got == expected, f"case {k}"
            n_hits += 1
    assert n_hits >= 1  # some mutations must still decode (e.g. literal flips)
