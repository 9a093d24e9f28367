"""Sharded frame pipelines: whole-frame codec over a device mesh.

This is the TPU-native scaling layer that has no counterpart in the
single-threaded reference (SURVEY.md §2): blocks shard data-parallel
across chips; linked-block windows travel as a ring halo
(``jax.lax.ppermute`` over ICI, ring order = frame order); compressed
payloads come back as fixed-capacity buffers + true lengths (the frame
format's incompressible fallback guarantees output ≤ block size,
``framed/compress.rs:239-255``, which makes TPU buffer sizing static);
the host concatenates blocks in frame order and adds headers/checksums.

Two frame modes:

* independent blocks — embarrassingly parallel, bit-exact with the
  reference frame writer (same parse, same bytes);
* ``parallel_linked`` — each block's 64 KiB window is the *raw* tail of
  the previous block, primed into the encoder table with dictionary
  semantics.  This decodes with any standard LZ4 frame reader as a
  linked-block frame, but is NOT byte-identical to the reference's
  serial linked mode (whose table state flows through the whole frame —
  inherently sequential).  Serial bit-exact linked mode remains available
  through the streaming API with any engine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from ..frame.errors import InvalidBlockSize
from ..frame.header import INCOMPRESSIBLE, MAGIC, WINDOW_SIZE, BlockDescriptor, Flags
from ..spec.block import DecodeError
from ..utils.hashing import make_hasher
from .mesh import BLOCK_AXIS, make_mesh

from ..kernels import compress as kcompress
from ..kernels import decompress as kdecompress


# max lane-kernel batches in flight during pipelined dispatch/collect
# (bounds HBM held by queued batches: ~16-32 MB each at 64 KiB blocks)
PIPELINE_DEPTH = int(
    __import__("os").environ.get("LZ4TPU_PIPELINE_DEPTH", "8")
)


class _LazyPrefixes:
    """Sequence facade that slices a block's window prefix on demand —
    eager construction is n_blocks x ~64 KiB of memcpy that the windowed
    dispatch plan almost never reads."""

    def __init__(self, fn, n):
        self._fn, self._n = fn, n

    def __len__(self):
        return self._n

    def __bool__(self):
        return self._n > 0

    def __getitem__(self, i):
        if isinstance(i, slice):
            return [self._fn(j) for j in range(*i.indices(self._n))]
        return self._fn(i)


def _use_scheduled_decode() -> bool:
    """Gate for the model-driven multi-batch decode scheduler.  Defaults
    to TPU-only (kernel round costs are TPU-calibrated); LZ4TPU_SCHED=1
    forces it on any backend (CPU tests), =0 forces it off."""
    import os

    v = os.environ.get("LZ4TPU_SCHED")
    if v is not None:
        return v not in ("0", "")
    return jax.default_backend() == "tpu"


def _pad_blocks(data: bytes, block_size: int):
    n = len(data)
    n_blocks = max(-(-n // block_size), 1)
    arr = np.zeros((n_blocks, block_size), np.uint8)
    flat = np.frombuffer(data, np.uint8)
    lens = np.zeros(n_blocks, np.int32)
    for i in range(n_blocks):
        chunk = flat[i * block_size : (i + 1) * block_size]
        arr[i, : len(chunk)] = chunk
        lens[i] = len(chunk)
    return arr, lens, n_blocks


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# sharded kernels
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "block_size", "window", "acceleration", "u16_table", "has_dict",
    ),
)
def _compress_sharded(
    blocks,  # uint8 [N, B] (N divisible by mesh size)
    lens,  # int32 [N]
    tables,  # int32 [N, S] primed template (zeros, or dictionary-primed)
    dict_u8,  # uint8 [D] dictionary bytes (broadcast/replicated to all shards)
    dict_len,  # int32 [1]
    *,
    mesh,
    block_size: int,
    window: int,  # 0 = independent, else parallel-linked halo bytes
    acceleration: int,
    u16_table: bool,
    has_dict: bool = False,
):
    """Mesh-sharded block compression; returns (out_u8, out_len, status).

    Inside each shard: build per-block window prefixes (ring halo via
    ppermute for the shard-boundary block; preset-dictionary broadcast in
    independent mode, ``framed/compress.rs:202-214``), then run the Pallas
    compress grid over the local blocks.
    """
    s = tables.shape[1]
    d = dict_u8.shape[0] if has_dict else 0
    if window:
        d = 0  # linked mode seeds the first window instead of concatenating
    data_capacity = _round_up(window + d + block_size, 128)
    out_capacity = _round_up(data_capacity + data_capacity // 255 + 16, 4)

    def local(blocks_l, lens_l, tables_l, dict_l, dict_len_l):
        nl, b = blocks_l.shape
        if window:
            # halo: previous block's trailing `window` bytes; first local
            # block receives the previous device's last block tail over ICI
            tails = blocks_l[:, -window:]  # [nl, W]
            prev_local = jnp.roll(tails, 1, axis=0)
            from_prev_dev = jax.lax.ppermute(
                tails[-1:],
                BLOCK_AXIS,
                [(i, (i + 1) % mesh.shape[BLOCK_AXIS]) for i in range(mesh.shape[BLOCK_AXIS])],
            )
            windows = prev_local.at[0:1].set(from_prev_dev)
            my_shard = jax.lax.axis_index(BLOCK_AXIS)
            global_ids = my_shard * nl + jnp.arange(nl)
            # window length of previous block: full `window` when the
            # previous block was full-size; global block 0's window is the
            # broadcast dictionary tail (framed/compress.rs:202-218) or
            # empty when there is none
            prev_lens = jnp.roll(lens_l, 1)
            prev_lens = prev_lens.at[0].set(
                jax.lax.ppermute(
                    lens_l[-1:],
                    BLOCK_AXIS,
                    [(i, (i + 1) % mesh.shape[BLOCK_AXIS]) for i in range(mesh.shape[BLOCK_AXIS])],
                )[0]
            )
            wlen = jnp.minimum(prev_lens, window)
            if has_dict:
                # dict tail, right-aligned in a `window`-byte slot
                dl = dict_l.shape[0]
                dict_tail = jnp.pad(dict_l, (window, 0))[dl : dl + window]
                is_first = (global_ids == 0)[:, None]
                windows = jnp.where(is_first, dict_tail[None, :], windows)
                wlen = jnp.where(
                    global_ids == 0, jnp.minimum(dict_len_l[0], window), wlen
                )
            else:
                wlen = jnp.where(global_ids == 0, 0, wlen)
            # only FULL windows are primed; a partial window contributes
            # no matches (unprimed table), but parsing it at cursor=window
            # is unsafe: empty hash slots alias buffer position 0, and
            # once window <= 0xFFFF the stale offset-to-0 becomes
            # emittable (with a 64 KiB window it was implicitly rejected
            # by the offset<=0xFFFF rule).  Route unprimed blocks through
            # the proven cursor=0 independent parse instead.
            full_win = wlen == window
            data = jnp.where(
                full_win[:, None],
                jnp.concatenate([windows, blocks_l], axis=1),
                jnp.concatenate([blocks_l, jnp.zeros_like(windows)], axis=1),
            )
            cursors = jnp.where(full_win, window, 0).astype(jnp.int32)
            prime = full_win.astype(jnp.int32)
            ns = jnp.where(full_win, window + lens_l, lens_l)
        elif d:
            # preset-dictionary broadcast: every independent block parses
            # [dictionary | block] starting at cursor == len(dictionary)
            # with the host-primed template table — byte-identical to the
            # streaming writer's per-block state (framed/compress.rs:217-218)
            data = jnp.concatenate(
                [jnp.broadcast_to(dict_l[None, :], (nl, d)), blocks_l], axis=1
            )
            cursors = jnp.full((nl,), d, jnp.int32)
            prime = jnp.zeros((nl,), jnp.int32)
            ns = d + lens_l
        else:
            data = blocks_l
            cursors = jnp.zeros((nl,), jnp.int32)
            prime = jnp.zeros((nl,), jnp.int32)
            ns = lens_l

        pad = data_capacity - data.shape[1]
        if pad:
            data = jnp.pad(data, ((0, 0), (0, pad)))

        caps = lens_l  # output capped at input size (incompressible fallback)
        accel = jnp.full((nl,), acceleration, jnp.int32)
        toff = jnp.zeros((nl,), jnp.int32)
        out_u8, out_len, status, _ = kcompress._compress_batch_jit(
            data,
            ns.astype(jnp.int32),
            cursors,
            caps.astype(jnp.int32),
            accel,
            toff,
            prime,
            tables_l,
            data_capacity=data_capacity,
            out_capacity=out_capacity,
            u16_table=u16_table,
        )
        return out_u8, out_len, status

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS), P(BLOCK_AXIS), P(None), P(None)),
        out_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS), P(BLOCK_AXIS)),
        check_vma=False,
    )(blocks, lens, tables, dict_u8, dict_len)


# ---------------------------------------------------------------------------
# lane-parallel kernels under shard_map (128 blocks per lane-kernel step PER
# DEVICE; the transposed (rows, lanes) buffers shard on the lane axis)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "rw", "ro", "pr", "max_rounds", "output_limit"),
)
def _decode128_sharded(
    words, n, prefix, plen, *, mesh, rw, ro, pr, max_rounds, output_limit
):
    from ..kernels.decode128 import _decode128_jit

    def local(w, nn, pfx, pl):
        return _decode128_jit(
            w, nn, pfx, pl, rw=rw, ro=ro, pr=pr,
            max_rounds=max_rounds, output_limit=output_limit,
        )

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(None, BLOCK_AXIS), P(None, BLOCK_AXIS),
            P(None, BLOCK_AXIS), P(None, BLOCK_AXIS),
        ),
        out_specs=(P(None, BLOCK_AXIS), P(None, BLOCK_AXIS), P(None, BLOCK_AXIS)),
        check_vma=False,
    )(words, n, prefix, plen)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "ri", "ro", "max_rounds", "hashlog", "windowed"),
)
def _compress128_sharded(
    words, n, cur0, tinit, *, mesh, ri, ro, max_rounds, hashlog,
    windowed: bool = False,
):
    from ..kernels.compress128 import _compress128_jit

    def local(w, nn, c0, ti):
        kw = {"cur0": c0, "tinit": ti} if windowed else {}
        return _compress128_jit(
            w, nn, ri=ri, ro=ro, max_rounds=max_rounds, hashlog=hashlog, **kw
        )

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(None, BLOCK_AXIS), P(None, BLOCK_AXIS),
            P(None, BLOCK_AXIS), P(None, BLOCK_AXIS),
        ),
        out_specs=(P(None, BLOCK_AXIS), P(None, BLOCK_AXIS)),
        check_vma=False,
    )(words, n, cur0, tinit)


def _pack_transposed(blocks, lanes: int, rows: int):
    """Pack byte strings into the lane kernels' transposed word layout:
    ``words[j, l]`` = little-endian word ``j`` of lane ``l`` (via the
    dtype-reinterpret fast path in ``lz4tpu.hostpack`` — the arithmetic
    pack measured 113 ms per 128 x 53 KB batch, 5x the decode kernel)."""
    from ..hostpack import pack_words_le

    arr = np.zeros((lanes, rows * 4), np.uint8)
    n = np.zeros((1, lanes), np.int32)
    for i, b in enumerate(blocks):
        arr[i, : len(b)] = np.frombuffer(b, np.uint8)
        n[0, i] = len(b)
    return pack_words_le(arr), n


def _unpack_column(out_w, col: int, nbytes: int) -> bytes:
    return (
        np.ascontiguousarray(out_w[:, col])
        .astype("<i4", copy=False)
        .view(np.uint8)[:nbytes]
        .tobytes()
    )


def _lane_decode_batch(blocks, block_maxsize: int, mesh, dictionary=None):
    """Decode up to ``128 * n_dev`` independent raw blocks with the lane
    kernel sharded over the mesh; same status contract as
    ``decode128.decompress_blocks_128`` (per-lane scalar/host fallback).
    ``dictionary`` (optional) is the shared prefix every block's offsets
    may reach into — broadcast to all lanes right-aligned."""
    from ..kernels import decode128 as d128
    from ..kernels.decode128 import STATUS_FALLBACK
    from ..kernels.status import OK as ST_OK, STATUS_TO_KIND

    n_dev = mesh.shape[BLOCK_AXIS]
    lanes = 128 * n_dev
    assert 0 < len(blocks) <= lanes
    blocks = [bytes(b) for b in blocks]
    dictionary = bytes(dictionary) if dictionary else b""
    maxlen = max(max(len(b) for b in blocks), 4)
    rw, ro, pr = d128.buffer_rows(maxlen, block_maxsize, len(dictionary))
    max_rounds = d128.round_bound(maxlen, block_maxsize)
    words, n = _pack_transposed(blocks, lanes, rw)
    if pr:
        pa = np.zeros(pr * 4, np.uint8)
        pa[pr * 4 - len(dictionary) :] = np.frombuffer(dictionary, np.uint8)
        pw = pa.reshape(pr, 4).astype(np.uint32)
        pcol = (
            pw[:, 0] | (pw[:, 1] << 8) | (pw[:, 2] << 16) | (pw[:, 3] << 24)
        ).astype(np.int32)
        # broadcast the single dict column on DEVICE (a host np.repeat
        # would materialize and transfer pr*lanes*4 bytes per batch)
        prefix = jnp.broadcast_to(jnp.asarray(pcol)[:, None], (pr, lanes))
        plen = np.full((1, lanes), len(dictionary), np.int32)
    else:
        prefix = np.zeros((8, lanes), np.int32)
        plen = np.zeros((1, lanes), np.int32)
    out_w, out_len, status = _decode128_sharded(
        jnp.asarray(words), jnp.asarray(n),
        jnp.asarray(prefix), jnp.asarray(plen), mesh=mesh,
        rw=rw, ro=ro, pr=pr, max_rounds=max_rounds, output_limit=block_maxsize,
    )
    out_w = np.asarray(out_w)
    out_len = np.asarray(out_len)[0]
    status = np.asarray(status)[0]
    results = []
    for i in range(len(blocks)):
        s = int(status[i])
        if s == ST_OK:
            results.append(_unpack_column(out_w[pr:], i, int(out_len[i])))
        elif s == STATUS_FALLBACK:
            from ..kernels.decompress_v4 import decompress_blocks_v4

            results.append(
                decompress_blocks_v4(
                    [blocks[i]],
                    block_maxsize=block_maxsize,
                    prefixes=[dictionary] if dictionary else None,
                )[0]
            )
        else:
            raise DecodeError(STATUS_TO_KIND[s])
    return results


def _lane_compress_batch(blocks, mesh, prefixes=None):
    """Compress up to ``128 * n_dev`` raw blocks (each <=
    ``compress128.MAX_B``) with the lane kernel sharded over the mesh.
    ``prefixes`` (optional, per block): window/dictionary bytes the
    block's matches may reach into (linked-frame / preset-dictionary
    compress, ``framed/compress.rs:202-218,271-275``)."""
    from ..kernels import compress128 as c128

    n_dev = mesh.shape[BLOCK_AXIS]
    lanes = 128 * n_dev
    assert 0 < len(blocks) <= lanes
    blocks = [bytes(b) for b in blocks]
    if prefixes is not None:
        prefixes = [bytes(p or b"")[-65536:] for p in prefixes]
        assert len(prefixes) == len(blocks)
        if not any(prefixes):
            prefixes = None
    maxlen = max(max(len(b) for b in blocks), 4)
    assert maxlen <= c128.MAX_B
    max_plen = max((len(p) for p in prefixes), default=0) if prefixes else 0
    ri = -(-(maxlen + max_plen) // 4)
    ri = -(-ri // c128.GROUP_W) * c128.GROUP_W + c128.PAGE_W
    maxout = maxlen + maxlen // 255 + 16
    ro = (-(-maxout // 4) // c128.RING_W + 2) * c128.RING_W
    max_rounds = maxlen + maxout // c128.CB + maxlen // c128.CB + 256
    if prefixes:
        buffers = [p + b for p, b in zip(prefixes, blocks)]
        words, n = _pack_transposed(buffers, lanes, ri)
        cur0 = np.zeros((1, lanes), np.int32)
        for i, p in enumerate(prefixes):
            cur0[0, i] = len(p)
        tinit = np.full((1 << c128.HASHLOG, lanes), 0x1FFFF, np.int32)
        for base in range(0, len(prefixes), 128):
            tinit[:, base : base + 128] = c128.prime_tables_packed(
                prefixes[base : base + 128], c128.HASHLOG
            )
        windowed = True
    else:
        words, n = _pack_transposed(blocks, lanes, ri)
        cur0 = np.zeros((1, lanes), np.int32)
        tinit = np.zeros((8, lanes), np.int32)
        windowed = False
    out_w, out_len = _compress128_sharded(
        jnp.asarray(words), jnp.asarray(n), jnp.asarray(cur0),
        jnp.asarray(tinit), mesh=mesh,
        ri=ri, ro=ro, max_rounds=max_rounds, hashlog=c128.HASHLOG,
        windowed=windowed,
    )
    out_w = np.asarray(out_w)
    out_len = np.asarray(out_len)[0]
    results = []
    for i, b in enumerate(blocks):
        ln = int(out_len[i])
        if len(b) == 0:
            results.append(b"\x00")
        elif ln <= 0:
            from ..native import compress_block as _native_compress
            from ..spec.table import U32Table, prime_u32_table

            if prefixes and prefixes[i]:
                t = U32Table()
                prime_u32_table(t, prefixes[i])
                results.append(
                    bytes(_native_compress(prefixes[i] + b, len(prefixes[i]), t))
                )
            else:
                results.append(bytes(_native_compress(b, 0, U32Table())))
        else:
            results.append(_unpack_column(out_w, i, ln))
    return results


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "block_maxsize", "comp_capacity", "has_dict"),
)
def _decompress_sharded(
    comp,  # uint8 [N, C]
    comp_len,  # int32 [N]
    dict_u8,  # uint8 [D] dictionary tail (<= 64 KiB; replicated)
    dict_len,  # int32 [1]
    *,
    mesh,
    block_maxsize: int,
    comp_capacity: int,
    has_dict: bool = False,
):
    """Mesh-sharded independent-block decompression; the preset dictionary
    is broadcast once and becomes every block's prefix
    (``framed/decompress.rs:237-245``)."""

    from ..kernels.decompress_v4 import _decompress_batch_v4_jit

    rp = (1 << 16) // 128 if has_dict else 0

    def local(comp_l, lens_l, dict_l, dict_len_l):
        nl = comp_l.shape[0]
        if has_dict:
            # right-align the dictionary tail in the 64 KiB prefix slot,
            # as decompress_blocks_v3 lays prefixes out
            d = dict_l.shape[0]
            row = jnp.pad(dict_l, ((1 << 16) - d, 0)) if d < (1 << 16) else dict_l
            prefix = jnp.broadcast_to(row[None, :], (nl, 1 << 16))
            plen = jnp.broadcast_to(dict_len_l, (nl,))
        else:
            prefix = jnp.zeros((nl, 128), jnp.uint8)
            plen = jnp.zeros((nl,), jnp.int32)
        return _decompress_batch_v4_jit(
            comp_l,
            lens_l,
            prefix,
            plen,
            block_maxsize=block_maxsize,
            comp_capacity=comp_capacity,
            prefix_rows=rp,
        )

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS), P(None), P(None)),
        out_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS), P(BLOCK_AXIS)),
        check_vma=False,
    )(comp, comp_len, dict_u8, dict_len)


# ---------------------------------------------------------------------------
# whole-frame operations
# ---------------------------------------------------------------------------


def plan_lane_compress_batches(
    n_blocks: int, cpb: int, k: int, parallel_linked: bool
):
    """Lane-compress batch plan for the device-built windowed path.

    Returns ``[("w", start, nb), ...] + [("h", [chunk indices]), ...]``:
    contiguous FULL-WINDOW runs (every chunk's window = the k preceding
    chunks, entirely inside its own output block in merged-independent
    mode) ride the windowed dispatch; the window-less / partial-window
    output-block HEAD chunks (``j % cpb < k``) are gathered across output
    blocks into host-packed batches.  Every chunk index in
    ``[0, n_blocks)`` appears exactly once.
    """
    plan = []
    if parallel_linked:
        heads = list(range(min(k, n_blocks)))
        runs = [(k, n_blocks)] if n_blocks > k else []
    else:
        heads = [
            i
            for b0 in range(0, n_blocks, cpb)
            for i in range(b0, min(b0 + k, n_blocks))
        ]
        runs = [
            (b0 + k, min(b0 + cpb, n_blocks))
            for b0 in range(0, n_blocks, cpb)
            if b0 + k < min(b0 + cpb, n_blocks)
        ]
    for lo, hi in runs:
        for s in range(lo, hi, 128):
            plan.append(("w", s, min(128, hi - s)))
    for s in range(0, len(heads), 128):
        plan.append(("h", heads[s : s + 128]))
    return plan


def compress_frame_parallel(
    data,
    block_size: int = 1 << 16,
    mesh=None,
    content_checksum: bool = True,
    block_checksums: bool = False,
    with_content_size: bool = True,
    acceleration: int = 1,
    parallel_linked: bool = False,
    dictionary=None,
    dictionary_id: int | None = None,
    lane_kernel: bool = False,
    chunk_windows: bool = True,
) -> bytes:
    """Compress one LZ4 frame with all blocks in parallel on the mesh.

    Independent mode is byte-identical to the streaming writer
    (``frame.compress.CompressionSettings``) with the same settings —
    including with a preset dictionary, which is broadcast to every shard
    and parsed exactly like the reference's per-block dictionary state
    (``framed/compress.rs:202-218``: host-primed step-3 template table +
    per-block ``[dictionary | block]`` buffer).  ``parallel_linked`` emits
    a valid linked-block frame (see module docstring); with a dictionary
    only the first block's window is seeded from the dictionary tail.

    ``lane_kernel=True`` opts into the lane-parallel compressor
    (``kernels/compress128.py``, 128 blocks per kernel step per device;
    multi-device meshes shard the lane batches via ``shard_map``).  All
    frame modes qualify: independent, ``parallel_linked`` (each lane
    carries the previous blocks' trailing 64 KiB as its window with a
    host-primed table — framed/compress.rs:271-275 semantics), and
    preset dictionaries (window broadcast).  The output is a fully valid
    LZ4 frame decodable by any decoder, but NOT byte-identical to the
    streaming writer: the lane parse uses its own table/probe
    heuristics, so it finds a slightly different (still valid) match
    sequence.  Leave it off when byte parity with the reference encoder
    matters.
    """
    data = bytes(data)
    if BlockDescriptor.for_block_maxsize(block_size) is None:
        raise InvalidBlockSize(str(block_size))
    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.shape[BLOCK_AXIS]
    dictionary = bytes(dictionary) if dictionary is not None else None

    from ..kernels.compress import scalar_data_capacity_ok
    from ..kernels.compress128 import MAX_B as C128_MAX_B
    from ..kernels.compress128 import lanes_eligible as _c128_eligible

    use_lanes = lane_kernel
    # the lane kernel's VMEM budget caps per-block size; emitting smaller
    # blocks under a larger declared block-maxsize is valid LZ4 (BD is a
    # maximum, framed/header.rs:51-81).  Linked/dictionary mode carries a
    # 64 KiB window per lane, shrinking the eligible chunk further.
    chunk_size = min(block_size, C128_MAX_B) if use_lanes else block_size
    window = WINDOW_SIZE if parallel_linked else 0
    if use_lanes:
        # chunks carry windows whenever they are linked, dictionary-
        # seeded, or merged into larger output blocks (in-block windows).
        # ``chunk_windows=False`` drops the in-block windows for merged
        # INDEPENDENT blocks: each chunk compresses standalone (~1-2%
        # worse ratio, but bigger chunks, no table priming and no window
        # transport — the throughput-first mode)
        lane_plen = (
            WINDOW_SIZE
            if (
                parallel_linked or dictionary
                or (block_size > C128_MAX_B and chunk_windows)
            )
            else 0
        )
        while chunk_size > 2048 and not _c128_eligible(chunk_size, lane_plen):
            chunk_size //= 2
    if not use_lanes:
        # real-hardware routing by the scalar kernel's SMEM model (the
        # CPU interpret path has no such limit, but routing by static
        # shape keeps both backends on identical code paths)
        if parallel_linked:
            # [window | block] must fit the kernel step.  Emitting
            # smaller-than-declared blocks is valid LZ4, and
            # parallel_linked is already documented as not byte-exact
            # with the serial writer, so shrink the chunk — and the ring
            # halo with it (the halo construction needs window <= chunk)
            while chunk_size > 4096 and not scalar_data_capacity_ok(
                _round_up(min(WINDOW_SIZE, chunk_size) + chunk_size, 128)
            ):
                chunk_size //= 2
            window = min(WINDOW_SIZE, chunk_size)
        elif not scalar_data_capacity_ok(
            _round_up(len(dictionary or b"") + block_size, 128)
        ):
            # independent frames promise byte parity with the streaming
            # writer, so oversized blocks cannot be re-chunked; the
            # native-engine writer produces the identical frame (and is
            # the faster path for such blocks anyway)
            from ..frame.compress import CompressionSettings

            s = (
                CompressionSettings()
                .engine("native")
                .block_size(block_size)
                .block_checksums(block_checksums)
                .content_checksum(content_checksum)
                .acceleration(acceleration)
            )
            if dictionary is not None:
                s.dictionary(dictionary_id or 0, dictionary)
                if dictionary_id is None:
                    s.dictionary_id_nonsense_override(None)
            return s.compress_bytes(data, with_size=with_content_size)

    arr, lens, n_blocks = _pad_blocks(data, chunk_size)
    # pad block count to a multiple of the mesh size with empty blocks
    n_padded = _round_up(n_blocks, n_dev)
    if n_padded != n_blocks:
        arr = np.concatenate([arr, np.zeros((n_padded - n_blocks, chunk_size), np.uint8)])
        lens = np.concatenate([lens, np.zeros(n_padded - n_blocks, np.int32)])

    lane_payloads = None
    if use_lanes:
        from ..kernels.compress128 import compress_blocks_128

        raw_blocks = [
            data[i * chunk_size : i * chunk_size + int(lens[i])]
            for i in range(n_blocks)
        ]
        # chunks per OUTPUT frame block: when the lane kernel's VMEM
        # budget shrank the chunk below the requested block size, the
        # chunk streams of one output block are compressed with IN-BLOCK
        # windows and concatenated into a single valid LZ4 block of the
        # requested size (offsets stay valid across chunk joins because
        # the decoder's output is continuous) — this is how the
        # reference-default 4 MiB geometry compresses on-chip
        # ("compressbig").  NOT byte-identical to the serial writer: the
        # C greedy parse's table state is a strictly sequential chain
        # over the whole block (every probed slot depends on every prior
        # probe), so a byte-exact parallel big-block parse cannot exist;
        # the byte-exact path for big blocks remains the host engine /
        # scalar kernel routing (engine("native"/"tpu") streaming writer).
        cpb = max(block_size // chunk_size, 1)
        # per-chunk windows: linked mode reaches into the previous
        # blocks' decoded output (= raw data, trailing <= 64 KiB;
        # framed/compress.rs:271-275), with block 0 seeded from the
        # dictionary tail; independent mode windows stay INSIDE the
        # chunk's output block (each block's offsets must resolve
        # without neighbors), seeded from the broadcast dictionary
        # (framed/compress.rs:202-218)
        # prefixes materialize LAZILY: with the device-built windowed
        # plan only the few host-packed head batches ever read them, and
        # eagerly slicing n_blocks x ~64 KiB cost ~0.5 s of the warm
        # 32 MiB compressbig wall
        if parallel_linked:
            def _pfx(i):
                if i == 0:
                    return (dictionary or b"")[-WINDOW_SIZE:]
                return data[max(0, i * chunk_size - WINDOW_SIZE)
                            : i * chunk_size]

            lane_prefixes = _LazyPrefixes(_pfx, n_blocks)
        elif (cpb > 1 and chunk_windows) or dictionary:
            dtail = (dictionary or b"")[-WINDOW_SIZE:]

            def _pfx(i):
                return (dtail + data[(i // cpb) * cpb * chunk_size
                                     : i * chunk_size])[-WINDOW_SIZE:]

            lane_prefixes = _LazyPrefixes(_pfx, n_blocks)
        else:
            lane_prefixes = None
        lane_payloads = []
        batch = 128 * n_dev
        if n_dev == 1:
            # pipelined dispatch/collect: host pack + table priming of
            # batch k overlaps kernel execution of batches < k
            from ..kernels import compress128 as c128
            from ..kernels.compress128 import (
                collect_compress_128, dispatch_compress_128,
                dispatch_compress_windowed,
            )

            # chunk batches whose lanes ALL carry full same-source
            # windows build their [window|block] buffers ON DEVICE from
            # the flat block matrix (uploaded once) — the host neither
            # copies nor transfers the ~9x redundant window bytes (the
            # round-3 config-#3 bottleneck).  Linked mode: every batch
            # past the first k chunks; independent merge mode: batches
            # clear of each output block's first k chunks (those carry
            # partial/dictionary windows through the host-packed path).
            k = WINDOW_SIZE // chunk_size
            use_windowed = (
                not c128.STRICT
                and WINDOW_SIZE % chunk_size == 0
                and chunk_size <= WINDOW_SIZE
                and n_blocks > 128
                and (parallel_linked or (chunk_windows and cpb > k))
            )

            # batch plan: contiguous full-window runs ride the device-
            # built windowed path; the remaining chunks (window-less /
            # partial-window output-block HEADS, j % cpb < k, plus
            # dictionary-seeded heads) are gathered across output blocks
            # into a few host-packed batches.  Without this split the
            # merged-independent case ("compressbig": cpb = block_size /
            # chunk, e.g. 128 at 4 MiB) never used the windowed path at
            # all — every uniform 128-stripe started at an output-block
            # head — and shipped ~3x the corpus as host-packed
            # [window|block] buffers through the link (the round-4
            # 3.2 MB/s end-to-end).
            flat_dev = None
            plan = []  # ("w", start, nb) | ("h", [chunk indices])
            if use_windowed:
                from ..hostpack import to_device_chunked

                # +128 slack rows: _build_windowed_words always slices
                # LANES+k rows from start_block-k, and XLA dynamic_slice
                # CLAMPS an out-of-range start (silently shifting every
                # lane's window AND block!) — slack rows are only ever
                # read into idle lanes of partial batches
                rows = _round_up(n_blocks, 128) + 128
                flat = arr
                if rows != flat.shape[0]:
                    flat = np.concatenate(
                        [flat, np.zeros((rows - flat.shape[0], chunk_size),
                                        np.uint8)]
                    )
                flat_dev = to_device_chunked(flat)
                plan = plan_lane_compress_batches(
                    n_blocks, cpb, k, parallel_linked
                )
                from ..kernels.compress128 import prime_tables_batched

                tinit_batched = prime_tables_batched(
                    data, plan, lens, chunk=chunk_size, window=WINDOW_SIZE
                )
            else:
                for base in range(0, n_blocks, batch):
                    plan.append(
                        ("h", list(range(base, min(base + batch, n_blocks))))
                    )

            lane_payloads = [None] * n_blocks
            inflight = []

            def _collect_one():
                idxs, hnd = inflight.pop(0)
                for i, payload in zip(idxs, collect_compress_128(hnd)):
                    lane_payloads[i] = payload

            for item in plan:
                if item[0] == "w":
                    _, s, nb = item
                    inflight.append((
                        list(range(s, s + nb)),
                        dispatch_compress_windowed(
                            flat_dev, data, s, nb, lens,
                            chunk=chunk_size, window=WINDOW_SIZE,
                            tinit_batched=tinit_batched,
                        ),
                    ))
                else:
                    idxs = item[1]
                    pfx = (
                        [lane_prefixes[i] for i in idxs]
                        if lane_prefixes else None
                    )
                    inflight.append((
                        idxs,
                        dispatch_compress_128(
                            [raw_blocks[i] for i in idxs], prefixes=pfx
                        ),
                    ))
                if len(inflight) > PIPELINE_DEPTH:
                    _collect_one()
            while inflight:
                _collect_one()
        else:
            for base in range(0, n_blocks, batch):
                chunk = raw_blocks[base : base + batch]
                pfx = (
                    lane_prefixes[base : base + batch]
                    if lane_prefixes else None
                )
                lane_payloads.extend(
                    _lane_compress_batch(chunk, mesh, prefixes=pfx)
                )

    if lane_payloads is None:
        template = np.zeros(4096, np.int32)
        if dictionary and not parallel_linked:
        # independent+dict: buffers are [dict | block] with cursor at
        # dict_len, so dict coordinates == buffer coordinates and every
        # template position sits behind the cursor.  Linked mode must NOT
        # use this template: its buffers hold only the dict TAIL in a
        # `window`-byte slot, so dict-coordinate entries point at wrong
        # bytes — and once window < dict_len, at/AHEAD of the cursor
        # (a candidate equal to the cursor emits a zero offset).  The
        # in-kernel window priming supplies the same step-3 candidates in
        # correct buffer coordinates.
            from ..spec.table import U32Table, prime_u32_table

            t = U32Table()
            prime_u32_table(t, dictionary)
            template = t.dict.astype(np.int32)
        tables = np.broadcast_to(template, (n_padded, 4096)).copy()
        dict_u8 = np.frombuffer(dictionary or b"\x00", np.uint8)
        out_u8, out_len, status = _compress_sharded(
            jnp.asarray(arr),
            jnp.asarray(lens),
            jnp.asarray(tables),
            jnp.asarray(dict_u8),
            jnp.asarray(np.array([len(dictionary or b"")], np.int32)),
            mesh=mesh,
            block_size=chunk_size,
            window=window,
            acceleration=acceleration,
            u16_table=False,
            has_dict=bool(dictionary),
        )
        out_u8 = np.asarray(out_u8)
        out_len = np.asarray(out_len)
        status = np.asarray(status)

    # host-side ordered assembly (frame order)
    flags = Flags(
        independent_blocks=not parallel_linked,
        block_checksums=block_checksums,
        content_checksum=content_checksum,
        content_size=with_content_size,
        dictionary_id=dictionary_id is not None,
    )
    bd = BlockDescriptor.for_block_maxsize(block_size)
    header = bytearray()
    header.extend(MAGIC.to_bytes(4, "little"))
    header.append(flags.encode())
    header.append(bd.byte)
    if with_content_size:
        header.extend(len(data).to_bytes(8, "little"))
    if dictionary_id is not None:
        header.extend(int(dictionary_id).to_bytes(4, "little"))
    from ..spec.xxhash32 import xxh32

    header.append((xxh32(header[4:]) >> 8) & 0xFF)

    parts = [bytes(header)]
    # chunks per emitted frame block: the lane path concatenates each
    # output block's chunk streams into ONE block of the requested size
    # (in-block windows keep every offset resolvable); other paths emit
    # chunk-sized blocks (valid LZ4 — BD is a maximum)
    group = max(block_size // chunk_size, 1) if lane_payloads is not None else 1
    for ob in range(0, n_blocks, group):
        idxs = [i for i in range(ob, min(ob + group, n_blocks)) if lens[i]]
        if not idxs:
            continue  # no zero-length blocks: 0 is the EndMark
        blk_len = sum(int(lens[i]) for i in idxs)
        raw = data[ob * chunk_size : ob * chunk_size + blk_len]
        if lane_payloads is not None:
            # incompressible fallback applied host-side: the lane kernel
            # has no emission cap, so the cap semantics (output <= input,
            # framed/compress.rs NoPartialWrites) are enforced here.
            # Chunk streams SPLICE (not concat): LZ4 is end-delimited, so
            # interior chunks' literal-only tails merge into the next
            # chunk's first sequence (native.splice_streams)
            if len(idxs) > 1:
                from ..native import splice_streams

                payload = splice_streams([lane_payloads[i] for i in idxs])
            else:
                payload = lane_payloads[idxs[0]]
            incompressible = len(payload) > blk_len
        else:
            incompressible = status[ob] == kcompress.STATUS_INCOMPRESSIBLE
            payload = (
                raw if incompressible else out_u8[ob, : out_len[ob]].tobytes()
            )
        if incompressible:
            payload = raw
            parts.append((blk_len | INCOMPRESSIBLE).to_bytes(4, "little"))
        else:
            parts.append(len(payload).to_bytes(4, "little"))
        parts.append(payload)
        if block_checksums:
            parts.append(xxh32(payload).to_bytes(4, "little"))
    parts.append((0).to_bytes(4, "little"))
    if content_checksum:
        parts.append((make_hasher(0).update(data).digest()).to_bytes(4, "little"))
    return b"".join(parts)


def decompress_frame_parallel(
    frame,
    mesh=None,
    verify_checksums: bool = True,
    dictionary=None,
    lane_kernel: bool | None = None,
) -> bytes:
    """Decompress one LZ4 frame with all independent blocks in parallel.

    A preset dictionary is broadcast once and serves as every block's
    prefix.  Linked-block frames fall back to the (serial-by-nature)
    streaming reader with the native engine.

    ``lane_kernel=None`` (auto) routes eligible blocks through the
    lane-parallel decoder on single-device meshes always, and on
    multi-device meshes only on the TPU backend (the sharded lockstep
    kernel is far too slow under CPU interpret mode to be a sensible
    default there); pass True/False to override.
    """
    from ..frame.decompress import LZ4FrameReader

    frame = bytes(frame)
    dictionary = bytes(dictionary or b"")[-65536:]
    reader = LZ4FrameReader(frame, engine="native")
    if not reader.flags.independent_blocks:
        rest = LZ4FrameReader(frame, engine="native")
        return rest.read_all(dictionary)

    # scan block boundaries without decoding, with the same hostile-input
    # validations the streaming reader enforces (frame/decompress.py:120-140)
    from ..frame.decompress import _read_exact
    from ..frame.errors import BlockSizeOverflow

    blocks = []
    stream = reader.reader
    while True:
        block_length = int.from_bytes(_read_exact(stream, 4), "little")
        if block_length == 0:
            if reader.flags.content_checksum:
                expected_sum = int.from_bytes(_read_exact(stream, 4), "little")
            else:
                expected_sum = None
            break
        compressed = (block_length & INCOMPRESSIBLE) == 0
        block_length &= ~INCOMPRESSIBLE & 0xFFFFFFFF
        if block_length > reader.block_maxsize:
            raise BlockSizeOverflow("a block is larger than the frame's block maxsize")
        payload = _read_exact(stream, block_length)
        checksum = (
            int.from_bytes(_read_exact(stream, 4), "little")
            if reader.flags.block_checksums
            else None
        )
        blocks.append((compressed, payload, checksum))

    if verify_checksums and reader.flags.block_checksums:
        from ..frame.errors import BlockChecksumFail
        from ..spec.xxhash32 import xxh32

        for compressed, payload, checksum in blocks:
            if checksum is not None and xxh32(payload) != checksum:
                raise BlockChecksumFail("a block checksum was invalid")

    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.shape[BLOCK_AXIS]

    to_decode = [p for c, p, _ in blocks if c]
    outputs = {}
    # lane-parallel decoder (128 blocks per kernel step per device, one
    # block per SIMD lane) — ~5x the per-block scalar pipeline; it covers
    # independent blocks without dictionaries within its transposed-VMEM
    # budget, with a per-lane scalar fallback inside.  On multi-device
    # meshes the lane batches shard over the ``blocks`` axis
    # (``_decode128_sharded``).
    from ..kernels.decode128 import decompress_blocks_128, lanes_eligible

    if lane_kernel is None:
        lane_kernel = n_dev == 1 or jax.default_backend() == "tpu"
    lane_idx = []
    # dictionary frames ride the lane decoder too: the shared dictionary
    # broadcasts to every lane as a right-aligned prefix seeding the
    # transposed outputs (single-device wrapper and the sharded
    # multi-device path both)
    if to_decode and lane_kernel:
        plen = len(dictionary or b"")
        lane_idx = [
            i
            for i, p in enumerate(to_decode)
            if lanes_eligible(len(p), reader.block_maxsize, plen)
        ]
    if lane_idx:
        batch = 128 * n_dev
        # batch-balance: the lockstep kernel runs until its SLOWEST lane
        # finishes.  Multi-batch single-device runs without a dictionary
        # use the model-driven scheduler (parallel/sched.py): blocks
        # sorted by modeled lockstep rounds, each batch routed to the
        # CB=16/32 kernel variant with the lower modeled wall.  Other
        # shapes fall back to grouping by compressed size (a proxy for
        # round count).
        if (
            n_dev == 1
            and not dictionary
            and len(lane_idx) > batch
            and _use_scheduled_decode()
        ):
            from ..kernels.decode128 import load_variant
            from .sched import plan_batches

            sub = [to_decode[i] for i in lane_idx]
            # pipelined: dispatch up to PIPELINE_DEPTH batches ahead so
            # host pack + H2D of later batches overlap earlier kernels
            inflight = []

            def _drain_one():
                idxs, mod, hnd = inflight.pop(0)
                for i, o in zip(idxs, mod.collect_blocks_128(hnd)):
                    if len(o) > reader.block_maxsize:
                        raise BlockSizeOverflow(
                            "a block decompressed to more data than allowed"
                        )
                    outputs[i] = o

            for sub_idxs, cb in plan_batches(sub, reader.block_maxsize):
                idxs = [lane_idx[j] for j in sub_idxs]
                mod = load_variant(cb)
                inflight.append((idxs, mod, mod.dispatch_blocks_128(
                    [to_decode[i] for i in idxs],
                    block_maxsize=reader.block_maxsize,
                )))
                if len(inflight) > PIPELINE_DEPTH:
                    _drain_one()
            while inflight:
                _drain_one()
            lane_idx = []
        order = (
            sorted(lane_idx, key=lambda i: len(to_decode[i]))
            if len(lane_idx) > batch
            else lane_idx
        )
        if n_dev == 1:
            from ..kernels.decode128 import (
                collect_blocks_128, dispatch_blocks_128,
            )

            inflight = []

            def _drain_one():
                idxs, hnd = inflight.pop(0)
                for i, o in zip(idxs, collect_blocks_128(hnd)):
                    if len(o) > reader.block_maxsize:
                        raise BlockSizeOverflow(
                            "a block decompressed to more data than allowed"
                        )
                    outputs[i] = o

            for base in range(0, len(order), batch):
                idxs = order[base : base + batch]
                inflight.append((idxs, dispatch_blocks_128(
                    [to_decode[i] for i in idxs],
                    block_maxsize=reader.block_maxsize,
                    prefixes=(
                        [dictionary] * len(idxs) if dictionary else None
                    ),
                )))
                if len(inflight) > PIPELINE_DEPTH:
                    _drain_one()
            while inflight:
                _drain_one()
        else:
            for base in range(0, len(order), batch):
                idxs = order[base : base + batch]
                outs = _lane_decode_batch(
                    [to_decode[i] for i in idxs],
                    reader.block_maxsize,
                    mesh,
                    dictionary=dictionary,
                )
                for i, o in zip(idxs, outs):
                    if len(o) > reader.block_maxsize:
                        raise BlockSizeOverflow(
                            "a block decompressed to more data than allowed"
                        )
                    outputs[i] = o
    rest = [i for i in range(len(to_decode)) if i not in outputs]
    if rest:
        from ..kernels.decompress_v4 import V4_MAX_COMP, V4_MAX_OUT

        def _native_fallback(i):
            # beyond the kernels' SMEM/VMEM windows (frame block sizes
            # >= 1 MiB): per-block native decode, same typed errors
            from ..native import decompress_block as _native_decompress

            o = bytes(
                _native_decompress(
                    to_decode[i],
                    dictionary or b"",
                    output_limit=reader.block_maxsize,
                )
            )
            if len(o) > reader.block_maxsize:
                raise BlockSizeOverflow(
                    "a block decompressed to more data than allowed"
                )
            outputs[i] = o

        # blocks beyond decode128's VMEM budget (frame block sizes >=
        # 256 KiB, incl. the reference default 4 MiB) decode on-chip via
        # the HBM-staged banded lane kernel; its per-lane fallback covers
        # divergent-ratio stalls.  CPU interpret mode keeps the native
        # engine (the banded kernel is only sensible on real hardware).
        if jax.default_backend() == "tpu":
            # everything the lane decoder's VMEM eligibility skipped rides
            # the HBM-staged engine: big blocks (>= 256 KiB) AND the
            # "heavy" near-incompressible 64 KiB blocks whose comp streams
            # exceed the in-VMEM shape (Silesia's sao/x-ray class) — the
            # scalar v4 pipeline is ~5x slower than decodebig for those
            big = list(rest)
            if big:
                from ..kernels.decodebig import (
                    collect_blocks_big, dispatch_blocks_big,
                )

                big.sort(key=lambda i: len(to_decode[i]))
                # depth-1 pipeline: each 128 x 4 MiB batch parks ~0.5 GB
                # of HBM, so keep only one batch queued behind the
                # running one
                inflight = []

                def _drain_big():
                    idxs, hnd = inflight.pop(0)
                    for i, o in zip(idxs, collect_blocks_big(hnd)):
                        if len(o) > reader.block_maxsize:
                            raise BlockSizeOverflow(
                                "a block decompressed to more data than allowed"
                            )
                        outputs[i] = o

                for base in range(0, len(big), 128):
                    idxs = big[base : base + 128]
                    inflight.append((idxs, dispatch_blocks_big(
                        [to_decode[i] for i in idxs],
                        block_maxsize=reader.block_maxsize,
                        prefixes=(
                            [dictionary] * len(idxs) if dictionary else None
                        ),
                    )))
                    if len(inflight) > 1:
                        _drain_big()
                while inflight:
                    _drain_big()
                rest = [i for i in rest if i not in outputs]
        small = []
        for i in rest:
            if len(to_decode[i]) > V4_MAX_COMP:
                _native_fallback(i)
            else:
                small.append(i)
        eff_maxsize = min(reader.block_maxsize, V4_MAX_OUT)
        if small:
            need = max(len(to_decode[i]) for i in small)
            comp_capacity = 4096
            while comp_capacity < need:
                comp_capacity *= 2
            comp_capacity = _round_up(comp_capacity, 128)
            n = len(small)
            n_padded = _round_up(n, n_dev)
            comp = np.zeros((n_padded, comp_capacity), np.uint8)
            clens = np.zeros(n_padded, np.int32)
            for j, i in enumerate(small):
                p = to_decode[i]
                comp[j, : len(p)] = np.frombuffer(p, np.uint8)
                clens[j] = len(p)
            out_u8, out_len, statuses = _decompress_sharded(
                jnp.asarray(comp),
                jnp.asarray(clens),
                jnp.asarray(np.frombuffer(dictionary or b"\x00", np.uint8)),
                jnp.asarray(np.array([len(dictionary)], np.int32)),
                mesh=mesh,
                block_maxsize=eff_maxsize,
                comp_capacity=comp_capacity,
                has_dict=bool(dictionary),
            )
            out_u8 = np.asarray(out_u8)
            out_len = np.asarray(out_len)
            statuses = np.asarray(statuses)
            for j, i in enumerate(small):
                st = int(statuses[j])
                if (
                    st == kdecompress.ERR_MEMORY_LIMIT
                    and eff_maxsize < reader.block_maxsize
                ):
                    _native_fallback(i)
                    continue
                if st != kdecompress.OK:
                    raise DecodeError(kdecompress.STATUS_TO_KIND[st])
                if int(out_len[j]) > reader.block_maxsize:
                    raise BlockSizeOverflow(
                        "a block decompressed to more data than allowed"
                    )
                outputs[i] = out_u8[j, : out_len[j]].tobytes()

    parts = []
    k = 0
    for compressed, payload, _ in blocks:
        if compressed:
            parts.append(outputs[k])
            k += 1
        else:
            parts.append(payload)
    result = b"".join(parts)

    if verify_checksums and reader.flags.content_checksum and expected_sum is not None:
        from ..frame.errors import FrameChecksumFail

        if make_hasher(0).update(result).digest() != expected_sum:
            raise FrameChecksumFail("the frame checksum was invalid")
    return result


def _scan_frame(frame: bytes, verify_checksums: bool = True):
    """Parse one frame's header + block chain without decoding (the same
    hostile-input validations the streaming reader enforces).  Returns
    (reader, blocks, expected_sum) with blocks = [(compressed, payload)]."""
    from ..frame.decompress import LZ4FrameReader, _read_exact
    from ..frame.errors import BlockChecksumFail, BlockSizeOverflow

    reader = LZ4FrameReader(bytes(frame), engine="native")
    stream = reader.reader
    blocks = []
    expected_sum = None
    while True:
        block_length = int.from_bytes(_read_exact(stream, 4), "little")
        if block_length == 0:
            if reader.flags.content_checksum:
                expected_sum = int.from_bytes(_read_exact(stream, 4), "little")
            break
        compressed = (block_length & INCOMPRESSIBLE) == 0
        block_length &= ~INCOMPRESSIBLE & 0xFFFFFFFF
        if block_length > reader.block_maxsize:
            raise BlockSizeOverflow(
                "a block is larger than the frame's block maxsize"
            )
        payload = _read_exact(stream, block_length)
        if reader.flags.block_checksums:
            checksum = int.from_bytes(_read_exact(stream, 4), "little")
            if verify_checksums:
                from ..spec.xxhash32 import xxh32

                if xxh32(payload) != checksum:
                    raise BlockChecksumFail("a block checksum was invalid")
        blocks.append((compressed, payload))
    return reader, blocks, expected_sum


def decompress_frames_parallel(
    frames,
    mesh=None,
    verify_checksums: bool = True,
    dictionaries=None,
) -> list[bytes]:
    """Decode MANY LZ4 frames concurrently on the TPU — the parallel
    answer to linked-block frames, whose blocks form a strictly serial
    chain WITHIN a frame (block i needs block i-1's decoded 64 KiB tail,
    ``framed/decompress.rs:237-269``; the format itself makes a single
    chain unparallelizable, matching its seekability caveat).  Across
    frames the chains are independent, so wave ``w`` decodes block ``w``
    of every linked frame lane-parallel, each lane seeded with its own
    frame's carryover window (dictionary tail on the first block), the
    windows handed off between waves.

    Independent-block frames decode via ``decompress_frame_parallel``
    (their blocks already fan out within the frame).  Engine routing per
    wave: decode128's prefix mode when the shapes fit its VMEM budget,
    the v4 scalar pipeline (64 KiB prefix support) otherwise, native for
    oversized blocks.
    """
    frames = [bytes(f) for f in frames]
    if dictionaries is None:
        dictionaries = [None] * len(frames)
    assert len(dictionaries) == len(frames)
    if mesh is None:
        mesh = make_mesh()

    results: dict[int, bytes] = {}
    linked: list[int] = []
    scans: dict[int, tuple] = {}
    for fi, frame in enumerate(frames):
        reader, blocks, expected = _scan_frame(frame, verify_checksums)
        scans[fi] = (reader, blocks, expected)
        if reader.flags.independent_blocks:
            results[fi] = decompress_frame_parallel(
                frame, mesh=mesh, verify_checksums=verify_checksums,
                dictionary=dictionaries[fi],
            )
        else:
            linked.append(fi)

    if linked:
        from ..kernels.decode128 import (
            decompress_blocks_128, lanes_eligible as d128_eligible,
        )
        from ..kernels.decompress_v4 import (
            V4_MAX_COMP, V4_MAX_OUT, decompress_blocks_v4,
        )

        outputs = {fi: [] for fi in linked}
        windows = {
            fi: bytes(dictionaries[fi] or b"")[-WINDOW_SIZE:] for fi in linked
        }
        max_waves = max(len(scans[fi][1]) for fi in linked)
        for w in range(max_waves):
            wave = [fi for fi in linked if w < len(scans[fi][1])]
            todo = []
            for fi in wave:
                compressed, payload = scans[fi][1][w]
                if compressed:
                    todo.append(fi)
                else:
                    outputs[fi].append(payload)
                    windows[fi] = (windows[fi] + payload)[-WINDOW_SIZE:]
            for base in range(0, len(todo), 128):
                batch = todo[base : base + 128]
                payloads = [scans[fi][1][w][1] for fi in batch]
                prefixes = [windows[fi] for fi in batch]
                bms = max(scans[fi][0].block_maxsize for fi in batch)
                maxc = max(len(p) for p in payloads)
                maxp = max(len(p) for p in prefixes)
                if d128_eligible(maxc, bms, maxp):
                    outs = decompress_blocks_128(
                        payloads, block_maxsize=bms, prefixes=prefixes
                    )
                elif maxc <= V4_MAX_COMP and bms <= V4_MAX_OUT:
                    outs = decompress_blocks_v4(
                        payloads, block_maxsize=bms, prefixes=prefixes
                    )
                elif jax.default_backend() == "tpu":
                    # big-block linked chains (incl. the reference-default
                    # 4 MiB geometry) stay ON-CHIP: the banded kernel's
                    # prefix mode seeds each lane's carryover window into
                    # its initial output band
                    from ..kernels.decodebig import decompress_blocks_big

                    outs = decompress_blocks_big(
                        payloads, block_maxsize=bms, prefixes=prefixes
                    )
                else:
                    from ..native import decompress_block as _nd

                    outs = [
                        bytes(_nd(p, pre, output_limit=bms))
                        for p, pre in zip(payloads, prefixes)
                    ]
                for fi, o in zip(batch, outs):
                    if len(o) > scans[fi][0].block_maxsize:
                        from ..frame.errors import BlockSizeOverflow

                        raise BlockSizeOverflow(
                            "a block decompressed to more data than allowed"
                        )
                    outputs[fi].append(o)
                    windows[fi] = (windows[fi] + o)[-WINDOW_SIZE:]
        for fi in linked:
            data = b"".join(outputs[fi])
            reader, _, expected = scans[fi]
            if (
                verify_checksums
                and reader.flags.content_checksum
                and expected is not None
            ):
                from ..frame.errors import FrameChecksumFail

                if make_hasher(0).update(data).digest() != expected:
                    raise FrameChecksumFail("the frame checksum was invalid")
            results[fi] = data
    return [results[fi] for fi in range(len(frames))]
