"""Pallas TPU raw-block compressor — bit-exact greedy LZ4 parse.

TPU-native implementation of the reference's match finder and sequence
emitter (``/root/reference/src/raw/compress/mod.rs:147-260``).  The greedy
parse is a strictly sequential dependent loop (the hash table mutates as
the cursor moves), so one block's parse runs on the TPU's scalar core with
all state in SMEM:

* input block as packed little-endian words,
* the 4096-slot encoder table as scratch,
* compressed output emitted through a word-packing byte pusher.

Throughput comes from the grid (many blocks per call per chip) and from
the mesh (blocks data-parallel across chips, ``lz4tpu.parallel``), not
from vectorising a single parse — reordering anything would break
byte-for-byte parity with the C implementation.

The reference hash ``((v << 24) * 889523592379) >> 52`` is 64-bit; Mosaic
scalars are 32-bit, so the kernel computes the exact top-12 bits with
32-bit limb arithmetic (see ``_hash_u32t``): only byte0 and bytes1..4 of
the little-endian u64 read survive the ``<< 24``, giving

    hi32 = (b0*(m0>>8) + (b0*(m0&0xFF))>>8 + ((b0*m1)&0xFF)<<24 + w1*m0) mod 2^32
    hash = hi32 >> 20

with m0/m1 the low/high limbs of the multiplier — proven equal to the
64-bit form in tests/test_kernels_compress.py (random u64s + carry edges).

Cap/abort semantics mirror ``NoPartialWrites`` (``framed/compress.rs:285``):
the group-granular overflow check leaves the encoder table mutated exactly
as the reference does, which is what makes linked-block mode bit-exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..spec.block import Incompressible
from ..spec.table import HASH64_MUL, U16Table, U32Table

LANES = 128
HASHLOG = 12
MINMATCH = 4
SKIP_TRIGGER = 6

# 32-bit limbs of the 64-bit hash multiplier
_M0 = HASH64_MUL & 0xFFFFFFFF  # low limb
_M1 = HASH64_MUL >> 32  # high limb (= 207)

STATUS_OK = 0
STATUS_INCOMPRESSIBLE = 1

FIND_UNROLL = 1  # probes per fori chunk (4 measured 2x WORSE: typical find trip is ~1)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _srl(x, n):
    """Logical right shift on int32 scalars (>> would sign-extend)."""
    return jax.lax.shift_right_logical(x, n)


def _compress_kernel(
    in_words_ref,  # SMEM (1, 1, Wi) int32 — packed LE words of data (window+block)
    hashes_ref,  # SMEM (1, 1, Wh) int32 — two precomputed 12/13-bit hashes per word
    n_ref,  # SMEM (1,1,1) int32 — total data length
    cursor_ref,  # SMEM (1,1,1) int32 — parse start (window offset)
    cap_ref,  # SMEM (1,1,1) int32 — output byte cap (<0: none)
    accel_ref,  # SMEM (1,1,1) int32 — acceleration
    toff_ref,  # SMEM (1,1,1) int32 — table offset (linked-mode slide)
    prime_ref,  # SMEM (1,1,1) int32 — 1: prime table from data[:cursor] (dict semantics)
    table_in_ref,  # SMEM (1, 1, S) int32 — encoder table in
    out_words_ref,  # SMEM (1, 1, Wo) int32 — packed compressed output
    out_len_ref,  # SMEM (1,1,1) int32
    status_ref,  # SMEM (1,1,1) int32
    table_out_ref,  # SMEM (1, 1, S) int32 — encoder table out
    table_ref,  # SMEM scratch (S,) int32
    *,
    wi: int,
    wh: int,
    wo: int,
    table_slots: int,
    u16_table: bool,
):
    n = n_ref[0, 0, 0]
    init_cursor = cursor_ref[0, 0, 0]
    cap_in = cap_ref[0, 0, 0]
    cap = jnp.where(cap_in < 0, jnp.int32(0x7FFFFFF0), cap_in)
    acceleration = accel_ref[0, 0, 0]
    toff = toff_ref[0, 0, 0]
    do_prime = prime_ref[0, 0, 0]

    # copy the (possibly dictionary-primed) table into scratch; the extra
    # slot at index table_slots is a write sink for branchless masked
    # inserts (tail positions / non-matches write there instead of
    # branching — a lax.cond per position costs more than the insert)
    def copy_in(i, _):
        table_ref[i] = table_in_ref[0, 0, i]
        return 0

    jax.lax.fori_loop(0, table_slots, copy_in, 0)

    max_wi = wi - 1

    def read_byte(p):
        idx = jnp.minimum(_srl(p, 2), max_wi)
        w = in_words_ref[0, 0, idx]
        return _srl(w, (p & 3) * 8) & 0xFF

    def read_u32(p):
        """Unaligned LE u32 at byte p (two word reads + funnel shift)."""
        idx = jnp.minimum(_srl(p, 2), max_wi - 1)
        w0 = in_words_ref[0, 0, idx]
        w1 = in_words_ref[0, 0, idx + 1]
        sh = (p & 3) * 8
        lo = _srl(w0, sh)
        hi = jnp.where(sh == 0, 0, w1 << ((32 - sh) & 31))
        return lo | hi

    max_wh = wh - 1

    def hash_at(p):
        """Reference hash at position p, from the vector-precomputed table
        (two 16-bit entries per SMEM word) — one load + shift instead of
        the ~15-op 32-bit-limb evaluation the v1 kernel did per probe."""
        wv = hashes_ref[0, 0, jnp.minimum(_srl(p, 1), max_wh)]
        return _srl(wv, (p & 1) * 16) & 0xFFFF

    def table_replace(p, enable=None):
        h = hash_at(p)
        if enable is not None:
            h = jnp.where(enable, h, table_slots)  # dummy sink slot
        prev = table_ref[h]
        table_ref[h] = p + toff
        # saturating_sub in buffer coordinates
        return jnp.maximum(prev - toff, 0)

    # ---- in-kernel prefix priming (framed/compress.rs:202-214 semantics:
    #      insert positions 0, 3, 6, ... <= cursor-8 of the window/dictionary
    #      prefix, later inserts overwriting earlier) ----
    def prime_body(i, _):
        p = i * 3
        table_ref[hash_at(p)] = p + toff
        return 0

    n_prime = jnp.where(
        (do_prime != 0) & (init_cursor >= 8), (init_cursor - 8) // 3 + 1, 0
    )
    jax.lax.fori_loop(0, n_prime, prime_body, 0)

    # ---- output byte pusher (packed words, RMW) ----
    max_wo = wo - 1

    def push_byte(out_pos, b):
        idx = jnp.minimum(_srl(out_pos, 2), max_wo)
        sh = (out_pos & 3) * 8
        w = out_words_ref[0, 0, idx]
        w = (w & ~(0xFF << sh)) | ((b & 0xFF) << sh)
        out_words_ref[0, 0, idx] = w
        return out_pos + 1

    def push_lsic_tail(out_pos, value):
        # values < 0xF: nothing; < 0xF + 0xFF (the overwhelmingly common
        # tail case): exactly one byte, no while_loop
        def cond(c):
            return c[1] >= 0xFF

        def body(c):
            op, v = c
            return push_byte(op, 0xFF), v - 0xFF

        def emit(out_pos):
            v = value - 0xF

            def long(c):
                return jax.lax.while_loop(cond, body, c)

            out_pos, v = jax.lax.cond(
                v >= 0xFF, long, lambda c: c, (out_pos, v)
            )
            return push_byte(out_pos, v)

        return jax.lax.cond(value >= 0xF, emit, lambda op: op, out_pos)

    def push_word(out_pos, w):
        """Write 4 bytes at an arbitrary byte position (two RMW words)."""
        idx = jnp.minimum(_srl(out_pos, 2), max_wo - 1)
        sh = (out_pos & 3) * 8
        w0 = out_words_ref[0, 0, idx]
        w1 = out_words_ref[0, 0, idx + 1]
        m0 = jnp.where(sh == 0, 0, (1 << sh) - 1).astype(jnp.int32)
        out_words_ref[0, 0, idx] = (w0 & m0) | (w << sh)
        hi = jnp.where(sh == 0, w1, (w1 & ~((1 << sh) - 1)) | _srl(w, (32 - sh) & 31))
        out_words_ref[0, 0, idx + 1] = jnp.where(sh == 0, w1, hi)
        return out_pos + 4

    def copy_literals(out_pos, start, length):
        # word-at-a-time (4 bytes per step, two RMW words) + byte tail
        def wbody(i, op):
            return push_word(op, read_u32(start + 4 * i))

        out_pos = jax.lax.fori_loop(0, _srl(length, 2), wbody, out_pos)

        def body(i, op):
            return push_byte(op, read_byte(start + i))

        return jax.lax.fori_loop(length & ~3, length, body, out_pos)

    def lsic_len(v):
        return jnp.where(v < 0xF, 0, _srl(v - 0xF, 0) // 0xFF + 1)

    # ---- match extension (word-at-a-time LCP) ----
    def _lcp_bytes_tail(m, limit, a, b):
        """Up to 3 trailing byte compares, branchless."""
        g = jnp.bool_(True)
        for _ in range(3):
            g = g & (m < limit) & (read_byte(a + m) == read_byte(b + m))
            m = jnp.where(g, m + 1, m)
        return m

    def count_matching(a, a_end, b):
        """LCP of data[a:a_end] and data[b:n] (equivalent to
        compress/mod.rs:117-145; see spec/block.py for the proof).

        The first 32 bytes compare branchlessly (8 unrolled word steps);
        only matches that survive all 32 enter a while_loop (a while
        iteration costs ~750 ns on this part, so the common short match
        must never pay it)."""
        limit = jnp.minimum(a_end - a, n - b)

        # caller has already verified the first word matches (the probe's
        # branchless pre-check), so start at 4
        m = jnp.int32(4)
        g = jnp.bool_(True)
        for _ in range(7):
            g = g & (m + 4 <= limit) & (read_u32(a + m) == read_u32(b + m))
            m = jnp.where(g, m + 4, m)

        def long_path(m0):
            def wcond(c):
                _, go = c
                return go

            def wbody(c):
                m, _ = c
                go = jnp.bool_(True)
                for _ in range(8):
                    go = go & (m + 4 <= limit) & (read_u32(a + m) == read_u32(b + m))
                    m = jnp.where(go, m + 4, m)
                return m, go

            m1, _ = jax.lax.while_loop(wcond, wbody, (m0, jnp.bool_(True)))
            return m1

        m = jax.lax.cond(g, long_path, lambda m0: m0, m)
        return _lcp_bytes_tail(m, limit, a, b)

    # ---- the greedy parse (compress/mod.rs:166-238) ----
    # carry: cursor, out_pos, status, done
    def outer_cond(c):
        cursor, _, status, done = c
        return (cursor < n) & (status == STATUS_OK) & (~done)

    def outer_body(c):
        cursor, out_pos, status, done = c
        literal_start = cursor

        # --- find a duplicate ---
        # inner carry: cursor, step, step_counter, found, offset, extra, tail
        def find_cond(fc):
            cursor, _, _, found, _, _, tail = fc
            return (~found) & (~tail)

        def find_body(fc):
            cursor, step, step_counter, found, offset, extra, tail = fc
            # fully predicated so the body can be UNROLLED inside one
            # while iteration (a while_loop iteration costs ~750 ns of
            # fixed overhead on this part; see PERF_NOTES round 2)
            active = (~found) & (~tail)

            # tail guard: bail when the NEXT probe would pass n-11 (C's
            # `forwardIp > mflimitPlusOne`); at step==1 this is exactly the
            # reference's `n - cursor < 12` (compress/mod.rs:179)
            is_tail = active & (cursor + step > n - 11)
            # the tail path must NOT probe the table (compress/mod.rs:178
            # returns before the replace at :196): masked via the dummy slot
            candidate = jnp.where(
                is_tail, 0, table_replace(jnp.minimum(cursor, n - 1), active & (~is_tail))
            )
            usable = (
                active
                & (~is_tail)
                & (cursor != init_cursor)
                & (cursor - candidate <= 0xFFFF)
            )
            # branchless first-word pre-check: a usable candidate whose
            # first 4 bytes match IS a match (limit >= 4 holds in the probe
            # context); only real matches enter the LCP extension
            quick = usable & (read_u32(jnp.minimum(cursor, n - 4)) ==
                              read_u32(jnp.minimum(candidate, n - 4)))
            matching = jax.lax.cond(
                quick,
                lambda _: count_matching(cursor, n - 5, candidate),
                lambda _: jnp.int32(0),
                0,
            )
            is_match = quick

            # backtrack (compress/mod.rs:211-214): first 4 steps branchless
            # (backtracks are usually 0-3 bytes), while_loop only beyond
            def bt_can(bt):
                return (
                    (bt < cursor - literal_start)
                    & (candidate - bt > 0)
                    & (read_byte(cursor - bt - 1) == read_byte(candidate - bt - 1))
                )

            bt = jnp.int32(0)
            g = is_match
            for _ in range(4):
                g = g & bt_can(bt)
                bt = jnp.where(g, bt + 1, bt)

            def bt_long(bt0):
                def bt_cond(c2):
                    return c2[1]

                def bt_body(c2):
                    bt, _ = c2
                    can = bt_can(bt)
                    return jnp.where(can, bt + 1, bt), can

                return jax.lax.while_loop(bt_cond, bt_body, (bt0, jnp.bool_(True)))[0]

            bt = jax.lax.cond(g, bt_long, lambda b: b, bt)

            new_cursor = jnp.where(is_match, cursor + matching, cursor)
            # cursor-2 re-insert (compress/mod.rs:218), masked via dummy slot
            table_replace(jnp.maximum(new_cursor - 2, 0), is_match)

            new_offset = jnp.where(is_match, cursor - candidate, offset)
            new_extra = jnp.where(is_match, matching - MINMATCH + bt, extra)

            # miss: skip-acceleration stride (compress/mod.rs:225-231)
            miss = active & (~is_tail) & (~is_match)
            stepped = jnp.where(miss, cursor + step, new_cursor)
            # the step assignment lags one miss behind the advance (C's
            # forwardIp += step uses the previous iteration's step):
            # advances go 1, 1, a, a, ... for acceleration a
            upd = miss & (literal_start + 1 != stepped)
            new_step = jnp.where(upd, _srl(step_counter, SKIP_TRIGGER), step)
            new_counter = jnp.where(upd, step_counter + 1, step_counter)

            return (
                stepped,
                new_step,
                new_counter,
                found | is_match,
                new_offset,
                new_extra,
                tail | is_tail,
            )

        def find_body_k(fc):
            # inner fori amortizes the ~894ns while-iteration cost over 4
            # probes; the find body is fully predicated, and fori
            # iterations cost the cheap (~140ns) loop class.  All carries
            # are scalars, so Mosaic layout legalization is unaffected.
            return jax.lax.fori_loop(
                0, FIND_UNROLL, lambda i, c: find_body(c), fc
            )

        cursor2, _, _, found, offset, extra, tail = jax.lax.while_loop(
            find_cond,
            find_body_k,
            (
                cursor,
                jnp.int32(1),
                acceleration << SKIP_TRIGGER,
                jnp.bool_(False),
                jnp.int32(0),
                jnp.int32(0),
                jnp.bool_(False),
            ),
        )

        def emit_tail(args):
            out_pos, status = args
            literal_len = n - literal_start
            group_len = 1 + lsic_len(literal_len) + literal_len
            over = out_pos + group_len > cap
            status = jnp.where(over, STATUS_INCOMPRESSIBLE, status)

            def do_emit(op):
                op = push_byte(op, jnp.minimum(literal_len, 0xF) << 4)
                op = push_lsic_tail(op, literal_len)
                return copy_literals(op, literal_start, literal_len)

            out_pos = jax.lax.cond(over, lambda op: op, do_emit, out_pos)
            return out_pos, status

        def emit_group(args):
            out_pos, status = args
            literal_end = cursor2 - extra - MINMATCH
            literal_len = literal_end - literal_start
            group_len = (
                1 + lsic_len(literal_len) + literal_len + 2 + lsic_len(extra)
            )
            over = out_pos + group_len > cap
            status = jnp.where(over, STATUS_INCOMPRESSIBLE, status)

            def do_emit(op):
                token = (jnp.minimum(literal_len, 0xF) << 4) | jnp.minimum(extra, 0xF)
                op = push_byte(op, token)
                op = push_lsic_tail(op, literal_len)
                op = copy_literals(op, literal_start, literal_len)
                op = push_byte(op, offset & 0xFF)
                op = push_byte(op, _srl(offset, 8))
                return push_lsic_tail(op, extra)

            out_pos = jax.lax.cond(over, lambda op: op, do_emit, out_pos)
            return out_pos, status

        out_pos, status = jax.lax.cond(
            tail, emit_tail, emit_group, (out_pos, status)
        )
        return cursor2, out_pos, status, tail | (status != STATUS_OK)

    cursor0 = jnp.minimum(init_cursor, n)
    _, out_pos, status, _ = jax.lax.while_loop(
        outer_cond, outer_body, (cursor0, jnp.int32(0), jnp.int32(STATUS_OK), jnp.bool_(False))
    )

    out_len_ref[0, 0, 0] = out_pos
    status_ref[0, 0, 0] = status

    def copy_out(i, _):
        table_out_ref[0, 0, i] = table_ref[i]
        return 0

    jax.lax.fori_loop(0, table_slots, copy_out, 0)


# ---------------------------------------------------------------------------
# XLA wrapper
# ---------------------------------------------------------------------------


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# SMEM footprint model for one grid step of the scalar kernel on v5e
# (1.00 MB SMEM budget).  in_words (1 B/B), the packed hash array
# (2 B/B) and out_words (~1 B/B) are all double-buffered by the Mosaic
# grid pipeline => ~8 bytes of SMEM per byte of data_capacity, plus
# tables/scratch/scalars (~110 KB).  Measured anchors: data_capacity
# 65536 compiles at ~0.62 MB and runs; 131072 (the linked 64 KiB shape)
# fails AOT compile at 1.09 MB.  Callers route bigger shapes elsewhere
# (native engine, or smaller chunks where framing permits).
_SMEM_BUDGET = 980_000


def scalar_data_capacity_ok(data_capacity: int) -> bool:
    """True when a [window|dict]+block of this many bytes fits the scalar
    compress kernel's per-step SMEM windows on real hardware."""
    return 8 * data_capacity + 110_000 <= _SMEM_BUDGET


@functools.partial(
    jax.jit, static_argnames=("data_capacity", "out_capacity", "u16_table")
)
def _compress_batch_jit(
    data_u8,  # uint8 [N, C]
    n_arr,  # int32 [N]
    cursor_arr,  # int32 [N]
    cap_arr,  # int32 [N]
    accel_arr,  # int32 [N]
    toff_arr,  # int32 [N]
    prime_arr,  # int32 [N]
    tables,  # uint32/uint16 [N, S]
    *,
    data_capacity: int,
    out_capacity: int,
    u16_table: bool,
):
    n_blocks = data_u8.shape[0]
    wi = _round_up(data_capacity, 4) // 4 + 4
    wo = _round_up(out_capacity, 4) // 4 + 4
    s = tables.shape[1]

    d = jnp.zeros((n_blocks, wi * 4), jnp.uint8).at[:, :data_capacity].set(data_u8)
    dw = d.reshape(n_blocks, wi, 4).astype(jnp.uint32)
    in_words = (
        dw[:, :, 0] | (dw[:, :, 1] << 8) | (dw[:, :, 2] << 16) | (dw[:, :, 3] << 24)
    ).astype(jnp.int32)

    # vector hash precompute: the reference hash for EVERY position, on the
    # VPU via XLA (fused, ~free), packed two 16-bit hashes per SMEM word so
    # the scalar parse does one load + shift per probe instead of ~15 ops.
    npos = wi * 4
    du = d.astype(jnp.uint32)

    def sh(k):
        return jnp.pad(du[:, k:], ((0, 0), (0, k)))

    if u16_table:
        # (LE u32 at p) * 2654435761 >> (32 - HASHLOG - 1), mod 2^32
        v = du | (sh(1) << 8) | (sh(2) << 16) | (sh(3) << 24)
        hashes = (v * jnp.uint32(2654435761)) >> (32 - HASHLOG - 1)
    else:
        # 32-bit-limb form of the 64-bit 5-byte hash (module docstring),
        # masked to 0 where fewer than 8 bytes remain (hash_u32t semantics)
        b0 = du
        w1 = sh(1) | (sh(2) << 8) | (sh(3) << 16) | (sh(4) << 24)
        m0 = jnp.uint32(_M0)
        hi32 = (
            b0 * (m0 >> 8)
            + ((b0 * (m0 & 0xFF)) >> 8)
            + (((b0 * jnp.uint32(_M1)) & 0xFF) << 24)
            + w1 * m0
        )
        hashes = hi32 >> (32 - HASHLOG)
        pos = jnp.arange(npos, dtype=jnp.int32)[None, :]
        hashes = jnp.where(pos + 8 <= n_arr[:, None], hashes, 0)

    wh = npos // 2
    hp = hashes.reshape(n_blocks, wh, 2)
    hash_words = (hp[:, :, 0] | (hp[:, :, 1] << 16)).astype(jnp.int32)

    kernel = functools.partial(
        _compress_kernel, wi=wi, wh=wh, wo=wo, table_slots=s, u16_table=u16_table
    )

    smem11 = pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM)
    out_words, out_len, status, table_out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1, wi), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, wh), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            smem11,
            smem11,
            smem11,
            smem11,
            smem11,
            smem11,
            pl.BlockSpec((1, 1, s), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, wo), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            smem11,
            smem11,
            pl.BlockSpec((1, 1, s), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, 1, wo), jnp.int32),
            jax.ShapeDtypeStruct((n_blocks, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_blocks, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_blocks, 1, s), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((s + 1,), jnp.int32)],
        interpret=_interpret(),
    )(
        in_words.reshape(n_blocks, 1, wi),
        hash_words.reshape(n_blocks, 1, wh),
        n_arr.reshape(n_blocks, 1, 1),
        cursor_arr.reshape(n_blocks, 1, 1),
        cap_arr.reshape(n_blocks, 1, 1),
        accel_arr.reshape(n_blocks, 1, 1),
        toff_arr.reshape(n_blocks, 1, 1),
        prime_arr.reshape(n_blocks, 1, 1),
        tables.astype(jnp.int32).reshape(n_blocks, 1, s),
    )

    w = out_words.reshape(n_blocks, wo, 1)
    out_u8 = jnp.concatenate(
        [
            (w & 0xFF),
            (jax.lax.shift_right_logical(w, 8) & 0xFF),
            (jax.lax.shift_right_logical(w, 16) & 0xFF),
            (jax.lax.shift_right_logical(w, 24) & 0xFF),
        ],
        axis=2,
    ).reshape(n_blocks, wo * 4).astype(jnp.uint8)
    return (
        out_u8,
        out_len.reshape(n_blocks),
        status.reshape(n_blocks),
        table_out.reshape(n_blocks, s),
    )


def compress_blocks(
    datas,
    cursors=None,
    tables=None,
    acceleration: int = 1,
    caps=None,
    prime_prefix=False,
):
    """Compress a batch of raw blocks on the TPU (independent blocks; each
    entry may carry its own window prefix via ``cursors`` and a primed
    ``tables`` entry).

    Returns ``(outputs, tables)`` where ``outputs[i]`` is the compressed
    bytes or ``None`` if block ``i`` exceeded its cap (incompressible),
    and ``tables`` are the post-parse encoder tables (for linked chains).
    """
    n_blocks = len(datas)
    if n_blocks == 0:
        return [], []
    datas = [bytes(d) for d in datas]
    if cursors is None:
        cursors = [0] * n_blocks
    if caps is None:
        caps = [None] * n_blocks
    if tables is None:
        tables = [U32Table() for _ in range(n_blocks)]
    u16 = isinstance(tables[0], U16Table)

    # pow2 capacity bucketing to maximise compile reuse
    need = max(max(len(d) for d in datas), 4)
    data_capacity = 4096
    while data_capacity < need:
        data_capacity *= 2
    data_capacity = _round_up(data_capacity, LANES)
    out_capacity = _round_up(data_capacity + data_capacity // 255 + 16, 4)

    arr = np.zeros((n_blocks, data_capacity), np.uint8)
    n_arr = np.zeros(n_blocks, np.int32)
    cursor_arr = np.zeros(n_blocks, np.int32)
    cap_arr = np.full(n_blocks, -1, np.int32)
    toff_arr = np.zeros(n_blocks, np.int32)
    tbl = np.zeros((n_blocks, tables[0].dict.size), np.uint32)
    for i, d in enumerate(datas):
        arr[i, : len(d)] = np.frombuffer(d, np.uint8)
        n_arr[i] = len(d)
        cursor_arr[i] = cursors[i]
        if caps[i] is not None:
            cap_arr[i] = caps[i]
        toff_arr[i] = tables[i].offset
        tbl[i] = tables[i].dict
    accel_arr = np.full(n_blocks, max(int(acceleration), 1), np.int32)
    prime_arr = np.full(n_blocks, 1 if prime_prefix else 0, np.int32)

    out_u8, out_len, status, table_out = _compress_batch_jit(
        jnp.asarray(arr),
        jnp.asarray(n_arr),
        jnp.asarray(cursor_arr),
        jnp.asarray(cap_arr),
        jnp.asarray(accel_arr),
        jnp.asarray(toff_arr),
        jnp.asarray(prime_arr),
        jnp.asarray(tbl),
        data_capacity=data_capacity,
        out_capacity=out_capacity,
        u16_table=u16,
    )
    out_u8 = np.asarray(out_u8)
    out_len = np.asarray(out_len)
    status = np.asarray(status)
    table_out = np.asarray(table_out)

    outputs = []
    for i in range(n_blocks):
        # write post-parse table state back (abort keeps mutations, like
        # NoPartialWrites)
        tables[i].dict[:] = table_out[i].astype(tables[i].dict.dtype)
        if status[i] == STATUS_INCOMPRESSIBLE:
            outputs.append(None)
        else:
            outputs.append(out_u8[i, : out_len[i]].tobytes())
    return outputs, tables


def compress_block_tpu(
    data,
    cursor: int = 0,
    table=None,
    out=None,
    acceleration: int = 1,
    cap: int | None = None,
):
    """Single-block engine adapter (``engine='tpu'``); same contract as
    ``spec.block.compress_block``."""
    data = bytes(data)
    if table is None:
        table = U16Table() if len(data) <= 0xFFFF else U32Table()
    if not scalar_data_capacity_ok(_round_up(max(len(data), 1), 128)):
        # blocks beyond the scalar kernel's per-step SMEM window (e.g.
        # the frame default 4 MiB blocks, framed/compress.rs:49) route
        # to the bit-identical native engine — same parse decisions,
        # same bytes, same table-state mutation — instead of failing
        # AOT compilation on real hardware.
        from ..native import compress_block as _native_compress

        return _native_compress(
            data, cursor, table, out=out, acceleration=acceleration, cap=cap
        )
    outputs, _ = compress_blocks(
        [data], [cursor], [table], acceleration=acceleration, caps=[cap]
    )
    if outputs[0] is None:
        raise Incompressible()
    if out is not None:
        out.extend(outputs[0])
        return out
    return outputs[0]
