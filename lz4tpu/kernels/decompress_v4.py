"""Pallas TPU raw-block decompressor, v4 — parse-ahead ring + fused drain.

Measured revision of v3's cost model (see PERF_NOTES.md round 2): a
dynamically-indexed 5-row VMEM read costs ~110 ns and *overlaps almost
perfectly with neighbouring reads and vector work when its address is
known well in advance* — the 400-cycle "no overlap" floor v3 was designed
around only applies when the address is computed immediately before use.
v3's real bottleneck is its ~3 while-loop iterations per sequence, each
carrying the full parse + 4-way-switch + merge state machine.

v4 therefore restructures around *address lead time* and *stream-level
parallelism*:

* a scalar-core **parser runs ahead** of the data plane, pushing one
  record per sequence (literal src/len, match offset/len) into an SMEM
  **ring buffer** (capacity 256), so literal and far-match addresses are
  known early and the Mosaic scheduler can hoist the dynamic reads;
* the **drain** is fused: one iteration consumes one record in the common
  case — literal chunk (unaligned read straight from the compressed
  stream) merged into the register accumulator, then the match chunk
  (near: register extract with v2's lag-doubling bootstrap; far:
  unaligned read from the flushed output / prefix region) — plus a
  predicated 1 KiB aligned flush; long literals/matches occupy extra
  iterations (512 B per step);
* **block interleave** (``interleave`` machines fused per grid step) is
  implemented but DEFAULTS OFF: although two adjacent independent reads
  overlap in a single expression context (121 ns vs 114 ns for one),
  full machines laid out in program order do NOT overlap on the in-order
  core (measured il2 32.9 vs il1 35.9 MB/s) — kept for future schedulers;
* ``unroll`` body steps run per while iteration through an inner
  fori_loop (a while iteration costs ~894 ns of fixed overhead vs
  ~140 ns for the fori class).

Parse order, error kinds and timing (memory-limit checked only for
sequences with matches, like the reference's OOM guard,
``raw/decompress.rs:72-74``), prefix semantics and the host contract are
identical to v3; the kernels share the register-chunk primitives and are
differential-tested against each other and the spec.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..spec.block import DecodeError
from .status import (
    ERR_INVALID_OFFSET,
    ERR_MEMORY_LIMIT,
    ERR_UNEXPECTED_END,
    ERR_ZERO_OFFSET,
    OK,
    STATUS_TO_KIND,
)
from .decompress_v3 import _read_chunk, _reg_extract, _reg_merge, _round_up

LANES = 128
CHUNK = 512
CROWS = CHUNK // LANES  # 4
AR = 16  # accumulator rows (2 KiB); dynamic-roll cost is width-independent
FLUSH_AT = 1024  # flush 1 KiB whenever that much is buffered
CAPB = AR * LANES  # accumulator byte capacity
RING = 256  # parse-ahead capacity (records)
UNROLL = 4  # body steps per while_loop iteration (measured optimum)
INTERLEAVE = 1  # measured: a second machine does NOT overlap (in-order core)

# ring record fields (SMEM scratch laid out (interleave, NFIELDS, RING))
F_LIT_SRC, F_LIT_LEN, F_M_OFF, F_M_LEN, F_SRC_ABS = range(5)
NFIELDS = 5


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _shift_down_flush(acc):
    """Drop the flushed rows."""
    k = FLUSH_AT // LANES
    return jnp.concatenate(
        [acc[k:], jnp.zeros((k, LANES), jnp.int32)], axis=0
    )


def _decode_v4_kernel(
    comp_words_ref,  # SMEM (il, 1, W) int32
    comp_len_ref,  # SMEM (il, 1, 1) int32
    prefix_len_ref,  # SMEM (il, 1, 1) int32
    comp_bytes_ref,  # VMEM (il, Rc, 128) int32
    prefix_bytes_ref,  # VMEM (il, Rp(+1), 128) int32
    out_bytes_ref,  # VMEM (il, Rt, 128) int32
    out_len_ref,  # SMEM (il, 1, 1) int32
    status_ref,  # SMEM (il, 1, 1) int32
    ring_ref,  # SMEM scratch (il, NFIELDS, RING) int32
    *,
    output_limit: int,
    rp: int,
    w: int,
    rc: int,
    rt: int,
    variant: str = "full",
    unroll: int = UNROLL,
    interleave: int = INTERLEAVE,
):
    rp_bytes = rp * LANES
    max_word = w - 1

    def _machine(b):
        """Build (cond, body, init, finish) for block slot ``b``."""
        n = comp_len_ref[b, 0, 0]
        prefix_len = prefix_len_ref[b, 0, 0]
        comp_b = comp_bytes_ref.at[b]
        out_b = out_bytes_ref.at[b]

        if rp:

            def copy_prefix(i, _):
                out_bytes_ref[b, pl.ds(i, 1), :] = prefix_bytes_ref[b, pl.ds(i, 1), :]
                return 0

            jax.lax.fori_loop(0, rp, copy_prefix, 0)

        def read_byte(p):
            idx = jnp.minimum(jnp.maximum(p, 0) >> 2, max_word)
            word = comp_words_ref[b, 0, idx]
            return jax.lax.shift_right_logical(word, (p & 3) * 8) & 0xFF

        def read_lsic(initial, p, enable):
            # fast path, fully branchless: values below 0xF + 0xFF (one
            # continuation byte at most) — the overwhelmingly common case.
            # Only a 0xFF continuation byte enters the while_loop.
            need = (initial == 0xF) & enable
            eof0 = need & (p >= n)
            bb = read_byte(jnp.minimum(p, n - 1))
            bb = jnp.where(need & (~eof0), bb, 0)
            v = initial + bb
            p = jnp.where(need, p + 1, p)
            st = jnp.where(eof0, jnp.int32(ERR_UNEXPECTED_END), jnp.int32(OK))

            def tail(args):
                v0, p0 = args

                def cond(c):
                    _, _, st, last = c
                    return (last == 0xFF) & (st == OK)

                def body(c):
                    v, p, st, _ = c
                    eof = p >= n
                    b2 = jnp.where(eof, 0, read_byte(jnp.minimum(p, n - 1)))
                    st = jnp.where(eof, ERR_UNEXPECTED_END, st)
                    return v + b2, p + 1, st, b2

                vv, pp, stt, _ = jax.lax.while_loop(
                    cond, body, (v0, p0, jnp.int32(OK), jnp.int32(0xFF))
                )
                return vv, pp, stt

            v, p, st2 = jax.lax.cond(
                need & (bb == 0xFF) & (st == OK),
                tail,
                lambda args: (args[0], args[1], jnp.int32(OK)),
                (v, p),
            )
            return v, p, jnp.where(st != OK, st, st2)

        def parse_one(pos, la_out, status, wr, rd):
            """Parse one sequence at ``pos``; push a record.  Mirrors v3's
            parse exactly (error kinds and order)."""
            parsing = (pos < n) & (status == OK) & (wr - rd < RING)
            token = jnp.where(parsing, read_byte(pos), 0)
            litv, p1, st1 = read_lsic(token >> 4, pos + 1, parsing)
            status = jnp.where(parsing & (st1 != OK), st1, status)
            pok = parsing & (status == OK)
            status = jnp.where(pok & (p1 + litv > n), ERR_UNEXPECTED_END, status)
            pok &= status == OK

            p_after_lit = p1 + litv
            hm = pok & (n - p_after_lit >= 2)
            b0 = read_byte(jnp.minimum(p_after_lit, n - 1))
            b1 = read_byte(jnp.minimum(p_after_lit + 1, n - 1))
            offset = jnp.where(hm, b0 | (b1 << 8), 1)
            mv, p2, st2 = read_lsic(
                jnp.where(hm, token & 0xF, 0), p_after_lit + 2, hm
            )
            status = jnp.where(hm & (st2 != OK), st2, status)
            pok &= status == OK
            hm &= status == OK
            match_len = jnp.where(hm, mv + 4, 0)

            status = jnp.where(
                hm & (la_out + litv + match_len > output_limit),
                ERR_MEMORY_LIMIT,
                status,
            )
            status = jnp.where(
                hm & (status == OK) & (offset == 0), ERR_ZERO_OFFSET, status
            )
            status = jnp.where(
                hm & (status == OK) & (offset > la_out + litv + prefix_len),
                ERR_INVALID_OFFSET,
                status,
            )
            pok &= status == OK
            hm &= status == OK

            slot = jax.lax.rem(wr, RING)
            mlen = jnp.where(hm, match_len, 0)

            @pl.when(pok)
            def _():
                ring_ref[b, F_LIT_SRC, slot] = p1
                ring_ref[b, F_LIT_LEN, slot] = litv
                ring_ref[b, F_M_OFF, slot] = jnp.where(hm, offset, 1)
                ring_ref[b, F_M_LEN, slot] = mlen
                ring_ref[b, F_SRC_ABS, slot] = la_out + litv - offset

            new_pos = jnp.where(pok, jnp.where(hm, p2, p_after_lit), pos)
            new_la = jnp.where(pok, la_out + litv + mlen, la_out)
            new_wr = jnp.where(pok, wr + 1, wr)
            return new_pos, new_la, status, new_wr

        # carry: rd, wr, pos, la_out, status, out_len, flushed,
        #        lit_src, lit_rem, m_off, m_rem, m_lag, m_done, src_abs, acc
        def cond(c):
            rd, wr, pos, _, status = c[0], c[1], c[2], c[3], c[4]
            lit_rem, m_rem = c[8], c[10]
            return ((pos < n) | (rd < wr) | (lit_rem + m_rem > 0)) & (status == OK)

        def body(c):
            (rd, wr, pos, la_out, status, out_len, flushed,
             lit_src, lit_rem, m_off, m_rem, m_lag, m_done, src_abs, acc) = c

            # -- parser: one sequence per iteration, plus a second only
            # while the ring is still building its lead --
            def do_parse(c):
                return parse_one(c[0], c[1], c[2], c[3], rd)

            if variant != "noparse":
                can_parse = (pos < n) & (wr - rd < RING)
                pos, la_out, status, wr = jax.lax.cond(
                    can_parse, do_parse, lambda c: c, (pos, la_out, status, wr)
                )
                pos, la_out, status, wr = jax.lax.cond(
                    (wr - rd < 64) & (pos < n) & (wr - rd < RING),
                    do_parse,
                    lambda c: c,
                    (pos, la_out, status, wr),
                )
            else:
                # timing-only: fabricate records (fixed 24-byte literal
                # runs) so the drain runs standalone
                can = (pos < n) & (wr - rd < RING)
                slot = jax.lax.rem(wr, RING)

                @pl.when(can)
                def _():
                    ring_ref[b, F_LIT_SRC, slot] = jax.lax.rem(pos, jnp.int32(1024))
                    ring_ref[b, F_LIT_LEN, slot] = 24
                    ring_ref[b, F_M_OFF, slot] = 1
                    ring_ref[b, F_M_LEN, slot] = 0
                    ring_ref[b, F_SRC_ABS, slot] = 0

                pos = jnp.where(can, pos + 24, pos)
                wr = jnp.where(can, wr + 1, wr)

            if variant == "nodrain":
                has = rd < wr
                slot = jax.lax.rem(rd, RING)
                out_len = jnp.where(
                    has,
                    out_len + ring_ref[b, F_LIT_LEN, slot] + ring_ref[b, F_M_LEN, slot],
                    out_len,
                )
                rd = jnp.where(has, rd + 1, rd)
                return (rd, wr, pos, la_out, status, out_len, flushed,
                        lit_src, lit_rem, m_off, m_rem, m_lag, m_done, src_abs, acc)

            # -- pop the next record when the current one is done --
            need_pop = (lit_rem + m_rem == 0) & (rd < wr)
            slot = jax.lax.rem(rd, RING)
            lit_src = jnp.where(need_pop, ring_ref[b, F_LIT_SRC, slot], lit_src)
            lit_rem = jnp.where(need_pop, ring_ref[b, F_LIT_LEN, slot], lit_rem)
            m_off = jnp.where(need_pop, ring_ref[b, F_M_OFF, slot], m_off)
            m_rem = jnp.where(need_pop, ring_ref[b, F_M_LEN, slot], m_rem)
            m_lag = jnp.where(need_pop, ring_ref[b, F_M_OFF, slot], m_lag)
            src_abs = jnp.where(need_pop, ring_ref[b, F_SRC_ABS, slot], src_abs)
            m_done = jnp.where(need_pop, 0, m_done)
            rd = jnp.where(need_pop, rd + 1, rd)

            # -- predicated 1 KiB flush --
            filled = out_len - flushed
            do_flush = filled >= FLUSH_AT

            @pl.when(do_flush)
            def _():
                fr = FLUSH_AT // LANES
                row = jnp.clip(rp + flushed // LANES, 0, rt - fr)
                out_b[pl.ds(row, fr), :] = acc[: FLUSH_AT // LANES]

            acc = jnp.where(do_flush, _shift_down_flush(acc), acc)
            flushed = jnp.where(do_flush, flushed + FLUSH_AT, flushed)
            filled = out_len - flushed

            # -- literal chunk: read straight from the compressed stream --
            lit_take = jnp.clip(jnp.minimum(lit_rem, CAPB - filled), 0, CHUNK)
            if variant == "noread":
                lit_chunk = jnp.zeros((CROWS, LANES), jnp.int32)
            else:
                lit_chunk = _read_chunk(
                    comp_b, jnp.clip(lit_src, 0, (rc - CROWS - 1) * LANES)
                )
            if variant != "nomerge":
                acc = _reg_merge(acc, lit_chunk, filled, lit_take)
            filled2 = filled + lit_take
            lit_src = lit_src + lit_take
            lit_rem = lit_rem - lit_take

            # -- match chunk (only once literals are exhausted) --
            match_ready = (lit_rem == 0) & (m_rem > 0)
            near = match_ready & (m_lag <= filled2)
            far = match_ready & (m_lag > filled2)

            free2 = CAPB - filled2
            near_take = jnp.where(
                near,
                jnp.minimum(
                    jnp.minimum(jnp.minimum(m_rem, CHUNK), m_lag), free2
                ),
                0,
            )
            near_chunk = _reg_extract(
                acc, jnp.clip(filled2 - m_lag, 0, AR * LANES - 1)
            )

            # far source sits m_lag behind the write position (m_lag is a
            # power-of-two multiple of the offset after near-mode doubling,
            # so dst - m_lag always addresses valid pattern bytes — the
            # v2/v3 invariant); m_lag - filled2 >= 1 in the far branch
            # guarantees progress and keeps every read inside flushed bytes.
            far_take = jnp.where(
                far,
                jnp.clip(
                    jnp.minimum(
                        jnp.minimum(jnp.minimum(m_rem, CHUNK), m_lag - filled2),
                        free2,
                    ),
                    0,
                    CHUNK,
                ),
                0,
            )
            if variant == "noread":
                far_chunk = jnp.zeros((CROWS, LANES), jnp.int32)
            else:
                far_chunk = _read_chunk(
                    out_b,
                    jnp.clip(
                        rp_bytes + flushed + filled2 - m_lag,
                        0,
                        (rt - CROWS - 1) * LANES,
                    ),
                )

            chunk = jnp.where(near_take > 0, near_chunk, far_chunk)
            take = near_take + far_take  # at most one is nonzero
            if variant != "nomerge":
                acc = _reg_merge(acc, chunk, filled2, take)

            m_done = m_done + take
            m_rem = m_rem - take
            m_lag = jnp.where(
                (near_take > 0) & (take == m_lag) & (m_lag < CHUNK), m_lag * 2, m_lag
            )
            out_len = out_len + lit_take + take

            return (rd, wr, pos, la_out, status, out_len, flushed,
                    lit_src, lit_rem, m_off, m_rem, m_lag, m_done, src_abs, acc)

        z = jnp.int32(0)
        acc0 = jnp.zeros((AR, LANES), jnp.int32)
        init = (z, z, z, z, jnp.int32(OK), z, z,
                z, z, jnp.int32(1), z, jnp.int32(1), z, z, acc0)

        def finish(c):
            out_len_f, flushed_f, acc_f = c[5], c[6], c[14]
            status_f = c[4]
            row = jnp.clip(rp + flushed_f // LANES, 0, rt - AR)
            for j in range(AR // CROWS):
                out_b[pl.ds(row + j * CROWS, CROWS), :] = (
                    acc_f[j * CROWS : (j + 1) * CROWS]
                )
            out_len_ref[b, 0, 0] = out_len_f
            status_ref[b, 0, 0] = status_f

        return cond, body, init, finish

    machines = [_machine(b) for b in range(interleave)]

    def cond_f(cs):
        r = machines[0][0](cs[0])
        for mb in range(1, interleave):
            r = r | machines[mb][0](cs[mb])
        return r

    def body_f(cs):
        # one step of EVERY machine: the independent streams' memory ops
        # and scalar chains interleave in the in-order pipeline
        return tuple(machines[mb][1](cs[mb]) for mb in range(interleave))

    def body_k(cs):
        if unroll > 1:
            return jax.lax.fori_loop(0, unroll, lambda i, cc: body_f(cc), cs)
        return body_f(cs)

    final = jax.lax.while_loop(
        cond_f, body_k, tuple(m[2] for m in machines)
    )
    for mb in range(interleave):
        machines[mb][3](final[mb])


@functools.partial(
    jax.jit,
    static_argnames=(
        "block_maxsize", "comp_capacity", "prefix_rows", "variant", "unroll",
        "interleave",
    ),
)
def _decompress_batch_v4_jit(
    comp_u8,
    comp_len,
    prefix_u8,
    prefix_len,
    *,
    block_maxsize: int,
    comp_capacity: int,
    prefix_rows: int,
    variant: str = "full",
    unroll: int = UNROLL,
    interleave: int = INTERLEAVE,
):
    n_blocks, c = comp_u8.shape
    rp = prefix_rows
    il = interleave if n_blocks % interleave == 0 else 1

    rc = comp_capacity // LANES + 2 * CROWS + 2
    ro = (block_maxsize + comp_capacity) // LANES + 2 * CROWS + 2
    rt = rp + ro
    w = rc * LANES // 4

    comp_i32 = comp_u8.astype(jnp.int32)
    comp_bytes = jnp.zeros((n_blocks, rc * LANES), jnp.int32).at[:, :c].set(comp_i32)
    comp_bytes = comp_bytes.reshape(n_blocks, rc, LANES)

    cw = comp_bytes.reshape(n_blocks, w, 4).astype(jnp.uint32)
    comp_words = (
        cw[:, :, 0] | (cw[:, :, 1] << 8) | (cw[:, :, 2] << 16) | (cw[:, :, 3] << 24)
    ).astype(jnp.int32)

    rp_in = max(rp, 1)
    prefix_bytes = (
        jnp.zeros((n_blocks, rp_in * LANES), jnp.int32)
        .at[:, : prefix_u8.shape[1]]
        .set(prefix_u8.astype(jnp.int32))
        .reshape(n_blocks, rp_in, LANES)
    )

    kernel = functools.partial(
        _decode_v4_kernel,
        output_limit=block_maxsize,
        rp=rp,
        w=w,
        rc=rc,
        rt=rt,
        variant=variant,
        unroll=unroll,
        interleave=il,
    )

    def spec3(shape):
        return pl.BlockSpec(shape, lambda i: (i, 0, 0), memory_space=pltpu.SMEM)

    out_bytes, out_len, status = pl.pallas_call(
        kernel,
        grid=(n_blocks // il,),
        in_specs=[
            spec3((il, 1, w)),
            spec3((il, 1, 1)),
            spec3((il, 1, 1)),
            pl.BlockSpec((il, rc, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (il, rp_in, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((il, rt, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            spec3((il, 1, 1)),
            spec3((il, 1, 1)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, rt, LANES), jnp.int32),
            jax.ShapeDtypeStruct((n_blocks, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_blocks, 1, 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((il, NFIELDS, RING), jnp.int32)],
        interpret=_interpret(),
    )(
        comp_words.reshape(n_blocks, 1, w),
        comp_len.reshape(n_blocks, 1, 1),
        prefix_len.reshape(n_blocks, 1, 1),
        comp_bytes,
        prefix_bytes,
    )

    out_u8 = out_bytes.reshape(n_blocks, rt * LANES)[:, rp * LANES :].astype(jnp.uint8)
    return out_u8, out_len.reshape(n_blocks), status.reshape(n_blocks)


# the kernel streams each block's compressed words from an SMEM window, so
# a block's compressed size is capped by the ~1 MiB/core SMEM budget; the
# transposed VMEM output window similarly caps the per-block output buffer.
# Blocks beyond either cap (only reachable with frame block sizes >= 1 MiB)
# decode through the native engine — same typed-error contract.
V4_MAX_COMP = 512 << 10
V4_MAX_OUT = 2 << 20


def decompress_blocks_v4(blocks, prefixes=None, block_maxsize: int = 1 << 16):
    """Batch decode on the v4 kernel; same contract as v3.  Blocks whose
    compressed size exceeds ``V4_MAX_COMP`` (SMEM streaming window), or
    whose output exceeds ``V4_MAX_OUT`` when ``block_maxsize`` allows
    more, fall back to the native engine per block."""
    n = len(blocks)
    if n == 0:
        return []
    blocks = [bytes(b) for b in blocks]
    if prefixes is None:
        prefixes = [b""] * n
    prefixes = [bytes(p)[-65536:] for p in prefixes]

    big = [i for i in range(n) if len(blocks[i]) > V4_MAX_COMP]
    if big:
        from ..native import decompress_block as _native_decompress

        by_i = {}
        for i in big:
            by_i[i] = bytes(
                _native_decompress(
                    blocks[i], prefixes[i], output_limit=block_maxsize
                )
            )
        small = [i for i in range(n) if i not in by_i]
        if small:
            outs = decompress_blocks_v4(
                [blocks[i] for i in small],
                [prefixes[i] for i in small],
                block_maxsize=block_maxsize,
            )
            for i, o in zip(small, outs):
                by_i[i] = o
        return [by_i[i] for i in range(n)]

    eff_maxsize = min(block_maxsize, V4_MAX_OUT)
    any_prefix = any(len(p) for p in prefixes)

    need = max(max(len(b) for b in blocks), 4)
    comp_capacity = 4096
    while comp_capacity < need:
        comp_capacity *= 2
    comp_capacity = _round_up(comp_capacity, LANES)
    rp = (1 << 16) // LANES if any_prefix else 0

    # pad the batch to a multiple of the interleave factor with empty
    # blocks (an empty block's machine is immediately done)
    n_padded = _round_up(n, INTERLEAVE)

    comp = np.zeros((n_padded, comp_capacity), np.uint8)
    comp_len = np.zeros(n_padded, np.int32)
    for i, b in enumerate(blocks):
        comp[i, : len(b)] = np.frombuffer(bytes(b), np.uint8)
        comp_len[i] = len(b)

    pref = np.zeros((n_padded, max(rp, 1) * LANES), np.uint8)
    pref_len = np.zeros(n_padded, np.int32)
    if any_prefix:
        for i, p in enumerate(prefixes):
            if len(p):
                pref[i, rp * LANES - len(p) : rp * LANES] = np.frombuffer(p, np.uint8)
                pref_len[i] = len(p)

    out_u8, out_len, status = _decompress_batch_v4_jit(
        jnp.asarray(comp),
        jnp.asarray(comp_len),
        jnp.asarray(pref),
        jnp.asarray(pref_len),
        block_maxsize=eff_maxsize,
        comp_capacity=comp_capacity,
        prefix_rows=rp,
    )
    out_u8 = np.asarray(out_u8)
    out_len = np.asarray(out_len)
    status = np.asarray(status)

    results = []
    for i in range(n):
        if status[i] == ERR_MEMORY_LIMIT and eff_maxsize < block_maxsize:
            # the real limit is beyond the VMEM output cap: host fallback
            from ..native import decompress_block as _native_decompress

            results.append(
                bytes(
                    _native_decompress(
                        blocks[i], prefixes[i], output_limit=block_maxsize
                    )
                )
            )
        elif status[i] != OK:
            raise DecodeError(STATUS_TO_KIND[int(status[i])])
        else:
            results.append(out_u8[i, : out_len[i]].tobytes())
    return results
