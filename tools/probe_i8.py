"""Micro-probe for the round-3 int8-layout question.

The decode far-page rebuild's cost is the one-hot sweep over the output
buffer (~ro/8 i32 (8,128) slab reads + mask-FMAs per fire).  An int8
layout would hold the same bytes in (32,128) native tiles — the open
question is whether an i8 slab op over the SAME byte count costs less
than the i32 slab op (if not, int8 buys no rebuild-traffic reduction
and ROADMAP round-3 #3 loses its main claim).

Times a far-rebuild-shaped sweep (G groups x W-row window, one-hot mask
per lane, amortized over R repeats in-kernel) in both layouts.
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
R = 200  # in-kernel repeats (amortize dispatch)


def kernel_i32(src_ref, sel_ref, out_ref, *, groups, win_rows):
    def body(r, acc):
        sel = jax.lax.rem(sel_ref[0:1, :] + r, groups)
        accw = jnp.zeros((win_rows, LANES), jnp.int32)
        for g in range(groups):
            m = (sel == g).astype(jnp.int32)
            accw = accw + src_ref[
                g * win_rows : (g + 1) * win_rows, :
            ] * jnp.broadcast_to(m, (win_rows, LANES))
        return acc + accw[0:1, :]

    out_ref[:, :] = jax.lax.fori_loop(
        0, R, body, jnp.zeros((1, LANES), jnp.int32)
    )


def kernel_i8(src_ref, sel_ref, out_ref, *, groups, win_rows):
    # win_rows here is in i8 rows (4x the i32 rows for equal bytes)
    def body(r, acc):
        sel = jax.lax.rem(sel_ref[0:1, :] + r, groups)
        accw = jnp.zeros((win_rows, LANES), jnp.int8)
        for g in range(groups):
            m = jnp.broadcast_to(sel == g, (win_rows, LANES))
            # one-hot lanes are disjoint: select-or instead of mask-mult
            accw = accw | jnp.where(
                m, src_ref[g * win_rows : (g + 1) * win_rows, :], jnp.int8(0)
            )
        return acc + accw[0:1, :].astype(jnp.int32)

    out_ref[:, :] = jax.lax.fori_loop(
        0, R, body, jnp.zeros((1, LANES), jnp.int32)
    )


def run(name, kern, dtype, groups, win_rows):
    total_rows = groups * win_rows
    src = jnp.asarray(
        np.random.default_rng(0).integers(
            0, 100, (total_rows, LANES)
        ).astype(dtype)
    )
    sel = jnp.asarray(
        np.random.default_rng(1).integers(0, groups, (1, LANES)).astype(np.int32)
    )
    f = pl.pallas_call(
        functools.partial(kern, groups=groups, win_rows=win_rows),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, LANES), jnp.int32),
    )

    @jax.jit
    def chain(s):
        o = f(src, s)
        return s ^ (o.sum() * 0), o

    _, o = chain(sel)
    np.asarray(o)
    best = 1e9
    for _ in range(3):
        a = sel
        t0 = time.perf_counter()
        for _ in range(6):
            a, o = chain(a)
        np.asarray(o[:1])
        best = min(best, (time.perf_counter() - t0) / 6)
    per_sweep = best / R
    mb = total_rows * LANES * np.dtype(dtype).itemsize / 1e6
    print(
        f"{name:28s} {per_sweep*1e6:8.2f} us/sweep over {mb:6.2f} MB "
        f"= {mb/per_sweep/1e3:7.1f} GB/s effective",
        flush=True,
    )


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    # far-rebuild shape: 64 groups x 1 KiB windows = 8 MB total
    run("i32 (8,128) slabs", kernel_i32, np.int32, 64, 256)
    run("i8  (32,128) slabs", kernel_i8, np.int8, 64, 1024)
    # smaller windows (gather-like)
    run("i32 small-window (40 rows)", kernel_i32, np.int32, 64, 40)
    run("i8  small-window (160 rows)", kernel_i8, np.int8, 64, 160)
