"""On-chip decode128 round diagnostics: executed rounds + per-lane
done-at-round over the bench batch, compared with the host model
(tools/diag_rounds.py).  One decode, correctness-checked."""

from __future__ import annotations

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"),
)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import BLOCK, make_corpus  # noqa: E402
from lz4tpu.kernels import decode128 as d128  # noqa: E402
from lz4tpu.native import compress_block  # noqa: E402
from lz4tpu.spec.table import U32Table  # noqa: E402


def main() -> None:
    data = make_corpus(8.0)
    blocks = [data[i : i + BLOCK] for i in range(0, len(data), BLOCK)][:128]
    comp = [bytes(compress_block(b, 0, U32Table())) for b in blocks]
    maxlen = max(len(b) for b in comp)
    rw, ro, _pr = d128.buffer_rows(maxlen, BLOCK)
    max_rounds = d128.round_bound(maxlen, BLOCK)

    arr = np.zeros((128, rw * 4), np.uint8)
    n = np.zeros((1, 128), np.int32)
    for i, b in enumerate(comp):
        arr[i, : len(b)] = np.frombuffer(b, np.uint8)
        n[0, i] = len(b)
    ww = arr.reshape(128, rw, 4).astype(np.uint32)
    words = (
        ww[:, :, 0] | (ww[:, :, 1] << 8) | (ww[:, :, 2] << 16) | (ww[:, :, 3] << 24)
    ).astype(np.int32).T

    out_w, meta, status = d128._decode128_jit(
        jnp.asarray(np.ascontiguousarray(words)), jnp.asarray(n),
        rw=rw, ro=ro, max_rounds=max_rounds, output_limit=BLOCK,
    )
    meta = np.asarray(meta)
    status = np.asarray(status)[0]
    out_w = np.asarray(out_w)
    ok = 0
    for i, b in enumerate(blocks):
        if status[i] != 0:
            continue
        wwo = out_w[:, i].astype(np.uint32)
        by = np.empty((ro, 4), np.uint8)
        by[:, 0] = wwo & 0xFF
        by[:, 1] = (wwo >> 8) & 0xFF
        by[:, 2] = (wwo >> 16) & 0xFF
        by[:, 3] = (wwo >> 24) & 0xFF
        if by.reshape(-1)[: meta[0, i]].tobytes() == b:
            ok += 1
    doneat = meta[1]
    rounds = meta[2]
    print(f"exact={ok}/128  statuses: {np.bincount(status.astype(np.int64)).tolist()}")
    print(f"executed rounds (global): {rounds.max()}  (static bound {max_rounds})")
    print(f"done-at: mean={doneat.mean():.0f} p50={np.percentile(doneat,50):.0f} "
          f"p90={np.percentile(doneat,90):.0f} max={doneat.max()} min={doneat.min()}")
    print(f"skew efficiency (mean/max done-at): {doneat.mean()/max(doneat.max(),1):.3f}")
    order = np.argsort(doneat)
    print("worst 5 lanes:", [(int(i), int(doneat[i])) for i in order[-5:]])


if __name__ == "__main__":
    main()
