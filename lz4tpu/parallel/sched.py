"""Model-driven batch scheduling for the lane-parallel decoder.

The lockstep lane kernel runs every batch until its SLOWEST lane
finishes, and the right chunk size is a property of the DATA: a
sequence-dense lane (~8.5 B/sequence) gates a batch at one or two
sequences per round no matter the chunk width, while long-run lanes
finish in half the rounds at CB=32 for only ~5% more per-round cost.
Neither effect helps while dense and sparse blocks share a batch — so
the scheduler

1. models each block's lockstep rounds under BOTH chunk sizes with the
   native round model (``lz4tpu_model_rounds``, the C++ replica of the
   kernel's SEQ2 round machine — it predicted measured rounds within
   0.4%, PERF_NOTES round 3),
2. sorts blocks by their cheapest modeled wall time so each 128-lane
   batch groups similar-cost lanes (sum of batch maxima ~= sum of batch
   means instead of n_batches x global max), and
3. picks per batch the chunk size with the lower modeled wall
   (``rounds_max * cost(cb)``), routing it to that variant kernel
   (``decode128.load_variant``).

Modeled on the 32 MiB bench corpus: natural/CB16 365 MB/s -> sorted
per-batch-CB 556 MB/s (tools/sim_d128_seqk.py lineage); measured
deltas land within ~7% of the model.  No counterpart in the reference
(a scalar decoder has no batch geometry).
"""

from __future__ import annotations

import numpy as np

LANES = 128

# per-round kernel cost by chunk size, seconds (measured on-chip:
# CB=16 5312 rounds = 336.2 MB/s and CB=32 5120 rounds = 331.4 MB/s on
# the same 8 MiB batch, tools/measure_r3.json) — scheduling weights
# only, never correctness.  Geometry note: model_rounds derives
# flush/far/mid geometry from the global max comp length across the
# whole job, while decompress_blocks_128 re-buckets per batch, so
# modeled rounds can drift a few % from per-batch geometry — harmless
# for ordering/variant choice.  Recalibrate per part via
# LZ4TPU_ROUND_COST="16:4.7e-6,32:4.94e-6".
# round-4 recalibration (flush-gated geometry, same-session pair):
# CB16 4928 rounds = 385.4 MB/s, CB32 4800 rounds = 375.1 on the 8 MiB
# batch
ROUND_COST = {16: 4.42e-6, 32: 4.66e-6}
_env_rc = __import__("os").environ.get("LZ4TPU_ROUND_COST")
if _env_rc:
    for _part in _env_rc.split(","):
        _k, _v = _part.split(":")
        ROUND_COST[int(_k)] = float(_v)
CBS = (16, 32)


def model_rounds(comp_blocks, cb: int, block_maxsize: int) -> np.ndarray:
    """Modeled lockstep rounds per block for the cb-variant kernel
    (uses the variant's actual flush/far/mid geometry at this batch
    shape)."""
    from ..kernels.decode128 import load_variant
    from ..native import model_decode_rounds

    mod = load_variant(cb)
    maxlen = max((len(c) for c in comp_blocks), default=4)
    rw, ro, _ = mod.buffer_rows(maxlen, block_maxsize)
    mid_w = mod.pick_mid_w(rw, ro)
    return np.array(
        [
            model_decode_rounds(
                c, cb=cb, flush_thresh=mod.FLUSH_THRESH,
                flush_b=mod.FLUSH_B, far_g_bytes=mod.FAR_G * 4,
                mid_bytes=max(mid_w * 4 - 4, 0),
            )
            for c in comp_blocks
        ],
        dtype=np.int64,
    )


def plan_batches(comp_blocks, block_maxsize: int):
    """Schedule: [(block_indices, cb), ...] — blocks sorted by cheapest
    modeled wall time (descending), grouped into 128-lane batches, each
    batch routed to the chunk size with the lower modeled wall AMONG the
    variants whose compile envelope admits the batch shape (the mid-0
    scoped-vmem edge is variant-dependent: CB32 compiles ~0.85 MB of
    rowsum past CB16's edge, so near-edge batches must ride CB32)."""
    from ..kernels.decode128 import load_variant

    nb = len(comp_blocks)
    if nb == 0:
        return []
    rounds = {cb: model_rounds(comp_blocks, cb, block_maxsize) for cb in CBS}
    cost = np.minimum.reduce(
        [rounds[cb] * ROUND_COST[cb] for cb in CBS]
    )
    lens = np.array([len(c) for c in comp_blocks])
    order = np.argsort(-cost, kind="stable")
    plan = []
    for b0 in range(0, nb, LANES):
        idxs = order[b0 : b0 + LANES]
        maxlen = int(lens[idxs].max())
        walls = {
            cb: rounds[cb][idxs].max() * ROUND_COST[cb]
            for cb in CBS
            if load_variant(cb).lanes_eligible(maxlen, block_maxsize)
        }
        # the caller's eligibility gate admits a block only when SOME
        # variant compiles it, so walls is never empty; the widest
        # envelope (max CBS) is the backstop regardless
        cb = min(walls, key=walls.get) if walls else max(CBS)
        plan.append((idxs.tolist(), cb))
    return plan


def decode_scheduled(comp_blocks, block_maxsize: int):
    """Decode any number of independent raw blocks through the scheduled
    per-batch-CB lane kernels; returns outputs in input order (per-lane
    typed errors raise, fallback lanes re-decode per the wrapper)."""
    from ..kernels.decode128 import load_variant

    outputs = [None] * len(comp_blocks)
    # dispatch every batch before collecting any: host pack + H2D of
    # batch k overlaps kernel execution of batches < k (device queue)
    inflight = []
    for idxs, cb in plan_batches(comp_blocks, block_maxsize):
        mod = load_variant(cb)
        inflight.append(
            (idxs, mod, mod.dispatch_blocks_128(
                [comp_blocks[i] for i in idxs], block_maxsize=block_maxsize
            ))
        )
    for idxs, mod, batch in inflight:
        for i, o in zip(idxs, mod.collect_blocks_128(batch)):
            outputs[i] = o
    return outputs
