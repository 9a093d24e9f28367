"""Chip A/B (round 5): flush/refill geometry under the raised VMEM stack.

Rounds 2-5 tuned RING_W=192 / GROUP_W=256 / FAR_G=256 against the XLA
default 16 MiB scoped-vmem budget.  With the explicit
vmem_limit_bytes claim (decode128._decode128_jit) the stack is no
longer scarce, so the geometry trade-offs reopen:

* RING_W up (+ FLUSH_THRESH up) -> flush sweeps fire less often (flush
  term was ~25% of the round) at more rows swept per flush.
* GROUP_W up  -> fewer comp-group crossings (refill term ~21%); the
  one-hot rebuild cost is ~ n_groups * PAGE_W rows = constant-ish, so
  the win is fewer gated refill idles.
* FAR_G up    -> fewer far-group switches per match (modeled -2.5%
  rounds at 512).

Geometry is load-time (module constants derive from the env), so ONE
measurement per process; compares apples-to-apples by always timing the
SAME deterministic batches: the first N sched-planned batches of the
Silesia eligible partition whose batch maxlen lands in
(BUCKET_LO, BUCKET], dispatched at the BUCKET shape with this process's
geometry.  One kernel compile per invocation.

Usage:
  python tools/chip_geom_ab.py                       # baseline
  LZ4TPU_D128_RINGW=384 LZ4TPU_D128_FLUSHT=800 \
    python tools/chip_geom_ab.py                     # bigger ring
  LZ4TPU_D128_GROUPW=512 python tools/chip_geom_ab.py
  LZ4TPU_D128_FARG=512  python tools/chip_geom_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BUCKET = int(os.environ.get("LZ4TPU_AB_BUCKET", "49152"))
BUCKET_LO = int(os.environ.get("LZ4TPU_AB_BUCKET_LO", "32768"))
CBSEL = int(os.environ.get("LZ4TPU_AB_CB", "32"))
NBATCH = int(os.environ.get("LZ4TPU_AB_NBATCH", "4"))
M = 2


def main():
    import jax
    import jax.numpy as jnp

    from bench import BLOCK
    from lz4tpu.hostpack import pack_words_le, to_device_chunked
    from lz4tpu.kernels import decode128 as d128
    from lz4tpu.native import compress_block
    from lz4tpu.parallel import sched
    from lz4tpu.spec.table import U32Table
    from lz4tpu.utils import silesia

    data = b"".join(silesia.corpus(1.0).values())
    blocks = [data[i : i + BLOCK] for i in range(0, len(data), BLOCK)]
    comp = [bytes(compress_block(b, 0, U32Table())) for b in blocks]
    lens = np.array([len(b) for b in blocks])
    clens = np.array([len(c) for c in comp])
    elig = clens < lens
    eb = [b for b, e in zip(blocks, elig) if e]
    ec = [c for c, e in zip(comp, elig) if e]

    plan = sched.plan_batches(ec, BLOCK)
    picked = []
    for idx, cb in plan:
        bm = max(len(ec[i]) for i in idx)
        if cb == CBSEL and BUCKET_LO < bm <= BUCKET:
            picked.append(idx)
    picked = picked[:NBATCH]
    assert picked, "no batches in the target bucket"

    mod = d128.load_variant(CBSEL)
    rw, ro, _ = mod.buffer_rows(BUCKET, BLOCK)
    mid = mod.pick_mid_w(rw, ro)
    mr = mod.round_bound(BUCKET, BLOCK)
    total = sum(len(eb[i]) for idx in picked for i in idx)
    print(
        f"geometry: ring {mod.RING_W} flusht {mod.FLUSH_THRESH} "
        f"flushk {mod.FLUSH_K} group {mod.GROUP_W} far {mod.FAR_G} "
        f"mid {mid} cb {CBSEL} | {len(picked)} batches at bucket "
        f"({BUCKET_LO},{BUCKET}] = {total/1e6:.1f} MB",
        flush=True,
    )

    d_ws, d_ns = [], []
    for idx in picked:
        arr = np.zeros((128, rw * 4), np.uint8)
        n1 = np.zeros((1, 128), np.int32)
        for j, i in enumerate(idx):
            arr[j, : len(ec[i])] = np.frombuffer(ec[i], np.uint8)
            n1[0, j] = len(ec[i])
        d_ws.append(to_device_chunked(pack_words_le(arr)))
        d_ns.append(jnp.asarray(n1))

    @jax.jit
    def pass_all(t, *ws):
        ols = []
        for w, nn in zip(ws, d_ns):
            _, ol, st = mod._decode128_jit(
                w ^ t, nn, rw=rw, ro=ro, max_rounds=mr, output_limit=BLOCK
            )
            t = (st.sum() * 0 + ol.sum() * 0).astype(jnp.int32)
            ols.append((ol, st))
        return t, ols

    t0c = time.time()
    t0v, ols = pass_all(jnp.int32(0), *d_ws)
    jax.block_until_ready(t0v)
    print(f"compile+first {time.time()-t0c:.0f}s", flush=True)
    for bi, (ol, st) in enumerate(ols):
        st_h = np.asarray(st)[0]
        ol_h = np.asarray(ol)[0]
        for j, i in enumerate(picked[bi]):
            assert st_h[j] == 0, (bi, j, st_h[j])
            assert ol_h[j] == len(eb[i])
    best = 0.0
    for _ in range(3):
        t = jnp.int32(0)
        t0 = time.perf_counter()
        for _ in range(M):
            t, ols = pass_all(t, *d_ws)
        np.asarray(t)
        best = max(best, total / ((time.perf_counter() - t0) / M))
    print(f"RESULT {best/1e6:.1f} MB/s", flush=True)


if __name__ == "__main__":
    main()
