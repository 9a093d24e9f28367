"""Chip A/B (round 5): mid-mirror size on the mid-bucket batch shapes.

sim_bucket_mid.py models 3 rw buckets + MID_CAP 1024 at +8.1% on the
Silesia wall — but the mid gather (gather_rows over mid_w rows) costs
per-round vector issue linear in mid_w, which the round model does not
price.  This measures real wall time for the SAME batches at forced
mid_w in {0, 384, 960} on the 48 KiB-bucket shape, giving both the
round win and the per-round cost in one run.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MIDS = [int(x) for x in os.environ.get("LZ4TPU_AB_MIDS", "384,960").split(",")]
BUCKET = int(os.environ.get("LZ4TPU_AB_BUCKET", "49152"))
BUCKET_LO = int(os.environ.get("LZ4TPU_AB_BUCKET_LO", "32768"))
CBSEL = int(os.environ.get("LZ4TPU_AB_CB", "32"))
M = 2


def main():
    import jax
    import jax.numpy as jnp

    from bench import BLOCK
    from lz4tpu.hostpack import pack_words_le, to_device_chunked
    from lz4tpu.kernels import decode128 as d128
    from lz4tpu.native import compress_block, model_decode_rounds
    from lz4tpu.parallel import sched
    from lz4tpu.spec.table import U32Table
    from lz4tpu.utils import silesia

    data = b"".join(silesia.corpus(1.0).values())
    blocks = [data[i : i + BLOCK] for i in range(0, len(data), BLOCK)]
    comp = [bytes(compress_block(b, 0, U32Table())) for b in blocks]
    lens = np.array([len(b) for b in blocks])
    clens = np.array([len(c) for c in comp])
    elig = (clens < lens) & (clens <= 60448)
    eb = [b for b, e in zip(blocks, elig) if e]
    ec = [c for c, e in zip(comp, elig) if e]

    plan = sched.plan_batches(ec, BLOCK)
    picked = []
    for idx, cb in plan:
        bm = max(len(ec[i]) for i in idx)
        if cb == CBSEL and BUCKET_LO < bm <= BUCKET:
            picked.append(idx)
    print(f"{len(picked)} batches in bucket ({32768},{BUCKET}] at CB{CBSEL}",
          flush=True)
    picked = picked[:4]
    assert picked, "no batches in the target bucket"

    mod = d128.load_variant(CBSEL)
    rw, ro, _ = mod.buffer_rows(BUCKET, BLOCK)
    mr = mod.round_bound(BUCKET, BLOCK)
    total = sum(len(eb[i]) for idx in picked for i in idx)

    d_ws, d_ns = [], []
    for idx in picked:
        arr = np.zeros((128, rw * 4), np.uint8)
        n1 = np.zeros((1, 128), np.int32)
        for j, i in enumerate(idx):
            arr[j, : len(ec[i])] = np.frombuffer(ec[i], np.uint8)
            n1[0, j] = len(ec[i])
        d_ws.append(to_device_chunked(pack_words_le(arr)))
        d_ns.append(jnp.asarray(n1))

    for midw in MIDS:
        rows = rw + ro + mod.PAGE_W + mod.FAR_W + mod.RING_W + mod.NSTATE + midw
        print(f"mid_w={midw}: rowsum {rows} ({rows*512/1e6:.2f} MB)", flush=True)
        # modeled rounds at this mid
        rmaxes = []
        for idx in picked:
            rmaxes.append(max(
                model_decode_rounds(
                    ec[i], cb=CBSEL, flush_thresh=mod.FLUSH_THRESH,
                    flush_b=mod.FLUSH_B, far_g_bytes=mod.FAR_G * 4,
                    mid_bytes=max(midw * 4 - 4, 0),
                ) for i in idx))
        kw = dict(rw=rw, ro=ro, max_rounds=mr, output_limit=BLOCK, mid_w=midw)

        @jax.jit
        def pass_all(t, *ws):
            outs = []
            for w, nn in zip(ws, d_ns):
                _, ol, st = mod._decode128_jit(w ^ t, nn, **kw)
                t = (st.sum() * 0 + ol.sum() * 0).astype(jnp.int32)
                outs.append((ol, st))
            return t, outs

        t0c = time.perf_counter()
        tv, outs = pass_all(jnp.int32(0), *d_ws)
        rounds_meas = []
        for bi, (ol, st) in enumerate(outs):
            st_h = np.asarray(st)[0]
            ol_h = np.asarray(ol)
            for j, i in enumerate(picked[bi]):
                assert st_h[j] == 0, (bi, j, st_h[j])
                assert ol_h[0, j] == len(eb[i])
            rounds_meas.append(int(ol_h[2].max()))
        print(f"  compile+first {time.perf_counter()-t0c:.0f}s; "
              f"rounds meas {rounds_meas} model {rmaxes}", flush=True)
        best = 0.0
        for _ in range(3):
            t = jnp.int32(0)
            t0 = time.perf_counter()
            for _ in range(M):
                t, outs = pass_all(t, *d_ws)
            np.asarray(t)
            best = max(best, total / ((time.perf_counter() - t0) / M))
        tot_rounds = sum(rounds_meas)
        us_round = total / best / tot_rounds * 1e6 if tot_rounds else 0
        print(f"  mid_w={midw}: {best/1e6:.1f} MB/s  "
              f"({tot_rounds} rounds, {us_round:.2f} us/round)", flush=True)


if __name__ == "__main__":
    main()
