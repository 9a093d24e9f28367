"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: raw-block decode throughput on the TPU Pallas kernels over the
SILESIA STAND-IN corpus (lz4tpu/utils/silesia.py — BASELINE.md defines
the metric as "GB/s on Silesia"; the stand-in matches the real corpus's
per-file sizes, textures, and liblz4 ratios, since this environment has
no network egress), 64 KiB blocks through the model-driven batch
scheduler, GB/s per chip.  ``silesia_coverage`` reports the partition
honestly: stored blocks (greedy output >= input, never decoded by ANY
LZ4 implementation) are excluded; near-incompressible "heavy" blocks are
reported separately.  The deterministic mixed corpus of rounds 1-4 stays
in ``extra`` (``tpu_decode128_64m_*``) for round-over-round comparison.
``vs_baseline`` compares against the C reference implementation's
single-core decompression (~4.5 GB/s, BASELINE.md) — the bar the reference
library claims to match (``/root/reference/README.md:11``).

The ``extra`` dict reports the BASELINE.md configurations (the
``silesia_*`` keys carry the metric-corpus numbers; configs below run on
the mixed corpus for round-over-round comparability):

* config #1/#2 (Silesia-stand-in frames, xxhash32 checksums): the
  ``frame_*`` entries time the whole-frame parallel pipeline on the chip
  (kernels + host mux; end-to-end through the dev tunnel, whose measured
  floor ``tunnel_*`` is reported alongside).  Blocks >= 256 KiB (incl.
  the reference-default 4 MiB) decode on-chip via the HBM-staged banded
  lane kernel at FULL 128-lane occupancy on dedicated corpora
  (``tpu_decodebig_*``: 128 MiB at 1 MiB blocks, 512 MiB at 4 MiB);
  ``tpu_compressbig_*`` compresses true 4 MiB blocks on-chip as spliced
  in-block-windowed lane chunks.
* config #3 (linked + dictionary): ``frame_linked_dict_ratio`` from the
  ring-halo parallel-linked mode with a broadcast dictionary, compressed
  ON-CHIP by the windowed lane kernel (``tpu_linked_dict_*``: per-lane
  [window|block] buffers with host-primed tables).
* config #4 (levels): ``hc_level9_*`` host HC parse vs greedy.
* parity: ``tpu_compress128_strict_*`` — the lane compressor's STRICT
  mode, byte-for-byte equal to the reference greedy parse on every
  bench block (the accelerated parity path).
* config #5 (sharded corpus): exercised by tests/test_multiprocess.py and
  the resumable runner; not timed here (single chip).

Measurement protocol: the tunneled TPU backend executes lazily and
``block_until_ready`` does not force execution, so every timed run chains
M dispatches through a data dependency and fetches a scalar at the end
(amortising the ~25 ms tunnel round-trip), calibrated in-session against
known matmul/HBM costs.  ``--full`` adds a decode batch-size sweep.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(pathlib.Path(__file__).parent / ".jax_cache"))

import numpy as np

BASELINE_DECODE_GBPS = 4.5  # C lz4 single-core decompress (BASELINE.md)
BLOCK = 1 << 16
CAP = BLOCK + 512


def make_corpus(target_mb: float = 8.0) -> bytes:
    """Deterministic Silesia-stand-in: mix of real binaries from the image
    and synthetic text-like/repetitive/random spans (no network egress)."""
    parts = []
    for p in [
        "/usr/bin/g++",
        "/usr/lib/x86_64-linux-gnu/libc.so.6",
        "/usr/lib/x86_64-linux-gnu/libstdc++.so.6",
    ]:
        try:
            parts.append(open(p, "rb").read())
        except OSError:
            pass
    rng = np.random.default_rng(0)
    motifs = [
        b"the quick brown fox jumps over the lazy dog. ",
        bytes(range(64)) * 4,
        b"<xml attr='value'><nested>text</nested></xml>\n",
    ]
    syn = bytearray()
    while len(syn) < 4 << 20:
        syn.extend(motifs[int(rng.integers(len(motifs)))] * int(rng.integers(1, 30)))
        syn.extend(rng.integers(0, 256, int(rng.integers(10, 300)), dtype=np.uint8).tobytes())
    parts.append(bytes(syn))
    data = b"".join(parts)
    n = int(target_mb * (1 << 20))
    return (data * (n // len(data) + 1))[:n]


def _pack(blocks, cap):
    arr = np.zeros((len(blocks), cap), np.uint8)
    lens = np.zeros(len(blocks), np.int32)
    for i, c in enumerate(blocks):
        arr[i, : len(c)] = np.frombuffer(c, np.uint8)
        lens[i] = len(c)
    return arr, lens


def bench_tpu_decode(blocks, comp, kernel_jit, m=6):
    """Chained decode throughput for one kernel; asserts bit-exactness."""
    import jax
    import jax.numpy as jnp

    nb = len(blocks)
    total = sum(len(b) for b in blocks)
    arr, lens = _pack(comp, CAP)
    d_arr, d_lens = jnp.asarray(arr), jnp.asarray(lens)
    pref = jnp.zeros((nb, 128), jnp.uint8)
    plen = jnp.zeros(nb, jnp.int32)
    dkw = dict(block_maxsize=BLOCK, comp_capacity=CAP, prefix_rows=0)

    @jax.jit
    def dec_chain(a, l):
        out, ol, st = kernel_jit(a, l, pref, plen, **dkw)
        return a ^ (st.sum() * 0).astype(jnp.uint8), l, out, ol, st

    _, _, out, ol, st = dec_chain(d_arr, d_lens)
    out_h, ol_h, st_h = np.asarray(out), np.asarray(ol), np.asarray(st)
    assert (st_h == 0).all(), "TPU decode status errors"
    for i, b in enumerate(blocks):
        assert out_h[i, : ol_h[i]].tobytes() == b, f"TPU decode mismatch block {i}"

    a, l = d_arr, d_lens
    t0 = time.perf_counter()
    for _ in range(m):
        a, l, out, ol, st = dec_chain(a, l)
    np.asarray(ol[:2])
    return total / ((time.perf_counter() - t0) / m)


def _run_sched_orders(extra, blocks, comp, tag: str, m=2, orders_sel=None):
    """Chained on-device timing of the scheduled lane decode over
    prepared (blocks, comp): the shared machinery behind the mixed-corpus
    and Silesia sched benches.  Returns the best bytes/s across orders."""
    import jax
    import jax.numpy as jnp

    from lz4tpu.hostpack import pack_words_le
    from lz4tpu.kernels import decode128 as d128
    from lz4tpu.parallel import sched

    maxlen = max(len(c) for c in comp)
    # per-batch comp-length buckets: the wall-dominating (sequence-dense)
    # batches have well-compressed streams, so their rw shrinks — which
    # both cheapens the refill one-hot (cost ~ rw) and frees VMEM for the
    # mid mirror (pick_mid_w inside the jit: model -8% rounds).  Bucketed
    # to at most 4 shapes per CB variant to bound remote compiles.
    # THREE shared shapes (32 KiB, 48 KiB, and the 60448 eligibility
    # anchor) so the mixed and Silesia corpora reuse the same compiled
    # kernels — remote Mosaic compiles are the bench's wall-clock risk.
    # The 48 KiB bucket exists because pick_mid_w still grants the full
    # mid mirror there (rw 12552 + ro 16704 + mid 960 = 15.9 MB), and
    # the mid A/B on exactly those Silesia batches measured 621 -> 652
    # MB/s (tools/chip_mid_ab.py); the model (tools/sim_bucket_mid.py)
    # puts 3 buckets + cap-1024 mid at +8.1% on the Silesia wall.
    if maxlen <= 32768:
        buckets = [32768]
    elif maxlen <= 49152:
        buckets = [32768, 49152]
    else:
        buckets = [32768, 49152, max(maxlen, 60448)]
    if os.environ.get("LZ4TPU_BENCH_RWBUCKETS", "1") != "1":
        buckets = [maxlen]
    rounds = sched.model_rounds(comp, d128.CB, BLOCK)
    nb = len(blocks)
    n_batches = -(-nb // 128)
    base_order = np.arange(nb)
    orders = {
        "natural": [
            (base_order[bi * 128 : bi * 128 + 128].tolist(), d128.CB)
            for bi in range(n_batches)
        ],
        "sched": [
            (
                np.argsort(-rounds, kind="stable")[
                    bi * 128 : bi * 128 + 128
                ].tolist(),
                d128.CB,
            )
            for bi in range(n_batches)
        ],
        "sched_cb": sched.plan_batches(comp, BLOCK),
    }
    if orders_sel:
        orders = {k: v for k, v in orders.items() if k in orders_sel}
    total = sum(len(b) for b in blocks)
    best_overall = 0.0

    for name, plan in orders.items():
        d_ws, d_ns, metas, mods, kws = [], [], [], [], []
        for idx, cb in plan:
            mod = d128.load_variant(cb)
            batch_maxlen = max(len(comp[i]) for i in idx)
            mlen = next(b for b in buckets if b >= batch_maxlen)
            if not mod.lanes_eligible(mlen, BLOCK):
                # defense for env-narrowed VMEM envelopes: route
                # edge-bucket batches to the CB32 kernel (wider measured
                # envelope); with the default explicit vmem stack claim
                # every 64 KiB-block shape is eligible and this is dead
                mod = d128.load_variant(32)
            rw, ro, _pr = mod.buffer_rows(mlen, BLOCK)
            bc = [comp[i] for i in idx]
            arr = np.zeros((128, rw * 4), np.uint8)
            n1 = np.zeros((1, 128), np.int32)
            for j, c in enumerate(bc):
                arr[j, : len(c)] = np.frombuffer(c, np.uint8)
                n1[0, j] = len(c)
            d_ws.append(jnp.asarray(pack_words_le(arr)))
            d_ns.append(jnp.asarray(n1))
            metas.append(idx)
            mods.append(mod)
            kws.append(
                dict(
                    rw=rw, ro=ro,
                    max_rounds=mod.round_bound(mlen, BLOCK),
                    output_limit=BLOCK,
                )
            )

        @jax.jit
        def pass_all(t, *ws):
            ols = []
            for w, nn, mod, kw in zip(ws, d_ns, mods, kws):
                _, ol, st = mod._decode128_jit(w ^ t, nn, **kw)
                t = (st.sum() * 0 + ol.sum() * 0).astype(jnp.int32)
                ols.append((ol, st))
            return t, ols

        t0v, ols = pass_all(jnp.int32(0), *d_ws)
        for bi, (ol, st) in enumerate(ols):
            st_h = np.asarray(st)[0]
            ol_h = np.asarray(ol)[0]
            for j, i in enumerate(metas[bi]):
                assert st_h[j] == 0, f"lane status {st_h[j]} batch {bi} lane {j}"
                assert ol_h[j] == len(blocks[i])
        best = 0.0
        for _ in range(3):
            t = jnp.int32(0)
            t0 = time.perf_counter()
            for _ in range(m):
                t, ols = pass_all(t, *d_ws)
            np.asarray(t)
            best = max(best, total / ((time.perf_counter() - t0) / m))
        extra[f"{tag}{name}_mbps"] = round(best / 1e6, 1)
        best_overall = max(best_overall, best)
    extra[f"{tag}model_rounds"] = (
        f"max {int(rounds.max())} p50 {int(np.percentile(rounds, 50))} "
        f"mean {int(rounds.mean())} cb_picks "
        + "/".join(str(cb) for _, cb in orders.get("sched_cb", []))
    )
    return best_overall


def bench_silesia_decode(extra, m=2):
    """BASELINE.md's metric corpus: scheduled lane decode over the
    Silesia stand-in (lz4tpu/utils/silesia.py — exact member sizes,
    liblz4 ratios calibrated to the published per-file values).  Routing
    mirrors the frame layer's production policy: blocks whose greedy
    output would not shrink are STORED (never decoded by any LZ4
    implementation, excluded from the decode metric); near-incompressible
    blocks whose comp streams exceed the lane decoder's VMEM shape are
    the 'heavy' partition, reported separately (HBM-staged engine).
    Coverage percentages are reported alongside so the headline is
    honest about what it decodes."""
    from lz4tpu.native import compress_block
    from lz4tpu.spec.table import U32Table
    from lz4tpu.utils import silesia

    scale = float(os.environ.get("LZ4TPU_BENCH_SIL_SCALE", "1.0"))
    data = b"".join(silesia.corpus(scale).values())
    blocks = [data[i : i + BLOCK] for i in range(0, len(data), BLOCK)]
    comp = [bytes(compress_block(b, 0, U32Table())) for b in blocks]
    lens = np.array([len(b) for b in blocks])
    clens = np.array([len(c) for c in comp])
    stored = clens >= lens
    # lane eligibility is the production router's own check; with the
    # explicit vmem_limit_bytes stack claim every 64 KiB-block comp
    # shape fits, so the "heavy" partition is empty unless the envelope
    # is narrowed via env (LZ4TPU_D128_VMEM0 / LZ4TPU_BENCH_SIL_ELIG)
    from lz4tpu.kernels.decode128 import lanes_eligible as _elig

    elig_cap = int(
        os.environ.get("LZ4TPU_BENCH_SIL_ELIG", str(1 << 20))
    )
    elig = (~stored) & (clens <= elig_cap) & np.array(
        [_elig(int(c), BLOCK) for c in clens]
    )
    heavy = (~stored) & ~elig
    tot = int(lens.sum())
    extra["silesia_mb"] = round(tot / (1 << 20), 1)
    extra["silesia_block_ratio"] = round(int(clens[~stored].sum() + lens[stored].sum()) / tot, 4)
    extra["silesia_coverage"] = (
        f"eligible {lens[elig].sum()/tot*100:.1f}% / heavy "
        f"{lens[heavy].sum()/tot*100:.1f}% / stored {lens[stored].sum()/tot*100:.1f}%"
    )
    eb = [b for b, e in zip(blocks, elig) if e]
    ec = [c for c, e in zip(comp, elig) if e]
    bps = _run_sched_orders(
        extra, eb, ec, "silesia_decode128_", m=m,
        orders_sel=("sched", "sched_cb"),
    )
    # heavy partition (comp beyond the lane decoder's VMEM shape): the
    # HBM-staged engine decodes it on-chip — wrapper timing (includes the
    # window repack + transport; the production route for these blocks)
    hb = [b for b, h in zip(blocks, heavy) if h]
    hc = [c for c, h in zip(comp, heavy) if h]
    if hb:
        import lz4tpu.kernels.decodebig as dbig

        best = 0.0
        # pass 0 warms the Mosaic compiles (minutes, cold) so the
        # recorded number is the engine, not the compiler
        for it in range(2):
            t0 = time.perf_counter()
            outs = []
            for base in range(0, len(hc), 128):
                outs.extend(dbig.decompress_blocks_big(
                    hc[base : base + 128], block_maxsize=BLOCK,
                    _oband=18432, _cband=3072,
                ))
            dt = time.perf_counter() - t0
            assert outs == hb, "silesia heavy decodebig mismatch"
            best = max(best, sum(len(b) for b in hb) / dt)
        extra["silesia_heavy_decodebig_mbps"] = round(best / 1e6, 1)
    return bps, hc, hb


def bench_tpu_decode128_sched(extra, size_mb: float = 64.0, m=2):
    """Scheduled multi-batch lane decode: a 64 MiB corpus (1024 x 64 KiB
    blocks) decoded as eight 128-lane batches — scheduler efficiency
    grows with batch count (measured 593 MB/s at 4 batches vs 735 at 8:
    more batches amortize the slowest-lane skew).  The batch scheduler
    (``parallel/sched.py``) sorts blocks by the C++ round model
    (``native.model_decode_rounds`` — the lane kernel's lockstep-round
    state machine) so each batch groups similar-cost lanes, and the
    ``sched_cb`` order additionally routes every batch to the chunk-size
    variant (CB=16/32) with the lower modeled wall.  All orders are
    timed with the chained protocol and every lane must complete
    in-kernel."""
    from lz4tpu.native import compress_block
    from lz4tpu.spec.table import U32Table

    data = make_corpus(size_mb)
    blocks = [data[i : i + BLOCK] for i in range(0, len(data), BLOCK)]
    comp = [bytes(compress_block(b, 0, U32Table())) for b in blocks]
    return _run_sched_orders(
        extra, blocks, comp, f"tpu_decode128_{int(size_mb)}m_", m=m
    )


def bench_tpu_compress(blocks, comp, m=6):
    import jax
    import jax.numpy as jnp

    from lz4tpu.kernels.compress import _compress_batch_jit

    nb = len(blocks)
    total = sum(len(b) for b in blocks)
    barr, blens = _pack(blocks, BLOCK)
    d_barr = jnp.asarray(barr)
    d_blens = jnp.asarray(blens)
    zz = jnp.zeros(nb, jnp.int32)
    caps = jnp.full(nb, -1, jnp.int32)
    acc = jnp.ones(nb, jnp.int32)
    tbl = jnp.zeros((nb, 4096), jnp.uint32)
    ckw = dict(data_capacity=BLOCK, out_capacity=BLOCK + BLOCK // 255 + 18, u16_table=False)

    @jax.jit
    def comp_chain(a):
        outc, olen, stc, _ = _compress_batch_jit(
            a, d_blens, zz, caps, acc, zz, zz, tbl, **ckw
        )
        return a ^ (stc.sum() * 0).astype(jnp.uint8), outc, olen, stc

    _, outc, olen, stc = comp_chain(d_barr)
    outc_h, olen_h = np.asarray(outc), np.asarray(olen)
    for i, c in enumerate(comp):
        assert outc_h[i, : olen_h[i]].tobytes() == c, f"TPU compress mismatch block {i}"

    a = d_barr
    t0 = time.perf_counter()
    for _ in range(m):
        a, outc, olen, stc = comp_chain(a)
    np.asarray(olen[:2])
    return total / ((time.perf_counter() - t0) / m)


def bench_tpu_compress128(data, m=4, blk=None):
    """Lane-parallel compressor: 128 x 32 KiB blocks per kernel step.
    Correctness (valid LZ4, not reference-byte-exact) is checked through
    the host wrapper once; timing uses the chained on-device protocol.
    ``blk`` overrides the per-lane block size (STRICT mode's extra table
    sweeps push the 32 KiB shape ~2.6 MB past the 16 MB scoped-VMEM
    limit, so its parity entry times 16 KiB lanes)."""
    import jax
    import jax.numpy as jnp

    from lz4tpu.kernels import compress128 as c128
    from lz4tpu.native import decompress_block as native_decompress

    blk = blk or c128.MAX_B
    blocks = [data[i : i + blk] for i in range(0, len(data), blk)][:128]
    comp = c128.compress_blocks_128(blocks)
    for b, c in zip(blocks, comp):
        assert bytes(native_decompress(c, b"", output_limit=blk)) == b, (
            "compress128 roundtrip mismatch"
        )
    ratio = sum(len(c) for c in comp) / sum(len(b) for b in blocks)

    maxlen = max(len(b) for b in blocks)
    ri = -(-maxlen // 4)
    ri = -(-ri // c128.GROUP_W) * c128.GROUP_W + c128.PAGE_W
    maxout = maxlen + maxlen // 255 + 16
    ro = (-(-maxout // 4) // c128.RING_W + 2) * c128.RING_W
    max_rounds = maxlen + maxout // c128.CB + maxlen // c128.CB + 256
    arr = np.zeros((c128.LANES, ri * 4), np.uint8)
    n = np.zeros((1, c128.LANES), np.int32)
    for i, b in enumerate(blocks):
        arr[i, : len(b)] = np.frombuffer(b, np.uint8)
        n[0, i] = len(b)
    from lz4tpu.hostpack import pack_words_le

    d_words = jnp.asarray(pack_words_le(arr))
    d_n = jnp.asarray(n)
    total = sum(len(b) for b in blocks)

    @jax.jit
    def chain(wds):
        _, ol = c128._compress128_jit(
            wds, d_n, ri=ri, ro=ro, max_rounds=max_rounds, hashlog=c128.HASHLOG
        )
        return wds ^ (ol.sum() * 0), ol

    _, ol = chain(d_words)
    np.asarray(ol)
    best = 0.0
    for _ in range(3):
        a = d_words
        t0 = time.perf_counter()
        for _ in range(m):
            a, ol = chain(a)
        np.asarray(ol[:1])
        best = max(best, total / ((time.perf_counter() - t0) / m))
    return best, ratio


def bench_tpu_compressbig(extra, m=3):
    """compressbig: reference-default 4 MiB frame blocks compressed
    on-chip as spliced in-block-windowed lane chunks.  End-to-end rate
    (pipelined, transport-bound on this backend) + the chained kernel
    rate of the windowed batch (the in-kernel compressbig throughput)."""
    import jax
    import jax.numpy as jnp

    from lz4tpu import decompress_frame
    from lz4tpu.hostpack import to_device_chunked
    from lz4tpu.kernels import compress128 as c128
    from lz4tpu.native import prime_tables_native
    from lz4tpu.parallel.mesh import make_mesh
    from lz4tpu.parallel.pipeline import compress_frame_parallel

    data = make_corpus(32.0)
    mesh = make_mesh(1)
    frame = compress_frame_parallel(
        data, block_size=4 << 20, mesh=mesh, lane_kernel=True
    )
    assert decompress_frame(frame, engine="native") == data
    extra["tpu_compressbig_ratio"] = round(len(frame) / len(data), 4)
    t0 = time.perf_counter()
    compress_frame_parallel(
        data, block_size=4 << 20, mesh=mesh, lane_kernel=True
    )
    extra["tpu_compressbig_mbps"] = round(
        len(data) / (time.perf_counter() - t0) / 1e6, 1
    )
    # fast mode: windowless merged chunks — no per-batch table upload, no
    # window transport; ~1-2% worse ratio (the throughput-first writer)
    ff = compress_frame_parallel(
        data, block_size=4 << 20, mesh=mesh, lane_kernel=True,
        chunk_windows=False,
    )
    assert decompress_frame(ff, engine="native") == data
    extra["tpu_compressbig_fast_ratio"] = round(len(ff) / len(data), 4)
    t0 = time.perf_counter()
    compress_frame_parallel(
        data, block_size=4 << 20, mesh=mesh, lane_kernel=True,
        chunk_windows=False,
    )
    extra["tpu_compressbig_fast_mbps"] = round(
        len(data) / (time.perf_counter() - t0) / 1e6, 1
    )

    # chained kernel rate of one windowed 128-lane batch
    chunk = 8192
    W = 1 << 16
    k = W // chunk
    ri = -(-(chunk + W) // 4)
    ri = -(-ri // c128.GROUP_W) * c128.GROUP_W + c128.PAGE_W
    maxout = chunk + chunk // 255 + 16
    ro = (-(-maxout // 4) // c128.RING_W + 2) * c128.RING_W
    max_rounds = chunk + maxout // c128.CB + chunk // c128.CB + 256
    base = 128  # batch fully interior to block 0 (4 MiB = 512 chunks)
    arr = np.frombuffer(data[: (base + 128) * chunk], np.uint8).reshape(
        -1, chunk
    )
    buf = np.zeros((128, ri * 4), np.uint8)
    n = np.zeros((1, 128), np.int32)
    cur0 = np.full((1, 128), W, np.int32)
    for j in range(128):
        s = (base + j) * chunk
        buf[j, : W + chunk] = np.frombuffer(data[s - W : s + chunk], np.uint8)
        n[0, j] = W + chunk
    from lz4tpu.hostpack import pack_words_le

    d_words = jnp.asarray(pack_words_le(buf))
    d_n, d_c = jnp.asarray(n), jnp.asarray(cur0)
    gst = (np.arange(128, dtype=np.int64) + base) * chunk
    tinit = jnp.asarray(prime_tables_native(
        data, gst, np.full(128, W, np.int64), np.zeros(128, np.int64),
        c128.HASHLOG,
    ))
    total = 128 * chunk

    @jax.jit
    def chain(wds):
        _, ol = c128._compress128_jit(
            wds, d_n, d_c, tinit,
            ri=ri, ro=ro, max_rounds=max_rounds, hashlog=c128.HASHLOG,
        )
        return wds ^ (ol.sum() * 0), ol

    _, ol = chain(d_words)
    np.asarray(ol)
    best = 0.0
    for _ in range(3):
        a = d_words
        t0 = time.perf_counter()
        for _ in range(m):
            a, ol = chain(a)
        np.asarray(ol[:1])
        best = max(best, total / ((time.perf_counter() - t0) / m))
    extra["tpu_compressbig_kernel_mbps"] = round(best / 1e6, 1)


def bench_tpu_decodebig(data, bb, m=2):
    """HBM-staged banded decode of >=256 KiB blocks: bit-exactness through
    the wrapper once, then the chained on-device protocol on the
    window-aligned layout; every timed lane must be in-kernel."""
    import jax
    import jax.numpy as jnp

    import lz4tpu.kernels.decodebig as dbig
    from lz4tpu.native import compress_block
    from lz4tpu.spec.table import U32Table

    from lz4tpu.native import repack_window_into, repack_window_lens

    bigs = [data[i : i + bb] for i in range(0, len(data), bb)]
    bigs = [b for b in bigs if len(b) == bb][:128]
    if not bigs:
        return None
    bcomp = [bytes(compress_block(b, 0, U32Table())) for b in bigs]
    outs = dbig.decompress_blocks_big(bcomp, block_maxsize=bb)
    assert outs == bigs, "decodebig mismatch"

    chunk_lens = [repack_window_lens(c, bb, dbig.WS_LOG) for c in bcomp]
    maxchunk = max(int(cl.max()) for cl, _ in chunk_lens)
    win_r = -(-(maxchunk + 16) // 512) * 512
    lens = [(len(cl) - 1) * win_r + int(cl[-1]) for cl, _ in chunk_lens]
    maxlen = max(lens)
    rw = -(-maxlen // 4)
    rw_pad = -(-rw // dbig.CHALF) * dbig.CHALF + dbig.CBAND + dbig.CHALF
    ro_pad = -(-bb // 4 // dbig.OHALF) * dbig.OHALF + dbig.OBAND + dbig.OHALF
    mr = dbig.round_bound(maxlen, bb)
    arr = np.zeros((128, rw_pad * 4), np.uint8)
    n = np.zeros((1, 128), np.int32)
    for i, c in enumerate(bcomp):
        repack_window_into(c, bb, dbig.WS_LOG, win_r, arr[i])
        n[0, i] = lens[i]
    from lz4tpu.hostpack import pack_words_le

    d_words = jnp.asarray(pack_words_le(arr))
    d_n = jnp.asarray(n)

    @jax.jit
    def chain(wds):
        _, ol, st = dbig._decodebig_jit(
            wds, d_n, oband=dbig.OBAND, cband=dbig.CBAND, rw_pad=rw_pad,
            ro_pad=ro_pad, max_rounds=mr, output_limit=bb,
            win_r=win_r, ws_log=dbig.WS_LOG,
        )
        return wds ^ (st.sum() * 0), ol, st

    _, ol, st = chain(d_words)
    np.asarray(ol)
    st = np.asarray(st)[0][: len(bigs)]
    in_kernel = int((st == 0).sum())
    total = sum(len(b) for b in bigs)
    best = 0.0
    for _ in range(3):
        a = d_words
        t0 = time.perf_counter()
        for _ in range(m):
            a, ol, st_ = chain(a)
        np.asarray(ol[:1])
        best = max(best, total / ((time.perf_counter() - t0) / m))
    return best, len(bigs), in_kernel


def bench_tunnel(extra, mb: int = 8):
    """Host<->device transport floor on this backend.  The frame_* rates
    are end-to-end (they move the corpus across the link both ways), so
    their ceiling is the link itself: decoded bytes must come back at
    the D2H rate no matter how fast the kernels run.  Recording the
    measured link rates makes that gap auditable (on a production PCIe
    host the same pipeline code faces a ~16+ GB/s link instead)."""
    import jax.numpy as jnp

    from lz4tpu.hostpack import to_device_chunked

    rng = np.random.default_rng(7)
    h2d = 0.0
    devs = []
    for _ in range(3):
        a = rng.integers(0, 256, mb << 20, np.uint8)
        t0 = time.perf_counter()
        d = to_device_chunked(a.reshape(-1, 1024))
        d.block_until_ready()
        h2d = max(h2d, mb / (time.perf_counter() - t0))
        devs.append(d + 0)  # distinct device buffers: jax caches the
        # host copy after the first np.asarray, so each D2H rep below
        # must fetch an array it has never fetched
    from lz4tpu.hostpack import fetch_device_rows

    d2h = 0.0
    for d in devs:
        d.block_until_ready()
        t0 = time.perf_counter()
        # the collect paths' actual fetch primitive (overlapped pieces):
        # measured ~30% above a whole-buffer np.asarray on this tunnel
        fetch_device_rows(d)
        d2h = max(d2h, mb / (time.perf_counter() - t0))
    extra["tunnel_h2d_mbps"] = round(h2d, 1)
    extra["tunnel_d2h_mbps"] = round(d2h, 1)


def frame_ceilings(extra):
    """Composed transport ceilings for the end-to-end frame paths, from
    the SAME-RUN measured link rates: a frame decode moves comp bytes UP
    (ratio x size over h2d) and decoded bytes DOWN (size over d2h), and
    on this tunnel transfers serialize with each other — so the honest
    ceiling is 1 / (r/h2d + 1/d2h), not the bare d2h rate (and mirrored
    for compress).  frame_*_vs_ceiling reports how much of that composed
    ceiling the pipeline achieves."""
    h2d, d2h = extra.get("tunnel_h2d_mbps"), extra.get("tunnel_d2h_mbps")
    if not h2d or not d2h:
        return
    for name, rate_key, ratio_key, up_r in (
        ("frame_decode", "frame_decode_mbps", "frame_parallel_ratio", True),
        ("frame_compress", "frame_compress_mbps", "frame_parallel_ratio", False),
        ("frame_compress_fast", "frame_compress_fast_mbps",
         "frame_compress_fast_ratio", False),
        # transport-only ceilings (kernel + per-batch table H2D excluded,
        # so these are optimistic — vs_ceiling is a lower bound)
        ("tpu_compressbig", "tpu_compressbig_mbps",
         "tpu_compressbig_ratio", False),
        ("tpu_compressbig_fast", "tpu_compressbig_fast_mbps",
         "tpu_compressbig_fast_ratio", False),
    ):
        r = extra.get(ratio_key)
        rate = extra.get(rate_key)
        if r is None or rate is None:
            continue
        if up_r:  # decode: comp up, raw down
            ceil = 1.0 / (r / h2d + 1.0 / d2h)
        else:  # compress: raw up, comp down
            ceil = 1.0 / (1.0 / h2d + r / d2h)
        extra[f"{name}_ceiling_mbps"] = round(ceil, 1)
        extra[f"{name}_vs_ceiling"] = round(rate / ceil, 3)


def bench_frame_parallel(data, extra):
    """Whole-frame pipeline on the chip (config #1/#2/#3 shapes).

    Decode timing uses a 32 MiB corpus: the pipelined dispatch/collect
    only overlaps once a frame spans multiple 128-lane batches (an 8 MiB
    frame is a single batch).  Rates remain end-to-end and therefore
    bounded by the tunnel (see ``bench_tunnel``)."""
    from lz4tpu.parallel.mesh import make_mesh
    from lz4tpu.parallel.pipeline import (
        compress_frame_parallel,
        decompress_frame_parallel,
    )

    mesh = make_mesh(1)
    fdata = make_corpus(32.0)
    frame = compress_frame_parallel(fdata, block_size=BLOCK, mesh=mesh)
    t0 = time.perf_counter()
    frame = compress_frame_parallel(fdata, block_size=BLOCK, mesh=mesh)
    extra["frame_compress_mbps"] = round(
        len(fdata) / (time.perf_counter() - t0) / 1e6, 1
    )
    out = decompress_frame_parallel(frame, mesh=mesh)
    t0 = time.perf_counter()
    out = decompress_frame_parallel(frame, mesh=mesh)
    extra["frame_decode_mbps"] = round(
        len(fdata) / (time.perf_counter() - t0) / 1e6, 1
    )
    assert out == fdata
    extra["frame_parallel_ratio"] = round(len(frame) / len(fdata), 4)
    # fast mode: lane-kernel frames (valid LZ4, in-block windows, not
    # byte-identical to the serial writer) — the throughput-first writer
    from lz4tpu import decompress_frame as _df

    ff = compress_frame_parallel(
        fdata, block_size=BLOCK, mesh=mesh, lane_kernel=True,
        chunk_windows=False,
    )
    assert _df(ff, engine="native") == fdata
    t0 = time.perf_counter()
    compress_frame_parallel(
        fdata, block_size=BLOCK, mesh=mesh, lane_kernel=True,
        chunk_windows=False,
    )
    extra["frame_compress_fast_mbps"] = round(
        len(fdata) / (time.perf_counter() - t0) / 1e6, 1
    )
    extra["frame_compress_fast_ratio"] = round(len(ff) / len(fdata), 4)
    del fdata, frame, out, ff

    # config #3: linked + broadcast dictionary compressed on-chip by the
    # WINDOWED lane kernel (per-lane [window|block] + host-primed tables)
    dictionary = data[: 1 << 16]
    fl = compress_frame_parallel(
        data, block_size=BLOCK, mesh=mesh, parallel_linked=True,
        dictionary=dictionary, lane_kernel=True,
    )
    from lz4tpu import decompress_frame

    assert decompress_frame(fl, dictionary=dictionary, engine="native") == data
    extra["frame_linked_dict_ratio"] = round(len(fl) / len(data), 4)
    t0 = time.perf_counter()
    compress_frame_parallel(
        data, block_size=BLOCK, mesh=mesh, parallel_linked=True,
        dictionary=dictionary, lane_kernel=True,
    )
    extra["tpu_linked_dict_compress_mbps"] = round(
        len(data) / (time.perf_counter() - t0) / 1e6, 1
    )


def bench_native(data, extra):
    from lz4tpu import CompressionSettings, decompress_frame

    # config #2 at the reference's default 4 MiB blocks (host engine)
    s = CompressionSettings().engine("native")  # 4 MiB blocks default
    frame = s.compress_bytes(data)
    t0 = time.perf_counter()
    frame = s.compress_bytes(data)
    t_c = time.perf_counter() - t0
    out = decompress_frame(frame, engine="native")
    t0 = time.perf_counter()
    out = decompress_frame(frame, engine="native")
    t_d = time.perf_counter() - t0
    assert out == data
    extra["native_compress_mbps"] = round(len(data) / t_c / 1e6, 1)
    extra["native_decompress_mbps"] = round(len(data) / t_d / 1e6, 1)
    extra["frame_ratio_4m"] = round(len(frame) / len(data), 4)

    # single-thread numbers: the reference's own posture is single-core,
    # so the 1t rates are the apples-to-apples comparison; the threaded
    # rates above exercise the independent-block parallelism seam
    # (byte-identical output either way)
    s1 = CompressionSettings().engine("native").threads(1)
    t0 = time.perf_counter()
    f1 = s1.compress_bytes(data)
    extra["native_compress_1t_mbps"] = round(
        len(data) / (time.perf_counter() - t0) / 1e6, 1
    )
    assert f1 == frame
    os.environ["LZ4TPU_HOST_THREADS"] = "1"
    try:
        t0 = time.perf_counter()
        assert decompress_frame(frame, engine="native") == data
        extra["native_decompress_1t_mbps"] = round(
            len(data) / (time.perf_counter() - t0) / 1e6, 1
        )
    finally:
        os.environ.pop("LZ4TPU_HOST_THREADS", None)

    # config #4: high-compression levels (host parse by design this round)
    s9 = CompressionSettings().engine("native").level(9)
    t0 = time.perf_counter()
    f9 = s9.compress_bytes(data)
    t_hc = time.perf_counter() - t0
    assert decompress_frame(f9, engine="native") == data
    extra["hc_level9_ratio"] = round(len(f9) / len(data), 4)
    extra["hc_level9_mbps"] = round(len(data) / t_hc / 1e6, 1)
    return len(data) / t_d


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    full = "--full" in sys.argv
    profile = "--profile" in sys.argv
    # default 8 MiB = 128 x 64 KiB blocks: fills the lane-parallel
    # decoder's 128-lane batches (a 2 MiB corpus leaves 3/4 of its lanes
    # idle)
    size_mb = float(args[0]) if args else 8.0
    data = make_corpus(size_mb)
    blocks = [data[i : i + BLOCK] for i in range(0, len(data), BLOCK)]
    while len(blocks) % 4:
        blocks.append(b"\x00" * BLOCK)

    from lz4tpu.native import compress_block
    from lz4tpu.spec.table import U32Table

    comp = [compress_block(b, 0, U32Table()) for b in blocks]

    extra = {
        "corpus_mb": round(sum(len(b) for b in blocks) / (1 << 20), 2),
        "block_ratio": round(sum(len(c) for c in comp) / sum(len(b) for b in blocks), 4),
        # tpu_* kernel rates use the chained on-device protocol; frame_*
        # rates include host<->device transfers, which on this dev setup
        # cross a ~25 ms/fetch network tunnel (PERF_NOTES.md) — they
        # bound the tunnel, not the pipeline
        "note": "frame_* rates are tunnel-transfer-bound on this backend",
    }
    native_d = bench_native(data, extra)

    tpu_best = None
    silesia_best = None
    try:
        import jax

        on_tpu = jax.default_backend() == "tpu"
    except Exception as e:  # pragma: no cover
        on_tpu = False
        extra["tpu_error"] = str(e)[:200]

    if on_tpu:
        # every section individually guarded: a slow compile or failure in
        # one extra must not lose the headline metric
        import contextlib

        from lz4tpu.kernels.decompress_v3 import _decompress_batch_v3_jit
        from lz4tpu.kernels.decompress_v4 import _decompress_batch_v4_jit

        prof = (
            jax.profiler.trace("/tmp/lz4tpu_trace")
            if profile
            else contextlib.nullcontext()
        )
        with prof:
            for name, kern in (("v4", _decompress_batch_v4_jit),
                               ("v3", _decompress_batch_v3_jit)):
                try:
                    bps = bench_tpu_decode(blocks, comp, kern)
                    extra[f"tpu_decode_{name}_mbps"] = round(bps / 1e6, 1)
                    if tpu_best is None or bps > tpu_best:
                        tpu_best = bps
                except Exception as e:  # pragma: no cover
                    extra[f"tpu_decode_{name}_error"] = str(e)[:160]
        if profile:
            extra["profile_trace"] = "/tmp/lz4tpu_trace"
        # lane-parallel decoder (128 blocks per kernel step).  Correctness
        # goes through the host wrapper once; timing uses the chained
        # on-device protocol (host<->device transfers through the tunnel
        # are orders of magnitude slower than the kernel and are not what
        # this metric measures)
        try:
            import jax.numpy as jnp

            from lz4tpu.kernels import decode128 as d128

            sub = blocks[:128]
            subc = comp[:128]
            out = d128.decompress_blocks_128(subc, block_maxsize=BLOCK)
            assert out == sub, "decode128 mismatch"

            maxlen = max(len(b) for b in subc)
            rw, ro, _pr = d128.buffer_rows(maxlen, BLOCK)
            max_rounds = d128.round_bound(maxlen, BLOCK)
            arr128 = np.zeros((128, rw * 4), np.uint8)
            n128 = np.zeros((1, 128), np.int32)
            for i, b in enumerate(subc):
                arr128[i, : len(b)] = np.frombuffer(b, np.uint8)
                n128[0, i] = len(b)
            from lz4tpu.hostpack import pack_words_le

            d_words = jnp.asarray(pack_words_le(arr128))
            d_n = jnp.asarray(n128)

            @jax.jit
            def chain128(wds):
                _, ol, st = d128._decode128_jit(
                    wds, d_n, rw=rw, ro=ro,
                    max_rounds=max_rounds, output_limit=BLOCK,
                )
                return wds ^ (st.sum() * 0), ol, st

            _, ol, st = chain128(d_words)
            np.asarray(ol)
            # timing honesty: every lane must complete IN-KERNEL (a lane
            # flagged for the host fallback did not decode its bytes)
            st = np.asarray(st)[0][: len(subc)]
            assert (st == 0).all(), f"non-OK lanes in timed batch: {st}"
            best = 0.0
            stot = sum(len(b) for b in sub)
            for _ in range(3):
                a = d_words
                t0 = time.perf_counter()
                for _ in range(4):
                    a, ol, _st = chain128(a)
                np.asarray(ol[:1])
                best = max(best, stot / ((time.perf_counter() - t0) / 4))
            extra["tpu_decode128_mbps"] = round(best / 1e6, 1)
            if tpu_best is None or best > tpu_best:
                tpu_best = best
        except Exception as e:  # pragma: no cover
            extra["tpu_decode128_error"] = str(e)[:160]

        # scheduled multi-batch lane decode on the 64 MiB mixed corpus
        # (round-over-round comparable shape)
        try:
            bps = bench_tpu_decode128_sched(extra)
            if bps and (tpu_best is None or bps > tpu_best):
                tpu_best = bps
        except Exception as e:  # pragma: no cover
            extra["tpu_decode128_sched_error"] = str(e)[:160]

        # BASELINE.md metric corpus: the Silesia stand-in (the headline
        # when it runs; coverage percentages reported alongside)
        if os.environ.get("LZ4TPU_BENCH_SILESIA", "1") == "1":
            try:
                silesia_best, _hc, _hb = bench_silesia_decode(extra)
            except Exception as e:  # pragma: no cover
                extra["silesia_error"] = str(e)[:160]

        try:
            extra["tpu_compress_mbps"] = round(
                bench_tpu_compress(blocks, comp) / 1e6, 1
            )
        except Exception as e:  # pragma: no cover
            extra["tpu_compress_error"] = str(e)[:160]
        try:
            c128_bps, c128_ratio = bench_tpu_compress128(data)
            extra["tpu_compress128_mbps"] = round(c128_bps / 1e6, 1)
            extra["tpu_compress128_ratio"] = round(c128_ratio, 4)
        except Exception as e:  # pragma: no cover
            extra["tpu_compress128_error"] = str(e)[:160]
        # HBM-staged big-block decode (reference-default frame shapes).
        # Throughput scales with lane occupancy, so these entries use a
        # dedicated corpus big enough to fill the 128 lanes at 1 MiB
        # blocks (32 lanes at 4 MiB; the host repack is the native C++
        # lz4tpu_repack_window pass)
        for name, bb, mb_default in (
            ("1m", 1 << 20, 128.0),
            ("4m", 1 << 22, 512.0),  # full 128-lane occupancy at 4 MiB
        ):
            try:
                dbig_mb = float(
                    os.environ.get(f"LZ4TPU_BENCH_DBIG_MB_{name.upper()}",
                                   str(mb_default))
                )
                dbig_data = make_corpus(dbig_mb)
                r = bench_tpu_decodebig(dbig_data, bb)
                del dbig_data
                if r is None:
                    continue
                bps, nlanes, in_kernel = r
                extra[f"tpu_decodebig_{name}_mbps"] = round(bps / 1e6, 1)
                extra[f"tpu_decodebig_{name}_lanes"] = (
                    f"{in_kernel}/{nlanes} in-kernel of 128"
                )
            except Exception as e:  # pragma: no cover
                extra[f"tpu_decodebig_{name}_error"] = str(e)[:160]

        try:
            bench_tpu_compressbig(extra)
        except Exception as e:  # pragma: no cover
            extra["tpu_compressbig_error"] = str(e)[:160]

        # STRICT lane compressor: byte parity with the reference greedy
        try:
            import lz4tpu.kernels.compress128 as c128m

            old_strict = c128m.STRICT
            c128m.STRICT = True
            # BOTH jit layers cache traces that baked the old STRICT flag
            # (the transposing wrapper inlines the inner call)
            c128m._compress128_jit.clear_cache()
            c128m._compress128_jit_t.clear_cache()
            try:
                # full 32 KiB lanes: the round-4 fused deferred-insert
                # sweep halved the sweep temporaries, so STRICT now fits
                # scoped VMEM at MAX_B (the split sweeps OOMed by 2.6 MB)
                sblk = c128m.MAX_B
                sblocks = [
                    data[i : i + sblk] for i in range(0, len(data), sblk)
                ][:128]
                scomp = c128m.compress_blocks_128(sblocks, hashlog=12)
                refs = [
                    bytes(compress_block(b, 0, U32Table())) for b in sblocks
                ]
                parity = sum(1 for a, b in zip(scomp, refs) if a == b)
                extra["tpu_compress128_strict_parity"] = (
                    f"{parity}/{len(sblocks)} (32 KiB blocks)"
                )
                bps, _r = bench_tpu_compress128(data, blk=sblk)
                extra["tpu_compress128_strict_mbps"] = round(bps / 1e6, 1)
            finally:
                c128m.STRICT = old_strict
                c128m._compress128_jit.clear_cache()
                c128m._compress128_jit_t.clear_cache()
        except Exception as e:  # pragma: no cover
            extra["tpu_compress128_strict_error"] = str(e)[:160]

        try:
            bench_tunnel(extra)
        except Exception as e:  # pragma: no cover
            extra["tunnel_error"] = str(e)[:160]
        try:
            bench_frame_parallel(data, extra)
        except Exception as e:  # pragma: no cover
            extra["frame_parallel_error"] = str(e)[:160]
        frame_ceilings(extra)

        if full:
            for nb in (16, 64):
                try:
                    sub = (blocks * ((nb // len(blocks)) + 1))[:nb]
                    subc = (comp * ((nb // len(comp)) + 1))[:nb]
                    bps = bench_tpu_decode(sub, subc, _decompress_batch_v4_jit)
                    extra[f"tpu_decode_v4_nb{nb}_mbps"] = round(bps / 1e6, 1)
                except Exception as e:  # pragma: no cover
                    extra[f"tpu_decode_v4_nb{nb}_error"] = str(e)[:160]

    if silesia_best:
        # BASELINE.md defines the metric as GB/s on Silesia; the mixed-
        # corpus numbers stay in extra for round-over-round comparison
        value = silesia_best / 1e9
        metric = "tpu_decode_gbps_per_chip_silesia"
    elif tpu_best is not None:
        value = tpu_best / 1e9
        metric = "tpu_decode_gbps_per_chip"
    else:
        value = native_d / 1e9
        metric = "native_decode_gbps_fallback"

    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 4),
                "unit": "GB/s",
                "vs_baseline": round(value / BASELINE_DECODE_GBPS, 4),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
