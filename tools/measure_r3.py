"""On-chip measurement batch (round 3).

Same protocol as measure_r2c.py: each config runs in a subprocess
(env-derived module constants re-evaluate), results append to
tools/measure_r3.json as they land, chained fetch-forced timing.

Run: python tools/measure_r3.py [config ...]
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent
OUT = ROOT / "tools" / "measure_r3.json"

CHILD = r"""
import json, os, pathlib, sys, time
sys.path.insert(0, os.environ["LZ4TPU_ROOT"])
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.environ["LZ4TPU_ROOT"] + "/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp
from bench import make_corpus

mode = os.environ["MEASURE_MODE"]
data = make_corpus(8.0)

if mode.startswith("compress128"):
    modname = os.environ.get("MEASURE_MODULE", "compress128")
    import importlib
    c128 = importlib.import_module(f"lz4tpu.kernels.{modname}")
    blk = c128.MAX_B
    blocks = [data[i:i+blk] for i in range(0, len(data), blk)][:128]
    maxlen = max(len(b) for b in blocks)
    ri = -(-maxlen // 4); ri = -(-ri // c128.GROUP_W) * c128.GROUP_W + c128.PAGE_W
    maxout = maxlen + maxlen // 255 + 16
    ro = (-(-maxout // 4) // c128.RING_W + 2) * c128.RING_W
    max_rounds = maxlen + maxout // c128.CB + maxlen // c128.CB + 256
    arr = np.zeros((c128.LANES, ri*4), np.uint8); n = np.zeros((1, c128.LANES), np.int32)
    for i, b in enumerate(blocks):
        arr[i, :len(b)] = np.frombuffer(b, np.uint8); n[0, i] = len(b)
    w = arr.reshape(c128.LANES, ri, 4).astype(np.uint32)
    words = (w[:,:,0] | (w[:,:,1]<<8) | (w[:,:,2]<<16) | (w[:,:,3]<<24)).astype(np.int32).T
    d_words = jnp.asarray(np.ascontiguousarray(words)); d_n = jnp.asarray(n)
    total = sum(len(b) for b in blocks)

    @jax.jit
    def chain(wds):
        outs = c128._compress128_jit(wds, d_n, ri=ri, ro=ro, max_rounds=max_rounds, hashlog=c128.HASHLOG)
        ol = outs[1]
        return wds ^ (ol.sum()*0), ol

    t0 = time.perf_counter(); _, ol = chain(d_words); np.asarray(ol)
    compile_s = time.perf_counter() - t0
    M = 4; best = 0.0
    for _ in range(3):
        a = d_words; t0 = time.perf_counter()
        for _ in range(M): a, ol = chain(a)
        np.asarray(ol[:1]); best = max(best, total / ((time.perf_counter()-t0)/M))
    res = {"mbps": round(best/1e6, 1), "compile_s": round(compile_s, 1)}
    if not os.environ.get("LZ4TPU_C128_TIMING"):
        from lz4tpu.native import decompress_block
        comp = c128.compress_blocks_128(blocks)
        ok = sum(
            1 for b, c in zip(blocks, comp)
            if bytes(decompress_block(c, b"", output_limit=len(b) or 64)) == b
        )
        res["roundtrip_ok"] = ok
        res["ratio"] = round(sum(len(c) for c in comp) / total, 4)
        if os.environ.get("MEASURE_PARITY"):
            from lz4tpu.native import compress_block as nb
            from lz4tpu.spec.table import U32Table
            ref = [bytes(nb(b, 0, U32Table())) for b in blocks]
            res["parity"] = sum(1 for a, b in zip(comp, ref) if a == b)
    print("RESULT " + json.dumps(res))

elif mode == "decode128":
    modname = os.environ.get("MEASURE_MODULE", "decode128")
    import importlib
    d128 = importlib.import_module(f"lz4tpu.kernels.{modname}")
    from lz4tpu.native import compress_block
    from lz4tpu.spec.table import U32Table
    BLOCK = 1 << 16
    blocks = [data[i:i+BLOCK] for i in range(0, len(data), BLOCK)][:128]
    comp = [bytes(compress_block(b, 0, U32Table())) for b in blocks]
    maxlen = max(len(b) for b in comp)
    rw, ro, _pr = d128.buffer_rows(maxlen, BLOCK)
    max_rounds = d128.round_bound(maxlen, BLOCK)
    arr = np.zeros((128, rw*4), np.uint8); n = np.zeros((1,128), np.int32)
    for i, b in enumerate(comp):
        arr[i, :len(b)] = np.frombuffer(b, np.uint8); n[0, i] = len(b)
    ww = arr.reshape(128, rw, 4).astype(np.uint32)
    words = (ww[:,:,0] | (ww[:,:,1]<<8) | (ww[:,:,2]<<16) | (ww[:,:,3]<<24)).astype(np.int32).T
    d_words = jnp.asarray(np.ascontiguousarray(words)); d_n = jnp.asarray(n)
    total = sum(len(b) for b in blocks)

    variant = os.environ.get("MEASURE_VARIANT", "full")

    @jax.jit
    def chain(wds):
        _, ol, st = d128._decode128_jit(
            wds, d_n, rw=rw, ro=ro, max_rounds=max_rounds,
            output_limit=BLOCK, variant=variant,
        )
        return wds ^ (st.sum()*0), ol

    t0 = time.perf_counter(); _, ol = chain(d_words); np.asarray(ol)
    compile_s = time.perf_counter() - t0
    res = {"compile_s": round(compile_s, 1)}
    if variant in ("full", "refill2x", "flush2x"):
        out = d128.decompress_blocks_128(comp, block_maxsize=BLOCK)
        res["exact"] = sum(1 for o, b in zip(out, blocks) if o == b)
        _, ol2, st2 = d128._decode128_jit(
            d_words, d_n, rw=rw, ro=ro, max_rounds=max_rounds,
            output_limit=BLOCK, variant=variant,
        )
        ol2 = np.asarray(ol2); st2 = np.asarray(st2)[0]
        res["status_ok"] = int((st2 == 0).sum())
        res["rounds_max"] = int(ol2[2].max())
        res["doneat_p50"] = int(np.median(ol2[1][:len(comp)]))
        res["doneat_max"] = int(ol2[1][:len(comp)].max())
    M = 4; best = 0.0
    for _ in range(3):
        a = d_words; t0 = time.perf_counter()
        for _ in range(M): a, ol = chain(a)
        np.asarray(ol[:1]); best = max(best, total / ((time.perf_counter()-t0)/M))
    res["mbps"] = round(best/1e6, 1)
    print("RESULT " + json.dumps(res))
"""

CONFIGS = [
    ("d128_base", "decode128", {}),
    ("c128_base", "compress128", {}),
    ("d128_lsic4", "decode128", {"LZ4TPU_D128_LSIC": "4"}),
    ("d128_refillk2", "decode128", {"LZ4TPU_D128_REFILL_K": "2"}),
    ("d128_refillk8", "decode128", {"LZ4TPU_D128_REFILL_K": "8"}),
    ("c128_hl11", "compress128", {"LZ4TPU_C128_HASHLOG": "11"}),
    ("d128_seq2", "decode128", {}),
    ("d128_seq2_off", "decode128", {"LZ4TPU_D128_SEQ2": "0"}),
    ("d128_seq2_cb8", "decode128", {"LZ4TPU_D128_CB": "8"}),
    ("d128_seq2_cb32", "decode128", {"LZ4TPU_D128_CB": "32"}),
    ("d128_seq2_b", "decode128", {}),
    ("d128_consol", "decode128", {}),
    ("c128_consol", "compress128", {}),
    ("c128_strict", "compress128", {"LZ4TPU_C128_STRICT": "1", "MEASURE_PARITY": "1"}),
]


def main() -> None:
    only = sys.argv[1:] or None
    results = {}
    if OUT.exists():
        results = json.loads(OUT.read_text())
    for name, mode, env in CONFIGS:
        if only and name not in only:
            continue
        if name in results and "error" not in results[name]:
            print(f"skip {name} (done)", flush=True)
            continue
        e = dict(os.environ)
        e.update(env)
        e["MEASURE_MODE"] = mode
        e["LZ4TPU_ROOT"] = str(ROOT)
        print(f"=== {name} ===", flush=True)
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, "-c", CHILD], env=e, capture_output=True, text=True,
            timeout=5400,
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("RESULT ")]
        if line:
            results[name] = json.loads(line[-1][7:])
        else:
            results[name] = {"error": (p.stderr or p.stdout)[-400:]}
        results[name]["wall_s"] = round(time.time() - t0, 1)
        OUT.write_text(json.dumps(results, indent=1))
        print(name, results[name], flush=True)


if __name__ == "__main__":
    main()
