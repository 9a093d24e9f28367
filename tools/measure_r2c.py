"""On-chip measurement batch (round-2 continuation session).

Measures, in priority order so partial runs still inform:
  1. compress128 default build on the bench corpus (current baseline).
  2. compress128 TIMING decomposition (fixed round count; deltas between
     variants = per-round component costs).
  3. decode128 REFILL_K=4 (new default, unmeasured) vs REFILL_K=1.

Each config runs in a subprocess so env-derived module constants
(REFILL_K, TIMING) re-evaluate.  Results append to tools/measure_r2c.json
as they land.  Chained fetch-forced protocol throughout.
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent
OUT = ROOT / "tools" / "measure_r2c.json"

CHILD = r"""
import json, os, pathlib, sys, time
sys.path.insert(0, os.environ["LZ4TPU_ROOT"])
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.environ["LZ4TPU_ROOT"] + "/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, os.environ["LZ4TPU_ROOT"])
from bench import make_corpus

mode = os.environ["MEASURE_MODE"]
data = make_corpus(8.0)

if mode in ("compress128", "compress128x"):
    if mode == "compress128x":
        from lz4tpu.kernels import compress128x as c128
    else:
        from lz4tpu.kernels import compress128 as c128
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
        _, ol = c128._compress128_jit(wds, d_n, ri=ri, ro=ro, max_rounds=max_rounds, hashlog=c128.HASHLOG)
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
        # correctness + ratio through the host wrapper (valid-LZ4 check)
        from lz4tpu.native import decompress_block
        comp = c128.compress_blocks_128(blocks)
        ok = sum(
            1 for b, c in zip(blocks, comp)
            if bytes(decompress_block(c, b"", output_limit=len(b) or 64)) == b
        )
        res["roundtrip_ok"] = ok
        res["ratio"] = round(sum(len(c) for c in comp) / total, 4)
    print("RESULT " + json.dumps(res))

elif mode == "decode128":
    from lz4tpu.kernels import decode128 as d128
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
        # correctness through the host wrapper once (other variants skip
        # real work and produce wrong output by design)
        out = d128.decompress_blocks_128(comp, block_maxsize=BLOCK)
        res["exact"] = sum(1 for o, b in zip(out, blocks) if o == b)
    M = 4; best = 0.0
    for _ in range(3):
        a = d_words; t0 = time.perf_counter()
        for _ in range(M): a, ol = chain(a)
        np.asarray(ol[:1]); best = max(best, total / ((time.perf_counter()-t0)/M))
    res["mbps"] = round(best/1e6, 1)
    print("RESULT " + json.dumps(res))
"""

CONFIGS = [
    # two-level place() in both kernels (uncommitted candidate)
    ("d128_place2", "decode128", {}),
    ("c128_place2", "compress128", {}),
    # packed-table candidate first (actionable), then decode decomposition,
    # then the remaining compress timing variants (each compile ~6-30 min)
    ("c128x_p4", "compress128x", {}),
    ("c128x_p8", "compress128x", {"LZ4TPU_C128_PROBES": "8"}),
    ("d128_flush2x", "decode128", {"MEASURE_VARIANT": "flush2x"}),
    ("d128_nogather", "decode128", {"MEASURE_VARIANT": "nogather"}),
    ("d128_noplace", "decode128", {"MEASURE_VARIANT": "noplace"}),
    ("d128_nofar", "decode128", {"MEASURE_VARIANT": "nofar"}),
    ("d128_refill2x", "decode128", {"MEASURE_VARIANT": "refill2x"}),
    ("d128_nonear", "decode128", {"MEASURE_VARIANT": "nonear"}),
    ("c128_default", "compress128", {}),
    ("d128_refillk4", "decode128", {"LZ4TPU_D128_REFILL_K": "4"}),
    ("d128_refillk1", "decode128", {"LZ4TPU_D128_REFILL_K": "1"}),
    ("c128_fixed", "compress128", {"LZ4TPU_C128_TIMING": "fixed"}),
    ("c128_nosweep", "compress128", {"LZ4TPU_C128_TIMING": "fixed,nosweep"}),
    ("c128_noprobeword", "compress128", {"LZ4TPU_C128_TIMING": "fixed,noprobeword"}),
    ("c128_noextend", "compress128", {"LZ4TPU_C128_TIMING": "fixed,noextend"}),
    ("c128_nolit", "compress128", {"LZ4TPU_C128_TIMING": "fixed,nolit"}),
    ("c128_noplace", "compress128", {"LZ4TPU_C128_TIMING": "fixed,noplace"}),
    ("c128_noflush", "compress128", {"LZ4TPU_C128_TIMING": "fixed,noflush"}),
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
            timeout=3600,
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
