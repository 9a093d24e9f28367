"""STRICT lane-compressor mode: byte-for-byte parity with the reference
greedy parse (compress/mod.rs:147-260) — the lane kernel becomes the
accelerated parity path (the scalar kernel remains the other one).

Mechanics proven against the oracle in tools/sim_c128_strict.py; this
differentially tests the kernel: exact 5-byte-hash buckets, zero-init
candidate quirk, insert suppression after the round's first tag hit,
exact false-hit resume, unbounded backward extension (PH_BT rounds for
page-gated/saturated cases), cursor-2 reinsert.
"""

import numpy as np
import pytest


@pytest.mark.slow
def test_compress128_strict_byte_parity(monkeypatch, corpus_sample):
    import lz4tpu.kernels.compress128 as c128
    from lz4tpu.native import compress_block as native_compress
    from lz4tpu.spec.table import U32Table

    monkeypatch.setattr(c128, "STRICT", True)
    c128._compress128_jit.clear_cache()
    rng = np.random.default_rng(9)
    payloads = [
        corpus_sample(5000, 2500),
        corpus_sample(5001, 1800),
        rng.integers(0, 256, 1500, dtype=np.uint8).tobytes(),
        b"\x00" * 1200 + corpus_sample(5002, 600),
        open("/usr/bin/g++", "rb").read()[:2000],
        b"abcd" * 700,
        # multi-group block: page-gated backward extensions take the
        # PH_BT continuation rounds
        corpus_sample(5003, 8000),
        b"hello",
        b"",
    ]
    try:
        comp = c128.compress_blocks_128(payloads, hashlog=12)
    finally:
        c128._compress128_jit.clear_cache()
    for i, (p, c) in enumerate(zip(payloads, comp)):
        if not p:
            assert c == b"\x00"
            continue
        ref = bytes(native_compress(p, 0, U32Table()))
        assert c == ref, f"lane strict output diverges from C parse at block {i}"
