"""Experiments tier: measured probe/prototype kernels kept for their
recorded results (PERF_NOTES.md), not wired into any default path.

* ``parse128`` — the original lane-parallel parse-only prototype whose
  33 ns/sequence measurement motivated decode128's architecture; its
  machinery is fully subsumed by ``kernels/decode128.py``.
"""
