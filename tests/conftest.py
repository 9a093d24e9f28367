"""Test configuration.

Kernels and parallel tests run on a virtual 8-device CPU mesh so the full
multi-chip sharding path compiles and executes without TPU hardware
(JAX_PLATFORMS=cpu + --xla_force_host_platform_device_count=8).  Set
LZ4TPU_TEST_PLATFORM=tpu to run the kernel tests on a real chip instead.
"""

import os
import sys

_platform = os.environ.get("LZ4TPU_TEST_PLATFORM", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if _platform == "tpu":
    # the tunneled TPU (axon plugin) is only selected when JAX_PLATFORMS
    # is fully unset: naming "tpu" picks the real libtpu plugin (which
    # finds no local chip), and naming "axon" races plugin registration
    os.environ.pop("JAX_PLATFORMS", None)
else:
    # pin through the config API as well: the axon plugin overrides the
    # environment variable
    os.environ["JAX_PLATFORMS"] = _platform
    jax.config.update("jax_platforms", _platform)

import random

import pytest


@pytest.fixture
def rng():
    return random.Random(0x124)


def make_corpus_sample(seed: int, size: int) -> bytes:
    """Deterministic mixed-compressibility data: text-ish runs, repeated
    motifs, random stretches — exercises literals, short/long matches,
    overlaps and incompressible spans."""
    r = random.Random(seed)
    out = bytearray()
    motifs = [
        b"the quick brown fox jumps over the lazy dog. ",
        b"ABCDABCDABCD",
        bytes(range(32)),
        b"\x00" * 17,
        b"lorem ipsum dolor sit amet, consectetur adipiscing elit, ",
    ]
    while len(out) < size:
        choice = r.random()
        if choice < 0.35:
            m = r.choice(motifs)
            out.extend(m * r.randint(1, 12))
        elif choice < 0.55 and len(out) > 8:
            # explicit back-reference-ish repetition of recent output
            start = r.randint(0, len(out) - 1)
            ln = r.randint(1, min(200, len(out) - start))
            out.extend(out[start : start + ln])
        elif choice < 0.8:
            out.extend(bytes(r.getrandbits(8) for _ in range(r.randint(1, 60))))
        else:
            out.extend(bytes([r.getrandbits(8)]) * r.randint(3, 90))
    return bytes(out[:size])


@pytest.fixture
def corpus_sample():
    return make_corpus_sample
