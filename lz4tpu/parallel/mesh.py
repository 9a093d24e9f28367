"""Device mesh helpers for data-parallel codec scaling.

The LZ4 frame format's parallelism seam is the block: independent blocks
(``/root/reference/src/framed/compress.rs:57-66``) are self-contained
compression problems, and even linked blocks depend only on the previous
64 KiB (``framed/mod.rs:19-20``).  We shard blocks across a 1-D ``blocks``
mesh axis (data parallel); linked-mode windows travel between neighbouring
devices as a ring halo (``jax.lax.ppermute`` over ICI) — see
``lz4tpu.parallel.pipeline``.

TP/PP/EP have no analogue for a codec and are intentionally out of scope
(SURVEY.md §2).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BLOCK_AXIS = "blocks"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """A 1-D mesh over ``blocks`` covering the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (BLOCK_AXIS,))


def block_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (block) dimension across the mesh."""
    return NamedSharding(mesh, P(BLOCK_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def initialize_distributed(**kwargs) -> None:
    """Multi-host setup (v5e pods): call once per process before device use.

    Thin wrapper over ``jax.distributed.initialize`` so multi-host runners
    only depend on lz4tpu.  Single-host usage never needs this.
    """
    jax.distributed.initialize(**kwargs)
