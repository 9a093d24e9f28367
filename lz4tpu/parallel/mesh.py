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


def local_mesh() -> Mesh:
    """A 1-D ``blocks`` mesh over THIS process's devices.

    The multi-host runner pattern is data-parallel at two levels: shards
    of the corpus distribute across processes by index
    (``runner.run_sharded_compress``), and each process compresses its
    shards block-parallel over its local chips.  No cross-host collective
    is needed for independent blocks, so DCN traffic is zero — exactly the
    scaling seam the frame format provides (``framed/compress.rs:57-66``).
    """
    return Mesh(np.asarray(jax.local_devices()), (BLOCK_AXIS,))


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    **kwargs,
) -> tuple[int, int]:
    """Multi-host setup (v5e pods): call once per process before device use.

    Wraps ``jax.distributed.initialize`` so multi-host runners only depend
    on lz4tpu, and returns ``(process_index, process_count)`` for use as
    the runner's shard-claiming coordinates.  Single-host usage never
    needs this.  Exercised by tests/test_multiprocess.py on a 2-process
    CPU cluster.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )
    return jax.process_index(), jax.process_count()
