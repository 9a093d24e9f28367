"""Record mesh-scaling proxy walls into MULTICHIP_SCALING.json.

Runs the full sharded compress+decompress pipeline on virtual CPU meshes
of 1/2/4/8 devices over two corpus sizes and records wall times plus the
work-division facts (block counts, shards per device).  On virtual CPU
devices the walls validate the SCHEDULE (work divides, no serialization
cliffs), not hardware speedup — real-slice scaling needs real chips
(documented limitation; see SURVEY §2 parallelism row).
"""

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from lz4tpu.parallel.mesh import make_mesh
from lz4tpu.parallel.pipeline import (
    compress_frame_parallel,
    decompress_frame_parallel,
)


def _data(n_bytes: int) -> bytes:
    rng = np.random.default_rng(11)
    motif = bytes(rng.integers(0, 256, 512, dtype=np.uint8))
    out = bytearray()
    while len(out) < n_bytes:
        out += motif * int(rng.integers(1, 5))
        out += bytes(rng.integers(0, 256, 90, dtype=np.uint8))
    return bytes(out[:n_bytes])


def main():
    results = []
    for size_mb in (4, 16):
        data = _data(size_mb << 20)
        for n_dev in (1, 2, 4, 8):
            mesh = make_mesh(n_dev)
            bs = 1 << 16
            # warm (compile cache per mesh shape); lane_kernel=False keeps
            # every mesh size on the SAME engine (the sharded scalar
            # kernels) — the 1-device auto route would pick the lane
            # decoder in CPU-interpret mode, which is not a scaling datum
            f = compress_frame_parallel(data[: 4 * bs], block_size=bs, mesh=mesh)
            decompress_frame_parallel(f, mesh=mesh, lane_kernel=False)
            t0 = time.perf_counter()
            frame = compress_frame_parallel(data, block_size=bs, mesh=mesh)
            t_c = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = decompress_frame_parallel(frame, mesh=mesh, lane_kernel=False)
            t_d = time.perf_counter() - t0
            assert out == data
            n_blocks = -(-len(data) // bs)
            results.append({
                "size_mb": size_mb, "n_dev": n_dev,
                "blocks": n_blocks,
                "blocks_per_dev": -(-n_blocks // n_dev),
                "compress_s": round(t_c, 3),
                "decompress_s": round(t_d, 3),
            })
            print(results[-1])
    path = pathlib.Path(__file__).resolve().parents[1] / "MULTICHIP_SCALING.json"
    path.write_text(json.dumps({
        "note": (
            "virtual 8-device CPU mesh: walls validate the schedule "
            "(shard counts divide, waves run), NOT hardware scaling — "
            "no multi-chip hardware in this environment"
        ),
        "results": results,
    }, indent=1))
    print("wrote", path)


if __name__ == "__main__":
    main()
