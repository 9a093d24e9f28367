"""Multi-process (multi-host-shaped) runner test on a 2-process CPU cluster.

Exercises the real ``jax.distributed.initialize`` path
(``parallel.mesh.initialize_distributed``) plus the shard-claiming
runner: two OS processes form a JAX cluster over a localhost coordinator,
each claims every other corpus shard (the DCN-free data-parallel seam of
the frame format, ``framed/compress.rs:57-66``), compresses block-parallel
on its local device mesh, and process 0 finalizes the ordered multi-frame
archive.  The decoded archive must be byte-identical to the input.
"""

import os
import pathlib
import subprocess
import sys
import textwrap

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent

WORKER = textwrap.dedent(
    """
    import os, sys, pathlib
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")

    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    workdir = pathlib.Path(sys.argv[3])

    from lz4tpu.parallel.mesh import initialize_distributed, local_mesh
    got_pid, got_count = initialize_distributed(
        coordinator_address="localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert got_pid == pid and got_count == nproc, (got_pid, got_count)
    assert jax.device_count() == 4 * nproc, jax.device_count()

    mesh = local_mesh()
    from lz4tpu.parallel.runner import run_sharded_compress
    stats = run_sharded_compress(
        workdir / "input.bin",
        workdir / "out.lz4",
        shard_bytes=150_000,
        block_size=1 << 16,
        process_index=pid,
        process_count=nproc,
        mesh=mesh,
        workdir=workdir / "shards",
        finalize=False,
    )
    print("WORKER_OK", pid, stats["compressed_here"], flush=True)
    """
)


@pytest.mark.skipif(
    os.environ.get("LZ4TPU_TEST_PLATFORM", "cpu") != "cpu",
    reason="CPU-cluster test",
)
def test_two_process_distributed_runner(tmp_path):
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    data = (b"multi host shard " * 9000) + bytes(range(256)) * 400
    (tmp_path / "input.bin").write_bytes(data)

    worker = tmp_path / "worker.py"
    worker.write_text(WORKER.format(repo=str(REPO), port=port))

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_COMPILATION_CACHE_DIR", None)

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", str(tmp_path)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"WORKER_OK {i}" in out, out[-2000:]

    # both processes must have produced shards (round-robin claiming)
    n_shards = -(-len(data) // 150_000)
    claims = [int(out.split("WORKER_OK")[1].split()[1]) for out in outs]
    assert sum(claims) == n_shards
    assert all(c > 0 for c in claims)

    # finalize in-process (as process 0 would) and verify the archive
    from lz4tpu.parallel.runner import run_sharded_compress, run_sharded_decompress

    stats = run_sharded_compress(
        tmp_path / "input.bin",
        tmp_path / "out.lz4",
        shard_bytes=150_000,
        block_size=1 << 16,
        workdir=tmp_path / "shards",
        finalize=True,
    )
    assert stats.get("finalized")
    run_sharded_decompress(tmp_path / "out.lz4", tmp_path / "back.bin")
    assert (tmp_path / "back.bin").read_bytes() == data
