"""Resumable large-corpus runner: shard a huge input over hosts and chips,
compress block-parallel, gather frames in order, survive restarts.

This is the 100 GB-corpus configuration from BASELINE.md: the frame
format's independent blocks make every shard a self-contained compression
problem (``/root/reference/src/framed/compress.rs:57-63``), so a crashed
run only redoes unfinished shards.  Each shard becomes one LZ4 frame
(frames are self-terminating and concatenate back to back,
``framed/mod.rs:3-7``), so the final output is a valid multi-frame .lz4
file that any standard reader decodes.

Multi-host: every process calls ``run_sharded_compress`` with the same
manifest; shards are claimed by (shard_index % process_count ==
process_index).  Progress lives in a manifest directory: one
``shard-NNNNNNN.lz4`` per finished shard plus a final ordered
concatenation — restartable at shard granularity with no coordination
beyond the filesystem.
"""

from __future__ import annotations

import json
import os
import pathlib
import tempfile

from .mesh import make_mesh
from .pipeline import compress_frame_parallel, decompress_frame_parallel


def run_sharded_compress(
    input_path,
    output_path,
    *,
    shard_bytes: int = 256 << 20,
    block_size: int = 1 << 16,
    process_index: int = 0,
    process_count: int = 1,
    mesh=None,
    workdir=None,
    parallel_linked: bool = False,
    finalize: bool = True,
) -> dict:
    """Compress ``input_path`` into a multi-frame .lz4 at ``output_path``.

    Resumable: re-running skips shards whose output already exists.
    Returns a stats dict.  With multiple processes, run one call per
    process (same arguments except ``process_index``); exactly one process
    (index 0) performs the final ordered concatenation when all shards are
    present.
    """
    input_path = pathlib.Path(input_path)
    output_path = pathlib.Path(output_path)
    total = input_path.stat().st_size
    n_shards = max(-(-total // shard_bytes), 1)

    workdir = pathlib.Path(workdir) if workdir else output_path.parent / (
        output_path.name + ".shards"
    )
    workdir.mkdir(parents=True, exist_ok=True)
    manifest_path = workdir / "manifest.json"
    manifest = {
        "input": str(input_path),
        "total_bytes": total,
        "shard_bytes": shard_bytes,
        "block_size": block_size,
        "n_shards": n_shards,
        "parallel_linked": parallel_linked,
    }
    if manifest_path.exists():
        old = json.loads(manifest_path.read_text())
        if {k: old.get(k) for k in manifest} != manifest:
            raise ValueError(
                f"existing manifest at {manifest_path} does not match this run's "
                "parameters; use a fresh workdir"
            )
    else:
        manifest_path.write_text(json.dumps(manifest, indent=2))

    if mesh is None:
        mesh = make_mesh()

    done = skipped = 0
    with open(input_path, "rb") as f:
        for shard in range(n_shards):
            if shard % process_count != process_index:
                continue
            shard_file = workdir / f"shard-{shard:07d}.lz4"
            if shard_file.exists():
                skipped += 1
                continue
            f.seek(shard * shard_bytes)
            data = f.read(shard_bytes)
            frame = compress_frame_parallel(
                data,
                block_size=block_size,
                mesh=mesh,
                parallel_linked=parallel_linked,
            )
            # atomic publish so a crash never leaves a half shard
            with tempfile.NamedTemporaryFile(dir=workdir, delete=False) as tmp:
                tmp.write(frame)
            os.replace(tmp.name, shard_file)
            done += 1

    stats = {"n_shards": n_shards, "compressed_here": done, "skipped": skipped}

    if finalize and process_index == 0:
        shard_files = [workdir / f"shard-{i:07d}.lz4" for i in range(n_shards)]
        if all(p.exists() for p in shard_files):
            with tempfile.NamedTemporaryFile(dir=output_path.parent, delete=False) as out:
                for p in shard_files:
                    out.write(p.read_bytes())
            os.replace(out.name, output_path)
            stats["finalized"] = True
            stats["output_bytes"] = output_path.stat().st_size
    return stats


def run_sharded_decompress(input_path, output_path, mesh=None) -> dict:
    """Decode a multi-frame .lz4 file (frames are self-terminating and
    processed in order; each frame's independent blocks decode in parallel
    on the mesh)."""
    import io

    from ..frame.decompress import LZ4FrameReader

    if mesh is None:
        mesh = make_mesh()
    data = pathlib.Path(input_path).read_bytes()
    out_total = 0
    with open(output_path, "wb") as out:
        pos = 0
        while pos < len(data):
            # find this frame's extent by walking its block chain; every
            # read is length-checked so a truncated/corrupt archive raises
            # InputTruncated instead of silently ending at int(b'') == 0
            reader = LZ4FrameReader(io.BytesIO(data[pos:]), engine="native")
            stream = reader.reader
            from ..frame.decompress import _read_exact

            while True:
                blen = int.from_bytes(_read_exact(stream, 4), "little")
                if blen == 0:
                    if reader.flags.content_checksum:
                        _read_exact(stream, 4)
                    break
                blen &= 0x7FFFFFFF
                _read_exact(stream, blen)
                if reader.flags.block_checksums:
                    _read_exact(stream, 4)
            frame_len = stream.tell()
            chunk = decompress_frame_parallel(data[pos : pos + frame_len], mesh=mesh)
            out.write(chunk)
            out_total += len(chunk)
            pos += frame_len
    return {"output_bytes": out_total}
