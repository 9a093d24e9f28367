"""``dolz4`` — file-to-file LZ4 frame compression.

CLI equivalent of the reference example (``/root/reference/examples/dolz4.rs``)
with real flags instead of edit-the-source configuration: engine selection
(spec / native / tpu / tpu-parallel), block size, linked blocks, checksums,
dictionaries, acceleration.
"""

from __future__ import annotations

import argparse
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="dolz4", description="Compress a file into an LZ4 frame."
    )
    p.add_argument("input", help="input file ('-' for stdin)")
    p.add_argument("output", help="output file ('-' for stdout)")
    p.add_argument(
        "--engine",
        default="auto",
        choices=["auto", "spec", "native", "tpu", "tpu-parallel"],
        help="codec backend (tpu-parallel compresses all blocks in one mesh batch)",
    )
    p.add_argument("--block-size", type=int, default=4 * 1024 * 1024,
                   help="64KiB/256KiB/1MiB/4MiB (bytes)")
    p.add_argument("--linked-blocks", action="store_true",
                   help="linked (dependent) blocks: better ratio, no seeking")
    p.add_argument("--block-checksums", action="store_true")
    p.add_argument("--no-content-checksum", action="store_true")
    p.add_argument("--no-content-size", action="store_true")
    p.add_argument("--acceleration", type=int, default=1)
    p.add_argument("--level", type=int, default=None,
                   help="high-compression level (2-12): hash-chain + lazy parse")
    p.add_argument("--dictionary", help="preset dictionary file")
    p.add_argument("--dictionary-id", type=int, default=0)
    p.add_argument(
        "--lane-kernel",
        action="store_true",
        help="tpu-parallel only: lane-parallel compressor (128 blocks per "
        "kernel step; valid LZ4, not byte-identical to the reference parse)",
    )
    p.add_argument("-v", "--verbose", action="store_true")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    data = (
        sys.stdin.buffer.read()
        if args.input == "-"
        else open(args.input, "rb").read()
    )

    t0 = time.perf_counter()
    if args.engine == "tpu-parallel":
        from lz4tpu.parallel.pipeline import compress_frame_parallel

        if args.level:
            raise SystemExit("--level is a host-parse feature; use engine native")
        frame = compress_frame_parallel(
            data,
            block_size=args.block_size,
            content_checksum=not args.no_content_checksum,
            block_checksums=args.block_checksums,
            with_content_size=not args.no_content_size,
            acceleration=args.acceleration,
            parallel_linked=args.linked_blocks,
            dictionary=(
                open(args.dictionary, "rb").read() if args.dictionary else None
            ),
            dictionary_id=args.dictionary_id if args.dictionary_id else None,
            lane_kernel=args.lane_kernel,
        )
    else:
        from lz4tpu import CompressionSettings

        s = (
            CompressionSettings()
            .engine(args.engine)
            .block_size(args.block_size)
            .independent_blocks(not args.linked_blocks)
            .block_checksums(args.block_checksums)
            .content_checksum(not args.no_content_checksum)
            .acceleration(args.acceleration)
            .level(args.level)
        )
        if args.dictionary:
            s.dictionary(args.dictionary_id, open(args.dictionary, "rb").read())
        frame = s.compress_bytes(data, with_size=not args.no_content_size)
    dt = time.perf_counter() - t0

    if args.output == "-":
        sys.stdout.buffer.write(frame)
    else:
        with open(args.output, "wb") as f:
            f.write(frame)
    if args.verbose:
        ratio = len(frame) / max(len(data), 1)
        print(
            f"{len(data)} -> {len(frame)} bytes (ratio {ratio:.3f}) "
            f"in {dt:.3f}s = {len(data) / dt / 1e6:.1f} MB/s",
            file=sys.stderr,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
