"""``delz4`` — file-to-file LZ4 frame decompression.

CLI equivalent of ``/root/reference/examples/delz4.rs``.
"""

from __future__ import annotations

import argparse
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="delz4", description="Decompress an LZ4 frame file."
    )
    p.add_argument("input", help="input .lz4 file ('-' for stdin)")
    p.add_argument("output", help="output file ('-' for stdout)")
    p.add_argument(
        "--engine",
        default="auto",
        choices=["auto", "spec", "native", "tpu", "tpu-parallel"],
    )
    p.add_argument("--dictionary", help="preset dictionary file")
    p.add_argument("-v", "--verbose", action="store_true")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    frame = (
        sys.stdin.buffer.read()
        if args.input == "-"
        else open(args.input, "rb").read()
    )
    dictionary = open(args.dictionary, "rb").read() if args.dictionary else b""

    t0 = time.perf_counter()
    if args.engine == "tpu-parallel":
        from lz4tpu.parallel.pipeline import decompress_frame_parallel

        data = decompress_frame_parallel(frame, dictionary=dictionary)
    else:
        from lz4tpu import decompress_frame

        data = decompress_frame(frame, dictionary=dictionary, engine=args.engine)
    dt = time.perf_counter() - t0

    if args.output == "-":
        sys.stdout.buffer.write(data)
    else:
        with open(args.output, "wb") as f:
            f.write(data)
    if args.verbose:
        print(
            f"{len(frame)} -> {len(data)} bytes in {dt:.3f}s = "
            f"{len(data) / dt / 1e6:.1f} MB/s",
            file=sys.stderr,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
