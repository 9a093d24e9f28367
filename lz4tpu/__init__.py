"""lz4tpu — a TPU-native LZ4 compression framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``main--/rust-lz-fear`` (the reference pure-Rust LZ4 library):

* raw LZ4 block codec — greedy hash-table match finder and sequence
  emitter, literal/overlap-copy decompressor — with byte-for-byte output
  parity with the C reference implementation
* the full LZ4 frame format: frame descriptor, 64 KiB–4 MiB blocks,
  independent and linked block modes, xxHash32 header/block/content
  checksums, preset dictionaries, incompressible-block fallback
* three interchangeable, differentially-tested codec engines:
  ``spec`` (NumPy executable spec / oracle), ``native`` (C++ host
  engine), and ``tpu`` (Pallas kernels operating on many blocks per chip)
* data-parallel scaling across TPU meshes with ring-halo linked blocks
  (``lz4tpu.parallel``)

Public API mirrors the reference crate root (``/root/reference/src/lib.rs:13``).
"""

from .frame.compress import CompressionSettings
from .frame.decompress import LZ4FrameIoReader, LZ4FrameReader, decompress_frame
from .frame.errors import (
    CompressionError,
    DecompressionError,
    HeaderParseError,
    LZ4Error,
)
from .frame.header import MAGIC, WINDOW_SIZE
from .spec.block import DecodeError, compress_block, decompress_block
from .spec.hc import compress_block_hc
from .spec.xxhash32 import XXHash32, xxh32

__version__ = "0.2.0"

__all__ = [
    "CompressionSettings",
    "LZ4FrameReader",
    "LZ4FrameIoReader",
    "decompress_frame",
    "compress_block",
    "compress_block_hc",
    "decompress_block",
    "DecodeError",
    "LZ4Error",
    "CompressionError",
    "DecompressionError",
    "HeaderParseError",
    "XXHash32",
    "xxh32",
    "MAGIC",
    "WINDOW_SIZE",
    "__version__",
]
