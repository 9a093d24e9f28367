"""Pure-Python/NumPy executable spec of the LZ4 format — the test oracle."""

from .block import (
    DecodeError,
    Incompressible,
    compress_block,
    decompress_block,
)
from .table import U16Table, U32Table, hash_all_u32, prime_u32_table
from .xxhash32 import XXHash32, xxh32
