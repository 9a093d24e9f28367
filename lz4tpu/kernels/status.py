"""Shared per-block status codes for the Pallas codec kernels.

Kernels cannot raise, so the typed ``DecodeError`` kinds of the spec
(``/root/reference/src/raw/decompress.rs:8-17``) travel out of the chip as
a per-block int32 status validated on the host — the kernel-level analogue
of the reference's hostile-input contract (``decompress.rs:53-57``).
"""

from ..spec.block import DecodeError

OK = 0
ERR_UNEXPECTED_END = 1
ERR_MEMORY_LIMIT = 2
ERR_ZERO_OFFSET = 3
ERR_INVALID_OFFSET = 4

STATUS_TO_KIND = {
    ERR_UNEXPECTED_END: DecodeError.KIND_UNEXPECTED_END,
    ERR_MEMORY_LIMIT: DecodeError.KIND_MEMORY_LIMIT,
    ERR_ZERO_OFFSET: DecodeError.KIND_ZERO_OFFSET,
    ERR_INVALID_OFFSET: DecodeError.KIND_INVALID_OFFSET,
}
