"""Interop oracle bindings against the system C lz4 (liblz4.so).

The reference's single most important property is byte parity with the C
implementation (``/root/reference/README.md:4,14``, exercised by
``/root/reference/tests/output_equivalence.rs:58-101`` via the lz4 CLI).
This image has no lz4 CLI but does ship ``liblz4.so.1.9.4``; these ctypes
bindings reproduce the CLI's behavior through the library APIs so the
interop suite actually executes.
"""

from .liblz4 import (  # noqa: F401
    available,
    lz4_compress_default,
    lz4_compress_fast,
    lz4_compress_hc,
    lz4_decompress_safe,
    lz4f_compress_frame_streaming,
    lz4f_decompress_frame,
)
