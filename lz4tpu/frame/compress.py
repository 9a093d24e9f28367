"""LZ4 frame compression — the host-side frame multiplexer.

Executable spec of ``/root/reference/src/framed/compress.rs``: the
``CompressionSettings`` builder (``compress.rs:36-134``), frame header
emission with xxh32 header checksum (``compress.rs:159-200``), dictionary
priming (``compress.rs:202-214``), the per-block loop with the
incompressible-block fallback capping output at input size
(``compress.rs:221-263``), independent-vs-linked table/window maintenance
(``compress.rs:265-275``), and the EndMark + content checksum trailer
(``compress.rs:277-281``).

The actual block codec is pluggable (``engine=``): the NumPy executable spec,
the C++ native engine, or the TPU Pallas path — all bit-exact with each
other.  TPU batch compression of whole frames lives in
``lz4tpu.parallel.pipeline``; this module is the streaming host API.
"""

from __future__ import annotations

import io

from ..spec.block import Incompressible
from ..spec.table import U32Table, prime_u32_table
from ..spec.xxhash32 import xxh32
from ..utils.hashing import make_hasher
from .errors import InvalidBlockSize
from .header import INCOMPRESSIBLE, MAGIC, WINDOW_SIZE, BlockDescriptor, Flags


def _resolve_engine(name):
    """Map an engine name to a ``compress_block`` callable.

    ``auto`` prefers the C++ native engine and falls back to the NumPy spec.
    """
    if callable(name):
        return name
    if name in ("auto", "native"):
        try:
            from ..native import compress_block as native_compress_block

            return native_compress_block
        except Exception:
            if name == "native":
                raise
    if name == "tpu":
        from ..kernels.compress import compress_block_tpu

        return compress_block_tpu
    from ..spec.block import compress_block as spec_compress_block

    return spec_compress_block


def _resolve_hc_engine(name):
    """HC block compressor for the configured engine.  The TPU engine falls
    back to the native host parse for HC blocks (TPU HC port deferred; the
    decode side is engine-independent)."""
    if name == "spec":
        from ..spec.hc import compress_block_hc as spec_hc

        return spec_hc
    try:
        from ..native import compress_block_hc as native_hc

        return native_hc
    except Exception:
        if name == "native":
            raise
        from ..spec.hc import compress_block_hc as spec_hc

        return spec_hc


class CompressionSettings:
    """Builder-style frame compression configuration
    (mirrors ``CompressionSettings``, ``compress.rs:36-134``).

    Defaults match the reference: independent blocks on, block checksums
    off, content checksum on, 4 MiB blocks, no dictionary
    (``compress.rs:44-55``).
    """

    def __init__(self):
        self._independent_blocks = True
        self._block_checksums = False
        self._content_checksum = True
        self._block_size = 4 * 1024 * 1024
        self._dictionary = None
        self._dictionary_id = None
        self._acceleration = 1
        self._level = None
        self._engine = "auto"
        self._threads = 0  # 0 = auto (cpu count) for independent blocks

    # -- builder setters (reference naming) ---------------------------------

    def independent_blocks(self, v: bool) -> "CompressionSettings":
        """Independent blocks (default) never reference previous blocks;
        linked blocks may reach back 64 KiB for better ratio but lose
        seekability (``compress.rs:57-66``)."""
        self._independent_blocks = v
        return self

    def block_checksums(self, v: bool) -> "CompressionSettings":
        self._block_checksums = v
        return self

    def content_checksum(self, v: bool) -> "CompressionSettings":
        self._content_checksum = v
        return self

    def block_size(self, v: int) -> "CompressionSettings":
        """Only 4 MiB, 1 MiB, 256 KiB and 64 KiB are valid (``compress.rs:93-100``)."""
        self._block_size = v
        return self

    def dictionary(self, dict_id: int, dict_bytes) -> "CompressionSettings":
        """Preset dictionary + application-specific id (``compress.rs:102-117``).
        Only the trailing 64 KiB can ever be referenced."""
        self._dictionary_id = dict_id
        self._dictionary = bytes(dict_bytes)
        return self

    def dictionary_id_nonsense_override(self, dict_id) -> "CompressionSettings":
        """Set/clear the dictionary id independently of the dictionary —
        the LZ4 CLI never writes one (``compress.rs:119-133``)."""
        self._dictionary_id = dict_id
        return self

    def acceleration(self, v: int) -> "CompressionSettings":
        """Match-search skip acceleration; 1 is the C default.  Higher values
        trade ratio for speed exactly like ``LZ4_compress_fast`` (scales the
        initial skip counter, ``raw/compress/mod.rs:147-148,174``)."""
        self._acceleration = max(int(v), 1)
        return self

    def level(self, v: int | None) -> "CompressionSettings":
        """High-compression level (the reference has no levels; BASELINE
        config #4 requires them).  ``None``/``1`` = the reference's greedy
        parse; ``>= 2`` = hash-chain + lazy parse (``spec/hc.py``) with
        search depth ``2**(level-1)``.  Every block is compressed with both
        parses and the smaller payload wins, so levelled output is never
        larger than the reference's greedy output."""
        self._level = None if v is None or int(v) <= 1 else int(v)
        return self

    def engine(self, name) -> "CompressionSettings":
        """Block-codec backend: 'auto', 'spec', 'native', 'tpu', or a callable."""
        self._engine = name
        return self

    def threads(self, n: int) -> "CompressionSettings":
        """Worker threads for INDEPENDENT-block frames on the native
        engine (0 = auto: one per CPU).  Each block compresses with its
        own template-table copy, so the output is byte-identical to the
        serial writer — independent blocks are the format's own
        parallelism seam (``compress.rs:57-66``); the reference itself
        is single-threaded.  Linked mode ignores this (the encoder table
        is a sequential chain across blocks).  ``1`` forces serial."""
        self._threads = max(int(n), 0)
        return self

    # -- compression entry points (compress.rs:137-157) ---------------------

    def compress(self, reader, writer) -> None:
        """Compress without a content-size header field."""
        self._compress_internal(_as_reader(reader), _as_writer(writer), None)

    def compress_with_size_unchecked(self, reader, writer, content_size: int) -> None:
        self._compress_internal(_as_reader(reader), _as_writer(writer), content_size)

    def compress_with_size(self, reader, writer) -> None:
        """Learn the content size by seeking to the end first
        (``compress.rs:147-157``)."""
        reader = _as_reader(reader)
        start = reader.tell()
        end = reader.seek(0, io.SEEK_END)
        reader.seek(start)
        self._compress_internal(reader, _as_writer(writer), end - start)

    def compress_bytes(self, data, with_size: bool = True) -> bytes:
        """Convenience one-shot: bytes in, frame bytes out."""
        out = io.BytesIO()
        if with_size:
            self.compress_with_size_unchecked(io.BytesIO(bytes(data)), out, len(data))
        else:
            self.compress(io.BytesIO(bytes(data)), out)
        return out.getvalue()

    # -- the frame writer itself (compress.rs:159-282) ----------------------

    def _compress_internal(self, reader, writer, content_size) -> None:
        compress_block = _resolve_engine(self._engine)
        compress_block_hc = (
            _resolve_hc_engine(self._engine) if self._level is not None else None
        )

        flags = Flags(
            independent_blocks=self._independent_blocks,
            block_checksums=self._block_checksums,
            content_checksum=self._content_checksum,
            content_size=content_size is not None,
            dictionary_id=self._dictionary_id is not None,
        )
        content_hasher = make_hasher(0) if self._content_checksum else None

        bd = BlockDescriptor.for_block_maxsize(self._block_size)
        if bd is None:
            raise InvalidBlockSize(f"{self._block_size} is not a valid LZ4 block size")

        header = bytearray()
        header.extend(MAGIC.to_bytes(4, "little"))
        header.append(flags.encode())
        header.append(bd.byte)
        if content_size is not None:
            header.extend(int(content_size).to_bytes(8, "little"))
        if self._dictionary_id is not None:
            header.extend(int(self._dictionary_id).to_bytes(4, "little"))
        header.append((xxh32(header[4:]) >> 8) & 0xFF)
        writer.write(bytes(header))

        # dictionary priming: template table + block initializer
        template_table = U32Table()
        block_initializer = b""
        if self._dictionary is not None:
            prime_u32_table(template_table, self._dictionary)
            block_initializer = self._dictionary

        if self._threads != 1 and flags.independent_blocks:
            import os as _os

            nthreads = self._threads or min(_os.cpu_count() or 1, 8)
            if nthreads > 1 and self._engine in ("auto", "native"):
                try:
                    from ..native import compress_block as _probe  # noqa: F401

                    self._compress_threaded(
                        reader, writer, flags, content_hasher,
                        compress_block, compress_block_hc,
                        template_table, block_initializer, nthreads,
                    )
                    return
                except ImportError:
                    pass  # native engine unavailable: serial spec path

        in_buffer = bytearray(block_initializer)
        table = template_table.copy()
        while True:
            window_offset = len(in_buffer)
            in_buffer.extend(_read_up_to(reader, self._block_size))
            read_bytes = len(in_buffer) - window_offset
            if read_bytes == 0:
                break

            if content_hasher is not None:
                content_hasher.update(in_buffer[window_offset:])

            data = bytes(in_buffer)
            # the greedy parse always runs (even at level >= 2) so the
            # encoder table state evolves identically across blocks in
            # linked mode; on cap-abort it has still applied all mutations
            # up to the abort point, like the reference's NoPartialWrites
            compressed = None
            try:
                compressed = bytes(
                    compress_block(
                        data,
                        cursor=window_offset,
                        table=table,
                        acceleration=self._acceleration,
                        cap=read_bytes,
                    )
                )
            except Incompressible:
                pass
            if compress_block_hc is not None:
                hc_cap = len(compressed) if compressed is not None else read_bytes
                try:
                    hc = bytes(
                        compress_block_hc(
                            data,
                            cursor=window_offset,
                            level=self._level,
                            cap=hc_cap,
                        )
                    )
                    if compressed is None or len(hc) < len(compressed):
                        compressed = hc
                except Incompressible:
                    pass
            if compressed is not None:
                writer.write(len(compressed).to_bytes(4, "little"))
                payload = compressed
            else:
                writer.write((read_bytes | INCOMPRESSIBLE).to_bytes(4, "little"))
                payload = data[window_offset:]

            writer.write(payload)
            if flags.block_checksums:
                writer.write(xxh32(payload).to_bytes(4, "little"))

            if flags.independent_blocks:
                in_buffer = bytearray(block_initializer)
                table = template_table.copy()
            elif len(in_buffer) > WINDOW_SIZE:
                forget = len(in_buffer) - WINDOW_SIZE
                table.slide(forget)
                del in_buffer[:forget]

        writer.write((0).to_bytes(4, "little"))
        if content_hasher is not None:
            writer.write(content_hasher.digest().to_bytes(4, "little"))

    def _compress_threaded(
        self, reader, writer, flags, content_hasher,
        compress_block, compress_block_hc,
        template_table, block_initializer, nthreads,
    ) -> None:
        """Independent-block body of ``_compress_internal`` fanned over a
        thread pool — byte-identical output (each block starts from the
        same template table and dictionary initializer as the serial
        loop; blocks are written strictly in frame order).  The native
        codec releases the GIL for the whole parse, so 4 workers run 4
        blocks truly concurrently; content hashing and block emission
        stay on the caller thread in stream order."""
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        window_offset = len(block_initializer)
        initializer = bytes(block_initializer)

        def job(data, read_bytes):
            table = template_table.copy()
            compressed = None
            try:
                compressed = bytes(
                    compress_block(
                        data,
                        cursor=window_offset,
                        table=table,
                        acceleration=self._acceleration,
                        cap=read_bytes,
                    )
                )
            except Incompressible:
                pass
            if compress_block_hc is not None:
                hc_cap = (
                    len(compressed) if compressed is not None else read_bytes
                )
                try:
                    hc = bytes(
                        compress_block_hc(
                            data,
                            cursor=window_offset,
                            level=self._level,
                            cap=hc_cap,
                        )
                    )
                    if compressed is None or len(hc) < len(compressed):
                        compressed = hc
                except Incompressible:
                    pass
            return compressed

        def emit(fut, data, read_bytes):
            compressed = fut.result()
            if compressed is not None:
                writer.write(len(compressed).to_bytes(4, "little"))
                payload = compressed
            else:
                writer.write((read_bytes | INCOMPRESSIBLE).to_bytes(4, "little"))
                payload = data[window_offset:]
            writer.write(payload)
            if flags.block_checksums:
                writer.write(xxh32(payload).to_bytes(4, "little"))

        with ThreadPoolExecutor(nthreads) as pool:
            pending = deque()
            while True:
                chunk = _read_up_to(reader, self._block_size)
                if not chunk:
                    break
                if content_hasher is not None:
                    content_hasher.update(chunk)
                data = (initializer + chunk) if initializer else chunk
                pending.append(
                    (pool.submit(job, data, len(chunk)), data, len(chunk))
                )
                if len(pending) > 2 * nthreads:
                    emit(*pending.popleft())
            while pending:
                emit(*pending.popleft())

        writer.write((0).to_bytes(4, "little"))
        if content_hasher is not None:
            writer.write(content_hasher.digest().to_bytes(4, "little"))


def _read_up_to(reader, n: int) -> bytes:
    """``Read::take(n).read_to_end`` semantics: keep reading until n bytes
    or EOF (``compress.rs:224-227``)."""
    chunks = []
    remaining = n
    while remaining:
        chunk = reader.read(remaining)
        if not chunk:
            break
        chunks.append(chunk)
        remaining -= len(chunk)
    return b"".join(chunks)


def _as_reader(obj):
    if isinstance(obj, (bytes, bytearray, memoryview)):
        return io.BytesIO(bytes(obj))
    return obj


def _as_writer(obj):
    return obj
