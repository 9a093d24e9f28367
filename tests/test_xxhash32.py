"""xxHash32 spec tests: known-answer vectors + streaming == one-shot."""

from lz4tpu.spec.xxhash32 import XXHash32, xxh32

# Known-answer vectors from the upstream xxHash reference implementation.
VECTORS = [
    (b"", 0, 0x02CC5D05),
    (b"a", 0, 0x550D7456),
    (b"abc", 0, 0x32D153FF),
]


def test_known_vectors():
    for data, seed, expected in VECTORS:
        assert xxh32(data, seed) == expected, (data, seed)


def test_streaming_equals_oneshot():
    data = bytes(range(256)) * 41
    for split_sizes in ([1], [3], [7, 13], [16], [15, 1, 16, 33], [100, 1000]):
        h = XXHash32(0)
        pos = 0
        i = 0
        while pos < len(data):
            step = split_sizes[i % len(split_sizes)]
            h.update(data[pos : pos + step])
            pos += step
            i += 1
        assert h.digest() == xxh32(data)


def test_digest_is_idempotent():
    h = XXHash32(0).update(b"hello world")
    assert h.digest() == h.digest()
    h.update(b"!")
    assert h.digest() == xxh32(b"hello world!")


def test_all_lengths_consistent():
    # every tail-length path (0..64 bytes) streaming vs one-shot
    base = bytes((i * 7 + 3) & 0xFF for i in range(64))
    for n in range(len(base) + 1):
        one = xxh32(base[:n])
        h = XXHash32(0)
        for b in base[:n]:
            h.update(bytes([b]))
        assert h.digest() == one, n
