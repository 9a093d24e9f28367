"""Lane-compress batch planning (pipeline.plan_lane_compress_batches).

The merged-independent "compressbig" geometry (cpb = block_size/chunk,
e.g. 128 at 4 MiB blocks) must route every interior chunk through the
device-built windowed dispatch and gather only the output-block heads
(j % cpb < k) into host-packed batches — the round-4 uniform 128-stripe
plan never used the windowed path at all (every stripe started at a
head), shipping ~3x the corpus as host-packed [window|block] buffers.
"""

import pytest

from lz4tpu.parallel.pipeline import plan_lane_compress_batches


def _check_coverage(plan, n_blocks, cpb, k, linked):
    seen = []
    for item in plan:
        if item[0] == "w":
            _, s, nb = item
            assert 0 < nb <= 128
            assert s >= k  # dispatch_compress_windowed precondition
            idxs = list(range(s, s + nb))
            if not linked:
                for i in idxs:  # full window inside the output block
                    assert i % cpb >= k, (i, cpb, k)
            seen.extend(idxs)
        else:
            assert item[0] == "h"
            assert 0 < len(item[1]) <= 128
            seen.extend(item[1])
    assert sorted(seen) == list(range(n_blocks))


@pytest.mark.parametrize(
    "n_blocks,cpb,k,linked",
    [
        (1024, 128, 2, False),  # compressbig: 32 MiB / 4 MiB blocks / 32 KiB chunks
        (1024, 8, 2, False),  # 256 KiB blocks
        (130, 128, 2, False),  # one full output block + a stub
        (1024, 128, 2, True),  # linked frame
        (3, 128, 2, False),  # all heads
        (200, 4, 2, False),  # head-heavy (half the chunks are heads)
        (129, 129, 2, False),  # cpb not a multiple of 128
    ],
)
def test_plan_covers_every_chunk_once(n_blocks, cpb, k, linked):
    plan = plan_lane_compress_batches(n_blocks, cpb, k, linked)
    _check_coverage(plan, n_blocks, cpb, k, linked)


def test_compressbig_plan_is_windowed_dominated():
    plan = plan_lane_compress_batches(1024, 128, 2, False)
    w_chunks = sum(nb for kind, *rest in plan if kind == "w" for nb in [rest[1]])
    h_chunks = sum(len(rest[0]) for kind, *rest in plan if kind == "h")
    assert w_chunks == 1024 - 16  # 8 output blocks x 126 interiors
    assert h_chunks == 16
