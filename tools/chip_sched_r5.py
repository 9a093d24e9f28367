"""Round-5 headline measurement: sched decode with per-batch rw buckets
(mid mirror active on sequence-dense batches) on the 64 MiB mixed corpus
AND the Silesia stand-in (the BASELINE.md metric)."""

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    extra = {}
    from bench import bench_silesia_decode, bench_tpu_decode128_sched

    try:
        bps = bench_tpu_decode128_sched(extra)
        print("mixed 64m best:", round(bps / 1e6, 1), "MB/s", flush=True)
    except Exception as e:
        extra["mixed_error"] = str(e)[:300]
    try:
        sbps, _hc, _hb = bench_silesia_decode(extra)
        print("silesia best:", round(sbps / 1e6, 1), "MB/s", flush=True)
    except Exception as e:
        extra["silesia_error"] = str(e)[:300]
    print(json.dumps(extra, indent=1))


if __name__ == "__main__":
    main()
