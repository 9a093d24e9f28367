"""Round-5 end-to-end frame measurements after the transport rework
(async meta, piecewise D2H, fast H2D): tunnel floors, frame compress/
decode, compressbig, with composed ceilings."""

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    from bench import (
        bench_frame_parallel,
        bench_tpu_compressbig,
        bench_tunnel,
        frame_ceilings,
        make_corpus,
    )

    extra = {}
    bench_tunnel(extra)
    print(json.dumps({k: extra[k] for k in sorted(extra)}), flush=True)
    data = make_corpus(32.0)
    try:
        bench_frame_parallel(data, extra)
    except Exception as e:
        extra["frame_error"] = str(e)[:300]
    print(json.dumps({k: v for k, v in extra.items() if "frame" in k}),
          flush=True)
    try:
        bench_tpu_compressbig(extra)
    except Exception as e:
        extra["compressbig_error"] = str(e)[:300]
    frame_ceilings(extra)
    print(json.dumps({k: extra[k] for k in sorted(extra)}, indent=1),
          flush=True)


if __name__ == "__main__":
    main()
