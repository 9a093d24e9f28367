"""Calibrate the Silesia stand-in noise knobs against liblz4.

For each member, bisects the noise fraction so the stand-in's
``LZ4_compress_default`` ratio matches the published per-file target
(lz4tpu/utils/silesia.py table) within +-0.005, generating at a reduced
size for speed (ratio is size-stable for these textures).  Prints the
frozen knob table to paste back into SILESIA.
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from lz4tpu.interop import liblz4
from lz4tpu.utils import silesia


def ratio(name, klass, knob, size):
    data = silesia._generate(name, size, klass, knob)
    return len(liblz4.lz4_compress_default(data)) / len(data)


def main():
    cal_size = int(sys.argv[1]) if len(sys.argv) > 1 else 3 << 20
    print(f"calibrating at {cal_size>>20} MiB per member")
    rows = []
    for name, size, target, klass, knob0 in silesia.SILESIA:
        sz = min(cal_size, size)
        lo, hi = 0.0, 1.0
        k = knob0
        r = ratio(name, klass, k, sz)
        for _ in range(10):
            if abs(r - target) <= 0.005:
                break
            if r < target:
                lo = k
            else:
                hi = k
            k = (lo + hi) / 2
            r = ratio(name, klass, k, sz)
        rows.append((name, size, target, klass, round(k, 4), round(r, 4)))
        print(f"{name:9s} target {target:.3f} -> achieved {r:.4f} knob {k:.4f}")
    print("\nfrozen table:")
    for name, size, target, klass, k, r in rows:
        print(f'    ("{name}", {size:_}, {target}, "{klass}", {k}),  # achieved {r}')


if __name__ == "__main__":
    main()
