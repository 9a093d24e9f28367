"""Debug: run decodebig on the bench corpus and dump per-lane statuses
instead of raising; save failing blocks for host-side parse analysis."""
import os, pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
from bench import make_corpus
from lz4tpu.native import compress_block
from lz4tpu.spec.table import U32Table
import lz4tpu.kernels.decodebig as dbig
import jax.numpy as jnp

block = int(os.environ.get("DBIG_BLOCK", str(1 << 20)))
data = make_corpus(float(os.environ.get("DBIG_MB", "96")))
blocks = [data[i:i+block] for i in range(0, len(data), block)]
blocks = [b for b in blocks if len(b) == block][:128]
comp = [bytes(compress_block(b, 0, U32Table())) for b in blocks]
nb = len(blocks)

packed = [dbig._repack_block(c, block) for c in comp]
maxchunk = max(len(ch) for p_, _ in packed for ch in p_)
win_r = -(-(maxchunk + 16) // 512) * 512
lens = [(len(ch) - 1) * win_r + len(ch[-1]) for ch, _ in packed]
maxlen = max(lens)
rw_pad = -(-(-(-maxlen // 4)) // dbig.CHALF) * dbig.CHALF + dbig.CBAND + dbig.CHALF
ro_pad = -(-block // 4 // dbig.OHALF) * dbig.OHALF + dbig.OBAND + dbig.OHALF
mr = dbig.round_bound(maxlen, block)
arr = np.zeros((128, rw_pad * 4), np.uint8)
n = np.zeros((1, 128), np.int32)
for i, (ch, _) in enumerate(packed):
    for k, c in enumerate(ch):
        arr[i, k * win_r : k * win_r + len(c)] = np.frombuffer(bytes(c), np.uint8)
    n[0, i] = lens[i]
words = np.ascontiguousarray(arr.view('<i4').T)
debug_state = os.environ.get("DBIG_DEBUG_STATE", "0") == "1"
out_w, out_len, status = dbig._decodebig_jit(
    jnp.asarray(words), jnp.asarray(n),
    oband=dbig.OBAND, cband=dbig.CBAND, rw_pad=rw_pad, ro_pad=ro_pad,
    max_rounds=mr, output_limit=block, window_bound=65535,
    win_r=win_r, ws_log=dbig.WS_LOG, debug_state=debug_state,
)
if debug_state:
    st = np.asarray(out_w)[: dbig.NSTATE + 2]
    names = ["pos", "out", "st", "done", "gb", "flush", "lrem", "lsrc",
             "mrem", "moff", "mlag", "tail", "fgb", "pgf", "rnd", "doneat",
             "pph", "pv", "slit", "ssrc", "soff", "x21", "x22", "x23",
             "cb_base", "ob_base"]
    for i in range(nb):
        print(f"lane {i}: " + " ".join(
            f"{nm}={st[k, i]}" for k, nm in enumerate(names)
        ))
        # derived: comp group wants vs band
        cb_g = st[24, i] // dbig.GROUP_W
        n_slots = (dbig.CBAND - dbig.PAGE_W) // dbig.GROUP_W + 1
        want = (st[0, i] >> 2) // dbig.GROUP_W
        lwant = (st[7, i] >> 2) // dbig.GROUP_W
        print(f"  cb_g={cb_g} n_slots={n_slots} pos_want={want} "
              f"lsrc_want={lwant} ob_rows={st[25, i]} "
              f"opause_at={(st[25, i] + dbig.OBAND) * 4 - 2 * dbig.RING_W * 4}")
    sys.exit(0)
status = np.asarray(status)[0][:nb]
out_len = np.asarray(out_len)
import collections
print("status histogram:", dict(collections.Counter(status.tolist())))
print("rounds:", out_len[2].max(), "done-at max:", out_len[1].max())
bad = [i for i in range(nb) if status[i] not in (0, 100)]
print("bad lanes:", bad[:20])
out_w = np.asarray(out_w)
for i in bad[:4]:
    open(f"/tmp/dbig_bad_{i}.bin", "wb").write(comp[i])
    open(f"/tmp/dbig_bad_{i}.raw", "wb").write(blocks[i])
    print(f"lane {i}: status {status[i]} out_len {out_len[0][i]} done-at {out_len[1][i]}")
# also check mismatches among OK lanes
mism = []
for i in range(nb):
    if status[i] == 0:
        ww = out_w[:, i].astype(np.uint32)
        by = np.empty((ro_pad, 4), np.uint8)
        by[:, 0] = ww & 0xFF; by[:, 1] = (ww >> 8) & 0xFF
        by[:, 2] = (ww >> 16) & 0xFF; by[:, 3] = (ww >> 24) & 0xFF
        if by.reshape(-1)[:out_len[0][i]].tobytes() != blocks[i]:
            mism.append(i)
print("OK-lane mismatches:", mism[:20])
for i in mism[:2]:
    open(f"/tmp/dbig_mism_{i}.bin", "wb").write(comp[i])
    open(f"/tmp/dbig_mism_{i}.raw", "wb").write(blocks[i])
