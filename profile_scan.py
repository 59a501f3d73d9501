#!/usr/bin/env python
"""Isolate device-compute time: single-batch step vs K-batch scan,
with inputs pre-staged on device (no host prep, no input RPC in the
timed region; one tiny sync fetch)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np

import bench as BB

d = BB._prepare_data()

import jax

from pecaller_tpu.formats.sdx import read_sdx, read_seq
from pecaller_tpu.formats.index_files import load_index
from pecaller_tpu.formats.fastq import FastqBatcher
from pecaller_tpu.index.nbr import load_nbr_index
from pecaller_tpu.mapper import device_map2 as dm2

sdx = read_sdx(os.path.join(d, "g.sdx"))
genome = read_seq(os.path.join(d, "g.seq"), sdx.genome_size)
index = load_index(os.path.join(d, "g"))
nbr = load_nbr_index(os.path.join(d, "g"), index)

batches = list(FastqBatcher(os.path.join(d, "r1.fastq"),
                            os.path.join(d, "r2.fastq"),
                            batch_size=8192).batches())

eng = dm2.FusedMapperEngine2(sdx, genome, index, nbr=nbr, paired=True,
                             min_align=0.9, min_dist=0, max_dist=500,
                             nthreads=2, group_k=1)

K = int(os.environ.get("PROFILE_K", "6"))

# host-prep + device-stage K batches once
ins_list = []
key = None
for b in batches[:K]:
    s1, l1, s2, l2, nos = b
    l1 = np.asarray(l1, np.int64)
    l2 = np.asarray(l2, np.int64)
    B = dm2._bucket_b(s1.shape[0])
    maxlen = max(int(l1.max()), int(l2.max()))
    M = dm2._pad_to(max(maxlen, 32), 16)
    N = dm2._pad_to(M + 2 * dm2.MISALIGN_SLOP + 1, 16)
    s_max = eng._seg_bucket(max(1, maxlen // 16))
    key = (B, M, N, s_max)
    a1 = eng._prep_end2(s1, l1, B, M, s_max)
    a2 = eng._prep_end2(s2, l2, B, M, s_max)
    ins_list.append([np.concatenate([x, y], axis=0)
                     for x, y in zip(a1, a2)])

B, M, N, s_max = key
dev_single = [jax.device_put(x) for x in ins_list[0]]
stacked = [jax.device_put(np.stack([ins[j] for ins in ins_list]))
           for j in range(7)]
jax.block_until_ready(dev_single + stacked)

d_ = eng._dnbr
fixed = (d_.nkeys, d_.val_start, d_.hi_table, d_.positions,
         eng._gcode, eng._gmask, eng._ist_dev, eng._st_pad_dev)


def timeit(fn, n=5, name=""):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    print(f"{name}: med {np.median(ts)*1e3:7.1f} ms "
          f"min {min(ts)*1e3:7.1f}", flush=True)
    return float(np.median(ts))


sfn = eng._fn_for(B, M, N, s_max)


def run_single():
    eng.dev_counts, out = sfn(eng.dev_counts, *fixed, *dev_single)
    np.asarray(out[:1])


t1 = timeit(run_single, 5, "single step (device inputs, sync fetch)")

mfn = eng._mfn_for(K, B, M, N, s_max)


def run_scan():
    eng.dev_counts, outs = mfn(eng.dev_counts, *fixed, *stacked)
    np.asarray(outs[:1, :1])


tk = timeit(run_scan, 5, f"scan K={K} (device inputs, sync fetch)")
print(f"scan per-batch: {tk/K*1e3:7.1f} ms vs single {t1*1e3:7.1f} ms",
      flush=True)
