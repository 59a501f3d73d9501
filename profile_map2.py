#!/usr/bin/env python
"""Stage-by-stage profiling of the v2 fused mapping step on the real TPU.

PECALLER_STAGE truncates build_fused_step2 after a prefix of the
pipeline (11-15 seed substages, 1 seeds, 2 +compact/windows, 3 +SW,
4 +decide, 5 +traceback, 6 full), so timing consecutive stages gives
the marginal cost of each.  The engine (and its 3.5 GB device index)
is built ONCE; each stage only builds + compiles a truncated step fn.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np

import bench as BB

d = BB._prepare_data()

import jax

print("backend:", jax.default_backend(), flush=True)

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
s1, l1, s2, l2, nos = batches[0]

eng = dm2.FusedMapperEngine2(sdx, genome, index, nbr=nbr, paired=True,
                             min_align=0.9, min_dist=0, max_dist=500,
                             nthreads=2, group_k=1)

STAGES = sys.argv[1].split(",") if len(sys.argv) > 1 else \
    ["11", "12", "13", "14", "15", "1", "2", "3", "4", "5", "6"]

prev = 0.0
for st in STAGES:
    os.environ["PECALLER_STAGE"] = st
    eng._fns = {}                       # force a rebuild at this stage
    h = eng.map_batch_async(s1, l1, s2, l2, read_nos=nos)
    np.asarray(h["out"])                # compile + warm
    ts = []
    for _ in range(5):
        t0 = time.time()
        h = eng.map_batch_async(s1, l1, s2, l2, read_nos=nos)
        np.asarray(h["out"])
        ts.append(time.time() - t0)
    cur = float(np.median(ts)) * 1e3
    print(f"stage {st}: {cur:7.1f} ms  (marginal {cur - prev:+7.1f})",
          flush=True)
    prev = cur

if os.environ.get("PROFILE_SCAN"):
    os.environ["PECALLER_STAGE"] = "6"
    for K in (6,):
        eng2 = dm2.FusedMapperEngine2(
            sdx, genome, index, nbr=nbr, paired=True, min_align=0.9,
            min_dist=0, max_dist=500, nthreads=2, group_k=K)
        eng2._dnbr = eng._dnbr          # reuse the uploaded index
        hs = [eng2.map_batch_async(*b[:4], read_nos=b[4])
              for b in batches[:K]]
        for h in hs:
            eng2.resolve(h)             # compile + warm
        ts = []
        for _ in range(5):
            t0 = time.time()
            hs = [eng2.map_batch_async(*b[:4], read_nos=b[4])
                  for b in batches[:K]]
            for h in hs:
                eng2.resolve(h)
            ts.append(time.time() - t0)
        per = float(np.median(ts)) / K * 1e3
        print(f"scan K={K}: {float(np.median(ts))*1e3:7.1f} ms total, "
              f"{per:7.1f} ms/batch", flush=True)
