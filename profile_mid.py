#!/usr/bin/env python
"""Stage-by-stage profiling of the v2.5 (quartered-key) fused mapping
step on the 47 Mb mid-genome bench data, real TPU.

Stages: 11 keys, 12 projection lookups, 13 +entry gathers/filter/spill,
1 full seeds (+sort/chain/dedup/select), 2 +compact/windows, 3 +SW,
4 +decide, 5 +traceback, 6 full.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np

import bench as BB

d = BB._prepare_data()
md = BB._prepare_mid(d)

import jax

print("backend:", jax.default_backend(), flush=True)

from pecaller_tpu.formats.sdx import read_sdx, read_seq
from pecaller_tpu.formats.index_files import load_index
from pecaller_tpu.formats.fastq import FastqBatcher
from pecaller_tpu.index.quarter import load_quarter_index
from pecaller_tpu.mapper import device_map2 as dm2

sdx = read_sdx(os.path.join(md, "m.sdx"))
genome = read_seq(os.path.join(md, "m.seq"), sdx.genome_size)
index = load_index(os.path.join(md, "m"))
quarter = load_quarter_index(os.path.join(md, "m"), index)

batches = list(FastqBatcher(os.path.join(md, "r1.fastq"),
                            os.path.join(md, "r2.fastq"),
                            batch_size=8192).batches())
s1, l1, s2, l2, nos = batches[0]

eng = dm2.FusedMapperEngine2(sdx, genome, index, quarter=quarter,
                             paired=True, min_align=0.9, min_dist=0,
                             max_dist=500, nthreads=2, group_k=1)
print("mode:", eng._dnbr.mode, "T1:", eng._dnbr.t1, "rcap:",
      eng._dnbr.rcap, flush=True)

STAGES = sys.argv[1].split(",") if len(sys.argv) > 1 else \
    ["11", "12", "13", "1", "2", "3", "4", "5", "6"]

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
    print(f"stage {st:>3}: {cur:8.1f} ms  (marginal {cur - prev:+8.1f})",
          flush=True)
    prev = cur
os.environ["PECALLER_STAGE"] = "6"
