#!/usr/bin/env python
"""Full-minus-one knockout timing of the v2 fused step on the TPU:
the marginal of each knocked-out piece is its true cost inside the
full fused program (no dummy-materialization distortion)."""
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
s1, l1, s2, l2, nos = batches[0]

eng = dm2.FusedMapperEngine2(sdx, genome, index, nbr=nbr, paired=True,
                             min_align=0.9, min_dist=0, max_dist=500,
                             nthreads=2, group_k=1)

l1a = np.asarray(l1, np.int64)
l2a = np.asarray(l2, np.int64)
B = dm2._bucket_b(s1.shape[0])
maxlen = max(int(l1a.max()), int(l2a.max()))
M = dm2._pad_to(max(maxlen, 32), 16)
N = dm2._pad_to(M + 2 * dm2.MISALIGN_SLOP + 1, 16)
s_max = eng._seg_bucket(max(1, maxlen // 16))
a1 = eng._prep_end2(s1, l1a, B, M, s_max)
a2 = eng._prep_end2(s2, l2a, B, M, s_max)
dev_in = [jax.device_put(np.concatenate([x, y], axis=0))
          for x, y in zip(a1, a2)]
jax.block_until_ready(dev_in)
d_ = eng._dnbr
fixed = (*d_.args, eng._gcode, eng._gmask, eng._ist_dev,
         eng._st_pad_dev)

VARIANTS = sys.argv[1].split(",") if len(sys.argv) > 1 else \
    ["", "rank", "posgather", "windows", "sw", "tb", "scatter"]

base = None
for v in VARIANTS:
    os.environ["PECALLER_PROF_SKIP"] = v
    eng._fns = {}
    fn = eng._fn_for(B, M, N, s_max)

    def run():
        eng.dev_counts, out = fn(eng.dev_counts, *fixed, *dev_in)
        np.asarray(out[:1])

    run()
    ts = []
    for _ in range(5):
        t0 = time.time()
        run()
        ts.append(time.time() - t0)
    cur = float(np.median(ts)) * 1e3
    if v == "":
        base = cur
        print(f"full step        : {cur:7.1f} ms", flush=True)
    else:
        print(f"minus {v:10s}: {cur:7.1f} ms  (piece costs "
              f"{base - cur:+6.1f})", flush=True)
os.environ["PECALLER_PROF_SKIP"] = ""
