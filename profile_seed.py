#!/usr/bin/env python
"""Sub-stage profiling of seed_chain_core on the real TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np

import bench as BN

d = BN._prepare_data()

import jax
import jax.numpy as jnp

from pecaller_tpu.formats.sdx import read_sdx, read_seq
from pecaller_tpu.formats.index_files import load_index
from pecaller_tpu.formats.fastq import FastqBatcher
from pecaller_tpu.mapper.device_pipeline import FusedMapperEngine
from pecaller_tpu.mapper.device_seeds import (
    DeviceSeedIndex, _rolling_keys, _neighborhood_dev, _probe_pair,
    _rank_lookup, KEY_CAP, SEG_CAP, HIT_CAP, POS_PAD)
from pecaller_tpu.ops.encode import IDEPTH

sdx = read_sdx(os.path.join(d, "g.sdx"))
genome = read_seq(os.path.join(d, "g.seq"), sdx.genome_size)
index = load_index(os.path.join(d, "g"))
eng = FusedMapperEngine(sdx, genome, index, paired=True, min_align=0.9,
                        min_dist=0, max_dist=500, nthreads=os.cpu_count())
dindex = eng._dindex

batcher = FastqBatcher(os.path.join(d, "r1.fastq"),
                       os.path.join(d, "r2.fastq"), batch_size=8192)
s1, l1, s2, l2, nos = next(iter(batcher.batches()))
B_, M, s_max = 8192, 112, 8
a1 = eng._prep_end(s1, np.asarray(l1, np.int64), B_, M, s_max)
(seqs1, rev1, bits_f, bits_r, lens1, offs, nsegs, mm0, skip, thr1) = [
    jax.device_put(np.asarray(x)) for x in a1]
jax.block_until_ready([bits_f, offs])

n_steps = max(1, int(np.ceil(np.log2(max(dindex.max_subrange, 2)))) + 1)
n_keys = dindex.n_keys
k_cap = dindex.compact_cap(B_ * 2 * s_max * 49)
S_MAX = s_max


def timeit(fn, n=5, name=""):
    r = fn()
    jax.block_until_ready(r)
    ts = []
    for _ in range(n):
        t0 = time.time()
        jax.block_until_ready(fn())
        ts.append(time.time() - t0)
    print(f"{name}: med {np.median(ts)*1e3:.1f} ms", flush=True)


# stage 1: keys + neighborhood (pure compute)
@jax.jit
def st_keys(bits_f, bits_r, offsets):
    kf = _rolling_keys(bits_f, offsets)
    kr = _rolling_keys(bits_r, offsets)
    keys2 = jnp.stack([kf, kr], axis=1)
    nb = _neighborhood_dev(keys2)
    return nb


nb = st_keys(bits_f, bits_r, offs)
timeit(lambda: st_keys(bits_f, bits_r, offs), 5, "keys+neighborhood")


# stage 2: ptab probe gather
@jax.jit
def st_probe(ptab, nb):
    p, a = _probe_pair(ptab, nb)
    return p.sum(), a.sum()


timeit(lambda: st_probe(dindex.ptab, nb), 5, "ptab probe (6.4M gathers)")

# stage 3: compaction + rank lookup + position gather
present, abundant = jax.jit(lambda p, n: _probe_pair(p, n))(dindex.ptab, nb)
seg_valid = np.arange(S_MAX)[None, :] < np.asarray(nsegs)[:, None]
seg_bad_np = np.asarray(abundant).any(-1) | ~seg_valid[:, None, :]
active = jnp.asarray(np.asarray(present) & ~seg_bad_np[..., None])


@jax.jit
def st_rank(ikeys, istarts, hi_table, positions, nb, active):
    flat_active = active.reshape(-1)
    K = k_cap
    slot = jnp.cumsum(flat_active.astype(jnp.int32)) - 1
    tgt = jnp.where(flat_active, jnp.minimum(slot, K - 1), K)
    comp_keys = jnp.zeros(K + 1, jnp.uint32).at[tgt].set(
        nb.reshape(-1), mode="drop")[:K]
    start_s, cnt_s = _rank_lookup(ikeys, istarts, hi_table, n_keys,
                                  comp_keys, n_steps)
    g_s = start_s[:, None] + jnp.arange(KEY_CAP)
    pmax = max(positions.shape[0] - 1, 0)
    gval_s = jnp.arange(KEY_CAP) < jnp.minimum(cnt_s, KEY_CAP)[:, None]
    pos_s = jnp.where(gval_s, positions[jnp.clip(g_s, 0, pmax)], POS_PAD)
    slot_c = jnp.clip(slot, 0, K - 1)
    cnt = jnp.where(flat_active, cnt_s[slot_c], 0).reshape(active.shape)
    pos = jnp.where(flat_active[:, None], pos_s[slot_c], POS_PAD)
    return pos.sum(), cnt.sum()


timeit(lambda: st_rank(dindex.keys, dindex.starts, dindex.hi_table,
                       dindex.positions, nb, active), 5,
       f"compact+rank+posgather (k_cap={k_cap})")

# stage 4: top_k select
rng = np.random.default_rng(0)
pos_full = jnp.asarray(
    rng.integers(0, 2**30, (B_, 2, S_MAX, 49 * KEY_CAP), dtype=np.int64)
    .astype(np.int32))


@jax.jit
def st_topk(pos):
    neg = jax.lax.top_k(-pos, SEG_CAP)[0]
    return (-neg[..., ::-1]).sum()


timeit(lambda: st_topk(pos_full), 5, "top_k 392->64")

# stage 5: chaining T loop
pos_seg = jnp.asarray(
    rng.integers(0, 2**30, (B_, 2, S_MAX, SEG_CAP), dtype=np.int64)
    .astype(np.int32))


@jax.jit
def st_chain(pos, offsets, n_segs):
    max_off = max(2, IDEPTH - 4)
    diag = pos - offsets[:, None, :, None]
    anchor_valid = pos < POS_PAD
    T = jnp.ones(pos.shape, jnp.int32)
    seg_in_read = (jnp.arange(S_MAX)[None, :] <= (n_segs - 1)[:, None])
    for dd in range(1, S_MAX):
        a = diag[:, :, :S_MAX - dd, :]
        bseg = diag[:, :, dd:, :]
        near = jnp.abs(a[..., :, None] - bseg[..., None, :]) < max_off
        near = near & anchor_valid[:, :, dd:][..., None, :]
        found = near.any(-1) & seg_in_read[:, None, dd:, None]
        T = T.at[:, :, :S_MAX - dd, :].add(found.astype(jnp.int32))
    return jnp.where(anchor_valid, T, 0).sum()


timeit(lambda: st_chain(pos_seg, offs, nsegs), 5, "chain T loop")

# stage 6: dedup sorts (A_CAP global argsorts)
A_CAP = 4 * B_
vals = jnp.asarray(rng.integers(0, 2**30, A_CAP, dtype=np.int64)
                   .astype(np.int32))


@jax.jit
def st_sorts(v):
    p1 = jnp.argsort(v, stable=True)
    p2 = jnp.argsort(v[p1], stable=True)
    q1 = jnp.argsort(v[p2], stable=True)
    q2 = jnp.argsort(v[q1], stable=True)
    return p1.sum() + p2.sum() + q1.sum() + q2.sum()


timeit(lambda: st_sorts(vals), 5, "4x argsort @32768")
print("done", flush=True)
