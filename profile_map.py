#!/usr/bin/env python
"""Stage-by-stage profiling of the fused mapping step on the real TPU.

Measures, at bench shapes (B=8192 pairs, 100bp reads, E. coli genome):
  - tunnel characteristics (device_put/get bandwidth + latency)
  - seed+chain stage
  - compact+SW stage
  - decide stage
  - traceback+scatter stage
  - the full fused step
Prints one line per measurement.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np

import bench as B

d = B._prepare_data()

import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

# ---- tunnel characteristics -------------------------------------------
x_small = np.zeros(64, np.int32)
x_big = np.zeros((8192, 112 * 6), np.uint8)    # ~5.5 MB, per-end prep size


def timeit(fn, n=5, name=""):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    print(f"{name}: med {np.median(ts)*1e3:.1f} ms  min {min(ts)*1e3:.1f}",
          flush=True)
    return np.median(ts)


timeit(lambda: jax.device_put(x_small).block_until_ready(), 5,
       "device_put 256B")
timeit(lambda: jax.device_put(x_big).block_until_ready(), 5,
       "device_put 5.5MB")
y = jax.device_put(x_big)
timeit(lambda: np.asarray(y[:64, :4]), 5, "device_get small slice")

f = jax.jit(lambda a: a.sum())
f(y).block_until_ready()
timeit(lambda: f(y).block_until_ready(), 5, "trivial jit dispatch rt")

# ---- engine setup ------------------------------------------------------
from pecaller_tpu.formats.sdx import read_sdx, read_seq
from pecaller_tpu.formats.index_files import load_index
from pecaller_tpu.formats.fastq import FastqBatcher
from pecaller_tpu.mapper.device_pipeline import FusedMapperEngine

sdx = read_sdx(os.path.join(d, "g.sdx"))
genome = read_seq(os.path.join(d, "g.seq"), sdx.genome_size)
index = load_index(os.path.join(d, "g"))
eng = FusedMapperEngine(sdx, genome, index, paired=True, min_align=0.9,
                        min_dist=0, max_dist=500, nthreads=os.cpu_count())

batcher = FastqBatcher(os.path.join(d, "r1.fastq"),
                       os.path.join(d, "r2.fastq"), batch_size=8192)
batches = list(batcher.batches())
s1, l1, s2, l2, nos = batches[0]

# host prep cost
t0 = time.time()
for _ in range(3):
    a1 = eng._prep_end(s1, np.asarray(l1, np.int64), 8192, 112, 8)
print(f"host _prep_end x1: {(time.time()-t0)/3*1e3:.1f} ms", flush=True)

# full fused step (warm)
h = eng.map_batch_async(s1, l1, s2, l2, read_nos=nos)
eng.resolve(h)


def full_step():
    h = eng.map_batch_async(s1, l1, s2, l2, read_nos=nos)
    np.asarray(h["packed"])


timeit(full_step, 5, "full fused step (dispatch+fetch)")

# ---- stage breakdown ---------------------------------------------------
from pecaller_tpu.mapper import device_pipeline as dp
from pecaller_tpu.mapper.device_seeds import seed_chain_core, HIT_CAP
import functools

dindex = eng._dindex
B_, M, N, s_max = 8192, 112, 160, 8
n_steps = max(1, int(np.ceil(np.log2(max(dindex.max_subrange, 2)))) + 1)
k_cap = dindex.compact_cap(B_ * 2 * s_max * 49)

a1 = eng._prep_end(s1, np.asarray(l1, np.int64), B_, M, s_max)
a2 = eng._prep_end(s2, np.asarray(l2, np.int64), B_, M, s_max)
(seqs1, rev1, bits1f, bits1r, lens1, offs1, nsegs1, mm01, skip1, thr1) = [
    jax.device_put(x) for x in a1]
(seqs2, rev2, bits2f, bits2r, lens2, offs2, nsegs2, mm02, skip2, thr2) = [
    jax.device_put(x) for x in a2]
jax.block_until_ready([seqs1, seqs2])

idx_args = (dindex.ptab, dindex.keys, dindex.starts, dindex.hi_table,
            dindex.positions)


@jax.jit
def seed_stage(ptab, ikeys, kstarts, hi_table, positions,
               bits_f, bits_r, offs, nsegs, mm0, skip):
    h, ho, o, t, fbk = seed_chain_core(
        ptab, ikeys, kstarts, hi_table, positions, bits_f, bits_r,
        offs, nsegs, mm0, skip, s_max=s_max, n_steps=n_steps,
        n_keys=dindex.n_keys, k_cap=k_cap)
    return h.sum() + ho.sum() + o.astype(jnp.int32).sum() + t.sum()


args_seed = idx_args + (bits1f, bits1r, offs1, nsegs1, mm01, skip1)
seed_stage(*args_seed).block_until_ready()
timeit(lambda: seed_stage(*args_seed).block_until_ready(), 5,
       "seed+chain one end")

# SW stage alone at the H_CAP shape
H_CAP = 2 * B_
refs = jax.device_put(np.random.randint(65, 85, (H_CAP, N), np.uint8))
blens = jax.device_put(np.full(H_CAP, 121, np.int32))
reads = jax.device_put(np.random.randint(65, 85, (H_CAP, M), np.uint8))
rlens = jax.device_put(np.full(H_CAP, 100, np.int32))
from pecaller_tpu.ops.sw_pallas import sw_align_pallas


@jax.jit
def sw_stage(refs, blens, reads, rlens):
    s, k, i = sw_align_pallas(refs, blens, reads, rlens, bisulfite=False,
                              n_rows=N)
    return s.sum() + k.sum() + i.sum()


sw_stage(refs, blens, reads, rlens).block_until_ready()
timeit(lambda: sw_stage(refs, blens, reads, rlens).block_until_ready(), 5,
       "pallas SW @16384x160")

# traceback + scatter at B winners
from pecaller_tpu.ops import sw as dsw

gs = sdx.genome_size
refsB = refs[:B_]
blensB = blens[:B_]
readsB = reads[:B_]
rlensB = rlens[:B_]
kw = jax.device_put(np.zeros(B_, np.int32))
iw = jax.device_put(np.full(B_, 100, np.int32))
dev_counts = jnp.zeros((gs, 6), jnp.uint16)
start_w = jax.device_put(
    np.random.randint(0, gs - 200, B_).astype(np.int32))


@functools.partial(jax.jit, donate_argnums=(0,))
def tb_stage(dev_counts, refs, blens, reads, rlens, kw, iw, start_w):
    ev_pos, ev_kind, ins_j, ins_len = dsw.sw_traceback_device(
        refs, blens, reads, rlens, kw, iw, bisulfite=False, n_rows=N)
    ev_abs = jnp.where(ev_pos >= 0, ev_pos + start_w[:, None], -1)
    flat_pos = ev_abs.reshape(-1)
    flat_kind = ev_kind.reshape(-1)
    ok = (flat_pos >= 0) & (flat_kind != dsw.EV_NONE)
    p = jnp.where(ok, flat_pos, 0)
    kk = jnp.where(ok, flat_kind.astype(jnp.int32), 0)
    dev_counts = dev_counts.at[p, kk].add(ok.astype(jnp.uint16),
                                          mode="drop")
    return dev_counts


dev_counts = tb_stage(dev_counts, refsB, blensB, readsB, rlensB, kw, iw,
                      start_w)
dev_counts.block_until_ready()


def run_tb():
    global dev_counts
    dev_counts = tb_stage(dev_counts, refsB, blensB, readsB, rlensB,
                          kw, iw, start_w)
    dev_counts.block_until_ready()


timeit(run_tb, 5, "traceback+scatter @8192")


# scatter alone
@functools.partial(jax.jit, donate_argnums=(0,))
def scat(dev_counts, p, kk, ok):
    return dev_counts.at[p, kk].add(ok.astype(jnp.uint16), mode="drop")


E = B_ * (N + M + 2)
pp = jax.device_put(np.random.randint(0, gs, E).astype(np.int32))
kkk = jax.device_put(np.random.randint(0, 5, E).astype(np.int32))
okk = jax.device_put(np.ones(E, bool))
dev_counts = scat(dev_counts, pp, kkk, okk)
dev_counts.block_until_ready()


def run_scat():
    global dev_counts
    dev_counts = scat(dev_counts, pp, kkk, okk)
    dev_counts.block_until_ready()


timeit(run_scat, 5, f"scatter alone @{E} events")
print("done", flush=True)
