#!/usr/bin/env python
"""Primitive op throughput on the tunneled TPU: gather, scatter, sort,
top_k, cumsum at the shapes the mapper uses."""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

rng = np.random.default_rng(0)


def timeit(fn, n=5, name=""):
    jax.block_until_ready(fn())
    ts = []
    for _ in range(n):
        t0 = time.time()
        jax.block_until_ready(fn())
        ts.append(time.time() - t0)
    med = float(np.median(ts))
    print(f"{name}: {med*1e3:8.1f} ms", flush=True)
    return med


# gather throughput into tables of different sizes
for tbl_bits, ng in ((28, 6_400_000), (22, 6_400_000), (22, 51_000_000),
                     (24, 51_000_000)):
    tbl = jnp.asarray(rng.integers(0, 2**31, 1 << tbl_bits,
                                   dtype=np.int64).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, 1 << tbl_bits, ng,
                                   dtype=np.int64).astype(np.int32))
    f = jax.jit(lambda t, i: t[i].sum())
    t = timeit(lambda: f(tbl, idx), 3,
               f"gather {ng/1e6:.0f}M from {4*(1<<tbl_bits)/2**20:.0f}MB")
    print(f"   -> {ng/t/1e9:.2f} G gathers/s", flush=True)

# scatter-set throughput (compaction pattern): N elems -> K slots
for N in (131_072, 1_048_576, 6_422_528):
    src = jnp.asarray(rng.integers(0, 2**31, N, dtype=np.int64)
                      .astype(np.int32))
    tgt = jnp.asarray(rng.permutation(N).astype(np.int32))
    K = N
    f = jax.jit(lambda s, t: jnp.zeros(K, jnp.int32).at[t].set(
        s, mode="drop").sum())
    t = timeit(lambda: f(src, tgt), 3, f"scatter-set {N/1e6:.2f}M")
    print(f"   -> {N/t/1e9:.3f} G scatters/s", flush=True)

# scatter-add uint16 (pileup pattern)
gs = 4_600_000
for N in (918_000, 2_244_608):
    pos = jnp.asarray(rng.integers(0, gs, N, dtype=np.int64)
                      .astype(np.int32))
    kind = jnp.asarray(rng.integers(0, 6, N, dtype=np.int64)
                       .astype(np.int32))
    ok = jnp.ones(N, jnp.uint16)
    f = jax.jit(lambda p, k, o: jnp.zeros((gs, 6), jnp.uint16)
                .at[p, k].add(o, mode="drop").sum())
    t = timeit(lambda: f(pos, kind, ok), 3, f"scatter-add {N/1e6:.2f}M")

# scatter-add with SORTED positions (per-read locality emulation)
pos_sorted = jnp.sort(pos)
f2 = jax.jit(lambda p, k, o: jnp.zeros((gs, 6), jnp.uint16)
             .at[p, k].add(o, mode="drop").sum())
timeit(lambda: f2(pos_sorted, kind, ok), 3, "scatter-add 2.24M sorted pos")

# scatter-add of contiguous window rows: (B, N6) rows
B, NW = 8192, 160
starts = jnp.asarray(rng.integers(0, gs - 200, B, dtype=np.int64)
                     .astype(np.int32))
win = jnp.asarray(rng.integers(0, 3, (B, NW, 6), dtype=np.int64)
                  .astype(np.uint16))
f3 = jax.jit(lambda s, w: jnp.zeros((gs, 6), jnp.uint16).at[
    s[:, None] + jnp.arange(NW)[None, :], :].add(w, mode="drop").sum())
timeit(lambda: f3(starts, win), 3, "scatter-add 1.3M window-rows(6)")

# argsort / sort
for N in (16_384, 32_768, 131_072, 918_000):
    v = jnp.asarray(rng.integers(0, 2**31, N, dtype=np.int64)
                    .astype(np.int32))
    f = jax.jit(lambda x: jnp.argsort(x).sum())
    timeit(lambda: f(v), 3, f"argsort {N}")
v64 = jnp.asarray(rng.integers(0, 2**62, 32_768, dtype=np.int64))
f = jax.jit(lambda x: jnp.argsort(x).sum())
timeit(lambda: f(v64), 3, "argsort int64 32768")

# top_k variants
x = jnp.asarray(rng.integers(0, 2**30, (131_072, 392), dtype=np.int64)
                .astype(np.int32))
f = jax.jit(lambda x: jax.lax.top_k(-x, 64)[0].sum())
timeit(lambda: f(x), 3, "top_k 64 of 392 x131k rows")
f = jax.jit(lambda x: jax.lax.top_k(-x, 32)[0].sum())
timeit(lambda: f(x), 3, "top_k 32 of 392 x131k rows")
f = jax.jit(lambda x: jnp.sort(x, axis=-1)[:, :64].sum())
timeit(lambda: f(x), 3, "full sort 392 x131k rows")

# cumsum big
v = jnp.asarray(rng.integers(0, 2, 6_422_528, dtype=np.int64)
                .astype(np.int32))
f = jax.jit(lambda x: jnp.cumsum(x)[-1])
timeit(lambda: f(v), 3, "cumsum 6.4M")

# int16 vs int32 elementwise
a16 = jnp.zeros((512, 16384), jnp.int16)
a32 = jnp.zeros((512, 16384), jnp.int32)
f16 = jax.jit(lambda a: (jnp.maximum(a + 3, a * 2) - 7).sum())
f32 = jax.jit(lambda a: (jnp.maximum(a + 3, a * 2) - 7).sum())
timeit(lambda: f16(a16), 3, "elementwise int16 8.4M")
timeit(lambda: f32(a32), 3, "elementwise int32 8.4M")
print("done")
