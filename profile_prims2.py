#!/usr/bin/env python
"""Primitive costs, measured by timing N chained iterations + final fetch
(defeats any async-dispatch lying in block_until_ready)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

rng = np.random.default_rng(0)


def timeit_chain(make_step, init, n=20, name=""):
    """make_step: carry -> carry (jitted); chains n dependent steps then
    fetches a tiny slice of the carry."""
    c = init
    c = make_step(c)
    jax.block_until_ready(c)
    _ = np.asarray(jax.tree_util.tree_leaves(c)[0].ravel()[0])
    t0 = time.time()
    for _ in range(n):
        c = make_step(c)
    _ = np.asarray(jax.tree_util.tree_leaves(c)[0].ravel()[0])
    dt = (time.time() - t0) / n
    print(f"{name}: {dt*1e3:8.2f} ms/iter", flush=True)
    return dt


# baseline: dispatch-only chain
x0 = jnp.zeros(8, jnp.int32)
f0 = jax.jit(lambda x: x + 1)
timeit_chain(f0, x0, 20, "noop chain (dispatch+fetch floor)")

# gather chain: carry perturbs indices so nothing is reusable
tbl = jnp.asarray(rng.integers(0, 2**31, 1 << 28, dtype=np.int64)
                  .astype(np.int32))
idx = jnp.asarray(rng.integers(0, 1 << 28, 6_400_000, dtype=np.int64)
                  .astype(np.int32))


@jax.jit
def g1(c):
    i2 = (idx ^ c[0]) & ((1 << 28) - 1)
    return c.at[0].set(tbl[i2].sum() & 1023)


timeit_chain(g1, x0, 10, "gather 6.4M from 1GB")

pos_tbl = jnp.asarray(rng.integers(0, 2**31, 1 << 22, dtype=np.int64)
                      .astype(np.int32))
idx51 = jnp.asarray(rng.integers(0, 1 << 22, 51_000_000, dtype=np.int64)
                    .astype(np.int32))


@jax.jit
def g2(c):
    i2 = (idx51 ^ c[0]) & ((1 << 22) - 1)
    return c.at[0].set(pos_tbl[i2].sum() & 1023)


timeit_chain(g2, x0, 5, "gather 51M from 16MB")

# scatter-set compaction chain
src = jnp.asarray(rng.integers(0, 2**31, 6_422_528, dtype=np.int64)
                  .astype(np.int32))
tgt = jnp.asarray(rng.permutation(6_422_528).astype(np.int32))


@jax.jit
def s1(c):
    t2 = (tgt + c[0]) % 6_422_528
    out = jnp.zeros(6_422_528, jnp.int32).at[t2].set(src, mode="drop")
    return c.at[0].set(out.sum() & 1023)


timeit_chain(s1, x0, 5, "scatter-set 6.4M")

# scatter-add uint16 pileup chain
gs = 4_600_000
pos = jnp.asarray(rng.integers(0, gs, 2_244_608, dtype=np.int64)
                  .astype(np.int32))
kind = jnp.asarray(rng.integers(0, 6, 2_244_608, dtype=np.int64)
                   .astype(np.int32))
counts0 = jnp.zeros((gs, 6), jnp.uint16)


@jax.jit
def s2(st):
    counts, c = st
    p2 = (pos + c[0]) % gs
    counts = counts.at[p2, kind].add(jnp.uint16(1), mode="drop")
    return counts, c.at[0].set(counts[0, 0].astype(jnp.int32))


timeit_chain(s2, (counts0, x0), 5, "scatter-add 2.24M u16")

pos9 = pos[:918_000]
kind9 = kind[:918_000]


@jax.jit
def s3(st):
    counts, c = st
    p2 = (pos9 + c[0]) % gs
    counts = counts.at[p2, kind9].add(jnp.uint16(1), mode="drop")
    return counts, c.at[0].set(counts[0, 0].astype(jnp.int32))


timeit_chain(s3, (counts0, x0), 5, "scatter-add 0.92M u16")

# scatter-set 131k -> 16k slots (hits compaction shape)
srcA = jnp.asarray(rng.integers(0, 2**31, 131_072, dtype=np.int64)
                   .astype(np.int32))
tgtA = jnp.asarray(rng.integers(0, 16_385, 131_072, dtype=np.int64)
                   .astype(np.int32))


@jax.jit
def s4(c):
    t2 = (tgtA + c[0]) % 16_385
    out = jnp.zeros(16_385, jnp.int32).at[t2].set(srcA, mode="drop")
    return c.at[0].set(out.sum() & 1023)


timeit_chain(s4, x0, 10, "scatter-set 131k->16k")

# argsort chains
for N in (32_768, 131_072, 918_000):
    v = jnp.asarray(rng.integers(0, 2**31, N, dtype=np.int64)
                    .astype(np.int32))

    @jax.jit
    def a1(c, v=v, N=N):
        v2 = v ^ c[0]
        return c.at[0].set(jnp.argsort(v2).sum() & 1023)

    timeit_chain(a1, x0, 5, f"argsort {N}")

# top_k chain
xk = jnp.asarray(rng.integers(0, 2**30, (131_072, 392), dtype=np.int64)
                 .astype(np.int32))


@jax.jit
def tk(c):
    x2 = xk ^ c[0]
    return c.at[0].set(jax.lax.top_k(-x2, 64)[0].sum() & 1023)


timeit_chain(tk, x0, 5, "top_k 64/392 x131k")


@jax.jit
def tk32(c):
    x2 = xk ^ c[0]
    return c.at[0].set(jax.lax.top_k(-x2, 32)[0].sum() & 1023)


timeit_chain(tk32, x0, 5, "top_k 32/392 x131k")


@jax.jit
def fsort(c):
    x2 = xk ^ c[0]
    return c.at[0].set(jnp.sort(x2, axis=-1)[:, :64].sum() & 1023)


timeit_chain(fsort, x0, 5, "row sort 392 x131k")

# chained fori_loop overhead (walk emulation): 273 iters of small ops
st0 = (jnp.zeros(8192, jnp.int32), x0)
tbc = jnp.asarray(rng.integers(0, 16, (8192, 161, 113), dtype=np.int64)
                  .astype(np.uint8))


@jax.jit
def walk(st):
    v, c = st

    def body(t, v):
        ii = (v + t) % 161
        jj = (v * 3 + t) % 113
        bits = tbc[jnp.arange(8192), ii, jj]
        return v + bits.astype(jnp.int32)

    v = jax.lax.fori_loop(0, 273, body, v)
    return v, c.at[0].set(v.sum() & 1023)


timeit_chain(walk, st0, 3, "fori_loop 273 x (8192-gather)")
print("done")
