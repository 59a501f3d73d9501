"""Pallas TPU kernel for the batched affine-gap glocal Smith-Waterman.

Same integer recurrence as ops/sw.py:sw_align_device (scores are exact
rationals x36; the horizontal plane is solved with the cummax transform)
but the three DP planes live in VMEM for the whole row loop instead of
round-tripping HBM once per `lax.scan` step.  For a (16384, 113)x160
problem the scan version moves ~5 GB of carry traffic per call; the
kernel moves each input/output exactly once.

Layout: read position on SUBLANES (axis 0), batch on LANES (axis 1).
The per-row reference fetch is then a dynamic slice on the sublane
dimension — `refs_ref[pl.ds(i-1, 1), :]` — which Mosaic supports with
no alignment constraint, and the (1, B) row broadcasts naturally
against the (W, B) DP planes.  (A lane-dim dynamic slice would need
128-aligned indices.)

Reference recurrence: pemapper.c:1694-1748 (three-plane DP, glocal
termination in the last read column).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sw import MATCH, MISMATCH, OPEN, EXT

NEG = -(1 << 30)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _shift_down(x, fill):
    """Sublane shift by one: out[0, :] = fill, out[j, :] = x[j-1, :]."""
    rolled = pltpu.roll(x, shift=1, axis=0)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(row == 0, fill, rolled)


def _cummax_rows(x):
    """Inclusive cummax along the sublane axis via log-doubling rolls."""
    H = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    k = 1
    while k < H:
        shifted = pltpu.roll(x, shift=k, axis=0)
        x = jnp.maximum(x, jnp.where(row >= k, shifted, NEG))
        k *= 2
    return x


def _sw_kernel(refs_ref, reads_ref, blens_ref, rlens_ref, out_ref,
               *, n_rows: int, bisulfite: bool):
    WP, BB = reads_ref.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (WP, BB), 0)

    # row 0 planes (sw.py:_row0)
    b0 = -(OPEN + (row - 1) * EXT)
    s0 = jnp.where(row == 0, 0, b0)
    s1 = s0
    s2 = jnp.where(row == 0, -OPEN, b0)

    reads = reads_ref[:]                       # (WP, BB) int32 chars
    blens = blens_ref[:]                       # (1, BB)
    rlens = rlens_ref[:]                       # (1, BB)
    colmask = row == rlens                     # rlen <= WP-1

    def at_col(x):
        return jnp.max(jnp.where(colmask, x, NEG), axis=0, keepdims=True)

    best = at_col(s0)                          # (1, BB)
    bk = jnp.zeros((1, BB), jnp.int32)
    bi = jnp.zeros((1, BB), jnp.int32)

    def body(i, carry):
        s0, s1, s2, best, bk, bi = carry
        rb = refs_ref[pl.ds(i - 1, 1), :]      # (1, BB) int32
        m = (rb == reads) | (rb == ord("N")) | (reads == ord("N")) \
            | (rb == ord("n")) | (reads == ord("n"))
        if bisulfite:
            m = m | (((rb == ord("C")) | (rb == ord("c"))) &
                     ((reads == ord("T")) | (reads == ord("t"))))
        bump = jnp.where(m, jnp.int32(MATCH), jnp.int32(MISMATCH))
        prev3 = jnp.maximum(jnp.maximum(s0, s1), s2)
        c0 = _shift_down(prev3 + bump, jnp.int32(0))
        c1 = jnp.where(row == 0, 0,
                       jnp.maximum(s0 - OPEN, s1 - EXT))
        a = jnp.where(row == 0, jnp.int32(-OPEN),
                      _shift_down(c0, jnp.int32(0)) - OPEN + row)
        c2 = _cummax_rows(a) - row
        active = i <= blens                    # (1, BB)
        for k, v in ((0, at_col(c0)), (1, at_col(c1)), (2, at_col(c2))):
            upd = active & (v > best)
            best = jnp.where(upd, v, best)
            bk = jnp.where(upd, k, bk)
            bi = jnp.where(upd, i, bi)
        s0 = jnp.where(active, c0, s0)
        s1 = jnp.where(active, c1, s1)
        s2 = jnp.where(active, c2, s2)
        return s0, s1, s2, best, bk, bi

    s0, s1, s2, best, bk, bi = jax.lax.fori_loop(
        1, n_rows + 1, body, (s0, s1, s2, best, bk, bi))
    out_ref[0, :] = best[0, :]
    out_ref[1, :] = bk[0, :]
    out_ref[2, :] = bi[0, :]


@functools.partial(jax.jit, static_argnames=("bisulfite", "n_rows",
                                             "block_b", "interpret"))
def sw_align_pallas(refs, blens, reads, rlens, bisulfite: bool = False,
                    n_rows: int | None = None, block_b: int = 256,
                    interpret: bool = False):
    """Batched glocal SW scores — Pallas TPU kernel.

    Same contract as sw.py:sw_align_device: refs (B, N) uint8 window
    chars, blens (B,) valid rows, reads (B, M) uint8, rlens (B,).
    Returns (score x36, plane k, ref row i) of the argmax cell in the
    last read column, all int32 (B,).
    """
    B, N = refs.shape
    M = reads.shape[1]
    n_rows = N if n_rows is None else n_rows
    if B % block_b != 0:
        pad = _round_up(B, block_b) - B
        refs = jnp.pad(refs, ((0, pad), (0, 0)))
        reads = jnp.pad(reads, ((0, pad), (0, 0)))
        blens = jnp.pad(blens, (0, pad))
        rlens = jnp.pad(rlens, (0, pad), constant_values=1)
    BP = refs.shape[0]
    WP = _round_up(M + 1, 8)
    NP = _round_up(n_rows, 8)
    refs_i = jnp.zeros((NP, BP), jnp.int32).at[:N, :].set(
        refs.astype(jnp.int32).T)
    reads_i = jnp.zeros((WP, BP), jnp.int32).at[:M, :].set(
        reads.astype(jnp.int32).T)
    blens_i = blens.astype(jnp.int32).reshape(1, BP)
    rlens_i = rlens.astype(jnp.int32).reshape(1, BP)

    grid = (BP // block_b,)
    out = pl.pallas_call(
        functools.partial(_sw_kernel, n_rows=n_rows, bisulfite=bisulfite),
        out_shape=jax.ShapeDtypeStruct((3, BP), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((NP, block_b), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((WP, block_b), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_b), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_b), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, block_b), lambda b: (0, b),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=BP * n_rows * WP * 25, bytes_accessed=BP * (NP + WP) * 4,
            transcendentals=0),
        interpret=interpret,
    )(refs_i, reads_i, blens_i, rlens_i)
    return out[0, :B], out[1, :B], out[2, :B]
