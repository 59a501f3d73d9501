"""Pallas TPU kernels: int32 code-based SW align + row-sync traceback.

Layout (both kernels): read/ref position on SUBLANES, batch slots on
LANES (per-row dynamic slices are only unconstrained on the sublane
dim).  DP planes are int32 (Mosaic lacks i16 rotates/reductions; scores fit
i16 and can be packed later if the VPU cost ever dominates again).

The traceback kernel replays the DP once (storing the packed decision
bits of every cell in a VMEM scratch cube) and then walks the path
row-synchronously: each iteration consumes exactly one reference row
per lane, resolving horizontal (insertion) runs in closed form with a
prefix-max over the bit row — n_rows iterations total, no scalar walk.
Event semantics are identical to ops/sw2.sw_traceback_rows (itself
validated bit-exact against the round-1 step walk / pemapper.c
:1752-1965).

Outputs of the traceback kernel are packed one i32 per (row, lane):
  kind(4 bits) | (ins_j+1)(12 bits, <<4) | ins_len(12 bits, <<16)
  | walk-tie flag (1 bit, <<28; see sw2._tie_parts_of)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sw import MATCH, MISMATCH, OPEN, EXT
from .sw2 import XN, EV_DEL, EV_NONE

NEG16 = -20000


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _shift_down(x, fill):
    """Sublane shift by one: out[0, :] = fill, out[j, :] = x[j-1, :]."""
    rolled = pltpu.roll(x, shift=1, axis=0)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(row == 0, fill, rolled)


def _cummax_sub(x, neg):
    """Inclusive cummax along sublanes via log-doubling rolls."""
    H = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    k = 1
    while k < H:
        shifted = pltpu.roll(x, shift=k, axis=0)
        x = jnp.maximum(x, jnp.where(row >= k, shifted, neg))
        k *= 2
    return x


def _match16(rb, reads, bisulfite: bool):
    """(1, L) ref xcode row vs (WP, L) read xcodes -> bool."""
    m = (rb == reads) | (rb == XN) | (reads == XN)
    if bisulfite:
        m = m | ((rb == 1) & (reads == 3))
    return m


def _dp_row16(s0, s1, s2, bump, row):
    """One DP row in int32 given previous planes; returns (c0, c1, c2).
    row: sublane iota (WP, L) int32."""
    prev3 = jnp.maximum(jnp.maximum(s0, s1), s2)
    c0 = _shift_down(prev3 + bump, jnp.int32(0))
    c1 = jnp.where(row == 0, jnp.int32(0),
                   jnp.maximum(s0 - jnp.int32(OPEN), s1 - jnp.int32(EXT)))
    a = jnp.where(row == 0, jnp.int32(-OPEN),
                  _shift_down(c0, jnp.int32(0)) - jnp.int32(OPEN)
                  + row.astype(jnp.int32))
    c2 = _cummax_sub(a, jnp.int32(NEG16)) - row.astype(jnp.int32)
    return c0, c1, c2


def _row0_16(row):
    b0 = -(jnp.int32(OPEN) + (row.astype(jnp.int32) - 1))
    s0 = jnp.where(row == 0, jnp.int32(0), b0)
    s2 = jnp.where(row == 0, jnp.int32(-OPEN), b0)
    return s0, s0, s2


def _align_kernel(refs_ref, reads_ref, blens_ref, rlens_ref, out_ref,
                  *, n_rows: int, bisulfite: bool):
    WP, L = reads_ref.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (WP, L), 0)
    s0, s1, s2 = _row0_16(row)
    reads = reads_ref[:].astype(jnp.int32)
    blens = blens_ref[:]
    rlens = rlens_ref[:]
    colmask = row == rlens

    def at_col(x):
        return jnp.max(jnp.where(colmask, x, NEG16),
                       axis=0, keepdims=True)

    best = at_col(s0)
    bk = jnp.zeros((1, L), jnp.int32)
    bi = jnp.zeros((1, L), jnp.int32)
    n_at = jnp.ones((1, L), jnp.int32)   # cells attaining the final best

    def body(i, carry):
        s0, s1, s2, best, bk, bi, n_at = carry
        rb = refs_ref[pl.ds(i - 1, 1), :].astype(jnp.int32)
        m = _match16(rb, reads, bisulfite)
        bump = jnp.where(m, jnp.int32(MATCH), jnp.int32(MISMATCH))
        c0, c1, c2 = _dp_row16(s0, s1, s2, bump, row)
        active = i <= blens
        for k, v in ((0, at_col(c0)), (1, at_col(c1)), (2, at_col(c2))):
            upd = active & (v > best)
            n_at = jnp.where(upd, 1,
                             jnp.where(active & (v == best), n_at + 1,
                                       n_at))
            best = jnp.where(upd, v, best)
            bk = jnp.where(upd, k, bk)
            bi = jnp.where(upd, i, bi)
        s0 = jnp.where(active, c0, s0)
        s1 = jnp.where(active, c1, s1)
        s2 = jnp.where(active, c2, s2)
        return s0, s1, s2, best, bk, bi, n_at

    s0, s1, s2, best, bk, bi, n_at = jax.lax.fori_loop(
        1, n_rows + 1, body, (s0, s1, s2, best, bk, bi, n_at))
    out_ref[0, :] = best[0, :].astype(jnp.int32)
    out_ref[1, :] = bk[0, :]
    out_ref[2, :] = bi[0, :]
    out_ref[3, :] = (n_at[0, :] >= 2).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("bisulfite", "n_rows",
                                             "block_b", "interpret"))
def sw_align_x_pallas(refs, blens, reads, rlens, bisulfite: bool = False,
                      n_rows: int | None = None, block_b: int = 256,
                      interpret: bool = False):
    """Same contract as sw2.sw_align_x (xcode inputs, int32 outputs)."""
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
    WP = _round_up(M + 1, 16)
    NP = _round_up(n_rows, 16)
    NR = min(N, NP)                 # rows past n_rows are never read
    refs_i = jnp.zeros((NP, BP), jnp.int32).at[:NR, :].set(
        refs[:, :NR].astype(jnp.int32).T)
    reads_i = jnp.full((WP, BP), XN + 2, jnp.int8).at[:M, :].set(
        reads.astype(jnp.int8).T)
    blens_i = blens.astype(jnp.int32).reshape(1, BP)
    rlens_i = rlens.astype(jnp.int32).reshape(1, BP)

    grid = (BP // block_b,)
    out = pl.pallas_call(
        functools.partial(_align_kernel, n_rows=n_rows,
                          bisulfite=bisulfite),
        out_shape=jax.ShapeDtypeStruct((4, BP), jnp.int32),
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
        out_specs=pl.BlockSpec((4, block_b), lambda b: (0, b),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=BP * n_rows * WP * 25,
            bytes_accessed=BP * (NP + WP) * 2, transcendentals=0),
        interpret=interpret,
    )(refs_i, reads_i, blens_i, rlens_i)
    return out[0, :B], out[1, :B], out[2, :B], out[3, :B] != 0


# ---------------------------------------------------------------------------
# traceback kernel


def _parts16(c0, c1, c2):
    # int32 throughout: Mosaic rotates only support 32-bit data
    a0 = jnp.where(c1 > c0, 1, 0)
    m = jnp.maximum(c0, c1)
    a0 = jnp.where(c2 > m, 2, a0)
    b1 = (c1 - jnp.int32(EXT) > c0 - jnp.int32(OPEN)).astype(jnp.int32)
    b2 = (c2 - jnp.int32(EXT) > c0 - jnp.int32(OPEN)).astype(jnp.int32)
    return a0, b1, b2


def _tie16(c0, c1, c2):
    # exact-equality companions (see sw2._tie_parts_of)
    t0 = ((c1 == c0) | (c2 == jnp.maximum(c0, c1))).astype(jnp.int32)
    t1 = (c1 - jnp.int32(EXT) == c0 - jnp.int32(OPEN)).astype(jnp.int32)
    t2 = (c2 - jnp.int32(EXT) == c0 - jnp.int32(OPEN)).astype(jnp.int32)
    return t0, t1, t2


def _tb_kernel(refs_ref, reads_ref, blens_ref, rlens_ref, bk_ref, bi_ref,
               out_ref, bits_ref, *, n_rows: int, bisulfite: bool):
    WP, L = reads_ref.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (WP, L), 0)
    reads = reads_ref[:].astype(jnp.int32)
    blens = blens_ref[:]

    # ---- phase 1: replay DP, store packed decision bits per row -------
    s00, s10, s20 = _row0_16(row)

    def replay(i, carry):
        s0, s1, s2 = carry
        rb = refs_ref[pl.ds(i - 1, 1), :].astype(jnp.int32)
        m = _match16(rb, reads, bisulfite)
        bump = jnp.where(m, jnp.int32(MATCH), jnp.int32(MISMATCH))
        c0, c1, c2 = _dp_row16(s0, s1, s2, bump, row)
        active = i <= blens
        n0 = jnp.where(active, c0, s0)
        n1 = jnp.where(active, c1, s1)
        n2 = jnp.where(active, c2, s2)
        a0p, b1p, _ = _parts16(s0, s1, s2)
        _, _, b2n = _parts16(n0, n1, n2)
        t0p, t1p, _ = _tie16(s0, s1, s2)
        _, _, t2n = _tie16(n0, n1, n2)
        comb = (_shift_down(a0p, jnp.int32(0))
                | (b1p << 2)
                | (_shift_down(b2n, jnp.int32(0)) << 3)
                | (_shift_down(t0p, jnp.int32(0)) << 4)
                | (t1p << 5)
                | (_shift_down(t2n, jnp.int32(0)) << 6))
        bits_ref[pl.ds(i, 1), :, :] = comb[None].astype(jnp.int8)
        return n0, n1, n2

    jax.lax.fori_loop(1, n_rows + 1, replay, (s00, s10, s20))

    # ---- phase 2: row-synchronous walk ---------------------------------
    colv = row                                        # (WP, L) int32
    kind_of = jnp.where(reads == XN, jnp.int32(EV_NONE),
                        reads.astype(jnp.int32))       # row t = base t
    out_ref[:, :] = jnp.full(out_ref.shape, EV_NONE, jnp.int32)

    def walk(t, st):
        jj, kk, alive32 = st
        i = n_rows - t
        act = (alive32 != 0) & (bi_ref[:] >= i)
        rowb = bits_ref[pl.ds(i, 1), :, :][0].astype(jnp.int32)
        a0 = rowb & 3
        b1 = (rowb >> 2) & 1
        b2 = (rowb >> 3) & 1
        t0 = (rowb >> 4) & 1
        t1 = (rowb >> 5) & 1
        t2 = (rowb >> 6) & 1

        stopc = jnp.where(b2 == 0, colv, -1)
        pm = _cummax_sub(stopc, jnp.int32(-1))
        oh_j = colv == jj
        jc = jnp.max(jnp.where(oh_j, pm, -1), axis=0, keepdims=True)

        is2 = act & (kk == 2)
        is1 = act & (kk == 1)
        run_dead = is2 & (jc <= 1)
        run_len = jnp.where(is2, jnp.where(run_dead, jj, jj - jc + 1), 0)
        cstep_j = jnp.where(is2, jc - 1, jj)
        cstep_c = jnp.clip(cstep_j, 0, WP - 1)
        oh_c = colv == cstep_c

        def at_c(x):
            return jnp.max(jnp.where(oh_c, x, -(1 << 30)),
                           axis=0, keepdims=True)

        a0_c = at_c(a0)
        b1_c = at_c(b1)
        consume = act & ~run_dead
        diag = consume & ~is1

        oh_k = colv == jnp.clip(cstep_c - 1, 0, WP - 1)
        kind_row = jnp.max(jnp.where(oh_k, kind_of, -(1 << 30)),
                           axis=0, keepdims=True)
        ev = jnp.where(diag, kind_row,
                       jnp.where(is1, jnp.int32(EV_DEL),
                                 jnp.int32(EV_NONE)))
        attach = (diag & (run_len > 0)) | run_dead
        ins_col = jnp.where(run_dead, 0, cstep_j)

        nk = jnp.where(is1, jnp.where(b1_c == 1, 1, 0), a0_c)
        nj = jnp.where(is1, jj, cstep_j - 1)
        nalive = consume & (nj > 0) & (i - 1 > 0)
        # tie accounting (see sw2.sw_traceback_rows): a0/b1 ties matter
        # only if the walk survives; b2 ties at every visited run col
        pmT = _cummax_sub(jnp.where(t2 == 1, colv, -1), jnp.int32(-1))
        t2max = jnp.max(jnp.where(oh_j, pmT, -1), axis=0, keepdims=True)
        tie_run = is2 & (t2max >= jnp.maximum(jc, 1))
        tie_new = ((diag & (at_c(t0) == 1) & nalive)
                   | (is1 & (at_c(t1) == 1) & nalive)
                   | tie_run)
        packed = (ev
                  | jnp.where(attach, (ins_col + 1) << 4, 0)
                  | jnp.where(attach, run_len << 16, 0)
                  | jnp.where(tie_new, jnp.int32(1) << 28, 0))
        cur = out_ref[pl.ds(i - 1, 1), :]
        out_ref[pl.ds(i - 1, 1), :] = jnp.where(act, packed, cur)

        jj = jnp.where(act, nj, jj)
        kk = jnp.where(act, nk, kk)
        alive32 = jnp.where(act, nalive.astype(jnp.int32), alive32)
        return jj, kk, alive32

    st = (rlens_ref[:].astype(jnp.int32), bk_ref[:].astype(jnp.int32),
          ((bi_ref[:] > 0) & (rlens_ref[:] > 0)).astype(jnp.int32))
    jax.lax.fori_loop(0, n_rows, walk, st)


@functools.partial(jax.jit, static_argnames=("bisulfite", "n_rows",
                                             "block_b", "interpret"))
def sw_tb_rows_pallas(refs, blens, reads, rlens, bt_k, bt_i,
                      bisulfite: bool = False, n_rows: int | None = None,
                      block_b: int = 256, interpret: bool = False):
    """Same contract as sw2.sw_traceback_rows: returns (ev_kind (B, R)
    int8, ins_j (B, R) int16, ins_len (B, R) int16, tie (B,) bool),
    R = n_rows."""
    B, N = refs.shape
    M = reads.shape[1]
    n_rows = N if n_rows is None else n_rows
    if B % block_b != 0:
        pad = _round_up(B, block_b) - B
        refs = jnp.pad(refs, ((0, pad), (0, 0)))
        reads = jnp.pad(reads, ((0, pad), (0, 0)))
        blens = jnp.pad(blens, (0, pad))
        rlens = jnp.pad(rlens, (0, pad), constant_values=1)
        bt_k = jnp.pad(bt_k, (0, pad))
        bt_i = jnp.pad(bt_i, (0, pad))
    BP = refs.shape[0]
    WP = _round_up(M + 1, 16)
    NP = _round_up(n_rows, 16)
    NR = min(N, NP)                 # rows past n_rows are never read
    refs_i = jnp.zeros((NP, BP), jnp.int32).at[:NR, :].set(
        refs[:, :NR].astype(jnp.int32).T)
    reads_i = jnp.full((WP, BP), XN + 2, jnp.int8).at[:M, :].set(
        reads.astype(jnp.int8).T)
    blens_i = blens.astype(jnp.int32).reshape(1, BP)
    rlens_i = rlens.astype(jnp.int32).reshape(1, BP)
    bk_i = bt_k.astype(jnp.int32).reshape(1, BP)
    bi_i = bt_i.astype(jnp.int32).reshape(1, BP)

    grid = (BP // block_b,)
    out = pl.pallas_call(
        functools.partial(_tb_kernel, n_rows=n_rows, bisulfite=bisulfite),
        out_shape=jax.ShapeDtypeStruct((n_rows, BP), jnp.int32),
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
            pl.BlockSpec((1, block_b), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_b), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_rows, block_b), lambda b: (0, b),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NP + 1, WP, block_b), jnp.int8),
        ],
        cost_estimate=pl.CostEstimate(
            flops=BP * n_rows * WP * 40,
            bytes_accessed=BP * (NP + WP) * 2, transcendentals=0),
        interpret=interpret,
    )(refs_i, reads_i, blens_i, rlens_i, bk_i, bi_i)
    packed = out.T[:B]                                # (B, n_rows)
    ev_kind = (packed & 15).astype(jnp.int8)
    insj_p = (packed >> 4) & 0xFFF
    ins_j = (insj_p - 1).astype(jnp.int32)
    ins_len = ((packed >> 16) & 0xFFF).astype(jnp.int32)
    tie = ((packed >> 28) & 1).any(axis=1)
    return ev_kind, ins_j, ins_len, tie
