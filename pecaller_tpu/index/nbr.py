"""1-mismatch-closed inverted seed index ("nbr index").

TPU-first replacement for the per-probe neighborhood expansion: instead
of probing all 49 variant keys of a read segment against the exact-key
CSR (the reference's fill_mers loop, pemapper.c:1969-2003), we invert
the relation offline.  For every key v in the Hamming-1 closure of the
genome's 16-mer set, the index stores the union of the position lists of
all exact keys within distance 1 of v, merged ascending.  A segment
probe then costs ONE rank lookup + one short contiguous position gather,
instead of 49 presence probes + a 392-wide merge/sort (which profiling
showed dominates the TPU seed stage: scatter-based compaction ~150 ms +
top_k ~21 ms per batch-end).

Semantics are exactly the reference's: position p (with exact 16-mer
k_p) is a candidate for probe v iff Hamming(v, k_p) <= 1, and candidates
are consumed in ascending-position order — identical to sorting the
union of the 49 per-variant lists.  The reference's too_many_spots
abundance gate applies per VARIANT key (any constituent exact key with
>= 100 positions poisons the probing segment, pemapper.c:1599-1615), so
each nbr record carries an "abundant constituent" flag.

Build strategy: every (variant_key, position) pair becomes one u64
  variant(32) << 31 | position(30) << 1 | abundant(1)
and ONE in-place sort orders the whole index (variant-major, position
ascending within variant; the abundant low bit can't reorder positions).
Positions are < 2^30 by the fused-engine gate, so this fits 63 bits.
Large buffers are hugepage-backed (utils/hugemem.py) because this VM
faults 4K pages at ~40 MB/s.

Storage blows up ~49x on positions, so this index is gated to small
genomes (build_nbr_index refuses above ``max_positions``); larger
genomes keep the direct CSR path.
"""

from __future__ import annotations

import os

import numpy as np

from ..formats.index_files import SeedIndex
from ..ops.encode import mismatch_neighborhood_keys
from ..utils.hugemem import hp_empty

TOO_MANY = 100          # pemapper.c:162 too_many_spots
NBR_MAGIC = 0x4E425232  # "NBR2"
_CH = 1 << 23           # elements per streaming chunk


NBR_HI_BITS = 28


class NbrIndex:
    """Host-side container for the inverted neighborhood index.

    Arrays are stored exactly as the device wants them (the packed-u64
    form needs jax x64 and the split costs ~60 s of slow page faults at
    load time on this host):
      nkeys     uint32 sorted closure keys
      val_start uint32 offset of each key's position run, with the
                "abundant constituent" flag in bit 31; counts come from
                the NEXT key's start (runs are contiguous), so there is
                no separate count array
      positions int32  merged ascending per key
      hi_table  int32  (2^NBR_HI_BITS + 1) prefix counts over key>>6
    """

    def __init__(self, nkeys, val_start, positions, hi_table):
        self.nkeys = nkeys
        self.val_start = val_start
        self.positions = positions
        self.hi_table = hi_table


def build_nbr_index(index: SeedIndex,
                    max_positions: int = 1_500_000_000) -> NbrIndex:
    """Build the Hamming-1 inverted index from an exact-key CSR.

    Raises ValueError when the expanded index would exceed
    ``max_positions`` entries (the caller should then keep the direct
    path).
    """
    keys = np.asarray(index.keys, dtype=np.uint32)
    starts = np.asarray(index.starts, dtype=np.int64)
    positions = np.asarray(index.positions, dtype=np.uint32)
    counts = np.diff(starts)
    ne = len(keys)
    if ne == 0:
        z = np.zeros(0, np.uint32)
        return NbrIndex(z, np.zeros(1, np.uint32), z.view(np.int32).copy(),
                        np.zeros((1 << NBR_HI_BITS) + 1, np.int32))
    P = int(counts.sum())
    total = 49 * P
    if total > max_positions:
        raise ValueError(
            f"nbr index would hold {total} positions > cap "
            f"{max_positions}")
    if int(positions.max(initial=0)) >= (1 << 30):
        raise ValueError("nbr index requires positions < 2^30")

    # per-position exact-key fields (small: P entries)
    e_of_p = np.repeat(np.arange(ne, dtype=np.int64), counts)
    ab_of_p = (counts >= TOO_MANY)[e_of_p].astype(np.uint64)
    pos_ab = (positions.astype(np.uint64) << np.uint64(1)) | ab_of_p
    del ab_of_p

    # expand all 49 variant columns into one u64 array, then one sort
    big = hp_empty(total, np.uint64)
    KCH = 1 << 19
    for klo in range(0, ne, KCH):
        khi = min(klo + KCH, ne)
        nb = mismatch_neighborhood_keys(keys[klo:khi])  # (k, 49) u32
        plo, phi = int(starts[klo]), int(starts[khi])
        eo = e_of_p[plo:phi] - klo
        pa = pos_ab[plo:phi]
        for col in range(49):
            vcol = nb[:, col].astype(np.uint64) << np.uint64(31)
            big[col * P + plo:col * P + phi] = vcol[eo] | pa
    del e_of_p, pos_ab
    big.sort()

    # group boundaries (variant-key runs) + per-group stats, streamed
    # into hugepage buffers (nn ~ total for sparse genomes)
    g_start = hp_empty(total, np.int64)
    nn = 0
    prev_hi = None
    for lo in range(0, total, _CH):
        hi = min(lo + _CH, total)
        vk = big[lo:hi] >> np.uint64(31)
        nb = np.empty(hi - lo, bool)
        nb[0] = (prev_hi is None) or (vk[0] != prev_hi)
        np.not_equal(vk[1:], vk[:-1], out=nb[1:])
        idxs = np.flatnonzero(nb)
        g_start[nn:nn + len(idxs)] = idxs + lo
        nn += len(idxs)
        prev_hi = vk[-1]
    g_start = g_start[:nn]

    # abundance prefix sums over the stolen low bit
    ab_cum = hp_empty(total + 1, np.int64)
    ab_cum[0] = 0
    carry = 0
    for lo in range(0, total, _CH):
        hi = min(lo + _CH, total)
        np.cumsum((big[lo:hi] & np.uint64(1)).astype(np.int64),
                  out=ab_cum[lo + 1:hi + 1])
        ab_cum[lo + 1:hi + 1] += carry
        carry = int(ab_cum[hi])

    nkeys = hp_empty(nn, np.uint32)
    # val_start has nn+1 entries: entry i+1's start delimits run i, so
    # counts need no array of their own (abundance flag rides bit 31)
    val_start = hp_empty(nn + 1, np.uint32)
    val_start[nn] = total
    hi_counts = np.zeros(1 << NBR_HI_BITS, np.int64)
    for lo in range(0, nn, _CH):
        hi = min(lo + _CH, nn)
        gs = g_start[lo:hi]
        ge = np.empty(hi - lo, np.int64)
        ge[:-1] = g_start[lo + 1:hi]
        ge[-1] = g_start[hi] if hi < nn else total
        nk = (big[gs] >> np.uint64(31)).astype(np.uint32)
        nkeys[lo:hi] = nk
        g_ab = ((ab_cum[ge] - ab_cum[gs]) > 0).astype(np.uint32)
        val_start[lo:hi] = gs.astype(np.uint32) | (g_ab << np.uint32(31))
        hi_counts += np.bincount(nk >> np.uint32(32 - NBR_HI_BITS),
                                 minlength=1 << NBR_HI_BITS)
    del ab_cum, g_start
    hi_table = np.zeros((1 << NBR_HI_BITS) + 1, np.int64)
    np.cumsum(hi_counts, out=hi_table[1:])

    out_pos = hp_empty(total, np.int32)
    for lo in range(0, total, _CH):
        hi = min(lo + _CH, total)
        out_pos[lo:hi] = ((big[lo:hi] >> np.uint64(1))
                          & np.uint64((1 << 30) - 1)).astype(np.int32)
    del big
    return NbrIndex(nkeys, val_start, out_pos,
                    hi_table.astype(np.int32))


_PARTS = ("nkeys", "vstart", "pos", "hi")


def _cache_paths(basename: str):
    return {k: f"{basename}.nbx.{k}.npy" for k in _PARTS}


def load_nbr_index(basename: str, index: SeedIndex,
                   max_positions: int = 1_500_000_000,
                   cache: bool = True) -> NbrIndex:
    """Load (or build + disk-cache) the nbr index for ``basename``.

    Cached parts are raw .npy files opened with mmap_mode="r": no
    anonymous-page zeroing, no zipfile streaming — the arrays go
    straight from the page cache into the device transfer."""
    ps = _cache_paths(basename)
    mdx = basename + ".mdx"
    fresh = cache and all(os.path.exists(p) for p in ps.values())
    if fresh and os.path.exists(mdx):
        fresh = all(os.path.getmtime(p) >= os.path.getmtime(mdx)
                    for p in ps.values())
    if fresh:
        a = {k: np.load(p, mmap_mode="r") for k, p in ps.items()}
        return NbrIndex(a["nkeys"], a["vstart"], a["pos"], a["hi"])
    nbr = build_nbr_index(index, max_positions=max_positions)
    if cache:
        try:
            np.save(ps["nkeys"], nbr.nkeys)
            np.save(ps["vstart"], nbr.val_start)
            np.save(ps["pos"], nbr.positions)
            np.save(ps["hi"], nbr.hi_table)
        except OSError:
            pass
    return nbr
