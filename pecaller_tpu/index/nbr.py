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

Storage blows up ~49x on positions, so this index is gated to small
genomes (build_nbr_index refuses above ``max_positions``); larger
genomes keep the direct CSR path.

Record layout (device side):
  nkeys    (Nn,)  uint32  sorted unique closure keys
  val      (Nn,)  uint64  start(34) | cnt_sat8(<<40) | abund(<<48)
  pos_pair (ceil(P/2)+pad,) uint64  positions packed two per word
                                    (lo = even index), enabling 2x wider
                                    gathers
  hi_table (2^HI+1,) int32  prefix counts over the top HI key bits
"""

from __future__ import annotations

import os

import numpy as np

from ..formats.index_files import SeedIndex
from ..ops.encode import mismatch_neighborhood_keys

TOO_MANY = 100          # pemapper.c:162 too_many_spots
NBR_HI_BITS = 26
NBR_MAGIC = 0x4E425231  # "NBR1"


class NbrIndex:
    """Host-side container for the inverted neighborhood index."""

    def __init__(self, nkeys: np.ndarray, val: np.ndarray,
                 positions: np.ndarray, hi_table: np.ndarray):
        self.nkeys = nkeys          # uint32 sorted
        self.val = val              # uint64 packed
        self.positions = positions  # uint32
        self.hi_table = hi_table    # int32 (2^HI + 1)
        sub = np.diff(hi_table)
        self.max_subrange = int(sub.max()) if len(sub) else 1

    @staticmethod
    def pack_val(start: np.ndarray, cnt_sat: np.ndarray,
                 abund: np.ndarray) -> np.ndarray:
        return (start.astype(np.uint64)
                | (cnt_sat.astype(np.uint64) << np.uint64(40))
                | (abund.astype(np.uint64) << np.uint64(48)))


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
        return NbrIndex(np.zeros(0, np.uint32), np.zeros(0, np.uint64),
                        np.zeros(0, np.uint32),
                        np.zeros((1 << NBR_HI_BITS) + 1, np.int32))
    total_out = 49 * int(counts.sum())
    if total_out > max_positions:
        raise ValueError(
            f"nbr index would hold {total_out} positions > cap "
            f"{max_positions}")
    abundant = counts >= TOO_MANY

    # all (variant_key, exact_idx) pairs, sorted by variant key: packed
    # u64 sort (key<<idx_bits | exact_idx) beats argsort ~2x at 49*Ne
    idx_bits = max(1, int(ne - 1).bit_length())
    nball = mismatch_neighborhood_keys(keys)            # (Ne, 49)
    combo = (nball.astype(np.uint64) << np.uint64(idx_bits))
    combo |= np.arange(ne, dtype=np.uint64)[:, None]
    combo = combo.ravel()
    combo.sort()
    sv = (combo >> np.uint64(idx_bits)).astype(np.uint32)
    se = (combo & np.uint64((1 << idx_bits) - 1)).astype(np.int64)
    del combo, nball

    newg = np.empty(len(sv), dtype=bool)
    newg[0] = True
    np.not_equal(sv[1:], sv[:-1], out=newg[1:])
    gid = np.cumsum(newg, dtype=np.int64) - 1           # group per pair
    nkeys = sv[newg].copy()
    nn = len(nkeys)

    # per-group totals / flags (bincount beats ufunc.at ~20x)
    pair_cnt = counts[se]
    g_cnt = np.bincount(gid, weights=pair_cnt.astype(np.float64),
                        minlength=nn).astype(np.int64)
    g_ab = np.bincount(gid[abundant[se]], minlength=nn) > 0

    # expand pair position ranges, then sort by (group, position)
    off = np.cumsum(pair_cnt) - pair_cnt
    total = int(off[-1] + pair_cnt[-1]) if len(pair_cnt) else 0
    within = np.arange(total, dtype=np.int64) - np.repeat(off, pair_cnt)
    src = np.repeat(starts[se], pair_cnt) + within
    del within, off
    gid_e = np.repeat(gid, pair_cnt)
    del gid, pair_cnt
    combo = (gid_e.astype(np.uint64) << np.uint64(32)) | \
        positions[src].astype(np.uint64)
    del gid_e, src
    combo.sort()
    out_pos = (combo & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    del combo

    g_start = np.concatenate([[0], np.cumsum(g_cnt)])[:-1]
    cnt_sat = np.minimum(g_cnt, 255)
    val = NbrIndex.pack_val(g_start, cnt_sat, g_ab)

    hi = (nkeys >> np.uint32(32 - NBR_HI_BITS)).astype(np.int64)
    hi_counts = np.bincount(hi, minlength=1 << NBR_HI_BITS)
    hi_table = np.zeros((1 << NBR_HI_BITS) + 1, dtype=np.int64)
    np.cumsum(hi_counts, out=hi_table[1:])
    return NbrIndex(nkeys, val, out_pos, hi_table.astype(np.int32))


def _cache_path(basename: str) -> str:
    return basename + ".nbx.npz"


def load_nbr_index(basename: str, index: SeedIndex,
                   max_positions: int = 1_500_000_000,
                   cache: bool = True) -> NbrIndex:
    """Load (or build + disk-cache) the nbr index for ``basename``."""
    p = _cache_path(basename)
    mdx = basename + ".mdx"
    if cache and os.path.exists(p) and (
            not os.path.exists(mdx)
            or os.path.getmtime(p) >= os.path.getmtime(mdx)):
        z = np.load(p)
        if int(z["magic"]) == NBR_MAGIC:
            return NbrIndex(z["nkeys"], z["val"], z["positions"],
                            z["hi_table"])
    nbr = build_nbr_index(index, max_positions=max_positions)
    if cache:
        try:
            np.savez(p, magic=np.int64(NBR_MAGIC), nkeys=nbr.nkeys,
                     val=nbr.val, positions=nbr.positions,
                     hi_table=nbr.hi_table)
        except OSError:
            pass
    return nbr
