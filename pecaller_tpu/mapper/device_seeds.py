"""Device seed extraction + chaining: the mapper front half on TPU.

TPU-first redesign of initial_map/fill_mers/find_matches — not a
translation: the reference's per-bucket pointer chasing becomes

  1. a 512 MB presence bitmap over the 4^16 key space (one gather per
     neighborhood key) plus an "abundant" bitmap encoding the
     too_many_spots >= 100 gate (pemapper.c:1599-1615);
  2. a two-level rank table (high-18-bit prefix counts + short fixed-step
     lower_bound) replacing full searchsorted;
  3. fixed-cap padded gathers (8 positions/key, 64/segment, 16 hits/read)
     with per-read overflow flags that route rare repetitive reads to the
     exact host engine;
  4. vectorized co-linear chaining: pairwise |diag-diff| < 12 tests
     between segment lists and an exact emulation of the reference's
     min_match ratchet / dynamic loop bound / min_spots wipe
     (pemapper.c:2188-2289), with diagonal dedup in enumeration order.

Reads flagged ``fallback`` re-run through the exact host path, so
end-to-end output matches the oracle except where a cap binds mid-read
(counted and reported by the engine).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.index_files import SeedIndex
from ..ops.encode import BASE_BITS, _RC, _BYTE_MM, IDEPTH

S_MAX = 20              # max segments (reads <= 299bp)
KEY_CAP = 8             # positions gathered per neighborhood key
SEG_CAP = 64            # positions kept per segment
HIT_CAP = 16            # candidate loci per read (fast path)
TOO_MANY = 100
HI_BITS = 18
POS_PAD = np.int32(2 ** 30)     # padding sentinel (> any position)


class DeviceSeedIndex:
    """Device-resident companion structures for a SeedIndex."""

    def __init__(self, index: SeedIndex):
        keys = np.asarray(index.keys, dtype=np.int64)
        starts = np.asarray(index.starts, dtype=np.int64)
        counts = np.diff(starts)
        words = np.zeros(1 << 27, dtype=np.uint32)
        w = (keys >> 5).astype(np.int64)
        b = (keys & 31).astype(np.uint32)
        np.bitwise_or.at(words, w, np.uint32(1) << b)
        ab = counts >= TOO_MANY
        awords = np.zeros(1 << 27, dtype=np.uint32)
        if ab.any():
            np.bitwise_or.at(awords, w[ab],
                             np.uint32(1) << b[ab].astype(np.uint32))
        hi = (keys >> (32 - HI_BITS)).astype(np.int64)
        hi_table = np.searchsorted(hi, np.arange((1 << HI_BITS) + 1))
        self.n_keys = len(keys)
        self.bitmap = jnp.asarray(words)
        self.abitmap = jnp.asarray(awords)
        self.keys = jnp.asarray(keys.astype(np.uint32))
        self.starts = jnp.asarray(starts.astype(np.int32))
        self.hi_table = jnp.asarray(hi_table.astype(np.int32))
        self.positions = jnp.asarray(
            np.asarray(index.positions, dtype=np.int64).astype(np.int32))
        self.max_subrange = int(np.diff(hi_table).max()) if len(keys) else 1


_BITS_D = jnp.asarray(BASE_BITS.astype(np.int32))
_RC_D = jnp.asarray(_RC)
_BM_D = jnp.asarray(_BYTE_MM.astype(np.int32))


def _probe_bit(words, keys):
    w = words[(keys >> 5)]
    return ((w >> (keys & 31).astype(jnp.uint32)) & 1).astype(jnp.bool_)


def _rank_lookup(keys, starts, hi_table, n_keys, nbi, n_steps: int):
    """uint32 keys -> (start, count); absent keys get count 0."""
    hi = (nbi >> (32 - HI_BITS)).astype(jnp.int32)
    lo = hi_table[hi]
    hi_end = hi_table[hi + 1]
    for _ in range(n_steps):
        cont = lo < hi_end
        mid = (lo + hi_end) >> 1
        v = keys[jnp.clip(mid, 0, n_keys - 1)]
        pred = v < nbi
        lo = jnp.where(cont & pred, mid + 1, lo)
        hi_end = jnp.where(cont & ~pred, mid, hi_end)
    idx = jnp.clip(lo, 0, max(n_keys - 1, 0))
    present = keys[idx] == nbi
    start = jnp.where(present, starts[idx], 0)
    cnt = jnp.where(present, starts[idx + 1] - starts[idx], 0)
    return start, cnt


def _pack_keys_dev(bits, offsets):
    """bits (B, M) int32 codes; offsets (B, S) -> (B, S) uint32 keys."""
    B, M = bits.shape
    key = jnp.zeros(offsets.shape, jnp.uint32)
    for j in range(IDEPTH):
        g = jnp.clip(offsets + j, 0, M - 1)
        sel = jnp.take_along_axis(bits, g, axis=1)
        key = (key << 2) + sel.astype(jnp.uint32)
    return key


def _neighborhood_dev(keys):
    """(B, 2, S) uint32 -> (B, 2, S, 49) uint32 keys, fill_mers order
    (uint32 wrap arithmetic, matching the reference's unsigned ints)."""
    k = keys
    outs = [k[..., None]]
    for shift in (0, 8, 16, 24):
        byte = (k >> shift) & jnp.uint32(0xFF)
        base = k - (byte << shift)
        var = _BM_D[byte.astype(jnp.int32)].astype(jnp.uint32)
        outs.append(base[..., None] + (var << shift))
    return jnp.concatenate(outs, axis=-1)


def seed_chain_core(bitmap, abitmap, ikeys, istarts, hi_table,
                    positions, seqs, lens, offsets, n_segs, min_match0,
                    skip, *, bisulfite: bool, s_max: int, n_steps: int,
                    n_keys: int):
    """Traceable seed+chain core (inlined by build_seed_chain_fn's jit and
    by the fused map step in device_pipeline.py).

    Returns (hits, hits_off, orient, tot, fallback, rev)."""
    S_MAX = s_max
    if True:
        B, M = seqs.shape
        idxr = lens[:, None] - 1 - jnp.arange(M)[None, :]
        rev = jnp.where(idxr >= 0,
                        _RC_D[jnp.take_along_axis(
                            seqs, jnp.clip(idxr, 0, M - 1), axis=1)],
                        0).astype(jnp.uint8)
        if bisulfite:
            conv_f = jnp.where(seqs == ord("C"), ord("T"), seqs)
            conv_r = jnp.where(rev == ord("C"), ord("T"), rev)
        else:
            conv_f, conv_r = seqs, rev
        kf = _pack_keys_dev(_BITS_D[conv_f], offsets)
        kr = _pack_keys_dev(_BITS_D[conv_r], offsets)
        keys2 = jnp.stack([kf, kr], axis=1)            # (B, 2, S)
        nb = _neighborhood_dev(keys2)                  # (B, 2, S, 49)

        present = _probe_bit(bitmap, nb)
        abundant = _probe_bit(abitmap, nb)
        seg_valid = (jnp.arange(S_MAX)[None, :] < n_segs[:, None])
        seg_bad = abundant.any(-1) | ~seg_valid[:, None, :]

        # compact the present keys before the rank lookup + position
        # gather: typically only a few % of the 48 mismatch variants
        # exist in the genome, so this cuts HBM gather traffic ~6x
        active = present & ~seg_bad[..., None]         # (B, 2, S, 49)
        flat_active = active.reshape(-1)
        nflat = flat_active.shape[0]
        K = max(nflat // 6, 1024)
        slot = jnp.cumsum(flat_active.astype(jnp.int32)) - 1
        n_present = slot[-1] + 1
        compact_over = n_present > K                   # whole-batch fallback
        tgt = jnp.where(flat_active, jnp.minimum(slot, K - 1), K)
        comp_keys = jnp.zeros(K + 1, jnp.uint32).at[tgt].set(
            nb.reshape(-1), mode="drop")[:K]
        start_s, cnt_s = _rank_lookup(ikeys, istarts, hi_table, n_keys,
                                      comp_keys, n_steps)
        g_s = start_s[:, None] + jnp.arange(KEY_CAP)
        pmax = max(positions.shape[0] - 1, 0)
        gval_s = jnp.arange(KEY_CAP) < jnp.minimum(cnt_s,
                                                   KEY_CAP)[:, None]
        pos_s = jnp.where(gval_s, positions[jnp.clip(g_s, 0, pmax)],
                          POS_PAD)                     # (K, 8)
        slot_c = jnp.clip(slot, 0, K - 1)
        cnt = jnp.where(flat_active, cnt_s[slot_c], 0).reshape(active.shape)
        seg_tot_true = cnt.sum(-1)                     # (B, 2, S)

        key_over = (cnt > KEY_CAP).any(-1)
        pos = jnp.where(flat_active[:, None], pos_s[slot_c], POS_PAD)
        pos = pos.reshape(*active.shape[:3], 49, KEY_CAP)
        pos = pos.reshape(*pos.shape[:3], 49 * KEY_CAP)
        # ascending smallest SEG_CAP via top_k on negated values (cheaper
        # than a full 392-wide sort)
        neg = jax.lax.top_k(-pos, SEG_CAP)[0]
        pos = -neg[..., ::-1]                          # (B,2,S,64) sorted
        seg_over = (seg_tot_true > SEG_CAP) | key_over

        # --- chaining: support counts per anchor -----------------------
        # one vectorized pass per segment-offset d: segment l vs l+d for
        # all l simultaneously (S-1 ops instead of S^2/2)
        max_off = max(2, IDEPTH - 4)
        diag = pos - offsets[:, None, :, None]          # int32 wrap, like C
        anchor_valid = pos < POS_PAD
        T = jnp.ones(pos.shape, jnp.int32)
        seg_in_read = (jnp.arange(S_MAX)[None, :] <= (n_segs - 1)[:, None])
        for dd in range(1, S_MAX):
            a = diag[:, :, :S_MAX - dd, :]              # anchors seg l
            bseg = diag[:, :, dd:, :]                   # partner seg l+dd
            near = jnp.abs(a[..., :, None] - bseg[..., None, :]) < max_off
            near = near & anchor_valid[:, :, dd:][..., None, :]
            found = near.any(-1) & seg_in_read[:, None, dd:, None]
            T = T.at[:, :, :S_MAX - dd, :].add(found.astype(jnp.int32))
        T = jnp.where(anchor_valid, T, 0)

        # --- min_match ratchet over (orient, loop) in order -------------
        max_depth = (n_segs - 1).astype(jnp.int32)
        min_spots = jnp.where(seg_valid[:, None, :], seg_tot_true,
                              jnp.int32(1 << 30)).min(-1)       # (B, 2)
        wipe = min_spots > 200
        Tmax = T.max(-1)                                        # (B, 2, S)
        cur = min_match0.astype(jnp.int32)
        processed = jnp.zeros((B, 2, S_MAX), jnp.bool_)
        for o in range(2):
            o_ok = ~wipe[:, o] & (skip == 0)
            for l in range(S_MAX):
                active = o_ok & (l <= 1 + max_depth - cur)
                processed = processed.at[:, o, l].set(active)
                cur = jnp.maximum(cur, jnp.where(active, Tmax[:, o, l], 0))
        final_min = cur
        accepted = (processed[..., None] &
                    (T == final_min[:, None, None, None]) & anchor_valid)
        # a reverse-orientation min_spots wipe clears forward survivors
        # too (find_matches zeroes *tot_hits, pemapper.c:2204-2207)
        accepted = accepted & ~wipe[:, 1][:, None, None, None]

        # --- dedup by diagonal, keep enumeration order ------------------
        # stable argsort by diagonal: within a diagonal group, original
        # flat position == enumeration order, so the first row of each
        # group is the entry the reference would keep
        flat_acc = accepted.reshape(B, -1)
        flat_diag = jnp.where(flat_acc, diag.reshape(B, -1), POS_PAD)
        flat_order = jnp.broadcast_to(
            jnp.arange(2 * S_MAX * SEG_CAP, dtype=jnp.int32)[None, :],
            flat_acc.shape)
        flat_pos = pos.reshape(B, -1)
        flat_off = jnp.broadcast_to(offsets[:, None, :, None],
                                    accepted.shape).reshape(B, -1)
        flat_or = jnp.broadcast_to(
            jnp.arange(2, dtype=jnp.int8)[None, :, None, None],
            accepted.shape).reshape(B, -1)
        perm = jnp.argsort(flat_diag, axis=1, stable=True)
        sd = jnp.take_along_axis(flat_diag, perm, 1)
        so = jnp.take_along_axis(flat_order, perm, 1)
        sp = jnp.take_along_axis(flat_pos, perm, 1)
        sf = jnp.take_along_axis(flat_off, perm, 1)
        sr = jnp.take_along_axis(flat_or, perm, 1)
        first = jnp.concatenate(
            [jnp.ones((B, 1), bool), sd[:, 1:] != sd[:, :-1]], axis=1)
        keep = first & (sd < POS_PAD)
        okey = jnp.where(keep, so, jnp.int32(2 ** 30))
        perm2 = jnp.argsort(okey, axis=1)[:, :HIT_CAP]
        hits = jnp.take_along_axis(sp, perm2, 1)
        hits_off = jnp.take_along_axis(sf, perm2, 1)
        orient = jnp.take_along_axis(sr, perm2, 1)
        kk = jnp.take_along_axis(okey, perm2, 1)
        valid_h = kk < (2 ** 30)
        tot = valid_h.sum(1).astype(jnp.int32)
        n_keep = keep.sum(1)
        fallback = (seg_over.any((1, 2)) | (n_keep > HIT_CAP) |
                    compact_over) & (skip == 0)
        return hits, hits_off, orient, tot, fallback, rev


def build_seed_chain_fn(dindex: DeviceSeedIndex, bisulfite: bool = False,
                        s_max: int = 8):
    """s_max: static segment-count bucket (8 covers reads <= 127 bp)."""
    n_steps = max(1, int(np.ceil(np.log2(max(dindex.max_subrange, 2)))) + 1)
    n_keys = dindex.n_keys

    # index arrays are jit ARGUMENTS, not closure constants: closed-over
    # device arrays get inlined into the serialized HLO (0.5 GB bitmap =>
    # oversized remote-compile requests)
    @jax.jit
    def seed_chain_impl(bitmap, abitmap, ikeys, istarts, hi_table,
                        positions, seqs, lens, offsets, n_segs, min_match0,
                        skip):
        hits, hits_off, orient, tot, fallback, _ = seed_chain_core(
            bitmap, abitmap, ikeys, istarts, hi_table, positions, seqs,
            lens, offsets, n_segs, min_match0, skip, bisulfite=bisulfite,
            s_max=s_max, n_steps=n_steps, n_keys=n_keys)
        # pack all outputs into one int32 matrix: a single device->host
        # fetch per call (each fetch costs ~150 ms through the tunnel)
        packed = jnp.concatenate(
            [hits, hits_off.astype(jnp.int32), orient.astype(jnp.int32),
             tot[:, None], fallback.astype(jnp.int32)[:, None]], axis=1)
        return packed

    def dispatch(seqs, lens, offsets, n_segs, min_match0, skip):
        return seed_chain_impl(
            dindex.bitmap, dindex.abitmap, dindex.keys, dindex.starts,
            dindex.hi_table, dindex.positions, seqs, lens, offsets,
            n_segs, min_match0, skip)

    def fetch(pending):
        packed = np.asarray(pending)
        h = HIT_CAP
        return (packed[:, :h], packed[:, h:2 * h],
                packed[:, 2 * h:3 * h].astype(np.int8),
                packed[:, 3 * h], packed[:, 3 * h + 1].astype(bool))

    def seed_chain(seqs, lens, offsets, n_segs, min_match0, skip):
        return fetch(dispatch(seqs, lens, offsets, n_segs, min_match0,
                              skip))

    seed_chain.dispatch = dispatch
    seed_chain.fetch = fetch
    return seed_chain
