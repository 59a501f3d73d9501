"""TPU-backed mapping engine: the host seed/chain/decision scaffolding of
MapperEngine with the Smith-Waterman score + traceback stages and the
pileup accumulation moved onto the device (ops/sw.py kernels).

Scores are exact rationals x36 (int32); the C decision layer consumes
score/36.0, whose comparisons are tie-exact.  Differences vs the float64
oracle are confined to exact-tie resolution inside the DP (see ops/sw.py).
"""

from __future__ import annotations

import numpy as np

from .engine import MapperEngine, MAX_HITS
from ..ops import sw as dsw


def _pad_to(x: int, step: int) -> int:
    return ((x + step - 1) // step + 1) * step if x % step else x + step


class DeviceMapperEngine(MapperEngine):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        import jax.numpy as jnp
        self._jnp = jnp
        self.dev_counts = jnp.zeros((self.sdx.genome_size, 6), jnp.uint16)
        self._shape_cache = {}

    # pad widths to coarse buckets so jit recompiles stay rare
    def _bucket(self, n, m):
        return (_pad_to(max(n, 8), 64), _pad_to(max(m, 8), 64))

    def _sw_scores(self, refs, blens, reads, rlens):
        H = refs.shape[0]
        if H == 0:
            return (np.zeros(0), np.zeros(0, np.int32),
                    np.zeros(0, np.int32))
        N, M = self._bucket(refs.shape[1], reads.shape[1])
        refs_p = np.zeros((H, N), dtype=np.uint8)
        refs_p[:, :refs.shape[1]] = refs
        reads_p = np.ones((H, M), dtype=np.uint8)   # pad != ref pad (0)
        reads_p[:, :reads.shape[1]] = reads
        score, bk, bi = dsw.sw_align_device(refs_p, blens.astype(np.int32),
                                            reads_p, rlens.astype(np.int32),
                                            bisulfite=self.bisulfite,
                                            n_rows=N)
        return (np.asarray(score).astype(np.float64) / 36.0,
                np.asarray(bk, dtype=np.int32),
                np.asarray(bi, dtype=np.int32))

    def _backtrack_end(self, seqs, lens, rev, orient, flat, best, use, end,
                       read_nos):
        jnp = self._jnp
        B = seqs.shape[0]
        m = np.zeros(B, dtype=np.uint32)
        winners = np.nonzero(use == 1)[0]
        if len(winners) == 0:
            return m
        flat_idx = np.full((B, MAX_HITS), -1, dtype=np.int64)
        flat_idx[flat["rid"], flat["hid"]] = np.arange(len(flat["rid"]))
        sel = flat_idx[winners, best[winners]]
        starts = flat["starts"][sel]
        blens = np.ascontiguousarray(flat["blens"][sel]).astype(np.int32)
        out_k = np.asarray(flat["out_k"][sel], dtype=np.int32)
        out_i = np.asarray(flat["out_i"][sel], dtype=np.int32)
        ors = orient[winners, best[winners]]
        oriented = np.where(ors[:, None] == 1, rev[winners], seqs[winners])
        rlens = lens[winners].astype(np.int32)
        width = int(blens.max()) if len(blens) else 1
        refs = self._gather_refs(starts, blens, width)
        m[winners] = (starts + out_i + 1).astype(np.uint32)

        N, M = self._bucket(width, oriented.shape[1])
        H = len(winners)
        refs_p = np.zeros((H, N), dtype=np.uint8)
        refs_p[:, :width] = refs
        reads_p = np.ones((H, M), dtype=np.uint8)
        reads_p[:, :oriented.shape[1]] = oriented

        ev_pos, ev_kind, ins_j, ins_len = dsw.sw_traceback_device(
            refs_p, blens, reads_p, rlens, out_k, out_i,
            bisulfite=self.bisulfite, n_rows=N)
        # absolute positions + scatter on device
        pos0 = jnp.asarray(starts.astype(np.int64))[:, None]
        ev_pos_abs = jnp.where(ev_pos >= 0, ev_pos + pos0, -1)
        ins_mask = jnp.asarray(np.asarray(ins_j)) >= 0
        self.dev_counts = self.dev_counts + dsw.pileup_scatter(
            ev_pos_abs.reshape(-1), ev_kind.reshape(-1),
            ins_mask.reshape(-1), genome_size=self.sdx.genome_size)

        ins_j_np = np.asarray(ins_j)
        ins_len_np = np.asarray(ins_len)
        ev_pos_np = np.asarray(ev_pos)
        wb, wt = np.nonzero(ins_j_np >= 0)
        for b, t in zip(wb, wt):
            w = winners[b]
            rn = int(read_nos[w]) if read_nos is not None else int(w)
            js, ln = int(ins_j_np[b, t]), int(ins_len_np[b, t])
            gpos = int(starts[b] + ev_pos_np[b, t])
            s = oriented[b, js:js + ln].tobytes().decode()
            self.ins_records.append(((self._order_counter + rn, end),
                                     gpos, s))
        return m

    def final_pileup(self) -> np.ndarray:
        host = self.pileup.sum(axis=0, dtype=np.uint16)
        return (host + np.asarray(self.dev_counts)).astype(np.uint16)

    def reset_group(self) -> None:
        super().reset_group()
        self.dev_counts = self._jnp.zeros(
            (self.sdx.genome_size, 6), self._jnp.uint16)
