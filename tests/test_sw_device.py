"""Device SW kernel: int32 DP must match a naive reference DP exactly,
and agree with the float64 oracle up to exact-tie resolution."""

import ctypes

import numpy as np
import pytest

from pecaller_tpu.ops.sw import (sw_align_device, sw_traceback_device,
                                 MATCH, MISMATCH, OPEN, EXT, EV_NONE)
from pecaller_tpu.native.build import load_swexact, ptr


def naive_int_dp(ref, read):
    nn, mm = len(ref), len(read)
    S = np.zeros((3, nn + 1, mm + 1), dtype=np.int64)
    for j in range(mm + 1):
        b = -(OPEN + (j - 1) * EXT) if j else 0
        S[0, :, j] = b
        S[1, :, j] = b
        S[2, :, j] = b if j else -OPEN
    S[0, :, 0] = 0
    S[1, :, 0] = 0
    S[2, :, 0] = -OPEN
    for i in range(1, nn + 1):
        for j in range(1, mm + 1):
            m = MATCH if (ref[i - 1] == read[j - 1] or
                          ref[i - 1] == ord("N") or
                          read[j - 1] == ord("N")) else MISMATCH
            S[2, i, j] = max(S[0, i, j - 1] - OPEN, S[2, i, j - 1] - EXT)
            S[1, i, j] = max(S[0, i - 1, j] - OPEN, S[1, i - 1, j] - EXT)
            S[0, i, j] = max(S[0, i - 1, j - 1], S[1, i - 1, j - 1],
                             S[2, i - 1, j - 1]) + m
    best, bk, bi = S[0, 0, mm], 0, 0
    for i in range(1, nn + 1):
        for k in range(3):
            if S[k, i, mm] > best:
                best, bk, bi = S[k, i, mm], k, i
    return best, bk, bi


def _random_case(rng, nn, mm, err=0.05, indel=True):
    ref = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=nn)
    start = rng.integers(0, max(1, nn - mm))
    read = ref[start:start + mm].copy()
    mask = rng.random(len(read)) < err
    read[mask] = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8),
                            size=mask.sum())
    if indel and rng.random() < 0.5 and len(read) > 20:
        p = rng.integers(5, len(read) - 5)
        k = rng.integers(1, 4)
        if rng.random() < 0.5:
            read = np.concatenate([read[:p], read[p + k:]])
        else:
            ins = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=k)
            read = np.concatenate([read[:p], ins, read[p:]])
    return ref, read[:mm]


def test_device_matches_naive_int_dp():
    rng = np.random.default_rng(0)
    N, M, B = 60, 40, 16
    refs = np.zeros((B, N), dtype=np.uint8)
    reads = np.zeros((B, M), dtype=np.uint8)
    blens = np.zeros(B, dtype=np.int32)
    rlens = np.zeros(B, dtype=np.int32)
    want = []
    for b in range(B):
        nn = int(rng.integers(30, N + 1))
        mm = int(rng.integers(20, M + 1))
        ref, read = _random_case(rng, nn, mm)
        refs[b, :nn] = ref
        reads[b, :len(read)] = read
        blens[b] = nn
        rlens[b] = len(read)
        want.append(naive_int_dp(ref, read[:len(read)]))
    score, bk, bi = sw_align_device(refs, blens, reads, rlens)
    for b in range(B):
        assert int(score[b]) == want[b][0], b
        assert int(bk[b]) == want[b][1], b
        assert int(bi[b]) == want[b][2], b


def test_device_agrees_with_oracle_scores():
    rng = np.random.default_rng(1)
    B, N, M = 32, 72, 56
    refs = np.zeros((B, N), dtype=np.uint8)
    reads = np.zeros((B, M), dtype=np.uint8)
    blens = np.full(B, N, dtype=np.int32)
    rlens = np.full(B, M, dtype=np.int32)
    for b in range(B):
        ref, read = _random_case(rng, N, M)
        refs[b] = ref
        reads[b, :len(read)] = read
        rlens[b] = len(read)
    score, bk, bi = sw_align_device(refs, blens, reads, rlens)

    lib = load_swexact()
    oscore = np.zeros(B)
    ok = np.zeros(B, dtype=np.int32)
    oi = np.zeros(B, dtype=np.int32)
    lib.sw_align_batch(ptr(refs, ctypes.c_uint8),
                       ptr(blens, ctypes.c_int32), N,
                       ptr(reads, ctypes.c_uint8),
                       ptr(rlens, ctypes.c_int32), M, B, 0, 2,
                       ptr(oscore, ctypes.c_double),
                       ptr(ok, ctypes.c_int32), ptr(oi, ctypes.c_int32))
    # scores must agree as exact rationals (x36)
    np.testing.assert_allclose(np.asarray(score) / 36.0, oscore,
                               rtol=0, atol=1e-9)


def naive_int_walk(ref, read, k, i):
    """Reference int-exact backtrack mirroring pemapper.c:1752-1965."""
    nn, mm = len(ref), len(read)
    S = np.zeros((3, nn + 1, mm + 1), dtype=np.int64)
    for j in range(mm + 1):
        b = -(OPEN + (j - 1) * EXT) if j else 0
        S[0, :, j] = b; S[1, :, j] = b
        S[2, :, j] = b if j else -OPEN
    S[0, :, 0] = 0; S[1, :, 0] = 0; S[2, :, 0] = -OPEN
    for ii in range(1, nn + 1):
        for j in range(1, mm + 1):
            m = MATCH if (ref[ii - 1] == read[j - 1] or
                          ref[ii - 1] == ord("N") or
                          read[j - 1] == ord("N")) else MISMATCH
            S[2, ii, j] = max(S[0, ii, j - 1] - OPEN, S[2, ii, j - 1] - EXT)
            S[1, ii, j] = max(S[0, ii - 1, j] - OPEN, S[1, ii - 1, j] - EXT)
            S[0, ii, j] = max(S[0, ii - 1, j - 1], S[1, ii - 1, j - 1],
                              S[2, ii - 1, j - 1]) + m
    counts = np.zeros((nn, 6), dtype=np.int64)
    j = mm
    ins_len = 0
    i1 = j1 = 0
    while i > 0 and j > 0:
        i1, j1 = i - 1, j - 1
        if k == 0:
            mi, mj, mk = i1, j1, 0
            smax = S[0, i1, j1]
            if S[1, i1, j1] > smax:
                mk = 1; smax = S[1, i1, j1]
            if S[2, i1, j1] > smax:
                mk = 2
        elif k == 2:
            mi, mj = i, j1
            mk = 2 if S[2, i, j1] - EXT > S[0, i, j1] - OPEN else 0
        else:
            mi, mj = i1, j
            mk = 1 if S[1, i1, j] - EXT > S[0, i1, j] - OPEN else 0
        if mi != i:
            q = read[j1]
            if mj != j:
                col = {ord("A"): 0, ord("C"): 1, ord("G"): 2,
                       ord("T"): 3}.get(q)
                if col is not None:
                    counts[i1, col] += 1
            else:
                counts[i1, 4] += 1
            if ins_len > 0:
                counts[i1, 5] += 1
            ins_len = 0
        else:
            ins_len += 1
        i, j, k = mi, mj, mk
    if ins_len > 0 and i >= 1:
        counts[i1, 5] += 1
    return counts


def test_traceback_pileup_matches_naive_walk():
    rng = np.random.default_rng(2)
    B, N, M = 16, 72, 56
    refs = np.zeros((B, N), dtype=np.uint8)
    reads = np.zeros((B, M), dtype=np.uint8)
    blens = np.full(B, N, dtype=np.int32)
    rlens = np.full(B, M, dtype=np.int32)
    for b in range(B):
        ref, read = _random_case(rng, N, M, err=0.03)
        refs[b] = ref
        reads[b, :len(read)] = read
        rlens[b] = len(read)
    score, bk, bi = sw_align_device(refs, blens, reads, rlens)
    ev_pos, ev_kind, ins_j, ins_len = sw_traceback_device(
        refs, blens, reads, rlens, np.asarray(bk), np.asarray(bi))
    ev_pos = np.asarray(ev_pos)
    ev_kind = np.asarray(ev_kind)
    ins_j = np.asarray(ins_j)
    for b in range(B):
        want = naive_int_walk(refs[b], reads[b, :rlens[b]],
                              int(bk[b]), int(bi[b]))
        got = np.zeros((N, 6), dtype=np.int64)
        for t in range(ev_pos.shape[1]):
            p = ev_pos[b, t]
            if p >= 0:
                if ev_kind[b, t] != EV_NONE:
                    got[p, ev_kind[b, t]] += 1
                if ins_j[b, t] >= 0:
                    got[p, 5] += 1
        assert np.array_equal(got, want), b
