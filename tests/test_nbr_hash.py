"""Cuckoo rank-table (index/nbr.build_cuckoo) unit tests: exact
(start, cnt_sat, abundant) recovery for every inserted key, no false
positives for absent keys (tag+slot reconstruct the full invertible
mix, so a match identifies the key exactly)."""

import numpy as np

from pecaller_tpu.index.nbr import build_cuckoo, _mix1, _mix2


def _lookup(tagt, valt, tb, qs):
    T = 1 << tb
    m1, m2 = _mix1(qs), _mix2(qs)
    h1 = (m1 & np.uint32(T - 1)).astype(np.int64)
    h2 = T + (m2 & np.uint32(T - 1)).astype(np.int64)
    e1, e2 = tagt[h1], tagt[h2]
    tfm = np.uint32((1 << 22) - 1)
    hit1 = ((e1 >> 31) != 0) & ((e1 & tfm) == (m1 >> np.uint32(tb)))
    hit2 = ((e2 >> 31) != 0) & ((e2 & tfm) == (m2 >> np.uint32(tb)))
    pres = hit1 | hit2
    e = np.where(hit1, e1, e2)
    sel = np.where(hit1, h1, h2)
    start = np.where(pres, valt[sel], 0)
    cnt = np.where(pres, (e >> np.uint32(22)) & np.uint32(0xFF), 0)
    ab = np.where(pres, (e >> np.uint32(30)) & np.uint32(1), 0)
    return pres, start, cnt, ab


def test_cuckoo_roundtrip():
    rng = np.random.default_rng(0)
    keys = np.unique(rng.integers(0, 2**32, 300000,
                                  dtype=np.uint64).astype(np.uint32))
    nn = len(keys)
    starts = np.cumsum(rng.integers(1, 300, nn + 1).astype(np.uint32)) - 1
    ab = rng.random(nn) < 0.01
    vs = starts[:nn + 1].copy().astype(np.uint32)
    vs[:-1] |= ab.astype(np.uint32) << 31
    tagt, valt, tb = build_cuckoo(keys, vs)

    pres, start, cnt, a = _lookup(tagt, valt, tb, keys)
    assert pres.all()
    assert np.array_equal(start, vs[:-1] & np.uint32((1 << 31) - 1))
    exp_cnt = np.minimum(np.diff(starts[:nn + 1].astype(np.int64)), 255)
    assert np.array_equal(cnt.astype(np.int64), exp_cnt)
    assert np.array_equal(a, ab.astype(np.uint32))

    absent = np.setdiff1d(
        rng.integers(0, 2**32, 100000, dtype=np.uint64).astype(np.uint32),
        keys)
    pres2 = _lookup(tagt, valt, tb, absent)[0]
    assert not pres2.any()


def test_cuckoo_empty_and_tiny():
    t, v, tb = build_cuckoo(np.zeros(0, np.uint32), np.zeros(1, np.uint32))
    assert not ((t >> 31) != 0).any()
    keys = np.array([0, 1, 2**32 - 1], np.uint32)
    vs = np.array([5, 9, 17, 20], np.uint32)
    tagt, valt, tb = build_cuckoo(keys, vs)
    pres, start, cnt, ab = _lookup(tagt, valt, tb, keys)
    assert pres.all()
    assert np.array_equal(start, [5, 9, 17])
    assert np.array_equal(cnt, [4, 8, 3])
