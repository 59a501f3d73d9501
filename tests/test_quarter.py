"""Quartered-key index (index/quarter.py, the v2.5 mid-genome seed
path): candidate-set equivalence with the Hamming-1 closure, and full
FusedMapperEngine2 parity vs the exact host oracle when seeded through
the quarter index."""

import numpy as np
import pytest

from util import (make_genome, write_fasta, sample_reads, write_fastq)


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    d = tmp_path_factory.mktemp("quarter")
    rng = np.random.default_rng(47)
    names, seqs = make_genome(rng, [30000, 20000], n_blocks=[(0, 5000, 30)])
    fa = str(d / "g.fa")
    write_fasta(fa, names, seqs)
    from pecaller_tpu.index import build_index
    build_index(fa, str(d / "g"), write_idx=False)
    reads = sample_reads(rng, names, seqs, 900, read_len=100, err_rate=0.01,
                         paired=True, insert_lo=150, insert_hi=450,
                         indel_rate=0.15, max_indel=4)
    write_fastq(str(d / "r1.fastq"), reads, which=0)
    write_fastq(str(d / "r2.fastq"), reads, which=1)
    return d


def _load(d):
    from pecaller_tpu.formats.sdx import read_sdx, read_seq
    from pecaller_tpu.formats.index_files import load_index
    sdx = read_sdx(str(d / "g.sdx"))
    genome = read_seq(str(d / "g.seq"), sdx.genome_size)
    index = load_index(str(d / "g"))
    return sdx, genome, index


def _host_quarter_probe(qi, key, t_cap=10 ** 9):
    """Host replica of the device quarter probe: (sorted candidate
    positions, poisoned)."""
    from pecaller_tpu.index.quarter import MARKER, N_SUB
    starts = np.asarray(qi.starts).astype(np.int64)
    pos = np.asarray(qi.pos)
    qb_all = np.asarray(qi.qw).view(np.uint8)
    cands, poison = [], False
    for q in range(4):
        s = (3 - q) * 8
        qb_p = (key >> s) & 0xFF
        sub = (((key >> s) >> 8) << s) | (key & ((1 << s) - 1))
        base = q * N_SUB + sub
        lo, hi = starts[base], starts[base + 1]
        for g in range(lo, min(hi, lo + t_cap)):
            x = int(qb_all[g]) ^ qb_p
            f = (x | (x >> 1)) & 0x55
            nm = (f & 1) + ((f >> 2) & 1) + ((f >> 4) & 1) + ((f >> 6) & 1)
            if pos[g] >= MARKER:
                if nm <= 1:
                    poison = True
                continue
            if nm == 1 or (nm == 0 and q == 0):
                cands.append(int(pos[g]))
    return sorted(cands), poison


def test_quarter_candidates_match_closure(data):
    """For random probe keys (present 16-mers, their 1-mismatch
    variants, and random keys) the quarter probe yields exactly the
    reference's Hamming<=1 candidate set (fill_mers semantics,
    pemapper.c:1969-2003) with the too_many_spots poison flag."""
    from pecaller_tpu.index.quarter import build_quarter_index, TOO_MANY
    from pecaller_tpu.ops.encode import mismatch_neighborhood_keys
    _, _, index = _load(data)
    qi = build_quarter_index(index)

    keys = np.asarray(index.keys, np.uint32)
    starts = np.asarray(index.starts, np.int64)
    positions = np.asarray(index.positions, np.uint32)
    counts = np.diff(starts)

    rng = np.random.default_rng(0)
    probes = list(rng.choice(keys, size=40))
    # 1-mismatch variants of present keys (hit the nm==1 filter arm)
    nb = mismatch_neighborhood_keys(np.asarray(probes[:20], np.uint32))
    probes += [nb[i, 1 + rng.integers(48)] for i in range(20)]
    probes += list(rng.integers(0, 1 << 32, 20).astype(np.uint32))

    for pk in probes:
        pk = int(pk)
        nbh = set(int(v) for v in
                  mismatch_neighborhood_keys(
                      np.asarray([pk], np.uint32))[0])
        want, want_poison = [], False
        for k in nbh:
            i = np.searchsorted(keys, np.uint32(k))
            if i >= len(keys) or keys[i] != np.uint32(k):
                continue
            if counts[i] >= TOO_MANY:
                want_poison = True
            else:
                want.extend(int(p) for p in
                            positions[starts[i]:starts[i + 1]])
        got, got_poison = _host_quarter_probe(qi, pk)
        assert got == sorted(want), hex(pk)
        assert got_poison == want_poison, hex(pk)


def test_fused2_quarter_matches_oracle(data):
    """Full mapping parity: FusedMapperEngine2 seeded by the quarter
    index must reproduce the exact host engine (same contract as
    test_fused2_matches_oracle)."""
    from pecaller_tpu.formats.fastq import FastqBatcher
    from pecaller_tpu.mapper.engine import MapperEngine
    from pecaller_tpu.mapper.device_map2 import FusedMapperEngine2
    from pecaller_tpu.index.quarter import build_quarter_index
    sdx, genome, index = _load(data)
    kw = dict(paired=True, min_align=0.9, min_dist=0, max_dist=500,
              nthreads=2)
    e_ref = MapperEngine(sdx, genome, index, **kw)
    e_fus = FusedMapperEngine2(sdx, genome, index,
                               quarter=build_quarter_index(index), **kw)
    assert e_fus._dnbr.mode == "quarter"
    batches = list(FastqBatcher(str(data / "r1.fastq"),
                                str(data / "r2.fastq"),
                                batch_size=900).batches())
    for s1, l1, s2, l2, nos in batches:
        rm1, rm2, rc = e_ref.map_batch(s1, l1, s2, l2, read_nos=nos)
        fm1, fm2, fc = e_fus.map_batch(s1, l1, s2, l2, read_nos=nos)
        assert np.array_equal(rc, fc)
        assert np.array_equal(rm1, fm1)
        assert np.array_equal(rm2, fm2)

    assert np.array_equal(e_ref.stats.mate_counts, e_fus.stats.mate_counts)
    assert e_ref.stats.total_dist == e_fus.stats.total_dist
    assert e_ref.stats.total_bases == e_fus.stats.total_bases

    p_ref = e_ref.final_pileup().astype(np.int64)
    p_fus = e_fus.final_pileup().astype(np.int64)
    assert np.array_equal(p_ref, p_fus)

    kr = sorted((k, len(s)) for k, _, s in e_ref.ins_records)
    kf = sorted((k, len(s)) for k, _, s in e_fus.ins_records)
    assert kr == kf


def test_quarter_single_end_bisulfite(data, tmp_path):
    """Quarter-seeded single-end and bisulfite paths vs the oracle."""
    from pecaller_tpu.formats.fastq import FastqBatcher
    from pecaller_tpu.mapper.engine import MapperEngine
    from pecaller_tpu.mapper.device_map2 import FusedMapperEngine2
    from pecaller_tpu.index.quarter import build_quarter_index
    sdx, genome, index = _load(data)
    kw = dict(paired=False, min_align=0.9, nthreads=2)
    e_ref = MapperEngine(sdx, genome, index, **kw)
    e_fus = FusedMapperEngine2(sdx, genome, index,
                               quarter=build_quarter_index(index), **kw)
    for s1, l1, s2, l2, nos in FastqBatcher(
            str(data / "r1.fastq"), None, batch_size=512).batches():
        rm1, _, rc = e_ref.map_batch(s1, l1, read_nos=nos)
        fm1, _, fc = e_fus.map_batch(s1, l1, read_nos=nos)
        assert np.array_equal(rc, fc)
        assert np.array_equal(rm1, fm1)
    assert np.array_equal(e_ref.stats.mate_counts, e_fus.stats.mate_counts)
    p_ref = e_ref.final_pileup().astype(np.int64)
    p_fus = e_fus.final_pileup().astype(np.int64)
    assert np.array_equal(p_ref, p_fus)


def test_quarter_cache_roundtrip(data, tmp_path):
    """load_quarter_index caches and reloads byte-identical arrays."""
    from pecaller_tpu.index.quarter import (build_quarter_index,
                                            load_quarter_index)
    _, _, index = _load(data)
    base = str(tmp_path / "q")
    # needs an .mdx mtime anchor
    open(base + ".mdx", "wb").close()
    qi1 = load_quarter_index(base, index)
    qi2 = load_quarter_index(base, index)      # from cache
    qi0 = build_quarter_index(index)
    for part in ("starts", "cnts", "pos", "qw"):
        assert np.array_equal(np.asarray(getattr(qi1, part)),
                              np.asarray(getattr(qi0, part))), part
        assert np.array_equal(np.asarray(getattr(qi2, part)),
                              np.asarray(getattr(qi0, part))), part
