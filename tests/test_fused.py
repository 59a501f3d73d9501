"""Fused on-device map step (mapper/device_pipeline.py) equivalence vs
the exact host engine.

The fused pipeline must reproduce the oracle's mapping decisions exactly
(classes, chosen loci, .mfile positions, summary stats): its integer
decision layer is a closed-form re-derivation of the reference's
sequential scans.  Pileup may differ only at exact-score-tie positions,
where the C float64 DP breaks mathematically-equal paths by rounding
noise while the int-exact device DP applies a fixed priority; counts are
conserved (same totals per column), only tie-located placement differs.
"""

import numpy as np
import pytest

from util import (make_genome, write_fasta, sample_reads, write_fastq,
                  assert_tie_local_pileup)


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    d = tmp_path_factory.mktemp("fused")
    rng = np.random.default_rng(42)
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


def _engines(d):
    from pecaller_tpu.formats.sdx import read_sdx, read_seq
    from pecaller_tpu.formats.index_files import load_index
    from pecaller_tpu.mapper.engine import MapperEngine
    from pecaller_tpu.mapper.device_pipeline import FusedMapperEngine
    sdx = read_sdx(str(d / "g.sdx"))
    genome = read_seq(str(d / "g.seq"), sdx.genome_size)
    index = load_index(str(d / "g"))
    kw = dict(paired=True, min_align=0.9, min_dist=0, max_dist=500,
              nthreads=2)
    return (MapperEngine(sdx, genome, index, **kw),
            FusedMapperEngine(sdx, genome, index, **kw))


def test_fused_matches_oracle(data):
    from pecaller_tpu.formats.fastq import FastqBatcher
    e_ref, e_fus = _engines(data)
    batches = list(FastqBatcher(str(data / "r1.fastq"),
                                str(data / "r2.fastq"),
                                batch_size=900).batches())
    for s1, l1, s2, l2, nos in batches:
        rm1, rm2, rc = e_ref.map_batch(s1, l1, s2, l2, read_nos=nos)
        fm1, fm2, fc = e_fus.map_batch(s1, l1, s2, l2, read_nos=nos)
        # decision layer must agree bit-for-bit
        assert np.array_equal(rc, fc)
        assert np.array_equal(rm1, fm1)
        assert np.array_equal(rm2, fm2)

    assert np.array_equal(e_ref.stats.mate_counts, e_fus.stats.mate_counts)
    assert e_ref.stats.total_dist == e_fus.stats.total_dist
    assert e_ref.stats.no_dists == e_fus.stats.no_dists
    assert e_ref.stats.total_bases == e_fus.stats.total_bases

    p_ref = e_ref.final_pileup().astype(np.int64)
    p_fus = e_fus.final_pileup().astype(np.int64)
    # counts conserved per column; only tie-located placement may differ
    assert_tie_local_pileup(p_ref, p_fus)

    # insertion records: same reads and lengths (tie placement inside a
    # repeat may rotate the extracted insertion string, e.g. CTAG/TAGC)
    kr = sorted((k, len(s)) for k, _, s in e_ref.ins_records)
    kf = sorted((k, len(s)) for k, _, s in e_fus.ins_records)
    assert kr == kf


def test_fused_single_end(data):
    from pecaller_tpu.formats.fastq import FastqBatcher
    from pecaller_tpu.formats.sdx import read_sdx, read_seq
    from pecaller_tpu.formats.index_files import load_index
    from pecaller_tpu.mapper.engine import MapperEngine
    from pecaller_tpu.mapper.device_pipeline import FusedMapperEngine
    d = data
    sdx = read_sdx(str(d / "g.sdx"))
    genome = read_seq(str(d / "g.seq"), sdx.genome_size)
    index = load_index(str(d / "g"))
    kw = dict(paired=False, min_align=0.9, nthreads=2)
    e_ref = MapperEngine(sdx, genome, index, **kw)
    e_fus = FusedMapperEngine(sdx, genome, index, **kw)
    batches = list(FastqBatcher(str(d / "r1.fastq"), None,
                                batch_size=512).batches())
    for s1, l1, s2, l2, nos in batches:
        rm1, _, rc = e_ref.map_batch(s1, l1, read_nos=nos)
        fm1, _, fc = e_fus.map_batch(s1, l1, read_nos=nos)
        assert np.array_equal(rc, fc)
        assert np.array_equal(rm1, fm1)
    assert np.array_equal(e_ref.stats.mate_counts, e_fus.stats.mate_counts)
    p_ref = e_ref.final_pileup().astype(np.int64)
    p_fus = e_fus.final_pileup().astype(np.int64)
    assert_tie_local_pileup(p_ref, p_fus)
