"""Mapper parity: pileup/mfile/summary/indel byte-equal to C pemapper."""

import gzip
import os
import shutil
import subprocess

import numpy as np
import pytest

from pecaller_tpu.mapper import run_mapper, MapperConfig

from util import (golden_ready,
                  have_reference, ref_binaries, run_ref_indexer, make_genome,
                  write_fasta, sample_reads, write_fastq, golden_dir)

pytestmark = pytest.mark.skipif(not have_reference(),
                                reason="reference sources unavailable")


def _gz(path):
    with gzip.open(path, "rb") as f:
        return f.read()


@pytest.fixture(scope="module")
def single_golden():
    d = golden_dir("map_single")
    if not golden_ready(os.path.join(d, "ref.summary.txt")):
        rng = np.random.default_rng(123)
        names, seqs = make_genome(rng, [50000])
        write_fasta(os.path.join(d, "genome.fa"), names, seqs)
        reads = sample_reads(rng, names, seqs, 2000, read_len=100,
                             err_rate=0.01)
        write_fastq(os.path.join(d, "reads.fastq"), reads, which=0)
        run_ref_indexer("genome.fa", "g", cwd=d)
        subprocess.run([os.path.join(ref_binaries(), "pemapper"), "ref",
                        "g.sdx", "s", "reads.fastq", "n", "0.9", "2",
                        "100000"], cwd=d, check=True,
                       stdout=subprocess.DEVNULL)
    return d


@pytest.fixture(scope="module")
def paired_golden():
    d = golden_dir("map_paired")
    if not golden_ready(os.path.join(d, "ref.summary.txt")):
        rng = np.random.default_rng(7)
        names, seqs = make_genome(
            rng, [20000, 15000, 12000, 10000, 9000, 8000, 7000, 6000, 5000,
                  4000], n_blocks=[(0, 5000, 40)])
        write_fasta(os.path.join(d, "genome.fa"), names, seqs)
        reads = sample_reads(rng, names, seqs, 3000, read_len=100,
                             err_rate=0.01, paired=True, insert_lo=150,
                             insert_hi=450, indel_rate=0.15, max_indel=4)
        write_fastq(os.path.join(d, "r1.fastq"), reads, which=0)
        write_fastq(os.path.join(d, "r2.fastq"), reads, which=1)
        run_ref_indexer("genome.fa", "g", cwd=d)
        subprocess.run([os.path.join(ref_binaries(), "pemapper"), "ref",
                        "g.sdx", "p", "r1.fastq", "r2.fastq", "500", "0",
                        "n", "0.9", "2", "100000"], cwd=d, check=True,
                       stdout=subprocess.DEVNULL)
    return d


def test_single_end_parity(single_golden, tmp_path):
    d = single_golden
    fq = str(tmp_path / "reads.fastq")
    shutil.copy(os.path.join(d, "reads.fastq"), fq)
    cfg = MapperConfig(out_base=str(tmp_path / "ours"),
                       sdx_path=os.path.join(d, "g.sdx"), paired=False,
                       files1=[fq], min_align=0.9, max_reads=100000)
    run_mapper(cfg)
    assert _gz(str(tmp_path / "ours.pileup.gz")) == \
        _gz(os.path.join(d, "ref.pileup.gz"))
    assert np.array_equal(
        np.fromfile(fq + ".mfile", dtype="<u4"),
        np.fromfile(os.path.join(d, "reads.fastq.mfile"), dtype="<u4"))
    assert open(str(tmp_path / "ours.summary.txt")).read() == \
        open(os.path.join(d, "ref.summary.txt")).read()
    assert _gz(str(tmp_path / "ours.indel.txt.gz")) == \
        _gz(os.path.join(d, "ref.indel.txt.gz"))


def test_paired_end_parity(paired_golden, tmp_path):
    d = paired_golden
    f1 = str(tmp_path / "r1.fastq")
    f2 = str(tmp_path / "r2.fastq")
    shutil.copy(os.path.join(d, "r1.fastq"), f1)
    shutil.copy(os.path.join(d, "r2.fastq"), f2)
    cfg = MapperConfig(out_base=str(tmp_path / "ours"),
                       sdx_path=os.path.join(d, "g.sdx"), paired=True,
                       files1=[f1], files2=[f2], max_dist=500, min_dist=0,
                       min_align=0.9, max_reads=100000)
    run_mapper(cfg)
    assert _gz(str(tmp_path / "ours.pileup.gz")) == \
        _gz(os.path.join(d, "ref.pileup.gz"))
    for ours, ref in [(f1 + ".mfile", "r1.fastq.mfile"),
                      (f2 + ".mfile", "r2.fastq.mfile")]:
        assert np.array_equal(
            np.fromfile(ours, dtype="<u4"),
            np.fromfile(os.path.join(d, ref), dtype="<u4"))
    assert open(str(tmp_path / "ours.summary.txt")).read() == \
        open(os.path.join(d, "ref.summary.txt")).read()
    assert _gz(str(tmp_path / "ours.indel.txt.gz")) == \
        _gz(os.path.join(d, "ref.indel.txt.gz"))
