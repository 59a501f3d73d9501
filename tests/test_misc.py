"""Remaining surface parity: pemapper array mode, pemapper_tsw trimming +
output groups, snp_tran_silent_rep, restricted snplist."""

import gzip
import io
import os
import shutil
import subprocess

import numpy as np
import pytest

from pecaller_tpu.cli import main as cli_main
from pecaller_tpu.cohort import snp_tran_silent_rep, make_snplist_restricted

from util import (have_reference, ref_binaries, golden_dir,
                  golden_ready)

pytestmark = pytest.mark.skipif(not have_reference(),
                                reason="reference sources unavailable")

PERL_ENV = dict(os.environ, PERL_HASH_SEED="0", PERL_PERTURB_KEYS="0")


def _gz(p):
    with gzip.open(p, "rb") as f:
        return f.read()


@pytest.fixture(scope="module")
def paired_src():
    d = golden_dir("map_paired")
    if not golden_ready(os.path.join(d, "r1.fastq")):
        pytest.skip("map_paired golden missing; run test_mapper first")
    return d


def test_array_mode_parity(paired_src, tmp_path):
    """pa mode: two file pairs into one output (second pair = copy)."""
    d = paired_src
    for i in (1, 2):
        for e in (1, 2):
            shutil.copy(os.path.join(d, f"r{e}.fastq"),
                        tmp_path / f"p{i}_{e}.fastq")
    with open(tmp_path / "list1.txt", "w") as f:
        f.write("p1_1.fastq\np2_1.fastq\n")
    with open(tmp_path / "list2.txt", "w") as f:
        f.write("p1_2.fastq\np2_2.fastq\n")
    ref_golden = golden_dir("map_array")
    if not os.path.exists(os.path.join(ref_golden, "ref.summary.txt")):
        for f in os.listdir(tmp_path):
            shutil.copy(tmp_path / f, ref_golden)
        shutil.copy(os.path.join(d, "g.sdx"), ref_golden)
        for ext in ("seq", "idx", "mdx"):
            shutil.copy(os.path.join(d, f"g.{ext}"), ref_golden)
        subprocess.run([os.path.join(ref_binaries(), "pemapper"), "ref",
                        "g.sdx", "pa", "list1.txt", "list2.txt", "500",
                        "0", "n", "0.9", "2", "100000"], cwd=ref_golden,
                       check=True, stdout=subprocess.DEVNULL)
    os.chdir(tmp_path)
    cli_main(["pemapper", "ours", "g.sdx", "pa", "list1.txt", "list2.txt",
              "500", "0", "n", "0.9", "2", "100000"]) \
        if os.path.exists(tmp_path / "g.sdx") else None
    # run from the golden dir so the index is present
    os.chdir(ref_golden)
    cli_main(["pemapper", str(tmp_path / "ours"), "g.sdx", "pa",
              "list1.txt", "list2.txt", "500", "0", "n", "0.9", "2",
              "100000"])
    assert _gz(str(tmp_path / "ours.pileup.gz")) == \
        _gz(os.path.join(ref_golden, "ref.pileup.gz"))
    assert open(str(tmp_path / "ours.summary.txt")).read() == \
        open(os.path.join(ref_golden, "ref.summary.txt")).read()
    for fq in ("p1_1.fastq", "p2_1.fastq", "p1_2.fastq", "p2_2.fastq"):
        assert np.array_equal(
            np.fromfile(os.path.join(ref_golden, fq + ".mfile"),
                        dtype="<u4"),
            np.fromfile(os.path.join(ref_golden, fq + ".mfile"),
                        dtype="<u4"))


def test_tsw_trim_and_groups(paired_src, tmp_path):
    """pemapper_tsw: fixed trimming + per-group output basenames."""
    d = paired_src
    g = golden_dir("map_tsw")
    if not os.path.exists(os.path.join(g, "grp2.summary.txt")):
        for e in (1, 2):
            shutil.copy(os.path.join(d, f"r{e}.fastq"),
                        os.path.join(g, f"a_{e}.fastq"))
            shutil.copy(os.path.join(d, f"r{e}.fastq"),
                        os.path.join(g, f"b_{e}.fastq"))
        shutil.copy(os.path.join(d, "g.sdx"), g)
        for ext in ("seq", "idx", "mdx"):
            shutil.copy(os.path.join(d, f"g.{ext}"), g)
        with open(os.path.join(g, "l1.txt"), "w") as f:
            f.write("a_1.fastq\tgrp1\nb_1.fastq\tgrp2\n")
        with open(os.path.join(g, "l2.txt"), "w") as f:
            f.write("a_2.fastq\nb_2.fastq\n")
        subprocess.run([os.path.join(ref_binaries(), "pemapper_tsw"),
                        "unused", "g.sdx", "pa", "l1.txt", "l2.txt", "500",
                        "0", "n", "0.9", "2", "100000", "3", "4"], cwd=g,
                       check=True, stdout=subprocess.DEVNULL)
        for grp in ("grp1", "grp2"):
            for ext in ("pileup.gz", "indel.txt.gz", "summary.txt"):
                os.rename(os.path.join(g, f"{grp}.{ext}"),
                          os.path.join(g, f"ref_{grp}.{ext}"))
    os.chdir(g)
    cli_main(["pemapper_tsw", "unused2", "g.sdx", "pa", "l1.txt", "l2.txt",
              "500", "0", "n", "0.9", "2", "100000", "3", "4"])
    for grp in ("grp1", "grp2"):
        assert _gz(f"{grp}.pileup.gz") == _gz(f"ref_{grp}.pileup.gz")
        assert _gz(f"{grp}.indel.txt.gz") == _gz(f"ref_{grp}.indel.txt.gz")
        assert open(f"{grp}.summary.txt").read() == \
            open(f"ref_{grp}.summary.txt").read()


def test_silent_rep_parity(tmp_path):
    t = golden_dir("cohort_tail")
    snp = os.path.join(t, "refsub.snp")
    if not os.path.exists(snp):
        pytest.skip("cohort tail golden missing")
    annot = str(tmp_path / "annot.txt")
    rng = np.random.default_rng(3)
    with open(snp) as f:
        f.readline()
        rows = [ln.split("\t")[:2] for ln in f if ln.strip()]
    classes = ["Silent", "Replacement", "Intronic", "UTR"]
    with open(annot, "w") as f:
        f.write("Fragment\tPosition\tannotation_type\tsnp_id\n")
        for c, p in rows:
            cl = classes[int(rng.integers(0, 4))]
            rs = f"rs{int(rng.integers(1, 10**6))}" \
                if rng.random() < 0.5 else "."
            f.write(f"{c}\t{p}\t{cl}\t{rs}\n")
    ref_out = subprocess.run(
        ["perl", os.path.join(ref_binaries(), "snp_tran_silent_rep.pl"),
         snp, annot, "SNP"], capture_output=True, text=True, env=PERL_ENV,
        check=True).stdout
    buf = io.StringIO()
    snp_tran_silent_rep(snp, annot, "SNP", buf)
    assert buf.getvalue() == ref_out


def test_restricted_snplist_parity(tmp_path):
    t = golden_dir("cohort_tail")
    if not os.path.exists(os.path.join(t, "refcall.snp")):
        pytest.skip("cohort tail golden missing")
    # identical input dirs for both implementations (each writes .bed
    # outputs that would otherwise pollute the other's input scan)
    wref = tmp_path / "ref"
    wour = tmp_path / "our"
    for w in (wref, wour):
        os.makedirs(w)
        shutil.copy(os.path.join(t, "refcall.snp"), w / "run1.snp")
        shutil.copy(os.path.join(t, "g.sdx"), w)
        with open(w / "cov1.bed", "w") as f:
            f.write("chr1\t1\t20000\n")
        with open(w / "cov2.bed", "w") as f:
            f.write("chr1\t1000\t29000\n")
    subprocess.run(
        ["perl", os.path.join(ref_binaries(),
                              "make_snplist_formerge_restricted.pl"),
         "g.sdx", "refres"], cwd=wref, env=PERL_ENV, check=True,
        capture_output=True)
    make_snplist_restricted(str(wour / "g.sdx"), str(wour / "ourres"),
                            directory=str(wour))
    for suf in (".good.bed", ".bad.bed"):
        assert open(wour / ("ourres" + suf)).read() == \
            open(wref / ("refres" + suf)).read()


def test_mapper_checkpoint_resume(tmp_path):
    """Batch-granular resume reproduces the uninterrupted run exactly."""
    d = golden_dir("map_single")
    if not golden_ready(os.path.join(d, "reads.fastq")):
        pytest.skip("map_single golden missing")
    from pecaller_tpu.mapper import run_mapper, MapperConfig
    from pecaller_tpu.mapper import runner as R
    from pecaller_tpu.mapper.engine import MapperEngine
    from pecaller_tpu.formats.sdx import read_sdx, read_seq
    from pecaller_tpu.formats.index_files import load_index
    from pecaller_tpu.formats.fastq import FastqBatcher

    fa = str(tmp_path / "a.fastq")
    fb = str(tmp_path / "b.fastq")
    shutil.copy(os.path.join(d, "reads.fastq"), fa)
    shutil.copy(os.path.join(d, "reads.fastq"), fb)
    sdxp = os.path.join(d, "g.sdx")
    run_mapper(MapperConfig(out_base=str(tmp_path / "full"), sdx_path=sdxp,
                            paired=False, files1=[fa, fb], min_align=0.9))
    # simulate an interruption after file 1 by saving its checkpoint
    sdx = read_sdx(sdxp)
    genome = read_seq(os.path.join(d, "g.seq"), sdx.genome_size)
    index = load_index(os.path.join(d, "g"))
    eng = MapperEngine(sdx, genome, index, min_align=0.9)
    b = FastqBatcher(fa)
    for s1, l1, _, _, nos in b.batches():
        eng.map_batch(s1, l1, read_nos=nos)
    res_base = str(tmp_path / "res")
    R._save_ckpt(res_base + ".ckpt.npz", eng, 1, b.total_records,
                 b.total_records)
    run_mapper(MapperConfig(out_base=res_base, sdx_path=sdxp, paired=False,
                            files1=[fa, fb], min_align=0.9,
                            checkpoint=True))
    assert _gz(res_base + ".pileup.gz") == \
        _gz(str(tmp_path / "full.pileup.gz"))
    assert open(res_base + ".summary.txt").read() == \
        open(str(tmp_path / "full.summary.txt")).read()
    assert not os.path.exists(res_base + ".ckpt.npz")


def test_distributed_partitioning():
    from pecaller_tpu.parallel.distributed import (partition_files,
                                                   partition_intervals)
    f1 = [f"a{i}" for i in range(7)]
    f2 = [f"b{i}" for i in range(7)]
    seen = set()
    for pid in range(3):
        l1, l2 = partition_files(f1, f2, pid, 3)
        assert len(l1) == len(l2)
        for a, b in zip(l1, l2):
            assert a[1:] == b[1:]
            seen.add(a)
    assert seen == set(f1)
    rows = [("chr1", 1, 1000), ("chr1", 2000, 2500), ("chr2", 1, 3000)]
    allrows = []
    for pid in range(2):
        allrows += partition_intervals(rows, pid, 2)
    assert sorted(allrows) == sorted(rows)
