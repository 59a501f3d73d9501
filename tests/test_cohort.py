"""Cohort-tail parity: snplist, merger, indel consensus, VCF, QC all
byte-equal to the reference Perl/C tools (pecall_merger built at -O0,
Perl run with PERL_HASH_SEED=0 for deterministic hash order)."""

import io
import os
import shutil
import subprocess

import pytest

from pecaller_tpu.cohort import (run_merger, merge_indel_snp, snp_to_vcf,
                                 make_snplist, snp_tran_counter)

from util import (have_reference, ref_binaries, golden_dir,
                  golden_ready)

pytestmark = pytest.mark.skipif(not have_reference(),
                                reason="reference sources unavailable")

PERL_ENV = dict(os.environ, PERL_HASH_SEED="0", PERL_PERTURB_KEYS="0")


@pytest.fixture(scope="module")
def tail_golden(request):
    """Depends on the caller golden dir (3-sample run) and extends it with
    the reference cohort-tail outputs."""
    d = golden_dir("call_3samp")
    if not golden_ready(os.path.join(d, "refcall.snp")):
        pytest.skip("caller golden not built yet; run test_caller first")
    bindir = ref_binaries()
    t = golden_dir("cohort_tail")
    if not os.path.exists(os.path.join(t, "ref.vcf")):
        for f in ["g.sdx", "g.seq", "refcall.snp", "refcall.base.gz"]:
            shutil.copy(os.path.join(d, f), t)
        os.rename(os.path.join(t, "refcall.base.gz"),
                  os.path.join(t, "run1.base.gz"))
        for si in range(3):
            src = os.path.join(d, f"sample{si}.indel.txt.gz")
            if not os.path.exists(src):
                pytest.skip("indel files missing from caller golden")
            shutil.copy(src, t)
        subprocess.run(["perl", os.path.join(bindir,
                                             "make_snplist_formerge.pl"),
                        "g.sdx", "refgood"], cwd=t, check=True,
                       env=PERL_ENV, capture_output=True)
        subprocess.run([os.path.join(bindir, "pecall_merger_O0"), "100000",
                        "10", "refgood.good.bed", "refmerged.snp", "g.sdx",
                        "n"], cwd=t, check=True, capture_output=True)
        subprocess.run(["perl", os.path.join(bindir, "merge_indel_snp.pl"),
                        "g.sdx", "refmerged.snp", ".", "refsub.snp"],
                       cwd=t, check=True, env=PERL_ENV, capture_output=True)
        with open(os.path.join(t, "ref.vcf"), "w") as vf:
            subprocess.run([os.path.join(bindir, "snp_to_vcf"), "g.sdx",
                            "refsub.snp", "0.3"], cwd=t, check=True,
                           stdout=vf, stderr=subprocess.DEVNULL)
        with open(os.path.join(t, "ref_tran.txt"), "w") as tf:
            subprocess.run(["perl", os.path.join(bindir,
                                                 "snp_tran_counter.pl"),
                            "refsub.snp"], cwd=t, check=True, stdout=tf,
                           env=PERL_ENV, stderr=subprocess.DEVNULL)
    return t


def test_snplist_parity(tail_golden):
    t = tail_golden
    make_snplist(os.path.join(t, "g.sdx"), os.path.join(t, "ourgood"),
                 directory=t)
    for suf in (".good.bed", ".bad.bed"):
        assert open(os.path.join(t, "ourgood" + suf)).read() == \
            open(os.path.join(t, "refgood" + suf)).read()


def test_merger_parity(tail_golden, tmp_path):
    t = tail_golden
    out = str(tmp_path / "ourmerged.snp")
    run_merger(os.path.join(t, "refgood.good.bed"), out,
               os.path.join(t, "g.sdx"), is_haploid=False, directory=t)
    assert open(out).read() == \
        open(os.path.join(t, "refmerged.snp")).read()


def test_indel_sub_parity(tail_golden, tmp_path):
    t = tail_golden
    out = str(tmp_path / "oursub.snp")
    merge_indel_snp(os.path.join(t, "g.sdx"),
                    os.path.join(t, "refmerged.snp"), t, out)
    assert open(out).read() == open(os.path.join(t, "refsub.snp")).read()


def _strip_date(text: str) -> str:
    return "\n".join(l for l in text.split("\n")
                     if not l.startswith("##fileDate="))


def test_vcf_parity(tail_golden, monkeypatch):
    t = tail_golden
    monkeypatch.chdir(t)     # ##reference= echoes the sdx path as given
    buf = io.StringIO()
    snp_to_vcf("g.sdx", "refsub.snp", buf, min_prob=0.3)
    # the reference stamps the run date; compare modulo the fileDate line
    assert _strip_date(buf.getvalue()) == \
        _strip_date(open("ref.vcf").read())


def test_qc_tran_parity(tail_golden):
    t = tail_golden
    buf = io.StringIO()
    snp_tran_counter(os.path.join(t, "refsub.snp"), buf)
    assert buf.getvalue() == open(os.path.join(t, "ref_tran.txt")).read()
