"""Test utilities: synthetic genomes/reads and the C-reference oracle.

The reference C sources (read-only at /root/reference) are compiled into
/tmp/pecaller_ref_build once per machine; golden outputs are cached under
REPO/.golden keyed by config name so expensive oracle runs happen once.
"""

from __future__ import annotations

import gzip
import os
import shutil
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_SRC = "/root/reference"
BUILD_DIR = "/tmp/pecaller_ref_build"
GOLDEN = os.path.join(REPO, ".golden")

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def have_reference() -> bool:
    return os.path.isdir(os.path.join(REF_SRC, "src"))


def ref_binaries() -> str:
    """Build the C reference once; return its bin directory.

    pecaller/dump_pileups/pecall_merger are additionally built at -O0 as
    <name>_O0: at -O3 the caller's producer/consumer handoff races (the
    worker thread reads td->dom_int before the main thread's store lands,
    because gcc sinks the dom_int store below the status=DATA_LOADED
    store), which corrupts the per-site reference allele and makes -O3
    output nondeterministic run-to-run.  The -O0 build realizes the
    intended semantics and is the golden oracle for caller outputs.
    """
    bindir = os.path.join(BUILD_DIR, "bin")
    if os.path.isfile(os.path.join(bindir, "pecaller_O0")):
        return bindir
    shutil.copytree(REF_SRC, BUILD_DIR, dirs_exist_ok=True)
    mk = os.path.join(BUILD_DIR, "Makefile")
    with open(mk) as f:
        txt = f.read()
    # upstream Makefile puts $(LIBS) before the source file; fix link order
    txt = txt.replace("$(CC) $(CFLAGS) $(LIBS) -o $@ $@.c",
                      "$(CC) $(CFLAGS) -o $@ $@.c $(LIBS)")
    with open(mk, "w") as f:
        f.write(txt)
    subprocess.run(["make"], cwd=BUILD_DIR, check=True,
                   capture_output=True)
    for prog in ["pecaller", "dump_pileups", "pecall_merger"]:
        subprocess.run(
            ["gcc", "-O0", "-w", "-o", os.path.join(bindir, prog + "_O0"),
             os.path.join(BUILD_DIR, "src", prog + ".c"),
             "-lm", "-lz", "-lpthread"],
            check=True, capture_output=True)
    return bindir


def make_genome(rng: np.random.Generator, contig_lens, names=None,
                n_blocks=()) -> tuple[list, list]:
    """Random ACGT contigs; n_blocks = [(contig, start, len), ...] N runs."""
    names = names or [f"chr{i+1}" for i in range(len(contig_lens))]
    seqs = []
    for ci, L in enumerate(contig_lens):
        s = BASES[rng.integers(0, 4, size=L)].copy()
        for (c, st, ln) in n_blocks:
            if c == ci:
                s[st:st + ln] = ord("N")
        seqs.append(s)
    return names, seqs


def write_fasta(path: str, names, seqs, width: int = 70) -> None:
    with open(path, "w") as f:
        for name, seq in zip(names, seqs):
            f.write(f">{name}\n")
            b = seq.tobytes().decode()
            for i in range(0, len(b), width):
                f.write(b[i:i + width] + "\n")


def sample_reads(rng: np.random.Generator, names, seqs, n_reads: int,
                 read_len: int = 100, err_rate: float = 0.0,
                 paired: bool = False, insert_lo: int = 150,
                 insert_hi: int = 400, indel_rate: float = 0.0,
                 max_indel: int = 4):
    """Sample reads (and optional mates) uniformly from the contigs.

    Returns list of (seq_bytes, mate_bytes_or_None, truth_info).
    Mate orientation follows Illumina FR: read1 forward, read2 revcomp
    (or flipped at random).
    """
    from pecaller_tpu.ops.encode import revcomp_bytes
    total = np.array([len(s) for s in seqs], dtype=np.int64)
    out = []
    for _ in range(n_reads):
        ci = int(rng.integers(0, len(seqs)))
        L = total[ci]
        ins = int(rng.integers(insert_lo, insert_hi)) if paired else read_len
        ins = min(ins, L)
        start = int(rng.integers(0, max(1, L - ins + 1)))
        frag = seqs[ci][start:start + ins]

        def mutate(s):
            s = s.copy()
            if err_rate > 0:
                mask = rng.random(len(s)) < err_rate
                idx = np.nonzero(mask)[0]
                s[idx] = BASES[rng.integers(0, 4, size=len(idx))]
            if indel_rate > 0 and rng.random() < indel_rate and len(s) > 20:
                p = int(rng.integers(10, len(s) - 10))
                k = int(rng.integers(1, max_indel + 1))
                if rng.random() < 0.5:
                    s = np.concatenate([s[:p], s[p + k:]])
                else:
                    insseq = BASES[rng.integers(0, 4, size=k)]
                    s = np.concatenate([s[:p], insseq, s[p:]])
            return s

        r1 = mutate(frag[:read_len])
        if paired:
            r2 = mutate(revcomp_bytes(frag)[:read_len])
            if rng.random() < 0.5:
                r1, r2 = r2, r1
            out.append((r1, r2, (ci, start, ins)))
        else:
            if rng.random() < 0.5:
                r1 = revcomp_bytes(r1)
            out.append((r1, None, (ci, start, ins)))
    return out


def write_fastq(path: str, reads, which: int = 0) -> None:
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "wt") as f:
        for i, tup in enumerate(reads):
            seq = tup[which]
            s = seq.tobytes().decode()
            f.write(f"@read{i}\n{s}\n+\n{'I' * len(s)}\n")


def run_ref_indexer(fasta: str, basename: str, bisulfite: bool = False,
                    cwd: str | None = None) -> None:
    bindir = ref_binaries()
    answers = f"S\n200\n{fasta}\n{basename}\n{'y' if bisulfite else 'n'}\n"
    subprocess.run([os.path.join(bindir, "index_genome_whole")],
                   input=answers.encode(), cwd=cwd, check=True,
                   stdout=subprocess.DEVNULL)


def gz_bytes(path: str) -> bytes:
    with gzip.open(path, "rb") as f:
        return f.read()


def assert_tie_local_pileup(p_ref: np.ndarray, p_fus: np.ndarray,
                            max_width: int = 8,
                            max_frac: float = 0.01) -> None:
    """Pin device-vs-oracle pileup divergence to exact-score-tie shifts.

    The only legitimate divergence between the float64 oracle DP and the
    integer device DP is the placement of equal-score indel/mismatch
    runs inside repeats: the same events land 1-2 bases away.  Such a
    shift produces a SHORT cluster of differing rows whose per-column
    sums cancel.  Any real bug (lost events, misplaced reads, corrupted
    counts) breaks per-cluster cancellation or produces wide clusters,
    and fails here.
    """
    d = p_fus.astype(np.int64) - p_ref.astype(np.int64)
    assert (d.sum(axis=0) == 0).all(), "global column sums differ"
    nz = np.nonzero(d.any(axis=1))[0]
    nnz = max(int((p_ref.sum(1) > 0).sum()), 1)
    assert len(nz) <= max(4, int(nnz * max_frac)), \
        f"{len(nz)} differing rows of {nnz}"
    if len(nz) == 0:
        return
    splits = np.nonzero(np.diff(nz) > max_width)[0]
    for cl in np.split(nz, splits + 1):
        width = int(cl[-1] - cl[0]) + 1
        assert width <= max_width, \
            f"diff cluster at {cl[0]} spans {width} rows"
        sub = d[cl[0]:cl[-1] + 1]
        assert (sub.sum(axis=0) == 0).all(), \
            f"cluster at {cl[0]} does not cancel per column: " \
            f"{sub.sum(axis=0)}"


def golden_ready(path: str) -> bool:
    """Golden artifact present AND non-empty.

    A killed reference run (suite timeout) can leave zero-byte outputs;
    existence alone then poisons every later run."""
    return os.path.exists(path) and os.path.getsize(path) > 0


def golden_dir(name: str) -> str:
    d = os.path.join(GOLDEN, name)
    os.makedirs(d, exist_ok=True)
    return d
