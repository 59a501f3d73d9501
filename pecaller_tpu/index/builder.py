"""Whole-genome 16-mer index builder.

Produces the four index artifacts (.seq/.sdx/.mdx/.idx) byte-identically
(after decompression) to the reference indexer
(/root/reference/src/index_genome_whole.c:93-354), but as a vectorized
counting sort instead of a 48 GB direct-addressed table:

  fasta -> uppercase bytes -> 2-bit codes -> rolling 16-mer keys
        -> N-run validity mask -> stable argsort by key  == bucket lists

The stable sort preserves genome-scan order within each bucket, which is
exactly the append order of the reference's per-bucket growable arrays.
"""

from __future__ import annotations

import gzip
import sys

import numpy as np

from ..formats.sdx import SdxInfo, write_sdx
from ..formats.index_files import SeedIndex, write_index_files
from ..ops.encode import BASE_BITS, BISULFITE_BASE_BITS, IDEPTH


def _parse_fasta_bytes(data: bytes):
    """Split a fasta byte blob into (names, seq byte arrays, in file order).

    Mirrors the reference's header handling (index_genome_whole.c:228-240):
    name = header[1:] with trailing non-alphanumerics stripped and internal
    whitespace replaced by '_'.  Sequence keeps only alphabetic characters,
    uppercased.
    """
    names, seqs = [], []
    cur = []
    for line in data.split(b"\n"):
        if line.startswith(b">"):
            if names:
                seqs.append(b"".join(cur))
            cur = []
            h = line[1:]
            while len(h) > 0 and not (chr(h[-1]).isalnum()):
                h = h[:-1]
            name = bytes((ord("_") if chr(c).isspace() else c) for c in h)
            names.append(name.decode())
        elif names:
            cur.append(bytes(c for c in line if chr(c).isalpha()).upper())
    if names:
        seqs.append(b"".join(cur))
    return names, [np.frombuffer(s, dtype=np.uint8) for s in seqs]


def build_index(fasta_path: str, basename: str, bisulfite: bool = False,
                gzip_level: int = 1, write_idx: bool = True) -> SdxInfo:
    with open(fasta_path, "rb") as f:
        data = f.read()
    names, seqs = _parse_fasta_bytes(data)
    if not names:
        raise ValueError(f"no contigs found in {fasta_path}")

    bits_tab = BISULFITE_BASE_BITS if bisulfite else BASE_BITS

    stored_lens = []
    all_kmers, all_positions = [], []
    gpos = 0
    seqfile = gzip.open(basename + ".seq", "wb", compresslevel=gzip_level)
    try:
        for seq in seqs:
            seqfile.write(seq.tobytes())
            L = seq.shape[0]
            stored_lens.append(np.uint32((L - (IDEPTH - 1)) & 0xFFFFFFFF))
            if L >= IDEPTH:
                bits = bits_tab[seq]
                k = np.zeros(L - IDEPTH + 1, dtype=np.uint32)
                for j in range(IDEPTH):
                    k <<= np.uint32(2)
                    k += bits[j:j + L - IDEPTH + 1]
                # validity: no 'N' anywhere in the 16-base window
                isn = (seq == ord("N")).astype(np.int64)
                cn = np.concatenate([[0], np.cumsum(isn)])
                valid = (cn[IDEPTH:] - cn[:-IDEPTH]) == 0
                pos = np.nonzero(valid)[0].astype(np.int64) + gpos
                all_kmers.append(k[valid])
                all_positions.append(pos)
            gpos += L - (IDEPTH - 1)
    finally:
        seqfile.close()

    kmers = np.concatenate(all_kmers) if all_kmers else np.zeros(0, np.uint32)
    positions = np.concatenate(all_positions) if all_positions \
        else np.zeros(0, np.int64)
    order = np.argsort(kmers, kind="stable")
    kmers_sorted = kmers[order]
    positions_sorted = positions[order].astype(np.uint32)
    keys, first = np.unique(kmers_sorted, return_index=True)
    starts = np.concatenate([first, [kmers_sorted.shape[0]]]).astype(np.int64)
    index = SeedIndex(keys=keys, starts=starts, positions=positions_sorted)
    if write_idx:
        write_index_files(basename, index, gzip_level=gzip_level)
    else:
        # skip the 16 GB dense .idx stream; persist the sparse form only
        positions_sorted.astype("<u4").tofile(basename + ".mdx")
        np.savez(basename + ".sidx.npz", keys=keys, starts0=starts[:-1])


    info = SdxInfo(names=names,
                   stored_lens=np.asarray(stored_lens, dtype=np.uint32),
                   idepth=IDEPTH)
    write_sdx(basename + ".sdx", info)
    return info


def index_genome_cli(argv=None) -> int:
    """Answer-file-compatible CLI: reads the same stdin prompt protocol as
    the reference (`index_genome < answers`, see README.md:20-34):

        line 1: S or D (output to screen/disk)
        [line: output filename, only if D]
        line:   max number of contig fasta files (ignored; we autoscan)
        line:   fasta path
        line:   basename
        line:   bisulfite? y/n
    """
    lines = sys.stdin.read().splitlines()
    it = iter(lines)
    first = next(it).strip()
    if "D" in first.upper():
        next(it)  # output file name; prompts echo ignored
    next(it)      # max fasta count
    fasta = next(it).strip()
    basename = next(it).strip()
    bis = next(it).strip().upper().startswith("Y")
    build_index(fasta, basename, bisulfite=bis)
    return 0
