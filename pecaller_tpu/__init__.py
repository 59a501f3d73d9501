"""pecaller_tpu — a TPU-native short-read WGS mapping + calling engine.

A from-scratch JAX/XLA/Pallas re-design of the PEMapper/PECaller pipeline
(reference: wingolab-org/pecaller, C/pthreads).  The pipeline stages:

  genome indexing   -> pecaller_tpu.index      (16-mer CSR seed index)
  read mapping      -> pecaller_tpu.mapper     (seed/chain/Smith-Waterman)
  base calling      -> pecaller_tpu.caller     (multi-sample empirical-Bayes EM)
  cohort merge/VCF  -> pecaller_tpu.cohort
  device kernels    -> pecaller_tpu.ops        (batched SW DP, pileup scatter)
  mesh scale-out    -> pecaller_tpu.parallel

File formats (.sdx/.seq/.idx/.mdx, binary pileup, .snp, .base.gz, VCF) are
byte-compatible with the reference so the two implementations interoperate
and can be golden-diffed against each other.
"""

__version__ = "0.1.0"
