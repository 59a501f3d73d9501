from .encode import (
    BASE_BITS, BISULFITE_BASE_BITS, encode_bases, rolling_kmers,
    revcomp_bytes, mismatch_neighborhood_keys,
)

__all__ = [
    "BASE_BITS", "BISULFITE_BASE_BITS", "encode_bases", "rolling_kmers",
    "revcomp_bytes", "mismatch_neighborhood_keys",
]
