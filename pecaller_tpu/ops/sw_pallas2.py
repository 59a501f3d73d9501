"""Pallas TPU kernels for the code-based SW align + row-sync traceback.

Placeholder pass-through to the XLA implementations; replaced by real
VMEM-resident kernels (int16 DP planes; in-kernel row-synchronous walk).
"""

from __future__ import annotations

from . import sw2


def sw_align_x_pallas(refs, blens, reads, rlens, bisulfite=False,
                      n_rows=None):
    return sw2.sw_align_x(refs, blens, reads, rlens, bisulfite=bisulfite,
                          n_rows=n_rows)


def sw_tb_rows_pallas(refs, blens, reads, rlens, bk, bi, bisulfite=False,
                      n_rows=None):
    return sw2.sw_traceback_rows(refs, blens, reads, rlens, bk, bi,
                                 bisulfite=bisulfite, n_rows=n_rows)
