"""Multi-host orchestration (SURVEY §2.4/§5.8: the reference's scale-out
is one process per directory via SGE qsub + shared filesystem; here it is
jax.distributed over a global device mesh plus deterministic work
partitioning).

Two levels:

* **In-core**: a global Mesh spanning all hosts' devices; the mapping /
  calling steps from parallel.mesh shard over it, with psum_scatter
  pileup reduction riding ICI within a slice and DCN across slices.
* **File-level**: fastq (pairs) and caller site intervals are partitioned
  deterministically across processes (round-robin by index), preserving
  the reference's file-format contract so partial artifacts merge with
  the standard cohort tools.

Single-chip sandboxes can exercise the full code path with
``n_processes=1``; the driver's dryrun validates the sharded step on a
virtual multi-device CPU mesh.
"""

from __future__ import annotations

import os


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> tuple[int, int]:
    """Initialize jax.distributed when configured; returns
    (process_id, num_processes).  No-op single-process otherwise."""
    import jax
    coordinator = coordinator or os.environ.get("PECALLER_COORDINATOR")
    if coordinator:
        num_processes = int(num_processes or
                            os.environ.get("PECALLER_NUM_PROCESSES", "1"))
        process_id = int(process_id if process_id is not None
                         else os.environ.get("PECALLER_PROCESS_ID", "0"))
        from jax._src import distributed as _dist
        if getattr(_dist.global_state, "client", None) is None:
            jax.distributed.initialize(coordinator_address=coordinator,
                                       num_processes=num_processes,
                                       process_id=process_id)
        return process_id, num_processes
    return 0, 1


def partition_files(files1, files2, process_id: int, num_processes: int):
    """Deterministic round-robin fastq(-pair) assignment per process."""
    sel = list(range(process_id, len(files1), num_processes))
    return ([files1[i] for i in sel],
            [files2[i] for i in sel] if files2 else [])


def partition_intervals(bed_rows, process_id: int, num_processes: int):
    """Caller guide intervals split by genome span: contiguous blocks of
    roughly equal total bases per process (keeps site streams sequential
    per process, the cache-friendly layout for the site merge)."""
    spans = [(c, s, e, e - s + 1) for (c, s, e) in bed_rows]
    total = sum(x[3] for x in spans)
    target = total / max(num_processes, 1)
    out, acc, pid = [], 0.0, 0
    for c, s, e, ln in spans:
        if pid == process_id:
            out.append((c, s, e))
        acc += ln
        while acc >= target * (pid + 1) and pid < num_processes - 1:
            pid += 1
    return out


def run_mapper_distributed(cfg, coordinator=None, num_processes=None,
                           process_id=None):
    """Map this process's share of the fastq list; artifacts are written
    with a per-process suffix and remain pipeline-compatible (the caller
    scans a directory of pileups; the merger unions .base.gz files)."""
    from ..mapper import run_mapper
    pid, n = init_distributed(coordinator, num_processes, process_id)
    files1, files2 = partition_files(cfg.files1, cfg.files2, pid, n)
    if not files1:
        return None
    from dataclasses import replace
    local = replace(cfg, files1=files1, files2=files2,
                    out_base=cfg.out_base + (f".part{pid}" if n > 1 else ""))
    return run_mapper(local)
