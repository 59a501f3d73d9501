"""Mesh scale-out: sharded mapping / calling steps.

The reference's only scale-out mechanism is one process per directory via
SGE qsub (map_directory_array.pl:101); here the equivalents are proper
device-mesh programs:

* mapping: reads are the data axis — each shard runs the SW batch on its
  reads and produces a partial pileup; partials are combined with
  psum_scatter over the ``genome`` axis so the final pileup lands sharded
  over space (the ICI-friendly reduce+shard pattern).
* calling: sites are embarrassingly parallel — shard the site batch and
  run the per-site model locally, no collectives needed beyond the final
  gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import sw as dsw


def make_mesh(n_reads_shards: int, n_genome_shards: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_reads_shards * n_genome_shards
    import numpy as np
    dev = np.asarray(devices[:n]).reshape(n_reads_shards, n_genome_shards)
    return Mesh(dev, axis_names=("reads", "genome"))


def sharded_map_step(mesh: Mesh, genome_size: int, bisulfite: bool = False):
    """Build a jitted mapping compute step over the mesh.

    Step signature: (refs (B,N) u8, blens (B,), reads (B,M) u8,
    rlens (B,)) -> (scores x36 (B,), bk, bi, pileup (genome_size, 6) u16
    sharded over the genome axis).
    """
    n_total = mesh.shape["reads"] * mesh.shape["genome"]
    gs_pad = ((genome_size + n_total - 1) // n_total) * n_total
    axes = ("reads", "genome")

    def local_step(refs, blens, reads, rlens):
        score, bk, bi = dsw.sw_align_device(refs, blens, reads, rlens,
                                            bisulfite=bisulfite)
        ev_pos, ev_kind, ins_j, _ = dsw.sw_traceback_device(
            refs, blens, reads, rlens, bk, bi, bisulfite=bisulfite)
        counts = dsw.pileup_scatter(ev_pos.reshape(-1),
                                    ev_kind.reshape(-1),
                                    (ins_j >= 0).reshape(-1),
                                    genome_size=gs_pad)
        # reduce partial pileups across every shard; land genome-sharded
        # (reduce_scatter over ICI)
        counts = jax.lax.psum_scatter(
            counts.reshape(n_total, gs_pad // n_total, 6),
            axes, scatter_dimension=0, tiled=False)
        return score, bk, bi, counts

    from jax.experimental.shard_map import shard_map
    step = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(axes, None), P(axes), P(axes, None), P(axes)),
        out_specs=(P(axes), P(axes), P(axes), P(axes, None)),
        check_rep=False)
    return jax.jit(step)


def sharded_call_step(mesh: Mesh, indiv: int):
    """Sharded per-site genotype-likelihood step (sites = data axis).

    Computes the Dirichlet-multinomial likelihood tensor over
    (sites, genotypes) for the flat-alpha pass — the caller's hot inner
    loop — with sites sharded across the full mesh.
    """
    from ..caller.device_model import site_likelihoods

    def local_step(reads, ref_int):
        return site_likelihoods(reads, ref_int)

    from jax.experimental.shard_map import shard_map
    step = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(("reads", "genome"), None, None),
                  P(("reads", "genome"))),
        out_specs=P(("reads", "genome"), None, None),
        check_rep=False)
    return jax.jit(step)
