"""Device mesh + sharded execution — SURVEY.md §2.4's distributed design.

The reference has no distributed backend (files are the transport;
2 pthreads share nothing, AlignGraph.cpp:3720-3735).  Our scale-out maps
the workload onto a mesh with two axes of parallelism:

  dp  — PE read batches data-parallel across chips (the hot DP/alignment
        work; replaces bowtie2 -p threading)
  sp  — the genome position axis sharded across chips for the graph-merge
        tensors (the TPU-native generalization of --part), merged with
        reduce_scatter/psum collectives over ICI

`alignment_step` is the flagship jittable step: seed lookup -> banded SW
-> traceback -> per-position coverage/vote accumulation; under shard_map
each dp shard aligns its reads against the replicated index and the vote
tensors are merged with psum_scatter so each device ends up holding a
position-contiguous slice (dp-axis collective riding ICI).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aligngraph_tpu.ops.banded_sw import banded_sw_auto, sw_traceback
from aligngraph_tpu.ops.seeding import (
    INVALID_DIAG, lookup_seeds, pack_query_seeds, select_candidates,
)


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def _align_and_vote(genome, sorted_kmers, sorted_pos, seqs, lens, *,
                    seed_len: int, stride: int, pad: int, C: int,
                    votes_len: int):
    """Per-shard: align reads, scatter (position, base) votes.

    Returns (votes [votes_len, 5] int32, n_aligned [1] int32).
    The caller wraps this in shard_map and merges votes with a collective.
    """
    G = genome.shape[0]
    R, L = seqs.shape
    W = 2 * pad
    WL = L + W
    packed, offs, valid = pack_query_seeds(seqs, seed_len, stride)
    valid = valid & (offs[None, :] <= (lens[:, None] - seed_len))
    hits = lookup_seeds(sorted_kmers, sorted_pos, packed, valid, 16)
    diags, votes_c = select_candidates(hits, offs, pad, C)
    diag_f = diags.reshape(-1)
    cvalid = diag_f != INVALID_DIAG
    diag_safe = jnp.where(cvalid, diag_f, 0)
    qidx = jnp.repeat(jnp.arange(R, dtype=jnp.int32), C)
    x = diag_safe[:, None] - pad + jnp.arange(WL, dtype=jnp.int32)[None, :]
    windows = jnp.where((x >= 0) & (x < G),
                        genome[jnp.clip(x, 0, G - 1)], jnp.int8(4))
    creads = seqs[qidx]
    clens = jnp.where(cvalid, lens[qidx], 0)
    res = banded_sw_auto(creads, clens, windows, pad=pad)
    pos_map = sw_traceback(res.tb, res.best_i, res.best_b, diag_safe,
                           pad=pad)
    aligned = pos_map >= 0
    # best candidate per read only (score argmax)
    score = jnp.where(cvalid, res.score, -1).reshape(R, C)
    best = jnp.argmax(score, axis=1)
    sel = (jnp.arange(R) * C + best)
    pm = pos_map[sel]                                    # [R, L]
    bases = creads[sel].astype(jnp.int32)
    ok = (pm >= 0) & (jnp.max(score, axis=1) > 0)[:, None]
    flat_pos = jnp.where(ok, pm, votes_len).reshape(-1)
    flat_base = jnp.clip(bases, 0, 4).reshape(-1)
    votes = jnp.zeros((votes_len, 5), jnp.int32)
    votes = votes.at[flat_pos, flat_base].add(
        ok.reshape(-1).astype(jnp.int32), mode="drop")
    n_aligned = jnp.sum(jnp.max(score, axis=1) > 0).astype(jnp.int32)
    return votes, n_aligned[None]


def make_sharded_alignment_step(mesh: Mesh, *, seed_len=15, stride=8,
                                pad=16, C=4, votes_len=1 << 14):
    """Build the jitted multi-chip alignment+merge step.

    Input shardings: reads dp-sharded, genome/index replicated.
    Output: votes reduce-scattered over the position axis (each device
    holds votes_len / n_dp positions), n_aligned psum'd.
    """
    axis = mesh.axis_names[0]
    n = mesh.devices.size
    assert votes_len % n == 0

    def shard_fn(genome, sorted_kmers, sorted_pos, seqs, lens):
        votes, n_al = _align_and_vote(
            genome, sorted_kmers, sorted_pos, seqs, lens,
            seed_len=seed_len, stride=stride, pad=pad, C=C,
            votes_len=votes_len)
        # merge across dp shards: each device keeps a position slice
        votes = jax.lax.psum_scatter(votes, axis, scatter_dimension=0,
                                     tiled=True)
        n_al = jax.lax.psum(n_al, axis)
        return votes, n_al

    mapped = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(), P(axis, None), P(axis)),
        out_specs=(P(axis, None), P()),
        check_vma=False,   # scan carries unvarying literals; skip analysis
    )
    return jax.jit(mapped)
