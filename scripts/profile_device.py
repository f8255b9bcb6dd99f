"""Break the device align program into stages and time each on the chip.

Stages (canonical-seeding pipeline):
  seed   pack_query_seeds + canonicalize + bucketed lookup + clustering
  dp+tb  banded SW + traceback Pallas kernels on the compacted rows
  full   the production _align_pairs_packed program

Usage: python scripts/profile_device.py [P]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from bench import make_workload
from aligngraph_tpu.align import read_aligner as ra
from aligngraph_tpu.config import Config
from aligngraph_tpu.ops.seeding import (
    INVALID_DIAG, lookup_seeds_bucketed, pack_query_seeds, rc_packed,
    select_candidates)
from aligngraph_tpu.ops.banded_sw_pallas import banded_sw_posmap_pallas


def t(f, n=5):
    jax.block_until_ready(f())
    ts = time.time()
    for _ in range(n):
        r = f()
    jax.block_until_ready(r)
    return (time.time() - ts) / n


def main():
    P = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    ref, data, lens = make_workload(n_pairs=P)
    cfg = Config(distance_low=100, distance_high=900)
    al = ra.ReadAligner.build(ref, cfg, batch_pairs=P)
    idx = al.index

    L = 100
    seqs = np.full((2 * P, L), 4, np.int8)
    seqs[:2 * P] = data[:2 * P]
    plens = np.full(P, 100, np.int32)
    seqs_d = jnp.asarray(seqs)
    plens_d = jnp.asarray(plens)
    genome = al.genome
    sk, spf, bl = idx.sorted_kmers, idx.sorted_posflip, idx.bucket_lo

    seed_len, stride, pad, C = (cfg.seed_len, cfg.seed_stride, cfg.band_pad,
                                cfg.max_candidates)
    R = 2 * P
    W = 2 * pad
    WL = L + W

    @jax.jit
    def stage_lookup(seqs, plens):
        rlens = jnp.repeat(plens, 2)
        packed, offs, valid = pack_query_seeds(seqs, seed_len, stride)
        valid = valid & (offs[None, :] <= (rlens[:, None] - seed_len))
        pk_rc = rc_packed(packed, seed_len)
        qflip = pk_rc < packed
        pcan = jnp.minimum(packed, pk_rc)
        pf, ok = lookup_seeds_bucketed(sk, spf, bl, pcan, valid, 8,
                                       idx.search_steps, idx.suffix_bits)
        return pf, ok, qflip, offs, rlens

    pf, ok, qflip, offs, rlens = jax.block_until_ready(
        stage_lookup(seqs_d, plens_d))
    print(f"lookup: {t(lambda: stage_lookup(seqs_d, plens_d))*1e3:.0f} ms",
          flush=True)

    @jax.jit
    def stage_select(pf, ok, qflip, offs, rlens):
        return select_candidates(pf, ok, qflip, offs, rlens, seed_len,
                                 pad, C)

    ds, vs, os_ = jax.block_until_ready(
        stage_select(pf, ok, qflip, offs, rlens))
    print(f"select: "
          f"{t(lambda: stage_select(pf, ok, qflip, offs, rlens))*1e3:.0f} ms",
          flush=True)

    @jax.jit
    def stage_prep(seqs, plens, diag_s, votes_s, orient_s):
        rlens = jnp.repeat(plens, 2)
        rc = ra._revcomp_padded(seqs, rlens)
        qseqs = jnp.concatenate([seqs, rc])
        qlens = jnp.concatenate([rlens, rlens])
        diag_f = diag_s.T.reshape(-1)
        cvalid_f = diag_f != INVALID_DIAG
        B_full = R * C
        TOP = min(B_full, max(128, (3 * R // 2) // 128 * 128))
        order = jnp.argsort(~cvalid_f, stable=True)
        top = order[:TOP]
        cvalid = cvalid_f[top]
        diag_safe = jnp.where(cvalid, diag_f[top], 0)
        rr = top % R
        qidx = orient_s.T.reshape(-1)[top] * R + rr
        windows = ra._window_slices(genome, diag_safe - pad, WL, L + W)
        creads = qseqs[qidx]
        clens = jnp.where(cvalid, qlens[qidx], 0)
        return creads, clens, windows, diag_safe

    creads, clens, windows, diag_safe = jax.block_until_ready(
        stage_prep(seqs_d, plens_d, ds, vs, os_))
    print(f"prep: "
          f"{t(lambda: stage_prep(seqs_d, plens_d, ds, vs, os_))*1e3:.0f} ms",
          flush=True)

    def stage_dptb():
        return banded_sw_posmap_pallas(creads, clens, windows,
                                       diag_safe - pad, pad=pad)

    print(f"dp+tb ({creads.shape[0]} rows): {t(stage_dptb)*1e3:.0f} ms",
          flush=True)

    u2, nmask = ra.pack_reads_np(seqs)
    rcseqs = ra.revcomp_padded_np(seqs, np.repeat(plens, 2))
    u2r, nmr = ra.pack_reads_np(rcseqs)
    u2_d, nm_d = jnp.asarray(u2), jnp.asarray(nmask)
    u2r_d, nmr_d = jnp.asarray(u2r), jnp.asarray(nmr)
    kw = dict(seed_len=seed_len, stride=stride, pad=pad, C=C,
              K=ra.MAX_PAIR_HITS, dlow=cfg.distance_low,
              dhigh=cfg.distance_high, bsteps=idx.search_steps,
              sbits=idx.suffix_bits)

    def full():
        out = ra._align_pairs_packed(genome, sk, spf, bl, u2_d, nm_d,
                                     u2r_d, nmr_d,
                                     plens_d, L=L, c13=True, **kw)
        return out

    print(f"full packed: {t(full)*1e3:.0f} ms "
          f"({2*P/t(full):.0f} device reads/s)", flush=True)

    from aligngraph_tpu.io.formalize import Reads
    reads = Reads(P, L, data[:2 * P], np.full(P, 100, np.int32))
    dt = t(lambda: al.align(reads), n=3)
    print(f"align() e2e single batch: {dt*1e3:.0f} ms -> "
          f"{2*P/dt:.0f} reads/s", flush=True)


if __name__ == "__main__":
    main()
