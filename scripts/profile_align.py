"""Stage-level profile of the read-aligner hot path on the real chip.

Compares the legacy compact path and the packed path (2-bit input,
first-segment output, device C13), separating device compute, h2d, d2h,
and host postprocessing.

Usage: python scripts/profile_align.py [P]
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
from aligngraph_tpu.io.formalize import Reads


def t(f, n=3):
    f()  # warm
    ts = time.time()
    for _ in range(n):
        f()
    return (time.time() - ts) / n


def main():
    P = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    ref, data, lens = make_workload(n_pairs=P)
    cfg = Config(distance_low=100, distance_high=900)
    t0 = time.time()
    al = ra.ReadAligner.build(ref, cfg, batch_pairs=P)
    print(f"index build: {time.time()-t0:.2f}s", flush=True)
    idx = al.index
    _ = idx.device_arrays()

    L = max(100, cfg.seed_len)
    seqs = np.full((2 * P, L), 4, np.int8)
    seqs[:2 * P] = data[:2 * P]
    plens = np.full(P, 100, np.int32)
    u2, nmask = ra.pack_reads_np(seqs)

    kw = dict(seed_len=cfg.seed_len, stride=cfg.seed_stride,
              pad=cfg.band_pad, C=cfg.max_candidates, K=ra.MAX_PAIR_HITS,
              dlow=cfg.distance_low, dhigh=cfg.distance_high,
              bsteps=idx.search_steps, sbits=idx.suffix_bits)

    dt = t(lambda: jax.block_until_ready(jnp.asarray(seqs)))
    print(f"h2d seqs int8 ({seqs.nbytes/1e6:.1f} MB): {dt*1e3:.0f} ms "
          f"({seqs.nbytes/dt/1e6:.0f} MB/s)", flush=True)
    dt = t(lambda: jax.block_until_ready((jnp.asarray(u2),
                                          jnp.asarray(nmask))))
    nb = u2.nbytes + nmask.nbytes
    print(f"h2d packed ({nb/1e6:.2f} MB): {dt*1e3:.0f} ms", flush=True)
    dt = t(lambda: ra.pack_reads_np(seqs))
    print(f"host pack_reads_np: {dt*1e3:.0f} ms", flush=True)

    seqs_d = jax.block_until_ready(jnp.asarray(seqs))
    plens_d = jnp.asarray(plens)
    u2_d, nm_d = jnp.asarray(u2), jnp.asarray(nmask)

    def run_compact():
        out = ra._align_pairs_compact(al.genome, idx.sorted_kmers,
                                      idx.sorted_posflip, idx.bucket_lo,
                                      seqs_d, plens_d, **kw)
        jax.block_until_ready(out["n_valid"])
        return out

    def run_packed():
        out = ra._align_pairs_packed(al.genome, idx.sorted_kmers,
                                     idx.sorted_posflip, idx.bucket_lo,
                                     u2_d, nm_d, plens_d, L=L, c13=True,
                                     **kw)
        jax.block_until_ready(out["n_valid"])
        return out

    dt_c = t(run_compact)
    print(f"device compute compact: {dt_c*1e3:.0f} ms", flush=True)
    dt_p = t(run_packed)
    print(f"device compute packed:  {dt_p*1e3:.0f} ms", flush=True)

    for name, runner in (("compact", run_compact), ("packed", run_packed)):
        out = runner()
        nbytes = sum(np.asarray(v).nbytes for v in out.values())
        dt = t(lambda: jax.tree_util.tree_map(np.asarray, out))
        print(f"d2h {name} ({nbytes/1e6:.2f} MB): {dt*1e3:.0f} ms "
              f"({nbytes/dt/1e6:.1f} MB/s)", flush=True)
        res = jax.tree_util.tree_map(np.asarray, out)
        if name == "compact":
            dt = t(lambda: ra._expand_compact(res, 0, P, L, plens))
        else:
            dt = t(lambda: ra._expand_packed(res, 0, P, L, plens))
        print(f"host expand {name}: {dt*1e3:.0f} ms", flush=True)

    reads = Reads(P, L, data[:2 * P], np.full(P, 100, np.int32))
    dt = t(lambda: al.align(reads), n=2)
    print(f"align() e2e: {dt*1e3:.0f} ms -> {2*P/dt:.0f} reads/s",
          flush=True)


if __name__ == "__main__":
    main()
