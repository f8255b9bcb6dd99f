"""End-to-end pipeline benchmark — BASELINE.json config 1 scale.

Prints ONE JSON line with the full-pipeline wall time and the per-stage
split (alignment / contig layer / k-mer graph build / traversal+scaffold /
refinement), so stage regressions are visible round to round.  The
reference's own self-reporting is total + alignment seconds only
(AlignGraph.cpp:4794-4795).

Workload: 4.6 Mb genome (1% SNP reference), 100bp PE reads, draft contigs
= target fragments with gaps.  Smaller than bench.py's read count by
default so the host graph stages dominate honestly (BENCH_PIPE_PAIRS to
override).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    n_pairs = int(os.environ.get("BENCH_PIPE_PAIRS", 100_000))
    glen = int(os.environ.get("BENCH_PIPE_GENOME", 4_600_000))

    from bench import make_workload
    from aligngraph_tpu.config import Config
    from aligngraph_tpu.io.fasta import decode, write_fasta
    from aligngraph_tpu.io.formalize import (Reads, formalize_contigs,
                                             formalize_genome)
    from aligngraph_tpu.pipeline.driver import run_pipeline
    from aligngraph_tpu.utils.hostmem import warm_heap

    warm_heap(1 << 30)
    rng = np.random.default_rng(7)
    ref, data, lens, target = make_workload(genome_len=glen,
                                            n_pairs=n_pairs, seed=7,
                                            return_target=True)
    reads = Reads(n_pairs, data.shape[1], data, lens)

    contig_seqs, pos = [], 0
    while pos + 25_000 < glen:
        ln = int(rng.integers(12_000, 28_000))
        contig_seqs.append(target[pos:pos + ln])
        pos += ln + int(rng.integers(1000, 3000))

    d = "/tmp/bench_pipeline"
    os.makedirs(d, exist_ok=True)
    write_fasta(f"{d}/genome.fa", ["chr"], [decode(ref)])
    write_fasta(f"{d}/contigs.fa",
                [f"c{i}" for i in range(len(contig_seqs))],
                [decode(c) for c in contig_seqs])
    cfg = Config(read1="-", read2="-", contig=f"{d}/contigs.fa",
                 genome=f"{d}/genome.fa", distance_low=100,
                 distance_high=900,
                 extended_contig=f"{d}/extended.fa",
                 remaining_contig=f"{d}/remaining.fa",
                 work_dir=f"{d}/tmp")
    t0 = time.time()
    res = run_pipeline(cfg, reads=reads,
                       contigs=formalize_contigs(cfg.contig),
                       genome=formalize_genome(cfg.genome, 1))
    wall = time.time() - t0
    st = {k: round(v, 2) for k, v in
          res.stats.get("stage_seconds", {}).items()}
    print(json.dumps({
        "metric": "pipeline_wall_s",
        "value": round(wall, 2),
        "unit": "s",
        "stages": st,
        "n_pairs": n_pairs,
        "genome_mb": glen / 1e6,
        "extended": len(res.extended_ids),
        "extended_bases": int(sum(len(s) for s in res.extended_seqs)),
        "kmer_stats": res.stats.get("kmer_build"),
    }))


if __name__ == "__main__":
    main()
