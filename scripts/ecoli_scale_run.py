"""End-to-end pipeline at E. coli scale — BASELINE.json config 1.

Simulates: 4.6 Mb target genome, closely related reference (1% SNPs +
small indels), 100bp PE reads at 500bp insert, draft contigs (target
fragments with gaps).  Runs the full pipeline (alignment on the TPU,
graph build + traversal on host/native), then evaluates the extended
contigs against the *target* with the Eval module.

  python scripts/ecoli_scale_run.py [n_pairs] [genome_len]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    glen = int(sys.argv[2]) if len(sys.argv) > 2 else 4_600_000

    from aligngraph_tpu.config import Config
    from aligngraph_tpu.io.fasta import decode, write_fasta
    from aligngraph_tpu.io.formalize import Reads
    from aligngraph_tpu.pipeline.driver import run_pipeline
    from bench import make_workload

    rng = np.random.default_rng(7)
    t0 = time.time()
    # target + reference + reads (vectorized simulation from bench);
    # return_target avoids replaying the RNG to recover the target
    ref, data, lens, target = make_workload(
        genome_len=glen, n_pairs=n_pairs, seed=7, return_target=True)
    reads = Reads(n_pairs, data.shape[1], data, lens)

    # draft contigs from the SAME generator bench_pipeline uses (~3 kb
    # fragments with 50-400 bp insert-bridgeable gaps) — the round-3
    # 12-28 kb / 1-3 kb-gap workload could not be bridged by a 500 bp
    # insert and silently produced zero output (round-4 verdict #6)
    from bench_pipeline import cut_contigs
    contig_seqs = cut_contigs(rng, target)
    print(f"setup: {len(contig_seqs)} contigs, {n_pairs} pairs, "
          f"{glen/1e6:.1f} Mb genome [{time.time()-t0:.1f}s]",
          file=sys.stderr)

    d = "/tmp/ecoli_scale"
    os.makedirs(d, exist_ok=True)
    write_fasta(f"{d}/genome.fa", ["chr"], [decode(ref)])
    write_fasta(f"{d}/contigs.fa",
                [f"c{i}" for i in range(len(contig_seqs))],
                [decode(c) for c in contig_seqs])

    from aligngraph_tpu.io.formalize import formalize_contigs, \
        formalize_genome
    cfg = Config(read1="-", read2="-", contig=f"{d}/contigs.fa",
                 genome=f"{d}/genome.fa", distance_low=100,
                 distance_high=900,
                 extended_contig=f"{d}/extended.fa",
                 remaining_contig=f"{d}/remaining.fa",
                 work_dir=f"{d}/tmp")
    res = run_pipeline(cfg, reads=reads,
                       contigs=formalize_contigs(cfg.contig),
                       genome=formalize_genome(cfg.genome, 1))
    print(json.dumps({
        "n_pairs": n_pairs, "genome_mb": glen / 1e6,
        "extended": len(res.extended_ids),
        "remaining": len(res.remaining_ids),
        "extended_bases": int(sum(len(s) for s in res.extended_seqs)),
        "wall_s": round(res.wall_seconds, 1),
        "align_s": round(res.align_seconds, 1),
        "kmer_stats": res.stats.get("kmer_build"),
    }))
    assert len(res.extended_ids) > 0, \
        "scale run produced ZERO extended contigs — workload miscalibrated"

    # evaluate extended contigs vs the TARGET
    write_fasta(f"{d}/target.fa", ["chr"], [decode(target)])
    from aligngraph_tpu.evaluate.evaluate import evaluate
    t0 = time.time()
    m = evaluate(f"{d}/target.fa", f"{d}/extended.fa",
                 out_path=f"{d}/stats.txt")
    m["eval_s"] = round(time.time() - t0, 1)
    print(json.dumps(m))


if __name__ == "__main__":
    main()
