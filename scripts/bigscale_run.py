"""Configs-3/4-class end-to-end run (round-4 verdict #6): a >=100 Mb
part at >=20x depth with --part >= 2, exercising the part-boundary cut
machinery and the 1.83 M-positions/GB sizing rule under load.

Defaults: 200 Mb genome, --part 2 (two 100 Mb parts), 20x depth
(20M pairs).  Reads are generated in memory (no FASTA round-trip);
contigs/genome go through the real formalizers.  Records wall, RSS,
stage seconds, dropped_* counters, and Eval metrics as one JSON line.

Usage: python scripts/bigscale_run.py [genome_mb] [depth] [part]
"""

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    gmb = float(sys.argv[1]) if len(sys.argv) > 1 else 200.0
    depth = float(sys.argv[2]) if len(sys.argv) > 2 else 20.0
    part = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    glen = int(gmb * 1e6)
    read_len = 100
    n_pairs = int(depth * glen / (2 * read_len))

    from bench_pipeline import cut_contigs, mutate_fast, simulate_pe_reads
    from aligngraph_tpu.config import Config
    from aligngraph_tpu.evaluate.evaluate import evaluate
    from aligngraph_tpu.io.fasta import decode, write_fasta
    from aligngraph_tpu.io.formalize import (Reads, formalize_contigs,
                                             formalize_genome)
    from aligngraph_tpu.pipeline.driver import run_pipeline
    from aligngraph_tpu.utils.hostmem import warm_heap

    warm_heap(1 << 30)
    t0 = time.time()
    rng = np.random.default_rng(11)
    target = rng.integers(0, 4, glen).astype(np.int8)
    ref = mutate_fast(rng, target)
    data, lens = simulate_pe_reads(rng, target, n_pairs,
                                   read_len=read_len)
    reads = Reads(n_pairs, read_len, data, lens)
    contig_seqs = cut_contigs(rng, target)
    d = os.environ.get("BIGSCALE_DIR", "/tmp/bigscale")
    os.makedirs(d, exist_ok=True)
    write_fasta(f"{d}/genome.fa", ["chr"], [decode(ref)])
    write_fasta(f"{d}/target.fa", ["chr"], [decode(target)])
    write_fasta(f"{d}/contigs.fa",
                [f"c{i}" for i in range(len(contig_seqs))],
                [decode(c) for c in contig_seqs])
    setup_s = time.time() - t0
    print(f"# setup {setup_s:.0f}s: {gmb:.0f} Mb genome, {n_pairs} "
          f"pairs, {len(contig_seqs)} contigs, part={part}",
          file=sys.stderr, flush=True)

    cfg = Config(read1="-", read2="-", contig=f"{d}/contigs.fa",
                 genome=f"{d}/genome.fa", distance_low=300,
                 distance_high=700, part=part,
                 extended_contig=f"{d}/extended.fa",
                 remaining_contig=f"{d}/remaining.fa",
                 work_dir=f"{d}/tmp")
    t0 = time.time()
    res = run_pipeline(cfg, reads=reads,
                       contigs=formalize_contigs(cfg.contig),
                       genome=formalize_genome(cfg.genome, part))
    wall = time.time() - t0
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    st = {k: round(v, 1) for k, v in
          res.stats.get("stage_seconds", {}).items()}
    n_ext = len(res.extended_ids)
    out = dict(metric="bigscale_wall_seconds", value=round(wall, 1),
               unit="s", genome_mb=gmb, depth=depth, part=part,
               n_pairs=n_pairs, extended=n_ext,
               extended_bases=int(sum(len(s)
                                      for s in res.extended_seqs)),
               remaining=len(res.remaining_ids),
               max_rss_gb=round(rss_gb, 1), stage_seconds=st,
               kmer_stats=res.stats.get("kmer_build"))
    print(json.dumps(out), flush=True)
    assert n_ext > 0, "bigscale run produced zero extended contigs"
    t0 = time.time()
    m = evaluate(f"{d}/target.fa", f"{d}/extended.fa",
                 out_path=f"{d}/stats.txt")
    m["eval_s"] = round(time.time() - t0, 1)
    print(json.dumps({k: (float(v) if isinstance(v, np.floating)
                          else int(v) if isinstance(v, np.integer)
                          else v) for k, v in m.items()}), flush=True)


if __name__ == "__main__":
    main()
