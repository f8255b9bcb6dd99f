"""Reproduce one golden-flag-matrix case in a persistent dir for bisection.

Usage: python scripts/repro_matrix.py <name> [workdir]
Names as in tests/test_golden_parity.py::MATRIX, plus 'default'.
Writes ref run into <wd>/ (tmp/), ours into <wd>/our_tmp/.
"""
import os
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from aligngraph_tpu.io.fasta import decode, write_fasta  # noqa: E402
from tests.simdata import make_simdata  # noqa: E402

REF_BIN = "/root/reference/AlignGraph/AlignGraph"
SHIMS = str(REPO / "scripts" / "shims")

MATRIX = {
    "default": ([], {}, 1),
    "uniqueExtension": (["--uniqueExtension"], dict(unique_extension=True), 1),
    "part2": (["--part", "2"], dict(part=2), 1),
    "multichrom_iterativeMap": (["--iterativeMap"],
                                dict(iterative_map=True), 3),
}


def main():
    name = sys.argv[1]
    wd = Path(sys.argv[2] if len(sys.argv) > 2 else f"/tmp/repro_{name}")
    ref_args, overrides, n_chrom = MATRIX[name]
    wd.mkdir(parents=True, exist_ok=True)

    sim = make_simdata(seed=7 + n_chrom, genome_len=12_000 * n_chrom,
                       n_pairs=600 * n_chrom, read_len=100, insert=500,
                       snp_rate=0.01)
    if n_chrom > 1:
        cuts = np.linspace(0, len(sim.reference), n_chrom + 1).astype(int)
        chroms = [sim.reference[cuts[i]:cuts[i + 1]] for i in range(n_chrom)]
        write_fasta(wd / "genome.fa", [f"chr{i}" for i in range(n_chrom)],
                    [decode(c) for c in chroms])
    else:
        write_fasta(wd / "genome.fa", ["chr0"], [decode(sim.reference)])
    write_fasta(wd / "reads_1.fa", [f"r{i}" for i in range(len(sim.reads1))],
                [decode(s) for s in sim.reads1])
    write_fasta(wd / "reads_2.fa", [f"r{i}" for i in range(len(sim.reads2))],
                [decode(s) for s in sim.reads2])
    write_fasta(wd / "contigs.fa", [f"c{i}" for i in range(len(sim.contigs))],
                [decode(s) for s in sim.contigs])

    if "--skip-ref" not in sys.argv:
        env = dict(os.environ)
        env["PATH"] = SHIMS + os.pathsep + env.get("PATH", "")
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("XLA_FLAGS", None)
        proc = subprocess.run(
            [REF_BIN, "--read1", "reads_1.fa", "--read2", "reads_2.fa",
             "--contig", "contigs.fa", "--genome", "genome.fa",
             "--distanceLow", "200", "--distanceHigh", "800",
             "--extendedContig", "ref_extended.fa",
             "--remainingContig", "ref_remaining.fa"] + ref_args,
            cwd=wd, env=env, capture_output=True, text=True, timeout=1200)
        print(proc.stdout[-1500:], proc.stderr[-1500:])
        print("ref rc:", proc.returncode)

    if "--skip-ours" not in sys.argv:
        from aligngraph_tpu.config import Config
        from aligngraph_tpu.pipeline.driver import run_pipeline
        cfg = Config(
            read1=str(wd / "reads_1.fa"), read2=str(wd / "reads_2.fa"),
            contig=str(wd / "contigs.fa"), genome=str(wd / "genome.fa"),
            distance_low=200, distance_high=800,
            extended_contig=str(wd / "our_extended.fa"),
            remaining_contig=str(wd / "our_remaining.fa"),
            work_dir=str(wd / "our_tmp"), **overrides)
        run_pipeline(cfg)
    print("workdir:", wd)


if __name__ == "__main__":
    main()
