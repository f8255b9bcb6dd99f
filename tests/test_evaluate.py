"""Eval module (Eval-AlignGraph equivalent) tests."""

import numpy as np

from aligngraph_tpu.evaluate.evaluate import evaluate
from aligngraph_tpu.io.fasta import decode, write_fasta
from tests.simdata import revcomp_np


def test_evaluate_perfect_contigs(tmp_path):
    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, 50_000).astype(np.int8)
    write_fasta(tmp_path / "g.fa", ["chr1"], [decode(genome)])
    contigs = [genome[1000:6000], genome[10_000:18_000],
               revcomp_np(genome[30_000:34_000])]
    write_fasta(tmp_path / "c.fa", ["a", "b", "c"],
                [decode(c) for c in contigs])
    m = evaluate(tmp_path / "g.fa", tmp_path / "c.fa",
                 out_path=str(tmp_path / "stats.txt"))
    assert m["n_contigs"] == 3
    assert m["n_true_contigs"] == 3
    assert m["covered_length"] == 5000 + 8000 + 4000
    assert m["maximum_length"] == 8000
    assert m["n50"] == 5000          # cumsum 8000+5000 > 17000/2
    assert m["mpmb"] == 0.0
    assert m["average_identity"] > 0.99
    stats = open(tmp_path / "stats.txt").read()
    assert "#true contigs" in stats and "N50" in stats


def test_evaluate_misassembled_contig(tmp_path):
    """A chimeric contig (two distant genome pieces joined) counts as a
    misassembly (errors=2 -> +1)."""
    rng = np.random.default_rng(1)
    genome = rng.integers(0, 4, 60_000).astype(np.int8)
    write_fasta(tmp_path / "g.fa", ["chr1"], [decode(genome)])
    chimera = np.concatenate([genome[5000:9000], genome[40_000:44_000]])
    write_fasta(tmp_path / "c.fa", ["chim"], [decode(chimera)])
    m = evaluate(tmp_path / "g.fa", tmp_path / "c.fa")
    assert m["n_contigs"] == 1
    # reference prints trueContigLengths.size() = TALLIED placements: both
    # halves of the chimera are tallied as error placements
    # (Eval-AlignGraph.cpp:343-371)
    assert m["n_true_contigs"] == 2
    assert m["mpmb"] > 0
    # both halves align -> covered length ~8000
    assert m["covered_length"] > 7000


def test_evaluate_cutoff(tmp_path):
    rng = np.random.default_rng(2)
    genome = rng.integers(0, 4, 10_000).astype(np.int8)
    write_fasta(tmp_path / "g.fa", ["chr1"], [decode(genome)])
    # one below-CUTOFF contig (999bp) must be excluded entirely
    write_fasta(tmp_path / "c.fa", ["small", "big"],
                [decode(genome[100:1099]), decode(genome[2000:5000])])
    m = evaluate(tmp_path / "g.fa", tmp_path / "c.fa")
    assert m["n_contigs"] == 1
