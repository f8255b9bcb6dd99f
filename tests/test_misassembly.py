"""Misassembly removal (C26) tests."""

import numpy as np

from aligngraph_tpu.config import Config
from aligngraph_tpu.io.fasta import decode, read_fasta, write_fasta
from aligngraph_tpu.io.formalize import Reads
from aligngraph_tpu.pipeline.misassembly import remove_misassembly
from tests.simdata import simulate_reads


def make_reads_obj(r1s, r2s):
    n = len(r1s)
    L = max(len(r) for r in r1s)
    data = np.full((2 * n, L), 4, np.int8)
    lens = np.zeros(n, np.int32)
    for i, (a, b) in enumerate(zip(r1s, r2s)):
        m = min(len(a), len(b))
        data[2 * i, :m] = a[:m]
        data[2 * i + 1, :m] = b[:m]
        lens[i] = m
    return Reads(n, L, data, lens)


def test_chimeric_contig_split(tmp_path):
    """A chimera of two distant genome regions with an uncovered junction
    must be split into parts."""
    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, 40_000).astype(np.int8)
    left = genome[2000:6000]
    right = genome[20_000:24_000]
    junk = rng.integers(0, 4, 400).astype(np.int8)  # junction junk
    chimera = np.concatenate([left, junk, right])
    write_fasta(tmp_path / "out.fa", ["chim"], [decode(chimera)])
    # reads from the real genome (cover left+right pieces, not the junk)
    r1, r2, _ = simulate_reads(rng, genome, 3000, read_len=80, insert=400,
                               err_rate=0.0)
    reads = make_reads_obj(r1, r2)
    cfg = Config(distance_low=100, distance_high=700, coverage=3)
    out = remove_misassembly(str(tmp_path / "out.fa"), cfg, genome, reads,
                             which="extended")
    ids, seqs = read_fasta(out)
    assert len(ids) == 2, ids
    assert ids[0] == "chim : part0" and ids[1] == "chim : part1"
    # parts correspond to the two genuine pieces (junction removed)
    assert abs(len(seqs[0]) - 4000) < 500
    assert abs(len(seqs[1]) - 4000) < 500


def test_clean_contig_untouched(tmp_path):
    rng = np.random.default_rng(1)
    genome = rng.integers(0, 4, 20_000).astype(np.int8)
    clean = genome[3000:8000]
    write_fasta(tmp_path / "out.fa", ["ok"], [decode(clean)])
    r1, r2, _ = simulate_reads(rng, genome, 1000, read_len=80, insert=400,
                               err_rate=0.0)
    reads = make_reads_obj(r1, r2)
    cfg = Config(distance_low=100, distance_high=700, coverage=3)
    out = remove_misassembly(str(tmp_path / "out.fa"), cfg, genome, reads,
                             which="extended")
    ids, seqs = read_fasta(out)
    assert ids == ["ok"]
    assert seqs[0] == decode(clean)


def test_remaining_gets_chaff(tmp_path):
    rng = np.random.default_rng(2)
    genome = rng.integers(0, 4, 10_000).astype(np.int8)
    write_fasta(tmp_path / "rem.fa", ["r0"], [decode(genome[1000:4000])])
    reads = make_reads_obj(*simulate_reads(rng, genome, 500, read_len=80,
                                           insert=400)[:2])
    cfg = Config(distance_low=100, distance_high=700, coverage=2)
    out = remove_misassembly(
        str(tmp_path / "rem.fa"), cfg, genome, reads, which="remaining",
        chaff=(["tiny"], [b"ACGT" * 20]))
    ids, seqs = read_fasta(out)
    assert "tiny" in ids

def test_coverage_chunked_groups(tmp_path, monkeypatch):
    """The chunked span-coverage path (int32-overflow guard) must produce
    the same splits when the contig axis is forced into many tiny groups."""
    import aligngraph_tpu.pipeline.misassembly as mm
    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, 40_000).astype(np.int8)
    chimera = np.concatenate([genome[2000:6000],
                              rng.integers(0, 4, 400).astype(np.int8),
                              genome[20_000:24_000]])
    pieces = [chimera, genome[9000:12_000], genome[25_000:29_000]]
    write_fasta(tmp_path / "out.fa", [f"c{i}" for i in range(len(pieces))],
                [decode(p) for p in pieces])
    r1, r2, _ = simulate_reads(rng, genome, 3000, read_len=80, insert=400,
                               err_rate=0.0)
    reads = make_reads_obj(r1, r2)
    cfg = Config(distance_low=100, distance_high=700, coverage=3)
    out1 = remove_misassembly(str(tmp_path / "out.fa"), cfg, genome, reads,
                              which="extended")
    base = read_fasta(out1)
    # force every real contig into its own coverage group
    monkeypatch.setattr(mm, "_COV_CHUNK", 3000)
    write_fasta(tmp_path / "out2.fa", [f"c{i}" for i in range(len(pieces))],
                [decode(p) for p in pieces])
    out2 = remove_misassembly(str(tmp_path / "out2.fa"), cfg, genome, reads,
                              which="extended")
    assert read_fasta(out2) == base
    assert base[0][0].startswith("c0 : part")   # chimera was split
