"""End-to-end pipeline tests: files in -> extended/remaining FASTA out."""

import subprocess
import sys

import numpy as np
import pytest

from aligngraph_tpu.config import Config
from aligngraph_tpu.io.fasta import decode, read_fasta, write_fasta
from aligngraph_tpu.pipeline.checkpoint import Checkpoint
from aligngraph_tpu.pipeline.driver import run_pipeline
from tests.simdata import make_simdata


@pytest.fixture(scope="module")
def sim_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    sim = make_simdata(seed=42, genome_len=30_000, n_pairs=3000,
                      read_len=100, insert=500, n_contigs=10,
                      snp_rate=0.01, err_rate=0.003)
    write_fasta(d / "genome.fa", ["refchr"], [decode(sim.reference)])
    write_fasta(d / "contigs.fa", [f"ctg{i}" for i in range(len(sim.contigs))],
                [decode(c) for c in sim.contigs])
    n = len(sim.reads1)
    write_fasta(d / "r1.fa", [f"p{i}" for i in range(n)],
                [decode(r) for r in sim.reads1])
    write_fasta(d / "r2.fa", [f"p{i}" for i in range(n)],
                [decode(r) for r in sim.reads2])
    return d, sim


def make_cfg(d, **kw):
    base = dict(read1=str(d / "r1.fa"), read2=str(d / "r2.fa"),
                contig=str(d / "contigs.fa"), genome=str(d / "genome.fa"),
                distance_low=300, distance_high=700,
                extended_contig=str(d / "extended.fa"),
                remaining_contig=str(d / "remaining.fa"),
                work_dir=str(d / "tmp"))
    base.update(kw)
    return Config(**base)


def test_pipeline_end_to_end(sim_files):
    d, sim = sim_files
    cfg = make_cfg(d)
    res = run_pipeline(cfg)
    assert res.stats["n_pairs"] == 3000
    assert len(res.extended_ids) >= 1, "no extended contigs produced"
    # extended output should be longer than the draft contigs it extends
    total_ext = sum(len(s) for s in res.extended_seqs)
    assert total_ext > 5000
    # headers follow the reference format
    assert res.extended_ids[0].startswith("AlignGraph0 @ refchr : ")
    # files written and parseable
    ids, seqs = read_fasta(str(d / "extended.fa"))
    assert len(ids) == len(res.extended_ids)
    rids, rseqs = read_fasta(str(d / "remaining.fa"))
    assert len(rids) == len(res.remaining_ids)
    # every extended contig aligns back to the target at high identity
    from aligngraph_tpu.align.contig_aligner import ContigAligner
    from tests.test_contig_aligner import contigs_from_arrays
    from tests.simdata import revcomp_np
    back = ContigAligner(sim.target, Config()).align(
        contigs_from_arrays(res.extended_seqs))
    assert len(set(back.chunk_id.tolist())) == len(res.extended_seqs)
    for k in range(back.n):
        s = res.extended_seqs[back.chunk_id[k]]
        q = s if back.fr[k] == 0 else revcomp_np(s)
        pm = back.pos_map[k]
        al = pm >= 0
        ident = (sim.target[pm[al]] == q[al]).mean()
        assert ident > 0.97, (k, ident)


def test_pipeline_part2_consistency(sim_files):
    """--part 2 must still produce extended output (lossy cut tolerated,
    like the reference)."""
    d, sim = sim_files
    cfg = make_cfg(d, part=2,
                   extended_contig=str(d / "extended_p2.fa"),
                   remaining_contig=str(d / "remaining_p2.fa"),
                   work_dir=str(d / "tmp_p2"))
    res = run_pipeline(cfg)
    assert res.stats["n_parts"] == 2
    assert len(res.extended_ids) >= 1


def test_pipeline_iterative_map(sim_files):
    """--iterativeMap (per-part read alignment) must reach equivalent
    output."""
    d, sim = sim_files
    cfg = make_cfg(d, part=2, iterative_map=True,
                   extended_contig=str(d / "extended_im.fa"),
                   remaining_contig=str(d / "remaining_im.fa"),
                   work_dir=str(d / "tmp_im"))
    res = run_pipeline(cfg)
    assert len(res.extended_ids) >= 1


def test_pipeline_iterative_map_degenerate_parts(tmp_path):
    """--iterativeMap where every genome part is shorter than the seed
    length: nothing can align, and the pipeline must finish with empty
    extended output instead of crashing on an empty part list
    (regression: np.concatenate([]) in the driver's iterativeMap branch)."""
    rng = np.random.default_rng(3)
    genome = rng.integers(0, 4, 20).astype(np.int8)
    contig = rng.integers(0, 4, 300).astype(np.int8)
    reads = [rng.integers(0, 4, 100).astype(np.int8) for _ in range(4)]
    write_fasta(tmp_path / "genome.fa", ["chr"], [decode(genome)])
    write_fasta(tmp_path / "contigs.fa", ["c0"], [decode(contig)])
    write_fasta(tmp_path / "r1.fa", ["p0", "p1"],
                [decode(r) for r in reads[:2]])
    write_fasta(tmp_path / "r2.fa", ["p0", "p1"],
                [decode(r) for r in reads[2:]])
    cfg = make_cfg(tmp_path, part=2, iterative_map=True)
    res = run_pipeline(cfg)
    assert res.extended_ids == []
    assert res.stats["n_parts"] == 2


def test_pipeline_resume(sim_files):
    d, sim = sim_files
    wd = str(d / "tmp_resume")
    cfg = make_cfg(d, work_dir=wd,
                   extended_contig=str(d / "extended_r.fa"),
                   remaining_contig=str(d / "remaining_r.fa"))
    ck = Checkpoint(wd)
    res1 = run_pipeline(cfg, checkpoint=ck)
    # resume: config restored from _command.txt, alignment + parts loaded
    cfg2 = Config(resume=True, work_dir=wd)
    res2 = run_pipeline(cfg2)
    assert res2.extended_ids == res1.extended_ids
    assert [len(s) for s in res2.extended_seqs] == \
        [len(s) for s in res1.extended_seqs]


def test_cli_determinism(sim_files):
    """Two independent CLI processes must produce byte-identical output
    (fixed reduction orders / stable sorts everywhere)."""
    d, sim = sim_files
    import os
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH="/root/repo")
    outs = []
    for run in ("da", "db"):
        args = [sys.executable, "-m", "aligngraph_tpu",
                "--read1", str(d / "r1.fa"), "--read2", str(d / "r2.fa"),
                "--contig", str(d / "contigs.fa"),
                "--genome", str(d / "genome.fa"),
                "--distanceLow", "300", "--distanceHigh", "700",
                "--extendedContig", str(d / f"ext_{run}.fa"),
                "--remainingContig", str(d / f"rem_{run}.fa")]
        r = subprocess.run(args, capture_output=True, text=True,
                           cwd=str(d), env=env, timeout=500)
        assert r.returncode == 0, r.stderr[-2000:]
        outs.append((open(d / f"ext_{run}.fa", "rb").read(),
                     open(d / f"rem_{run}.fa", "rb").read()))
    assert outs[0] == outs[1]


def test_cli_usage():
    out = subprocess.run(
        [sys.executable, "-m", "aligngraph_tpu", "--help"],
        capture_output=True, text=True, cwd="/root/repo")
    assert out.returncode == 0
    assert "aligngraph_tpu" in out.stdout
    bad = subprocess.run(
        [sys.executable, "-m", "aligngraph_tpu", "--bogus", "1"],
        capture_output=True, text=True, cwd="/root/repo")
    assert bad.returncode == 2
    assert "unknown flag" in bad.stderr
