"""Contig aligner (BLAT replacement) tests on simulated data."""

import numpy as np

from aligngraph_tpu.align.contig_aligner import ContigAligner
from aligngraph_tpu.config import Config
from aligngraph_tpu.io.formalize import Contigs
from tests.simdata import make_simdata, revcomp_np


def contigs_from_arrays(seqs):
    chunk_real, chunk_start, chunk_len = [], [], []
    for i, s in enumerate(seqs):
        chunk_real.append(i)
        chunk_start.append(0)
        chunk_len.append(len(s))
    return Contigs(
        ids=[f"c{i}" for i in range(len(seqs))],
        seqs=[np.asarray(s, np.int8) for s in seqs],
        chaff_ids=[], chaff_seqs=[],
        chunk_real=np.array(chunk_real, np.int32),
        chunk_start=np.array(chunk_start, np.int64),
        chunk_len=np.array(chunk_len, np.int64),
    )


def test_contig_alignment_basic():
    sim = make_simdata(seed=5, genome_len=40_000, n_pairs=1,
                      n_contigs=8, snp_rate=0.01)
    contigs = contigs_from_arrays(sim.contigs)
    cfg = Config()
    al = ContigAligner(sim.reference, cfg)
    res = al.align(contigs)
    placed = set(res.chunk_id.tolist())
    assert len(placed) >= len(sim.contigs) - 1, \
        f"only {len(placed)}/{len(sim.contigs)} contigs placed"
    for k in range(res.n):
        c = res.chunk_id[k]
        cov = res.score[k] / res.source_size[k]
        assert cov > 0.7, (c, cov)
        # placements should be near the simulated position (indel drift ok)
        if res.fr[k] == 0:
            true_start = sim.contig_pos[c][0]
            assert abs(int(res.target_start[k]) - true_start) < 1500


def test_contig_alignment_revcomp():
    sim = make_simdata(seed=6, genome_len=20_000, n_pairs=1, n_contigs=4,
                      snp_rate=0.005)
    seqs = [revcomp_np(s) for s in sim.contigs]
    res = ContigAligner(sim.reference, Config()).align(
        contigs_from_arrays(seqs))
    assert res.n >= len(seqs) - 1
    assert np.all(res.fr[np.argsort(res.score)[-len(seqs):]] == 1) or \
        (res.fr == 1).sum() >= len(seqs) - 1


def test_contig_alignment_exact_positions():
    rng = np.random.default_rng(0)
    g = rng.integers(0, 4, 10_000).astype(np.int8)
    contig = g[2000:5000].copy()
    res = ContigAligner(g, Config()).align(contigs_from_arrays([contig]))
    assert res.n == 1
    assert res.fr[0] == 0
    assert res.target_start[0] == 2000
    assert res.target_end[0] == 5000
    pm = res.pos_map[0]
    np.testing.assert_array_equal(pm, np.arange(2000, 5000))


def test_contig_alignment_large_deletion_chained():
    """Contig spans a 5kb segment deleted from the reference: chaining must
    produce ONE placement covering both sides (BLAT-like)."""
    rng = np.random.default_rng(1)
    target = rng.integers(0, 4, 30_000).astype(np.int8)
    # reference = target with [12000, 17000) deleted
    reference = np.concatenate([target[:12_000], target[17_000:]])
    contig = target[9_000:20_000].copy()          # 11kb, 5kb missing in ref
    res = ContigAligner(reference, Config()).align(
        contigs_from_arrays([contig]))
    assert res.n >= 1
    best = np.argmax(res.score)
    pm = res.pos_map[best]
    # left flank aligns near 9000, right flank near 12000 (post-deletion)
    left = pm[:3000]
    right = pm[-3000:]
    assert (left >= 0).mean() > 0.9
    assert (right >= 0).mean() > 0.9
    assert abs(int(left[left >= 0][0]) - 9_000) < 50
    assert abs(int(right[right >= 0][-1]) - 15_000) < 50
    # coverage of the whole contig: 6kb aligned / 11kb >= 0.5 passes filter
    assert res.score[best] / res.source_size[best] > 0.5


def test_contig_below_size_filter():
    rng = np.random.default_rng(2)
    g = rng.integers(0, 4, 5000).astype(np.int8)
    tiny = g[100:290].copy()   # 190bp < 200 -> sourceSize filter rejects
    res = ContigAligner(g, Config()).align(contigs_from_arrays([tiny]))
    assert res.n == 0
