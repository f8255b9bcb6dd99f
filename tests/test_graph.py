"""Graph engine tests: contig layer, k-mer layer, traversal/extension."""

import numpy as np

from aligngraph_tpu.align.contig_aligner import ContigAligner
from aligngraph_tpu.align.read_aligner import ReadAligner
from aligngraph_tpu.config import Config, THRESHOLD
from aligngraph_tpu.graph.contig_layer import build_contig_layer, \
    initial_contigs
from aligngraph_tpu.graph.kmer_layer import build_kmer_layer
from aligngraph_tpu.graph.model import NONE32, GraphTensors
from aligngraph_tpu.graph.traverse import extend_and_scaffold
from aligngraph_tpu.io.formalize import Reads
from tests.simdata import make_simdata, revcomp_np
from tests.test_contig_aligner import contigs_from_arrays
from tests.test_read_aligner import make_reads


def align_all(sim, cfg):
    contigs = contigs_from_arrays(sim.contigs)
    reads = make_reads(sim)
    ca = ContigAligner(sim.reference, cfg)
    cali = ca.align(contigs)
    ra = ReadAligner.build(sim.reference, cfg, batch_pairs=256)
    rali = ra.align(reads)
    keep = rali.ratio_ok(THRESHOLD)
    rali = _subset(rali, keep)
    return contigs, reads, cali, rali


def _subset(pa, mask):
    import dataclasses
    return dataclasses.replace(
        pa, **{f.name: getattr(pa, f.name)[mask]
               for f in dataclasses.fields(pa)})


def test_contig_layer_chain():
    rng = np.random.default_rng(0)
    ref = rng.integers(0, 4, 3000).astype(np.int8)
    contig = ref[500:1500].copy()
    cali = ContigAligner(ref, Config()).align(contigs_from_arrays([contig]))
    g = GraphTensors.create(ref)
    outp = build_contig_layer(g, contigs_from_arrays([contig]), cali)
    assert outp.get(0)
    # clean placement: ContiMer chain over [500, 1500)
    assert g.cm_cnt[500] == 1
    assert g.cm_cnt[1498] == 1  # last loop base (chain)
    assert g.cm_cnt[1499] == 1  # terminal ContiMer only
    assert g.cm_cnt[499] == 0 and g.cm_cnt[1500] == 0
    assert g.cm_next[500, 0] == 501
    assert g.cm_coff[500, 0] == 0
    assert g.cm_base[1000, 0] == ref[1000]
    # terminal: next == -1, genome nucleotide
    assert g.cm_next[1499, 0] == NONE32
    assert g.cm_coff[1499, 0] == 999
    ic = initial_contigs(contigs_from_arrays([contig]), outp)
    assert len(ic) == 1 and ic[0][0] == 0


def test_kmer_layer_coverage_and_votes():
    sim = make_simdata(seed=11, genome_len=6000, n_pairs=600, read_len=80,
                      insert=400, snp_rate=0.0, err_rate=0.0, n_contigs=2)
    cfg = Config(distance_low=100, distance_high=700, k_mer=5)
    contigs, reads, cali, rali = align_all(sim, cfg)
    g = GraphTensors.create(sim.reference)
    build_contig_layer(g, contigs, cali)
    st = build_kmer_layer(g, rali, reads, cfg.k_mer, cfg.insert_variation)
    assert st.tuples > 10000
    mid = slice(1000, 5000)
    covered = (g.km_cnt[mid] > 0).mean()
    assert covered > 0.9, covered
    # coverage should be roughly read depth (600*2*80/6000 = 16x)
    cov = g.km_cov[mid][g.km_cnt[mid] > 0]
    assert cov.max() > 5
    # votes at a covered position should favor the target base
    # (target == reference here, snp_rate 0)
    pos = 3000
    if g.km_cnt[pos] > 0:
        votes = g.km_votes[pos, 0]
        assert votes.argmax() == sim.reference[pos]
    # edges: most slot-0 kmers have a next edge
    e = g.ed_cnt[mid, 0][g.km_cnt[mid] > 0]
    assert (e >= 1).mean() > 0.8


def test_kmer_layer_chunk_invariance():
    """Slot state must not depend on the record-chunking granularity
    (slot reps/coverage/votes/edges accumulate identically)."""
    sim = make_simdata(seed=33, genome_len=4000, n_pairs=250, read_len=70,
                      insert=350, snp_rate=0.0, err_rate=0.0, n_contigs=2)
    cfg = Config(distance_low=100, distance_high=600, k_mer=5)
    contigs, reads, cali, rali = align_all(sim, cfg)
    gs = []
    for chunk in (17, 100000):
        g = GraphTensors.create(sim.reference)
        build_contig_layer(g, contigs, cali)
        st = build_kmer_layer(g, rali, reads, cfg.k_mer,
                              cfg.insert_variation, chunk_records=chunk)
        assert st.dropped_rank == 0 and st.dropped_slots == 0
        gs.append(g)
    a, b = gs
    np.testing.assert_array_equal(a.km_cnt, b.km_cnt)
    np.testing.assert_array_equal(a.km_cov, b.km_cov)
    np.testing.assert_array_equal(a.km_votes, b.km_votes)
    np.testing.assert_array_equal(a.km_contig, b.km_contig)
    np.testing.assert_array_equal(a.km_mate, b.km_mate)
    np.testing.assert_array_equal(a.ed_cnt, b.ed_cnt)
    np.testing.assert_array_equal(a.ed_pos, b.ed_pos)
    np.testing.assert_array_equal(a.ed_item, b.ed_item)


def test_extension_bridges_gap():
    """Two draft contigs with a read-covered gap must extend/join."""
    rng = np.random.default_rng(4)
    target = rng.integers(0, 4, 12000).astype(np.int8)
    reference = target.copy()  # identical reference for a clean test
    c1 = target[1000:4000].copy()
    c2 = target[4400:7500].copy()
    # simulate dense PE reads over the whole target
    from tests.simdata import simulate_reads
    reads1, reads2, _ = simulate_reads(rng, target, 1500, read_len=80,
                                       insert=400, err_rate=0.0)

    class SimStub:
        pass

    sim = SimStub()
    sim.reference = reference
    sim.contigs = [c1, c2]
    sim.reads1, sim.reads2 = reads1, reads2
    cfg = Config(distance_low=100, distance_high=700, k_mer=5, coverage=3)
    contigs, reads, cali, rali = align_all(sim, cfg)
    assert cali.n >= 2
    g = GraphTensors.create(reference)
    build_contig_layer(g, contigs, cali)
    build_kmer_layer(g, rali, reads, cfg.k_mer, cfg.insert_variation)
    scaffolds, pre = extend_and_scaffold(g, cfg.coverage, cfg.k_mer)
    assert len(scaffolds) >= 1
    longest = max(scaffolds, key=len)
    # the extension must bridge the [4000, 4400) gap: one scaffold longer
    # than either draft contig
    assert len(longest) > 5000, len(longest)
    # and its sequence must match the target where it aligns: locate by
    # exact prefix match, then require near-zero mismatch over full length
    s = np.asarray(longest)
    from numpy.lib.stride_tricks import sliding_window_view
    w = sliding_window_view(target, 50)
    hits = np.nonzero((w == s[:50]).all(axis=1))[0]
    assert len(hits) >= 1
    off = int(hits[0])
    ln = min(len(s), len(target) - off)
    err = (s[:ln] != target[off:off + ln]).mean()
    assert err < 0.01, err


def test_extension_corrects_snps():
    """Reference has SNPs vs target; read votes must correct them."""
    sim = make_simdata(seed=12, genome_len=8000, n_pairs=1200, read_len=80,
                      insert=400, snp_rate=0.01, err_rate=0.0, n_contigs=3)
    cfg = Config(distance_low=100, distance_high=700, k_mer=5, coverage=5)
    contigs, reads, cali, rali = align_all(sim, cfg)
    g = GraphTensors.create(sim.reference)
    build_contig_layer(g, contigs, cali)
    build_kmer_layer(g, rali, reads, cfg.k_mer, cfg.insert_variation)
    scaffolds, pre = extend_and_scaffold(g, cfg.coverage, cfg.k_mer)
    assert scaffolds
    # align the longest scaffold back to the TARGET: identity should be
    # high (votes corrected reference SNPs)
    s = np.asarray(max(scaffolds, key=len))
    assert len(s) > 500
    # align the scaffold back to the TARGET (handles indel frame shifts)
    # and measure per-base identity through the position map
    back = ContigAligner(sim.target, Config()).align(
        contigs_from_arrays([s]))
    assert back.n >= 1
    best = np.argmax(back.score)
    pm = back.pos_map[best]
    al = pm >= 0
    assert al.mean() > 0.9, al.mean()
    q = s if back.fr[best] == 0 else revcomp_np(s)
    ident = (sim.target[pm[al]] == q[al]).mean()
    assert ident > 0.98, ident
