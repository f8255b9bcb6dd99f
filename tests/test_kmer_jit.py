"""Device (jitted) k-mer layer build must equal the host oracle
bit-for-bit: same GraphTensors (slots, coverage, votes, strings, edges)
and same build statistics on real pipeline alignments."""

import dataclasses

import numpy as np
import pytest

from aligngraph_tpu.align.read_aligner import ReadAligner
from aligngraph_tpu.align.types import PairAlignments
from aligngraph_tpu.config import Config, THRESHOLD
from aligngraph_tpu.graph.contig_layer import build_contig_layer
from aligngraph_tpu.graph.kmer_layer import KmerBuildStats, build_kmer_layer
from aligngraph_tpu.graph.kmer_layer_jit import build_kmer_layer_device
from aligngraph_tpu.graph.model import GraphTensors
from aligngraph_tpu.io.formalize import Reads
from tests.simdata import make_simdata

KM_FIELDS = ("km_cnt", "km_contig", "km_coff", "km_contig0", "km_coff0",
             "km_mate", "km_cov", "km_votes", "km_s", "km_slen",
             "ed_cnt", "ed_pos", "ed_item")


def _subset(pa, mask):
    return dataclasses.replace(
        pa, **{f.name: getattr(pa, f.name)[mask]
               for f in dataclasses.fields(pa)})


def _aligned_graph(seed, n_pairs=900, genome_len=20_000, with_contigs=True,
                   err_rate=0.003):
    sim = make_simdata(seed=seed, genome_len=genome_len, n_pairs=n_pairs,
                       read_len=100, insert=500, n_contigs=8,
                       snp_rate=0.01, err_rate=err_rate)
    data = np.empty((2 * n_pairs, 100), np.int8)
    data[0::2] = np.stack(sim.reads1)
    data[1::2] = np.stack(sim.reads2)
    reads = Reads(n_pairs, 100, data, np.full(n_pairs, 100, np.int32))
    cfg = Config(distance_low=300, distance_high=700)
    rali = ReadAligner.build(sim.reference, cfg, batch_pairs=1024)\
        .align(reads)
    rali = _subset(rali, rali.ratio_ok(THRESHOLD))

    def make_graph():
        g = GraphTensors.create(sim.reference)
        if with_contigs:
            from aligngraph_tpu.align.contig_aligner import ContigAligner
            from tests.test_contig_aligner import contigs_from_arrays
            contigs = contigs_from_arrays(sim.contigs)
            cali = ContigAligner(sim.reference, cfg).align(contigs)
            build_contig_layer(g, contigs, cali)
        return g

    return make_graph, rali, reads, cfg


@pytest.mark.parametrize("seed,chunk", [(21, 4096), (22, 257)])
def test_device_build_equals_oracle(seed, chunk):
    make_graph, rali, reads, cfg = _aligned_graph(seed)
    g_host = make_graph()
    st_host = build_kmer_layer(g_host, rali, reads, cfg.k_mer,
                               cfg.insert_variation,
                               chunk_records=chunk)
    g_dev = make_graph()
    st_dev = build_kmer_layer_device(g_dev, rali, reads, cfg.k_mer,
                                     cfg.insert_variation,
                                     chunk_records=chunk)
    for f in KM_FIELDS:
        np.testing.assert_array_equal(getattr(g_dev, f),
                                      getattr(g_host, f), err_msg=f)
    assert dataclasses.asdict(st_dev) == dataclasses.asdict(st_host)
    assert st_dev.tuples > 10_000      # the workload is non-trivial


def test_device_build_no_contig_layer():
    """Read-only graph (no ContiMers): exercises the no-anchor combo
    path and the coverage/vote accumulation."""
    make_graph, rali, reads, cfg = _aligned_graph(
        23, n_pairs=400, genome_len=12_000, with_contigs=False)
    g_host = make_graph()
    build_kmer_layer(g_host, rali, reads, cfg.k_mer, cfg.insert_variation)
    g_dev = make_graph()
    build_kmer_layer_device(g_dev, rali, reads, cfg.k_mer,
                            cfg.insert_variation)
    for f in KM_FIELDS:
        np.testing.assert_array_equal(getattr(g_dev, f),
                                      getattr(g_host, f), err_msg=f)
    assert int(g_dev.km_cov.sum()) > 0


def test_device_build_overflow_fallback():
    """Tiny bridge capacity forces the overflow path: the chunk must be
    replayed through the host oracle with identical results."""
    import aligngraph_tpu.graph.kmer_layer_jit as kj

    make_graph, rali, reads, cfg = _aligned_graph(
        24, n_pairs=300, genome_len=12_000, err_rate=0.02)
    g_host = make_graph()
    st_h = build_kmer_layer(g_host, rali, reads, cfg.k_mer,
                            cfg.insert_variation, chunk_records=128)
    g_dev = make_graph()
    orig = kj._chunk_update

    calls = {"n": 0}

    def tiny_caps(state, cmpack, *args, B_cap, G_cap, **kw):
        calls["n"] += 1
        # starve the group capacity so every chunk overflows
        return orig(state, cmpack, *args, B_cap=B_cap, G_cap=64, **kw)

    kj._chunk_update = tiny_caps
    try:
        st_d = build_kmer_layer_device(g_dev, rali, reads, cfg.k_mer,
                                       cfg.insert_variation,
                                       chunk_records=128)
    finally:
        kj._chunk_update = orig
    assert calls["n"] >= 2
    for f in KM_FIELDS:
        np.testing.assert_array_equal(getattr(g_dev, f),
                                      getattr(g_host, f), err_msg=f)
    assert dataclasses.asdict(st_d) == dataclasses.asdict(st_h)
