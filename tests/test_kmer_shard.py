"""Position-sharded k-mer build == host oracle, bit for bit (D2/D3).

8 virtual CPU devices (conftest forces
xla_force_host_platform_device_count=8); the genome is small enough
that shard cuts land every ~2 kb, so plenty of reads' emission spans
and edges cross cuts."""

import numpy as np
import pytest

from tests.test_kmer_jit import KM_FIELDS


def _workload(seed=3, glen=16_000, n_pairs=900):
    import jax.numpy as jnp  # noqa: F401

    from tests.simdata import make_simdata
    from aligngraph_tpu.align.read_aligner import ReadAligner
    from aligngraph_tpu.align.contig_aligner import ContigAligner
    from aligngraph_tpu.config import Config, THRESHOLD
    from aligngraph_tpu.graph.contig_layer import build_contig_layer
    from aligngraph_tpu.graph.model import GraphTensors
    from aligngraph_tpu.io.formalize import Contigs, Reads
    from aligngraph_tpu.pipeline.driver import _subset_pairs

    sim = make_simdata(seed=seed, genome_len=glen, n_pairs=n_pairs,
                       read_len=100, insert=500, snp_rate=0.01)
    ref = np.asarray(sim.reference, np.int8)
    data = np.empty((2 * n_pairs, 100), np.int8)
    for i in range(n_pairs):
        data[2 * i] = sim.reads1[i]
        data[2 * i + 1] = sim.reads2[i]
    reads = Reads(n_pairs, 100, data, np.full(n_pairs, 100, np.int32))
    cfg = Config(distance_low=200, distance_high=800)
    rali = ReadAligner.build(ref, cfg).align(reads)
    rali = _subset_pairs(rali, rali.ratio_ok(THRESHOLD))
    contigs = Contigs(
        ids=[f"c{i}" for i in range(len(sim.contigs))],
        seqs=[np.asarray(c, np.int8) for c in sim.contigs],
        chaff_ids=[], chaff_seqs=[],
        chunk_real=np.arange(len(sim.contigs), dtype=np.int32),
        chunk_start=np.zeros(len(sim.contigs), np.int64),
        chunk_len=np.array([len(c) for c in sim.contigs], np.int64))
    cali = ContigAligner(ref, cfg).align(contigs)

    def fresh():
        g = GraphTensors.create(ref)
        build_contig_layer(g, contigs, cali, part_offset=0)
        return g

    return fresh, rali, reads, cfg


def test_sharded_build_equals_oracle():
    import jax

    from aligngraph_tpu.graph.kmer_layer import build_kmer_layer
    from aligngraph_tpu.parallel.kmer_shard import build_kmer_layer_sharded
    from jax.sharding import Mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    fresh, rali, reads, cfg = _workload()
    g_h = fresh()
    # single-chunk host oracle (chunking only affects stats, not the
    # graph — the merge is first-fit-stable)
    build_kmer_layer(g_h, rali, reads, cfg.k_mer, cfg.insert_variation,
                     chunk_records=1 << 30)
    g_s = fresh()
    mesh = Mesh(np.array(jax.devices()[:8]), ("pos",))
    st = build_kmer_layer_sharded(g_s, rali, reads, cfg.k_mer,
                                  cfg.insert_variation, mesh)
    for f in KM_FIELDS:
        np.testing.assert_array_equal(
            getattr(g_h, f), getattr(g_s, f), err_msg=f)
    assert st.tuples > 0 and st.groups > 0
    # the workload must actually exercise cross-cut structure
    n_local = -(-g_h.km_cnt.shape[0] // 8)
    cuts = np.arange(1, 8) * n_local
    near = np.zeros(0, np.int64)
    for c in cuts:
        near = np.concatenate(
            [near, np.arange(max(c - 1, 0), min(c + 1, g_h.n_pos))])
    assert g_h.km_cnt[near].sum() > 0, "no k-mers near shard cuts"


def test_chunking_invariance_of_oracle():
    """The host merge is chunk-independent (the property the sharded
    build relies on): different chunk_records give identical graphs."""
    from aligngraph_tpu.graph.kmer_layer import build_kmer_layer

    fresh, rali, reads, cfg = _workload(seed=5, glen=8_000, n_pairs=400)
    g_a = fresh()
    build_kmer_layer(g_a, rali, reads, cfg.k_mer, cfg.insert_variation,
                     chunk_records=97)
    g_b = fresh()
    build_kmer_layer(g_b, rali, reads, cfg.k_mer, cfg.insert_variation,
                     chunk_records=1 << 30)
    for f in KM_FIELDS:
        np.testing.assert_array_equal(
            getattr(g_a, f), getattr(g_b, f), err_msg=f)
