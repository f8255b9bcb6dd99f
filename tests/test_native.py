"""C++ native traversal must match the Python oracle exactly."""

import copy

import numpy as np
import pytest

from aligngraph_tpu import native
from aligngraph_tpu.config import Config, THRESHOLD
from aligngraph_tpu.graph.contig_layer import build_contig_layer
from aligngraph_tpu.graph.kmer_layer import build_kmer_layer
from aligngraph_tpu.graph.model import GraphTensors
from aligngraph_tpu.graph.traverse import extd_contigs1
from tests.simdata import make_simdata
from tests.test_graph import align_all


@pytest.fixture(scope="module")
def built_graph():
    sim = make_simdata(seed=21, genome_len=15_000, n_pairs=1200,
                      read_len=90, insert=450, snp_rate=0.008,
                      err_rate=0.003, n_contigs=5)
    cfg = Config(distance_low=150, distance_high=750, coverage=4)
    contigs, reads, cali, rali = align_all(sim, cfg)
    g = GraphTensors.create(sim.reference)
    build_contig_layer(g, contigs, cali)
    build_kmer_layer(g, rali, reads, cfg.k_mer, cfg.insert_variation)
    return g, cfg


def test_native_builds():
    assert native.get_lib() is not None, "g++ build failed"


def test_native_fasta_matches_python(tmp_path):
    import io as _io
    from aligngraph_tpu.io.fasta import read_fasta
    data = (b">rec one extra words\r\nACGTacgt\nNNN\n\n"
            b">rec2\nTTTT\n>empty\n>last\nGG\n")
    p = tmp_path / "t.fa"
    p.write_bytes(data)
    py = read_fasta(_io.BytesIO(data))       # python oracle (stream path)
    cc = native.read_fasta_native(str(p))
    assert cc is not None
    assert cc[0] == py[0]
    assert cc[1] == py[1]
    # and the public read_fasta(path) now routes through native
    assert read_fasta(str(p)) == py


def test_native_matches_python_walk(built_graph):
    g, cfg = built_graph
    g_py = copy.deepcopy(g)
    g_cc = copy.deepcopy(g)
    py = extd_contigs1(g_py, cfg.coverage, cfg.k_mer)
    cc = native.extd_contigs1_native(g_cc, cfg.coverage, cfg.k_mer)
    assert cc is not None
    assert len(py) == len(cc), (len(py), len(cc))
    for a, b in zip(py, cc):
        assert bytes(a.seq) == bytes(b.seq)
        assert a.extended == b.extended
        assert (a.start_off & 0xFFFFFFFF) == b.start_off
        assert (a.end_off & 0xFFFFFFFF) == b.end_off
        assert (a.start0_off & 0xFFFFFFFF) == b.start0_off
        assert (a.end0_off & 0xFFFFFFFF) == b.end0_off
        assert (a.start0_id & 0xFFFFFFFF) == b.start0_id
        assert (a.end0_id & 0xFFFFFFFF) == b.end0_id
    # traversal flags identical afterwards
    np.testing.assert_array_equal(g_py.km_trav, g_cc.km_trav)
