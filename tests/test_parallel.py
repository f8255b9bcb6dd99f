"""Multi-device sharding tests (8-device virtual CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aligngraph_tpu.parallel.halo import (exchange_halos,
                                          sliding_window_sum_sharded)
from aligngraph_tpu.parallel.mesh import (
    make_mesh, make_sharded_aligner, shard_reads_pairwise)
from aligngraph_tpu.ops.seeding import build_index


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(8)


def test_halo_window_sum_matches_unsharded(mesh):
    rng = np.random.default_rng(0)
    n = 8 * 512
    x = rng.integers(0, 100, n).astype(np.int32)
    window = 7
    fn = sliding_window_sum_sharded(mesh, "dp", window)
    from jax.sharding import NamedSharding, PartitionSpec as P
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("dp")))
    out = np.asarray(fn(xs))
    # oracle: windows that run past the end sum only the available tail
    pad = np.concatenate([x, np.zeros(window - 1, np.int32)])
    expect = np.array([pad[i:i + window].sum() for i in range(n)])
    np.testing.assert_array_equal(out, expect)


def test_sharded_production_aligner_equals_single(mesh):
    """THE production align program (_align_pairs_packed) under shard_map
    (reads dp-sharded, index replicated) must produce record-for-record
    the same accepted alignments as the single-device align() path."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from aligngraph_tpu.align.read_aligner import (
        ReadAligner, pack_reads_np)
    from aligngraph_tpu.config import Config
    from aligngraph_tpu.io.formalize import Reads
    from tests.simdata import make_simdata

    sim = make_simdata(seed=5, genome_len=10_000, n_pairs=64, read_len=80,
                       insert=400, snp_rate=0.01)
    n = 64
    L = 80
    data = np.empty((2 * n, L), np.int8)
    for i in range(n):
        data[2 * i] = sim.reads1[i]
        data[2 * i + 1] = sim.reads2[i]
    plens = np.full(n, L, np.int32)
    reads = Reads(n, L, data, plens)
    cfg = Config(distance_low=100, distance_high=700)

    # single-device oracle through the production path (one batch)
    al = ReadAligner.build(sim.reference, cfg, batch_pairs=n, c13=True)
    want = al.align(reads)

    # sharded: 8 dp shards of 8 pairs each
    from aligngraph_tpu.align.read_aligner import revcomp_padded_np
    idx = al.index
    u2, nmask = pack_reads_np(data)
    rcdata = revcomp_padded_np(data, np.repeat(plens, 2))
    u2r, nmr = pack_reads_np(rcdata)
    u2, nmask, pl = shard_reads_pairwise(u2, nmask, plens, 8)
    u2r, nmr, _ = shard_reads_pairwise(u2r, nmr, plens, 8)
    step = make_sharded_aligner(
        mesh, L=L, seed_len=cfg.seed_len, stride=cfg.seed_stride,
        pad=cfg.band_pad, C=cfg.max_candidates,
        dlow=cfg.distance_low, dhigh=cfg.distance_high,
        bsteps=idx.search_steps, sbits=idx.suffix_bits, c13=True)
    rep = NamedSharding(mesh, P())
    out = step(
        jax.device_put(jnp.asarray(sim.reference), rep),
        jax.device_put(idx.sorted_kmers, rep),
        jax.device_put(idx.sorted_posflip, rep),
        jax.device_put(idx.bucket_lo, rep),
        jax.device_put(jnp.asarray(u2), NamedSharding(mesh, P("dp", None))),
        jax.device_put(jnp.asarray(nmask),
                       NamedSharding(mesh, P("dp", None))),
        jax.device_put(jnp.asarray(u2r),
                       NamedSharding(mesh, P("dp", None))),
        jax.device_put(jnp.asarray(nmr),
                       NamedSharding(mesh, P("dp", None))),
        jax.device_put(jnp.asarray(pl), NamedSharding(mesh, P("dp"))),
    )
    out = jax.tree_util.tree_map(np.asarray, out)
    assert int(out["n_valid_total"][0]) == want.n > 50

    # decode each shard's packed buffer and merge (global pair ids)
    from aligngraph_tpu.align.read_aligner import (
        _expand_packed, unpack_records)
    n_sh = 8
    per = len(pl) // n_sh
    bufs = out["buf"].reshape(n_sh, -1)
    chunks = []
    for s in range(n_sh):
        res_s = unpack_records(bufs[s], per)
        chunks.append(_expand_packed(res_s, s * per, per, L,
                                     pl[s * per:(s + 1) * per]))
    got = {k: np.concatenate([c[k] for c in chunks]) for k in chunks[0]}
    for field in ("pair_id", "fr", "score", "source_start", "source_end",
                  "target_start", "target_end", "pos_map"):
        np.testing.assert_array_equal(
            got[field], getattr(want, field), err_msg=field)


def test_sharded_coverage_matches_oracle(mesh):
    """D3: position-sharded span coverage (scatter-add + reduce_scatter +
    cross-shard scan) == single-device jit == numpy oracle, including
    spans that cross shard boundaries."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from aligngraph_tpu.parallel.coverage import (
        make_sharded_coverage, pad_spans, span_coverage, span_coverage_np)

    rng = np.random.default_rng(3)
    G = 8 * 1024
    N = 4096
    starts = rng.integers(-50, G + 50, N).astype(np.int32)
    ends = (starts + rng.integers(0, 300, N)).astype(np.int32)
    # force spans that straddle every shard boundary
    for b in range(1, 8):
        starts[b] = b * 1024 - 100
        ends[b] = b * 1024 + 100
    oracle = span_coverage_np(starts, ends, G)
    single = np.asarray(span_coverage(jnp.asarray(starts),
                                      jnp.asarray(ends), G))
    np.testing.assert_array_equal(single, oracle)

    fn = make_sharded_coverage(mesh, G)
    s_p, e_p = pad_spans(starts, ends, 8)
    sh = NamedSharding(mesh, P("dp"))
    out = fn(jax.device_put(jnp.asarray(s_p), sh),
             jax.device_put(jnp.asarray(e_p), sh))
    assert out.sharding.spec == P("dp")
    np.testing.assert_array_equal(np.asarray(out), oracle)


def test_halo_exchange_edges(mesh):
    """Edge shards get zero halos; interior shards get neighbor rows."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    n = 8 * 4
    x = jnp.arange(n, dtype=jnp.int32)
    xs = jax.device_put(x, NamedSharding(mesh, P("dp")))

    def f(blk):
        return exchange_halos(blk, "dp", 2)

    out = jax.jit(jax.shard_map(
        f, mesh=mesh, in_specs=P("dp"), out_specs=P("dp"),
        check_vma=False))(xs)
    out = np.asarray(out).reshape(8, 8)   # 2 + 4 + 2 per shard
    # shard 0: left halo zeros, then 0..3, then right halo 4,5
    np.testing.assert_array_equal(out[0], [0, 0, 0, 1, 2, 3, 4, 5])
    # shard 3: left halo 10,11, rows 12..15, right halo 16,17
    np.testing.assert_array_equal(out[3], [10, 11, 12, 13, 14, 15, 16, 17])
    # last shard: right halo zeros
    np.testing.assert_array_equal(out[7], [26, 27, 28, 29, 30, 31, 0, 0])
