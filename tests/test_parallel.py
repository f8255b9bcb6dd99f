"""Multi-device sharding tests (8-device virtual CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aligngraph_tpu.parallel.halo import (exchange_halos,
                                          sliding_window_sum_sharded)
from aligngraph_tpu.parallel.mesh import (make_mesh,
                                          make_sharded_alignment_step)
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


def test_sharded_alignment_equals_replicated(mesh):
    """The dp-sharded alignment+vote step must produce the same merged
    votes as a single-device run of the same shard function."""
    from aligngraph_tpu.parallel.mesh import _align_and_vote
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(1)
    glen = 1 << 13
    genome = rng.integers(0, 4, glen).astype(np.int8)
    idx = build_index(genome, 15)
    n_reads = 64          # 8 per shard
    L = 64
    seqs = np.empty((n_reads, L), np.int8)
    for i in range(n_reads):
        p = int(rng.integers(0, glen - L))
        seqs[i] = genome[p:p + L]
    lens = np.full(n_reads, L, np.int32)

    votes_len = glen
    step = make_sharded_alignment_step(mesh, votes_len=votes_len)
    args = (
        jax.device_put(jnp.asarray(genome), NamedSharding(mesh, P())),
        jax.device_put(idx.sorted_kmers, NamedSharding(mesh, P())),
        jax.device_put(idx.sorted_pos, NamedSharding(mesh, P())),
        jax.device_put(jnp.asarray(seqs), NamedSharding(mesh, P("dp"))),
        jax.device_put(jnp.asarray(lens), NamedSharding(mesh, P("dp"))),
    )
    votes_sh, n_al = step(*args)
    # single-device oracle: all reads at once, no collective
    votes_1, n1 = _align_and_vote(
        jnp.asarray(genome), idx.sorted_kmers, idx.sorted_pos,
        jnp.asarray(seqs), jnp.asarray(lens),
        seed_len=15, stride=8, pad=16, C=4, votes_len=votes_len)
    assert int(n_al.reshape(-1)[0]) == int(n1[0]) == n_reads
    np.testing.assert_array_equal(np.asarray(votes_sh),
                                  np.asarray(votes_1))


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
