"""Read aligner end-to-end on simulated data: seeds -> DP -> pairing."""

import numpy as np

from aligngraph_tpu.align.read_aligner import ReadAligner
from aligngraph_tpu.config import Config, THRESHOLD
from aligngraph_tpu.io.formalize import Reads
from aligngraph_tpu.ops.seeding import (
    build_index, pack_kmers_np,
)
from tests.simdata import make_simdata, revcomp_np


def make_reads(sim):
    n = len(sim.reads1)
    L = max(len(r) for r in sim.reads1)
    data = np.full((2 * n, L), 4, np.int8)
    lens = np.zeros(n, np.int32)
    for i, (r1, r2) in enumerate(zip(sim.reads1, sim.reads2)):
        m = min(len(r1), len(r2))
        data[2 * i, :m] = r1[:m]
        data[2 * i + 1, :m] = r2[:m]
        lens[i] = m
    return Reads(n, L, data, lens)


def test_pack_kmers():
    codes = np.array([0, 1, 2, 3, 0, 4, 1], np.int8)  # ACGTANС
    packed, valid = pack_kmers_np(codes, 3)
    # first 3-mer ACG = 0b000110 = 6
    assert packed[0] == 0b000110
    assert valid[0] and valid[1] and valid[2]
    assert not valid[3] and not valid[4]  # windows containing the N


def test_align_simulated_reads():
    sim = make_simdata(seed=3, genome_len=20_000, n_pairs=300,
                      read_len=100, insert=500, snp_rate=0.01)
    reads = make_reads(sim)
    cfg = Config(distance_low=200, distance_high=800)
    al = ReadAligner.build(sim.reference, cfg, batch_pairs=128)
    res = al.align(reads)

    # nearly every simulated pair should align (close reference, 1% SNPs)
    aligned_pairs = np.unique(res.pair_id)
    frac = len(aligned_pairs) / reads.n_pairs
    assert frac > 0.9, f"only {frac:.2%} of pairs aligned"

    # strand sanity: each reported pair must have opposite strands
    assert np.all(res.fr[:, 0] != res.fr[:, 1])

    # fragment lengths within the configured window (actual aligned span)
    # and alignment positions approximately match the simulated positions
    # (reference has indels vs target, so allow drift)
    top = res.score.sum(axis=1)
    for p in aligned_pairs[:50]:
        rows = np.nonzero(res.pair_id == p)[0]
        best = rows[np.argmax(top[rows])]
        ts = res.target_start[best].min()
        true = sim.read_pos[p]
        assert abs(ts - true) < 600, (p, ts, true)

    # the reference C13 ratio filter should keep the vast majority
    keep = res.ratio_ok(THRESHOLD)
    assert keep.mean() > 0.95

    # pos_map consistency: matches count = src span minus gaps
    m = (res.pos_map >= 0).sum(axis=2)
    np.testing.assert_array_equal(
        m, res.source_end - res.source_start - res.source_gap)


def test_align_rc_mate_positions():
    """Mate2 (fr=1) pos_map must be in revcomp coordinates against the
    forward genome."""
    sim = make_simdata(seed=9, genome_len=10_000, n_pairs=40, read_len=80,
                      insert=400, snp_rate=0.0, err_rate=0.0)
    # align against the *target* itself (exact): placements must be exact
    reads = make_reads(sim)
    cfg = Config(distance_low=150, distance_high=650)
    al = ReadAligner.build(sim.target, cfg, batch_pairs=64)
    res = al.align(reads)
    assert res.n >= 35
    for k in range(res.n):
        p = res.pair_id[k]
        for mate in (0, 1):
            pm = res.pos_map[k, mate]
            fr = res.fr[k, mate]
            rl = len(sim.reads1[p])
            seq = [sim.reads1[p], sim.reads2[p]][mate]
            if fr:
                seq = revcomp_np(seq)
            aligned = pm >= 0
            assert aligned.sum() == rl  # exact reads -> fully aligned
            np.testing.assert_array_equal(
                sim.target[pm[aligned]], seq[aligned])


def test_no_reads():
    cfg = Config(distance_low=0, distance_high=1000)
    al = ReadAligner.build(np.zeros(1000, np.int8) + 1, cfg, batch_pairs=16)
    empty = Reads(0, 0, np.zeros((0, 0), np.int8), np.zeros(0, np.int32))
    res = al.align(empty)
    assert res.n == 0


def test_compact_transfer_equals_full():
    """The packed transfer (2-bit reads in, first-segment + overflow
    records out, host expansion) must reproduce the full-layout extraction
    bit-for-bit (c13 off so both paths are raw)."""
    import jax.numpy as jnp

    from aligngraph_tpu.align import read_aligner as ra

    sim = make_simdata(seed=11, genome_len=15_000, n_pairs=200,
                       read_len=90, insert=450, snp_rate=0.01)
    reads = make_reads(sim)
    cfg = Config(distance_low=150, distance_high=750)
    al = ReadAligner.build(sim.reference, cfg, batch_pairs=64, c13=False)
    res = al.align(reads)          # packed path (default)

    # recompute through the full path batch by batch
    P = al.batch_pairs
    L = max(reads.max_len, cfg.seed_len)
    chunks = []
    for start in range(0, reads.n_pairs, P):
        cnt = min(P, reads.n_pairs - start)
        seqs = np.full((2 * P, L), 4, np.int8)
        plens = np.zeros(P, np.int32)
        blk = reads.data[2 * start:2 * (start + cnt)]
        seqs[:2 * cnt, :blk.shape[1]] = blk
        plens[:cnt] = reads.lengths[start:start + cnt]
        full = ra._align_pairs_device(
            al.genome, al.index.sorted_kmers, al.index.sorted_posflip,
            al.index.bucket_lo,
            jnp.asarray(seqs), jnp.asarray(plens), seed_len=cfg.seed_len,
            stride=cfg.seed_stride, pad=cfg.band_pad,
            C=cfg.max_candidates, K=ra.MAX_PAIR_HITS,
            dlow=cfg.distance_low, dhigh=cfg.distance_high,
            bsteps=al.index.search_steps, sbits=al.index.suffix_bits)
        full = {k: np.asarray(v) for k, v in full.items()}
        chunks.append(ra._expand_full(full, start, cnt, L))
    want = {k: np.concatenate([c[k] for c in chunks]) for k in chunks[0]}

    assert res.n == len(want["pair_id"]) > 100
    for field in ("pair_id", "fr", "score", "source_start", "source_end",
                  "source_gap", "source_size", "target_start",
                  "target_end", "target_gap", "pos_map"):
        np.testing.assert_array_equal(getattr(res, field), want[field],
                                      err_msg=field)


def test_general_packed_transfer_equals_full():
    """The per-slot (general) transfer format — used when distance_high
    exceeds the dense format's int16 delta range — must also reproduce the
    full-layout extraction bit-for-bit."""
    import jax.numpy as jnp

    from aligngraph_tpu.align import read_aligner as ra

    sim = make_simdata(seed=11, genome_len=15_000, n_pairs=120,
                       read_len=90, insert=450, snp_rate=0.01)
    reads = make_reads(sim)
    cfg = Config(distance_low=0, distance_high=40_000)   # > 32000: general
    al = ReadAligner.build(sim.reference, cfg, batch_pairs=64, c13=False)
    res = al.align(reads)

    P = al.batch_pairs
    L = max(reads.max_len, cfg.seed_len)
    chunks = []
    for start in range(0, reads.n_pairs, P):
        cnt = min(P, reads.n_pairs - start)
        seqs = np.full((2 * P, L), 4, np.int8)
        plens = np.zeros(P, np.int32)
        blk = reads.data[2 * start:2 * (start + cnt)]
        seqs[:2 * cnt, :blk.shape[1]] = blk
        plens[:cnt] = reads.lengths[start:start + cnt]
        full = ra._align_pairs_device(
            al.genome, al.index.sorted_kmers, al.index.sorted_posflip,
            al.index.bucket_lo,
            jnp.asarray(seqs), jnp.asarray(plens), seed_len=cfg.seed_len,
            stride=cfg.seed_stride, pad=cfg.band_pad,
            C=cfg.max_candidates, K=ra.MAX_PAIR_HITS,
            dlow=cfg.distance_low, dhigh=cfg.distance_high,
            bsteps=al.index.search_steps, sbits=al.index.suffix_bits)
        full = {k: np.asarray(v) for k, v in full.items()}
        chunks.append(ra._expand_full(full, start, cnt, L))
    want = {k: np.concatenate([c[k] for c in chunks]) for k in chunks[0]}

    assert res.n == len(want["pair_id"]) > 50
    for field in ("pair_id", "fr", "score", "source_start", "source_end",
                  "source_gap", "source_size", "target_start",
                  "target_end", "target_gap", "pos_map"):
        np.testing.assert_array_equal(getattr(res, field), want[field],
                                      err_msg=field)


def test_device_c13_equals_host_filter():
    """align(c13=True) must equal align(c13=False) + the host ratio_ok
    filter (THRESHOLD 0.6) — the device integer 3/5 compare is exact."""
    from aligngraph_tpu.config import THRESHOLD

    sim = make_simdata(seed=13, genome_len=15_000, n_pairs=150,
                       read_len=90, insert=450, snp_rate=0.02)
    reads = make_reads(sim)
    cfg = Config(distance_low=150, distance_high=750)
    raw = ReadAligner.build(sim.reference, cfg, batch_pairs=64,
                            c13=False).align(reads)
    dev = ReadAligner.build(sim.reference, cfg, batch_pairs=64,
                            c13=True).align(reads)
    keep = np.nonzero(raw.ratio_ok(THRESHOLD))[0]
    assert dev.n == len(keep) > 50
    for field in ("pair_id", "fr", "score", "source_start", "source_end",
                  "source_gap", "source_size", "target_start",
                  "target_end", "target_gap", "pos_map"):
        np.testing.assert_array_equal(getattr(dev, field),
                                      getattr(raw, field)[keep],
                                      err_msg=field)


def test_packed_reads_roundtrip():
    from aligngraph_tpu.align.read_aligner import (
        pack_reads_np, _unpack_reads)

    rng = np.random.default_rng(3)
    seqs = rng.integers(0, 5, (16, 101)).astype(np.int8)
    u2, nm = pack_reads_np(seqs)
    assert u2.shape == (16, 26) and nm.shape == (16, 13)
    back = np.asarray(_unpack_reads(u2, nm, 101))
    np.testing.assert_array_equal(back, seqs)


def test_bucketed_lookup_equals_searchsorted():
    import jax.numpy as jnp

    from aligngraph_tpu.ops.seeding import (
        build_index, lookup_seeds, lookup_seeds_bucketed, pack_query_seeds,
        rc_packed,
    )

    rng = np.random.default_rng(7)
    genome = rng.integers(0, 4, 50_000).astype(np.int8)
    genome[rng.random(genome.shape) < 0.001] = 4   # sprinkle Ns
    idx = build_index(genome, 15)
    qs = np.full((64, 100), 4, np.int8)
    for i in range(64):
        s = rng.integers(0, len(genome) - 100)
        qs[i] = genome[s:s + 100]
    packed, offs, valid = pack_query_seeds(jnp.asarray(qs), 15, 8)
    pcan = jnp.minimum(packed, rc_packed(packed, 15))
    a, aok = lookup_seeds(idx.sorted_kmers, idx.sorted_posflip, pcan,
                          valid, 8)
    b, bok = lookup_seeds_bucketed(idx.sorted_kmers, idx.sorted_posflip,
                                   idx.bucket_lo, pcan, valid, 8,
                                   idx.search_steps, idx.suffix_bits)
    np.testing.assert_array_equal(np.asarray(aok), np.asarray(bok))
    aokn = np.asarray(aok)
    np.testing.assert_array_equal(np.asarray(a)[aokn], np.asarray(b)[aokn])
    assert aokn.sum() > 100


def test_direct_addressed_lookup_equals_searchsorted():
    """suffix_bits == 0 path (26-bit-table big-genome case, exercised
    here cheaply with 7-mers: 2*7 = 14 <= the 14-bit prefix floor)."""
    import jax.numpy as jnp

    from aligngraph_tpu.ops.seeding import (
        build_index, lookup_seeds, lookup_seeds_bucketed, pack_query_seeds,
        rc_packed,
    )

    rng = np.random.default_rng(9)
    genome = rng.integers(0, 4, 30_000).astype(np.int8)
    idx = build_index(genome, 7)
    assert idx.suffix_bits == 0 and idx.search_steps == 0
    qs = np.full((64, 100), 4, np.int8)
    for i in range(64):
        s = rng.integers(0, len(genome) - 100)
        qs[i] = genome[s:s + 100]
    packed, offs, valid = pack_query_seeds(jnp.asarray(qs), 7, 8)
    pcan = jnp.minimum(packed, rc_packed(packed, 7))
    a, aok = lookup_seeds(idx.sorted_kmers, idx.sorted_posflip, pcan,
                          valid, 8)
    b, bok = lookup_seeds_bucketed(idx.sorted_kmers, idx.sorted_posflip,
                                   idx.bucket_lo, pcan, valid, 8,
                                   idx.search_steps, idx.suffix_bits)
    np.testing.assert_array_equal(np.asarray(aok), np.asarray(bok))
    aokn = np.asarray(aok)
    np.testing.assert_array_equal(np.asarray(a)[aokn], np.asarray(b)[aokn])
    assert aokn.sum() > 100


def test_canonical_index_roundtrip():
    """Every genome k-mer must be findable through its canonical form,
    with the flip bit recovering the original orientation."""
    from aligngraph_tpu.ops.seeding import (
        build_index, pack_kmers_np, rc_packed_np)

    rng = np.random.default_rng(9)
    genome = rng.integers(0, 4, 5_000).astype(np.int8)
    sl = 15
    idx = build_index(genome, sl)
    packed, valid = pack_kmers_np(genome, sl)
    pos = np.nonzero(valid)[0]
    fwd = packed[pos]
    rc = rc_packed_np(fwd, sl)
    can = np.minimum(fwd, rc)
    # no palindromes for odd k
    assert (fwd != rc).all()
    lo = np.searchsorted(idx.sorted_kmers_np, can, side="left")
    hi = np.searchsorted(idx.sorted_kmers_np, can, side="right")
    assert (hi > lo).all()
    # each position appears exactly once with the right flip bit
    pf = idx.sorted_posflip_np
    found_pos = pf & 0x7FFFFFFF
    found_flip = pf < 0
    order = np.argsort(found_pos)
    np.testing.assert_array_equal(found_pos[order], pos)
    np.testing.assert_array_equal(found_flip[order], rc < fwd)
