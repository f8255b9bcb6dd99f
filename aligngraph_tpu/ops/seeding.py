"""Seed index + candidate-diagonal selection (bowtie2/BLAT seeding replaced).

The reference shells out to bowtie2 (FM-index) / BLAT for seeding+alignment
(AlignGraph.cpp:3581-3656).  Our TPU-native equivalent is a sorted k-mer
position index over the concatenated genome axis:

 - build (host, numpy): pack every `seed_len`-mer (2-bit codes) into int32,
   drop windows containing N, sort by packed value -> (sorted_kmers,
   sorted_pos).  One-time cost per reference genome.
 - lookup (device, XLA): `searchsorted` of query seed packs into the sorted
   array, gather up to `max_hits` positions per seed.
 - candidate selection (device): per read, cluster hit diagonals
   (genome_pos - read_offset) within `band_pad` and emit the top
   `max_candidates` clusters by vote count (deterministic tie-break on
   diagonal).

seed_len must be <= 15 so a packed seed fits in a non-negative int32.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

INVALID_DIAG = np.int32(2**31 - 1)


@dataclasses.dataclass
class SeedIndex:
    """Sorted k-mer position index + prefix bucket table.

    Host (numpy) arrays are authoritative; device copies are created
    lazily (reads use device lookup in the hot path, contigs use host
    np.searchsorted for one-off long queries).

    bucket_lo[p] is the first index in sorted_kmers whose top
    (2*seed_len - suffix_bits) packed bits are >= p; a device lookup is
    then one table gather + a short binary search inside the bucket
    (search_steps = log2 of the largest bucket) instead of a full-depth
    searchsorted over all k-mers.  The prefix width adapts to the genome
    (~4 table slots per k-mer, capped at 24 bits / 64MB)."""
    seed_len: int
    genome_len: int
    sorted_kmers_np: np.ndarray   # [M] int32, ascending
    sorted_pos_np: np.ndarray     # [M] int32 genome position of each k-mer
    bucket_lo_np: np.ndarray      # [2^prefix_bits + 1] int32
    search_steps: int             # binary-search iterations within bucket
    suffix_bits: int              # low packed bits not covered by table
    _device: tuple = None

    @property
    def n_kmers(self) -> int:
        return int(self.sorted_kmers_np.shape[0])

    def device_arrays(self):
        if self._device is None:
            self._device = (jnp.asarray(self.sorted_kmers_np),
                            jnp.asarray(self.sorted_pos_np),
                            jnp.asarray(self.bucket_lo_np))
        return self._device

    @property
    def sorted_kmers(self):
        return self.device_arrays()[0]

    @property
    def sorted_pos(self):
        return self.device_arrays()[1]

    @property
    def bucket_lo(self):
        return self.device_arrays()[2]


def pack_kmers_np(codes: np.ndarray, seed_len: int):
    """All overlapping seed_len-mers of `codes` -> (packed int32, valid bool).

    packed[i] encodes codes[i:i+seed_len] big-endian 2 bits/base; windows
    containing N (code>=4) are invalid.
    """
    n = len(codes)
    m = n - seed_len + 1
    if m <= 0:
        return (np.zeros(0, np.int32), np.zeros(0, bool))
    c = codes.astype(np.int64)
    packed = np.zeros(m, dtype=np.int64)
    invalid = np.zeros(m, dtype=bool)
    for k in range(seed_len):
        w = c[k:k + m]
        packed = (packed << 2) | np.where(w >= 4, 0, w)
        invalid |= w >= 4
    return packed.astype(np.int32), ~invalid


def build_index(genome_codes: np.ndarray, seed_len: int = 15) -> SeedIndex:
    """Host-side one-time index build over the concatenated genome."""
    if seed_len > 15:
        raise ValueError("seed_len must be <= 15 (int32 packing)")
    packed, valid = pack_kmers_np(genome_codes, seed_len)
    pos = np.nonzero(valid)[0].astype(np.int32)
    kmers = packed[pos]
    order = np.argsort(kmers, kind="stable")
    sorted_kmers = kmers[order]
    prefix_bits = min(24, 2 * seed_len,
                      max(14, int(np.ceil(np.log2(max(len(kmers), 2)))) + 2))
    suffix_bits = 2 * seed_len - prefix_bits
    n_buckets = 1 << prefix_bits
    counts = np.bincount(sorted_kmers >> suffix_bits, minlength=n_buckets)
    bucket_lo = np.zeros(n_buckets + 1, np.int32)
    bucket_lo[1:] = np.cumsum(counts).astype(np.int32)
    max_bucket = int(counts.max()) if counts.size else 0
    return SeedIndex(
        seed_len=seed_len,
        genome_len=int(len(genome_codes)),
        sorted_kmers_np=sorted_kmers,
        sorted_pos_np=pos[order],
        bucket_lo_np=bucket_lo,
        search_steps=max(1, int(np.ceil(np.log2(max_bucket + 1))) + 1),
        suffix_bits=suffix_bits,
    )


def pack_query_seeds(seqs: jax.Array, seed_len: int, stride: int):
    """Device: pack seeds at `stride` offsets from padded reads [R, L].

    Returns (packed [R, S] int32, offsets [S] int32, valid [R, S] bool);
    seeds whose window contains a pad/N code are invalid.
    """
    R, L = seqs.shape
    offsets = jnp.arange(0, max(L - seed_len + 1, 1), stride, dtype=jnp.int32)
    S = offsets.shape[0]
    idx = offsets[:, None] + jnp.arange(seed_len, dtype=jnp.int32)[None, :]
    win = seqs[:, idx]                       # [R, S, seed_len]
    w = win.astype(jnp.int32)
    invalid = jnp.any(w >= 4, axis=-1)
    w = jnp.where(w >= 4, 0, w)
    shifts = (2 * (seed_len - 1 - jnp.arange(seed_len)))[None, None, :]
    packed = jnp.sum(w << shifts, axis=-1).astype(jnp.int32)
    return packed, offsets, ~invalid


@partial(jax.jit, static_argnames=("max_hits",))
def lookup_seeds(sorted_kmers, sorted_pos, packed, valid, max_hits: int):
    """For each query seed return up to max_hits genome positions.

    Seeds with more than max_hits occurrences are *dropped entirely*
    (repetitive-seed policy, analogous to aligner multiseed filters) —
    this keeps candidate selection deterministic and bounded.

    packed/valid: [R, S].  Returns hit positions [R, S, max_hits] int32
    with -1 for misses.
    """
    M = sorted_kmers.shape[0]
    lo = jnp.searchsorted(sorted_kmers, packed, side="left").astype(jnp.int32)
    hi = jnp.searchsorted(sorted_kmers, packed, side="right").astype(jnp.int32)
    count = hi - lo
    take = lo[..., None] + jnp.arange(max_hits, dtype=jnp.int32)
    ok = (
        valid[..., None]
        & (count[..., None] <= max_hits)
        & (jnp.arange(max_hits) < count[..., None])
    )
    pos = sorted_pos[jnp.clip(take, 0, M - 1)]
    return jnp.where(ok, pos, -1)


@partial(jax.jit, static_argnames=("max_hits", "steps", "suffix_bits"))
def lookup_seeds_bucketed(sorted_kmers, sorted_pos, bucket_lo, packed,
                          valid, max_hits: int, steps: int,
                          suffix_bits: int):
    """Two-level lookup_seeds: identical results, far fewer gathers.

    A full searchsorted over M k-mers costs ~2*log2(M) dependent random
    gathers per query.  Here the prefix bucket table bounds the range in
    one gather, then `steps` (= log2 of the largest bucket) bounded
    binary-search iterations resolve the exact k-mer run — the in-bucket
    probes are cache-local."""
    M = sorted_kmers.shape[0]
    prefix = (packed >> suffix_bits).astype(jnp.int32)
    lo0 = bucket_lo[prefix]
    hi0 = bucket_lo[prefix + 1]

    def left_bound(target):
        lo, hi = lo0, hi0
        for _ in range(steps):
            go = lo < hi
            mid = (lo + hi) >> 1
            less = sorted_kmers[jnp.clip(mid, 0, M - 1)] < target
            lo = jnp.where(go & less, mid + 1, lo)
            hi = jnp.where(go & ~less, mid, hi)
        return lo

    lo = left_bound(packed)
    hi = left_bound(packed + 1)   # right bound: all keys == packed precede
    count = hi - lo
    take = lo[..., None] + jnp.arange(max_hits, dtype=jnp.int32)
    ok = (
        valid[..., None]
        & (count[..., None] <= max_hits)
        & (jnp.arange(max_hits) < count[..., None])
    )
    pos = sorted_pos[jnp.clip(take, 0, M - 1)]
    return jnp.where(ok, pos, -1)


@partial(jax.jit, static_argnames=("band_pad", "max_candidates"))
def select_candidates(hit_pos, seed_offsets, band_pad: int,
                      max_candidates: int):
    """Cluster hit diagonals per read -> top candidate diagonals.

    hit_pos: [R, S, H] genome positions (-1 = miss);
    seed_offsets: [S] read offsets of each seed.
    Returns (diags [R, C] int32 = genome position aligned to read base 0,
    votes [R, C] int32); empty slots have diag=INVALID_DIAG, votes=0.

    Clustering: sort diagonals; a new cluster starts when the gap to the
    previous diagonal exceeds band_pad; cluster vote = size; representative
    diagonal = cluster minimum (deterministic).  Top-C by (votes desc,
    diag asc).
    """
    R, S, H = hit_pos.shape
    N = S * H
    diag = jnp.where(
        hit_pos >= 0,
        hit_pos - seed_offsets[None, :, None].astype(jnp.int32),
        INVALID_DIAG,
    ).reshape(R, N)
    diag = jnp.sort(diag, axis=1)        # invalids sort to the end
    prev = jnp.concatenate(
        [jnp.full((R, 1), -(2**30), jnp.int32), diag[:, :-1]], axis=1)
    is_valid = diag != INVALID_DIAG
    new_cluster = is_valid & ((diag - prev) > band_pad)
    # cluster votes via run lengths: for a cluster-start at i, votes =
    # (index of next cluster start, or #valid) - i.  next-start index is a
    # suffix-min over start positions (flip + cummin + flip).
    idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, :], (R, N))
    n_valid = jnp.sum(is_valid, axis=1, keepdims=True).astype(jnp.int32)
    start_idx = jnp.where(new_cluster, idx, jnp.int32(N))
    nxt = jnp.concatenate([start_idx[:, 1:],
                           jnp.full((R, 1), N, jnp.int32)], axis=1)
    next_start = jnp.flip(
        jax.lax.cummin(jnp.flip(nxt, axis=1), axis=1), axis=1)
    votes_at_start = jnp.minimum(next_start, n_valid) - idx
    votes = jnp.where(new_cluster, votes_at_start, 0)
    rep_diag = jnp.where(new_cluster, diag, INVALID_DIAG)
    # rank clusters by (votes desc, rep_diag asc): composed stable argsorts
    o1 = jnp.argsort(rep_diag, axis=1, stable=True)
    neg_votes = jnp.take_along_axis(-votes, o1, axis=1)
    o2 = jnp.argsort(neg_votes, axis=1, stable=True)
    order = jnp.take_along_axis(o1, o2, axis=1)
    topk = order[:, :max_candidates]
    out_votes = jnp.take_along_axis(votes, topk, axis=1)
    out_diag = jnp.take_along_axis(rep_diag, topk, axis=1)
    out_diag = jnp.where(out_votes > 0, out_diag, INVALID_DIAG)
    return out_diag, out_votes
