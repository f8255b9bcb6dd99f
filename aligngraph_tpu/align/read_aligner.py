"""In-engine PE short-read aligner — the bowtie2 replacement (C5).

Reference invocation being replaced (AlignGraph.cpp:3601-3609):
  bowtie2 -f --no-mixed -k 5 --local --mp 3,1 --rdg 2,1 --rfg 2,1
          --score-min G,5,2 -I distanceLow -X distanceHigh
          --no-discordant --reorder

TPU-native pipeline (all device work under jit, static shapes):
  1. both orientations of every mate (fwd + revcomp)
  2. seed lookup in the sorted k-mer genome index (ops/seeding.py)
  3. candidate diagonals by clustered seed votes
  4. banded affine local SW + exact traceback (ops/banded_sw.py)
  5. per-candidate parse quantities (parseBOWTIE equivalents)
  6. PE pairing: opposite strands, facing orientation, fragment length in
     [distanceLow, distanceHigh] (-I/-X), per-mate score >= 5 + 2*ln(len)
     (--score-min G,5,2), top-K pairs by combined score (-k 5),
     deterministic tie-break (fragment start, then end)
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from aligngraph_tpu.align.types import PairAlignments
from aligngraph_tpu.config import Config
from aligngraph_tpu.io.formalize import Reads
from aligngraph_tpu.ops.banded_sw import banded_sw_posmap_auto
from aligngraph_tpu.ops.seeding import (
    INVALID_DIAG, SeedIndex, build_index, lookup_seeds_bucketed,
    pack_query_seeds, rc_packed, select_candidates,
)

SCORE_MIN_CONST = 5.0   # bowtie2 --score-min G,5,2
SCORE_MIN_COEFF = 2.0
MAX_PAIR_HITS = 5       # bowtie2 -k 5
MAXSEG = 8              # M-block segments per alignment (transfer format)
THRESHOLD = 0.6         # C13 read-pair ratio filter (AlignGraph.cpp:34)

_COMP = jnp.array([3, 2, 1, 0, 4], dtype=jnp.int8)


def pack_reads_np(seqs: np.ndarray):
    """Host: int8 codes [R, L] -> (2-bit packed [R, ceil(L/4)] uint8,
    N/pad bitmask [R, ceil(L/8)] uint8).  The device->host tunnel on this
    machine is bandwidth-bound; 2.25 bits/base vs 8 shrinks the input leg
    ~3.6x."""
    R, L = seqs.shape
    L4 = (L + 3) // 4
    L8 = (L + 7) // 8
    pad4 = np.zeros((R, 4 * L4 - L), np.int8)
    s4 = np.concatenate([seqs, pad4], axis=1).astype(np.uint8)
    b = s4 & 3
    u2 = (b[:, 0::4] | (b[:, 1::4] << 2) | (b[:, 2::4] << 4)
          | (b[:, 3::4] << 6))
    isn = (s4 >= 4)
    pad8 = np.ones((R, 8 * L8 - 4 * L4), bool)
    n8 = np.concatenate([isn, pad8], axis=1)
    nmask = np.zeros((R, L8), np.uint8)
    for k in range(8):
        nmask |= n8[:, k::8].astype(np.uint8) << k
    return u2, nmask


def _unpack_reads(u2: jax.Array, nmask: jax.Array, L: int) -> jax.Array:
    """Device inverse of pack_reads_np -> int8 codes [R, L] (N/pad = 4)."""
    i = jnp.arange(L, dtype=jnp.int32)
    b = (u2[:, i // 4].astype(jnp.int32) >> (2 * (i % 4))) & 3
    n = (nmask[:, i // 8].astype(jnp.int32) >> (i % 8)) & 1
    return jnp.where(n == 1, 4, b).astype(jnp.int8)


def _revcomp_padded(seqs: jax.Array, lens: jax.Array) -> jax.Array:
    """Reverse-complement padded reads: rc[i] = comp(seq[len-1-i]) for
    i < len, pad 4 beyond."""
    R, L = seqs.shape
    idx = lens[:, None] - 1 - jnp.arange(L, dtype=jnp.int32)[None, :]
    ok = idx >= 0
    vals = jnp.take_along_axis(seqs, jnp.clip(idx, 0, L - 1), axis=1)
    return jnp.where(ok, _COMP[vals.astype(jnp.int32)], jnp.int8(4))


def _candidate_stats(pos_map, qlens):
    """parseBOWTIE-equivalent quantities from a position map.

    Returns dict of [B] arrays: src_start/src_end/src_gap (I), tgt_start,
    tgt_end (reference formula ts + size + D - I, AlignGraph.cpp:282),
    tgt_gap (D), match count.
    """
    B, L = pos_map.shape
    aligned = pos_map >= 0
    m = jnp.sum(aligned, axis=1).astype(jnp.int32)
    idx = jnp.arange(L, dtype=jnp.int32)[None, :]
    big = jnp.int32(2**30)
    ss = jnp.min(jnp.where(aligned, idx, big), axis=1)
    se = jnp.max(jnp.where(aligned, idx + 1, -1), axis=1)
    ss = jnp.where(m > 0, ss, 0)
    se = jnp.where(m > 0, se, 0)
    ins = (se - ss) - m
    ts = jnp.min(jnp.where(aligned, pos_map, big), axis=1)
    tea = jnp.max(jnp.where(aligned, pos_map + 1, -1), axis=1)
    ts = jnp.where(m > 0, ts, -1)
    tea = jnp.where(m > 0, tea, -1)
    dele = jnp.where(m > 0, (tea - ts) - m, 0)
    te_ref = jnp.where(m > 0, ts + qlens + dele - ins, -1)
    return dict(match=m, src_start=ss, src_end=se, src_gap=ins,
                tgt_start=ts, tgt_end_actual=tea, tgt_end=te_ref,
                tgt_gap=dele)


def _extract_segments(pm: jax.Array):
    """Device: pos_map rows [B, L] -> M-block segments [B, MAXSEG, 3]
    (src_start, tgt_start, size; -1-filled) + overflow flag [B].

    The device->host tunnel is bandwidth-bound; segments are ~8x smaller
    than position maps and reconstruct them exactly.  Implemented as
    masked reductions per segment slot (TPU scatters serialize; dense
    masked reduces over [B, L] vectorize)."""
    B, L = pm.shape
    aligned = pm >= 0
    prev_a = jnp.concatenate([jnp.zeros((B, 1), bool), aligned[:, :-1]],
                             axis=1)
    prev_p = jnp.concatenate([jnp.full((B, 1), -2, pm.dtype),
                              pm[:, :-1]], axis=1)
    is_start = aligned & (~prev_a | (pm != prev_p + 1))
    run_id = jnp.cumsum(is_start.astype(jnp.int32), axis=1) - 1
    n_runs = run_id[:, -1] + 1
    idx = jnp.arange(L, dtype=jnp.int32)[None, :]
    cols = []
    for s in range(MAXSEG):
        in_run = aligned & (run_id == s)
        start_s = is_start & (run_id == s)
        src = jnp.max(jnp.where(start_s, idx, -1), axis=1)
        tgt = jnp.max(jnp.where(start_s, pm, -1), axis=1)
        size = jnp.sum(in_run, axis=1).astype(jnp.int32)
        cols.append(jnp.stack(
            [src, tgt, jnp.where(size > 0, size, -1)], axis=-1))
    segs = jnp.stack(cols, axis=1)                    # [B, MAXSEG, 3]
    overflow = n_runs > MAXSEG
    return segs, overflow


def reconstruct_pos_map(segs: np.ndarray, L: int) -> np.ndarray:
    """Host: segments [..., MAXSEG, 3] -> pos_map [..., L] int32."""
    lead = segs.shape[:-2]
    pm = np.full(lead + (L,), -1, np.int32)
    idx = np.arange(L, dtype=np.int32)
    for s in range(segs.shape[-2]):
        st = segs[..., s, 0:1]
        ts = segs[..., s, 1:2]
        sz = segs[..., s, 2:3]
        m = (sz > 0) & (idx >= st) & (idx < st + sz)
        pm = np.where(m, ts + (idx - st), pm)
    return pm


@dataclasses.dataclass
class ReadAligner:
    """Holds the genome on device + seed index; aligns batches of pairs.

    c13: apply the reference's read-pair ratio filter (C13,
    AlignGraph.cpp:1261, THRESHOLD 0.6) ON DEVICE so rejected records
    never cross the device->host tunnel.  Identical end state to the
    host-side filter the driver applies (records failing it are dropped
    there anyway); set False for consumers that need raw records (the
    misassembly-removal coverage loader, AlignGraph.cpp:3940-3984).
    """
    genome: jax.Array          # [G] int8
    index: SeedIndex
    cfg: Config
    batch_pairs: int = 4096
    c13: bool = True

    @classmethod
    def build(cls, genome_codes: np.ndarray, cfg: Config,
              batch_pairs: int = 4096, c13: bool = True) -> "ReadAligner":
        idx = build_index(genome_codes, cfg.seed_len)
        return cls(genome=jnp.asarray(genome_codes), index=idx, cfg=cfg,
                   batch_pairs=batch_pairs, c13=c13)

    # ------------------------------------------------------------------
    def align(self, reads: Reads) -> PairAlignments:
        """Align all pairs; returns accepted pair alignments (host SoA).

        Device dispatch is asynchronous: all batches are enqueued before
        any result is pulled, so compute, device->host transfer, and host
        post-processing of consecutive batches overlap.

        Transfer format: the device compacts the [P, K] pair-hit table to
        its valid slots (~1 per pair in practice) and ships int16-packed
        M-block segments only; the parse quantities (C9 equivalents) are
        recomputed on host from the segments with the exact device
        formulas.  If a batch has more valid slots than the compaction
        capacity (extreme multi-mapping), it transparently re-runs through
        the full-layout path."""
        cfg = self.cfg
        P = self.batch_pairs
        L = max(reads.max_len, cfg.seed_len)
        n = reads.n_pairs
        pending = []
        for start in range(0, max(n, 1), P):
            cnt = min(P, n - start) if n else 0
            seqs = np.full((2 * P, L), 4, np.int8)
            plens = np.zeros(P, np.int32)
            if cnt > 0:
                blk = reads.data[2 * start:2 * (start + cnt)]
                seqs[:2 * cnt, :blk.shape[1]] = blk
                plens[:cnt] = reads.lengths[start:start + cnt]
            u2, nmask = pack_reads_np(seqs)
            dev = _align_pairs_packed(
                self.genome, self.index.sorted_kmers,
                self.index.sorted_posflip, self.index.bucket_lo, jnp.asarray(u2), jnp.asarray(nmask),
                jnp.asarray(plens), L=L,
                seed_len=cfg.seed_len, stride=cfg.seed_stride,
                pad=cfg.band_pad, C=cfg.max_candidates,
                K=MAX_PAIR_HITS, dlow=cfg.distance_low,
                dhigh=cfg.distance_high,
                bsteps=self.index.search_steps,
                sbits=self.index.suffix_bits, c13=self.c13)
            pending.append((start, cnt, dev, seqs, plens))
        out_chunks = []
        for start, cnt, dev, seqs, plens in pending:
            res = jax.tree_util.tree_map(np.asarray, dev)
            if (int(res["n_valid"]) > res["slot_id"].shape[0]
                    or int(res["n_ovf"]) > res["ovf_slot"].shape[0]):
                # compaction overflow (pathological multi-mapping or
                # ultra-gappy batch): re-run through the uncompacted path
                full = _align_pairs_device(
                    self.genome, self.index.sorted_kmers,
                    self.index.sorted_posflip, self.index.bucket_lo,
                    jnp.asarray(seqs),
                    jnp.asarray(plens), seed_len=cfg.seed_len,
                    stride=cfg.seed_stride, pad=cfg.band_pad,
                    C=cfg.max_candidates, K=MAX_PAIR_HITS,
                    dlow=cfg.distance_low, dhigh=cfg.distance_high,
                    bsteps=self.index.search_steps,
                    sbits=self.index.suffix_bits)
                full = jax.tree_util.tree_map(np.asarray, full)
                if self.c13:
                    full["valid"] &= np.asarray(_c13_mask_np(full))
                out_chunks.append(_expand_full(full, start, cnt, L))
            else:
                out_chunks.append(
                    _expand_packed(res, start, cnt, L, plens))
        cat = {k: np.concatenate([c[k] for c in out_chunks])
               for k in out_chunks[0]}
        return PairAlignments(**cat)


def _expand_full(res, start: int, cnt: int, L: int) -> dict:
    """Host extraction from the full [P, K] device layout."""
    valid = res["valid"]
    p_ids, k_ids = np.nonzero(valid[:cnt] if cnt else valid[:0])
    sel = (p_ids, k_ids)
    return dict(
        pair_id=(p_ids + start).astype(np.int32),
        fr=res["fr"][sel],
        score=res["score"][sel],
        source_start=res["src_start"][sel],
        source_end=res["src_end"][sel],
        source_gap=res["src_gap"][sel],
        source_size=res["src_size"][sel],
        target_start=res["tgt_start"][sel],
        target_end=res["tgt_end"][sel],
        target_gap=res["tgt_gap"][sel],
        pos_map=reconstruct_pos_map(res["segs"][sel], L),
    )


def _expand_compact(res, start: int, cnt: int, L: int,
                    plens: np.ndarray) -> dict:
    """Host extraction from the compact valid-slot transfer format.

    Recomputes the parse quantities (_candidate_stats equivalents) from
    the int16 segment records with identical integer formulas, so results
    are bit-equal to the full path (tested)."""
    K = MAX_PAIR_HITS
    slot = res["slot_id"]
    mask = slot >= 0
    slot = slot[mask]
    p_ids = slot // K
    keep = p_ids < max(cnt, 0)
    slot = slot[keep]
    p_ids = p_ids[keep]
    sel = np.nonzero(mask)[0][keep]
    fr = res["fr"][sel]
    score = res["score"][sel].astype(np.int32)
    tgt_base = res["tgt_base"][sel]                      # [n, 2]
    s16 = res["segs16"][sel].astype(np.int32)            # [n, 2, S, 3]
    sz = s16[..., 2]
    segv = sz > 0
    segs = np.stack([
        np.where(segv, s16[..., 0], -1),
        np.where(segv, tgt_base[..., None] + s16[..., 1], -1),
        np.where(segv, sz, -1),
    ], axis=-1)                                          # [n, 2, S, 3]
    match = np.sum(np.where(segv, sz, 0), axis=-1)       # [n, 2]
    nseg = np.maximum(segv.sum(axis=-1), 1)
    last = (nseg - 1)[..., None]
    ss = s16[..., 0, 0]
    src_last = np.take_along_axis(s16[..., 0], last, axis=-1)[..., 0]
    sz_last = np.take_along_axis(sz, last, axis=-1)[..., 0]
    se = src_last + sz_last
    ins = (se - ss) - match
    tea = np.take_along_axis(segs[..., 1], last, axis=-1)[..., 0] + sz_last
    dele = (tea - tgt_base) - match
    qlen = plens[p_ids][:, None].astype(np.int32)
    te_ref = tgt_base + qlen + dele - ins
    return dict(
        pair_id=(p_ids + start).astype(np.int32),
        fr=fr,
        score=score,
        source_start=ss.astype(np.int32),
        source_end=se.astype(np.int32),
        source_gap=ins.astype(np.int32),
        source_size=np.broadcast_to(qlen, ins.shape).copy(),
        target_start=tgt_base,
        target_end=te_ref.astype(np.int32),
        target_gap=dele.astype(np.int32),
        pos_map=reconstruct_pos_map(segs, L),
    )


def _window_slices(genome: jax.Array, start: jax.Array, WL: int,
                   P0: int) -> jax.Array:
    """Per-row contiguous genome windows via sliced gather.

    out[i] = genome[start[i] : start[i]+WL] with out-of-range bases = 4.
    start must satisfy start >= -P0.  One WL-wide slice gather per row
    instead of WL elementwise gathers."""
    gp = jnp.concatenate([
        jnp.full((P0,), 4, jnp.int8), genome,
        jnp.full((P0 + WL,), 4, jnp.int8)])
    lo = jnp.clip(start + P0, 0, genome.shape[0] + P0)
    return jax.vmap(lambda l: jax.lax.dynamic_slice(gp, (l,), (WL,)))(lo)


@partial(jax.jit, static_argnames=("seed_len", "stride", "pad", "C", "K",
                                   "dlow", "dhigh", "bsteps", "sbits"))
def _align_pairs_device(genome, sorted_kmers, sorted_posflip, bucket_lo,
                        seqs, plens, *, seed_len, stride, pad, C, K, dlow,
                        dhigh, bsteps, sbits):
    """One batch of P pairs -> top-K pair alignments per pair."""
    R, L = seqs.shape            # R = 2P (mate-interleaved)
    P = R // 2
    W = 2 * pad
    WL = L + W
    rlens = jnp.repeat(plens, 2)                     # [R]
    rc = _revcomp_padded(seqs, rlens)
    qseqs = jnp.concatenate([seqs, rc])              # [2R, L] for DP gather
    qlens = jnp.concatenate([rlens, rlens])

    # --- seeding: ONE canonical lookup per read serves both orientations
    packed, offs, valid = pack_query_seeds(seqs, seed_len, stride)
    valid = valid & (offs[None, :] <= (rlens[:, None] - seed_len))
    pk_rc = rc_packed(packed, seed_len)
    qflip = pk_rc < packed
    pcan = jnp.minimum(packed, pk_rc)
    pf, ok = lookup_seeds_bucketed(sorted_kmers, sorted_posflip, bucket_lo,
                                   pcan, valid, 8, bsteps, sbits)
    diag_s, votes_s, orient_s = select_candidates(
        pf, ok, qflip, offs, rlens, seed_len, pad, C)    # [R, C] each

    # --- validity compaction: most candidate slots are empty (avg ~1.2
    # real candidates/read); sort valid-first and run DP/traceback/stats
    # on TOP = 1.5 slots/read only.  The flatten is RANK-major (all
    # rank-0 candidates of every read first), so when a repeat-heavy
    # batch overflows capacity, only the lowest-vote-rank candidates are
    # shed (deterministic; PARITY.md).
    diag_f = diag_s.T.reshape(-1)                    # [C*R] rank-major
    cvalid_f = diag_f != INVALID_DIAG
    B_full = R * C
    # DP capacity ~1.5 rows/read, 128-aligned (Pallas lane tiles), clamped
    # to the full table for tiny batches
    TOP = min(B_full, max(128, (3 * R // 2) // 128 * 128))
    order = jnp.argsort(~cvalid_f, stable=True)      # valid rows first
    top = order[:TOP]
    inv = jnp.full(B_full, -1, jnp.int32).at[top].set(
        jnp.arange(TOP, dtype=jnp.int32))            # full row -> top row

    cvalid = cvalid_f[top]
    diag_safe = jnp.where(cvalid, diag_f[top], 0)
    rr = top % R                                     # read row of each slot
    qidx = orient_s.T.reshape(-1)[top] * R + rr      # row in qseqs
    windows = _window_slices(genome, diag_safe - pad, WL, L + W)
    creads = qseqs[qidx]
    clens = qlens[qidx]
    sw_score, pos_map = banded_sw_posmap_auto(
        creads, jnp.where(cvalid, clens, 0), windows, diag_safe, pad=pad)
    st = _candidate_stats(pos_map, clens)            # pos_map [TOP, L]
    score = jnp.where(cvalid, sw_score, -1)
    score_min = jnp.ceil(
        SCORE_MIN_CONST
        + SCORE_MIN_COEFF * jnp.log(jnp.maximum(clens, 2).astype(jnp.float32))
    ).astype(jnp.int32)
    good = cvalid & (score >= score_min) & (st["match"] > 0)

    # --- per-mate candidate tables [P, 2, C] ---
    # rank-major full-layout candidate index for (pair p, mate m, cand c):
    # c*R + (2p + m), remapped through the compaction permutation
    r_ids = (2 * jnp.arange(P, dtype=jnp.int32)[:, None, None]
             + jnp.arange(2, dtype=jnp.int32)[None, :, None])   # [P,2,1]
    c_ids = jnp.arange(C, dtype=jnp.int32)[None, None, :]
    cand_full = c_ids * R + r_ids                    # [P, 2, C]
    cand = inv[cand_full]                            # top-row idx or -1
    present = cand >= 0
    cand = jnp.where(present, cand, 0)
    m_fr = orient_s.T.reshape(-1)[cand_full].astype(jnp.int8)
    m_good = good[cand] & present
    m_score = score[cand]
    m_ts = st["tgt_start"][cand]
    m_tea = st["tgt_end_actual"][cand]
    # dedup identical placements (same tgt_start & fr, earlier slot wins)
    same = ((m_ts[..., None, :] == m_ts[..., :, None])
            & (m_fr[..., None, :] == m_fr[..., :, None])
            & m_good[..., None, :] & m_good[..., :, None])
    j = jnp.arange(C)
    earlier = j[None, :] < j[:, None]                # [C, C] j' < j
    dup = jnp.any(same & earlier[None, None, :, :], axis=-1)
    m_good = m_good & ~dup

    # --- pairing [P, C, C] ---
    g1 = m_good[:, 0, :, None]
    g2 = m_good[:, 1, None, :]
    fr1 = m_fr[:, 0, :, None]
    fr2 = m_fr[:, 1, None, :]
    ts1 = m_ts[:, 0, :, None]
    ts2 = m_ts[:, 1, None, :]
    te1 = m_tea[:, 0, :, None]
    te2 = m_tea[:, 1, None, :]
    s1 = m_score[:, 0, :, None]
    s2 = m_score[:, 1, None, :]
    opp = fr1 != fr2
    ts_fwd = jnp.where(fr1 == 0, ts1, ts2)
    ts_rev = jnp.where(fr1 == 0, ts2, ts1)
    lo = jnp.minimum(ts1, ts2)
    hi = jnp.maximum(te1, te2)
    frag = hi - lo
    ok = (g1 & g2 & opp & (ts_fwd <= ts_rev)
          & (frag >= dlow) & (frag <= dhigh))
    total = jnp.where(ok, s1 + s2, -1)
    # rank: total desc, then fragment-start asc (deterministic); composed
    # stable argsorts instead of a packed int64 key (x64 disabled)
    big = jnp.int32(2**30)
    key_lo = jnp.where(ok, lo, big).reshape(P, -1)
    key_sc = jnp.where(ok, -total, big).reshape(P, -1)
    o1 = jnp.argsort(key_lo, axis=1, stable=True)
    o2 = jnp.argsort(jnp.take_along_axis(key_sc, o1, axis=1), axis=1,
                     stable=True)
    order = jnp.take_along_axis(o1, o2, axis=1)[:, :K]   # [P, K]
    kvalid = jnp.take_along_axis(ok.reshape(P, -1), order, axis=1)
    j1 = order // C
    j2 = order % C

    def gather_mate(arr, jm, mate):
        # arr: [P, 2, 2C] -> [P, K]
        return jnp.take_along_axis(arr[:, mate, :], jm, axis=1)

    out = {}
    cand1 = gather_mate(cand, j1, 0)                 # flat candidate ids
    cand2 = gather_mate(cand, j2, 1)
    both = jnp.stack([cand1, cand2], axis=-1)        # [P, K, 2]

    def pick(a):
        return a[both]

    out["valid"] = kvalid
    out["fr"] = jnp.stack([gather_mate(m_fr, j1, 0),
                           gather_mate(m_fr, j2, 1)], axis=-1)
    out["score"] = pick(score)
    out["src_start"] = pick(st["src_start"])
    out["src_end"] = pick(st["src_end"])
    out["src_gap"] = pick(st["src_gap"])
    out["src_size"] = pick(clens)
    out["tgt_start"] = pick(st["tgt_start"])
    out["tgt_end"] = pick(st["tgt_end"])
    out["tgt_gap"] = pick(st["tgt_gap"])
    # compact transfer format: M-block segments, extracted once over the
    # TOP DP rows (2.5x fewer rows than the [P, K, 2] hit table), then
    # gathered per selected hit
    segs_top, ovf_top = _extract_segments(pos_map)   # [TOP, MAXSEG, 3]
    out["segs"] = segs_top[both]                     # [P, K, 2, MAXSEG, 3]
    out["valid"] = out["valid"] & ~jnp.any(ovf_top[both], axis=-1)
    return out


def _c13_mask_np(out: dict) -> np.ndarray:
    """Host C13 mask over the full [P, K] layout (integer-exact 3/5)."""
    ss, se, sg = out["src_start"], out["src_end"], out["src_gap"]
    sz = out["src_size"]
    ts, te, tg = out["tgt_start"], out["tgt_end"], out["tgt_gap"]
    ok = ((se - ss - sg) * 5 >= 3 * sz) & ((te - ts - tg) * 5
                                           >= 3 * (te - ts))
    return ok.all(axis=-1)


@partial(jax.jit, static_argnames=("L", "seed_len", "stride", "pad", "C",
                                   "K", "dlow", "dhigh", "bsteps", "sbits",
                                   "c13"))
def _align_pairs_packed(genome, sorted_kmers, sorted_posflip, bucket_lo, u2,
                        nmask, plens, *, L, seed_len, stride, pad, C, K,
                        dlow, dhigh, bsteps, sbits, c13):
    """Tunnel-optimized batch: 2-bit packed reads in, first-segment +
    overflow-buffer records out, C13 ratio filter applied on device.

    Transfer budget vs _align_pairs_compact: input 8 -> 2.25 bits/base;
    output 114 -> ~30 bytes/slot (most short-read alignments are a single
    M-block — indels split blocks, mismatches do not — so only segments
    beyond the first go through the sparse overflow buffer)."""
    seqs = _unpack_reads(u2, nmask, L)
    out = _align_pairs_device.__wrapped__(
        genome, sorted_kmers, sorted_posflip, bucket_lo, seqs, plens,
        seed_len=seed_len, stride=stride, pad=pad, C=C, K=K, dlow=dlow,
        dhigh=dhigh, bsteps=bsteps, sbits=sbits)
    if c13:
        # C13 (AlignGraph.cpp:1261): both mates (se-ss-I)/size >= 0.6 and
        # (te-ts-D)/(te-ts) >= 0.6; 0.6 == 3/5 so the compare is exact in
        # integers (no float-boundary hazard)
        ss, se, sg = out["src_start"], out["src_end"], out["src_gap"]
        sz = out["src_size"]
        ts, te, tg = out["tgt_start"], out["tgt_end"], out["tgt_gap"]
        ok = ((se - ss - sg) * 5 >= 3 * sz) & ((te - ts - tg) * 5
                                               >= 3 * (te - ts))
        out["valid"] = out["valid"] & jnp.all(ok, axis=-1)

    P = out["valid"].shape[0]
    M = (3 * P) // 2
    S = MAXSEG
    valid_f = out["valid"].reshape(P * K)
    order = jnp.argsort(~valid_f, stable=True)   # valid slots first, in
    slots = order[:M].astype(jnp.int32)          # (pair, k) order
    svalid = valid_f[slots]
    p_ids = slots // K
    k_ids = slots % K

    def g(a):
        return a[p_ids, k_ids]

    segs = g(out["segs"])                        # [M, 2, S, 3] int32
    tgt_base = g(out["tgt_start"])               # [M, 2]
    frp = (g(out["fr"])[:, 0] | (g(out["fr"])[:, 1] << 1)).astype(jnp.uint8)
    seg1 = jnp.stack([segs[:, :, 0, 0], segs[:, :, 0, 2]],
                     axis=-1).astype(jnp.int16)  # [M, 2, 2] (ss, sz)
    seg1 = jnp.where(svalid[:, None, None], seg1, -1)

    # sparse overflow buffer for segments beyond the first
    E = max(P // 2, 128)
    extra = (segs[:, :, 1:, 2] > 0) & svalid[:, None, None]   # [M,2,S-1]
    ef = extra.reshape(M * 2 * (S - 1))
    eorder = jnp.argsort(~ef, stable=True)[:E]
    evalid = ef[eorder]
    e_slot = (eorder // (2 * (S - 1))).astype(jnp.int32)
    rem = eorder % (2 * (S - 1))
    e_mate = (rem // (S - 1)).astype(jnp.int32)
    e_seg = (rem % (S - 1)).astype(jnp.int32) + 1
    esel = (e_slot, e_mate, e_seg)
    e_src = segs[..., 0][esel].astype(jnp.int16)
    e_dt = (segs[..., 1][esel]
            - tgt_base[e_slot, e_mate]).astype(jnp.int16)
    e_sz = segs[..., 2][esel].astype(jnp.int16)

    return dict(
        n_valid=jnp.sum(valid_f.astype(jnp.int32)),
        n_ovf=jnp.sum(extra.astype(jnp.int32)),
        slot_id=jnp.where(svalid, slots, -1),
        frp=jnp.where(svalid, frp, jnp.uint8(255)),
        score=g(out["score"]).astype(jnp.int16),
        tgt_base=tgt_base,
        seg1=seg1,
        ovf_slot=jnp.where(evalid, e_slot, -1),
        ovf_ms=jnp.where(evalid, e_mate * 8 + e_seg, -1).astype(jnp.int8),
        ovf_src=jnp.where(evalid, e_src, -1),
        ovf_dt=jnp.where(evalid, e_dt, -1),
        ovf_sz=jnp.where(evalid, e_sz, -1),
    )


def _expand_packed(res, start: int, cnt: int, L: int,
                   plens: np.ndarray) -> dict:
    """Host extraction from the packed first-segment transfer format.

    Recomputes the parse quantities from segment records with the exact
    integer formulas of _candidate_stats (bit-equal to the full path,
    tested)."""
    K = MAX_PAIR_HITS
    slot = res["slot_id"]
    mask = slot >= 0
    sel = np.nonzero(mask)[0]
    slot = slot[sel]
    p_ids = slot // K
    keep = p_ids < max(cnt, 0)
    sel = sel[keep]
    p_ids = p_ids[keep]
    n = len(sel)
    # compact-row index -> output row (-1 dropped)
    row_of = np.full(res["slot_id"].shape[0], -1, np.int64)
    row_of[sel] = np.arange(n)

    frp = res["frp"][sel].astype(np.int8)
    fr = np.stack([frp & 1, (frp >> 1) & 1], axis=-1).astype(np.int8)
    score = res["score"][sel].astype(np.int32)
    tgt_base = res["tgt_base"][sel].astype(np.int32)     # [n, 2]
    seg1 = res["seg1"][sel].astype(np.int32)             # [n, 2, 2]

    # full segment table [n, 2, MAXSEG, 3] from seg1 + overflow entries
    segs = np.full((n, 2, MAXSEG, 3), -1, np.int32)
    segs[:, :, 0, 0] = seg1[..., 0]
    segs[:, :, 0, 1] = np.where(seg1[..., 1] > 0, tgt_base, -1)
    segs[:, :, 0, 2] = seg1[..., 1]
    om = res["ovf_slot"] >= 0
    if om.any():
        orow = row_of[res["ovf_slot"][om]]
        okeep = orow >= 0
        orow = orow[okeep]
        oms = res["ovf_ms"][om][okeep].astype(np.int64)
        omate, oseg = oms // 8, oms % 8
        osrc = res["ovf_src"][om][okeep].astype(np.int32)
        odt = res["ovf_dt"][om][okeep].astype(np.int32)
        osz = res["ovf_sz"][om][okeep].astype(np.int32)
        segs[orow, omate, oseg, 0] = osrc
        segs[orow, omate, oseg, 1] = tgt_base[orow, omate] + odt
        segs[orow, omate, oseg, 2] = osz

    # fast pos_map reconstruction: one vectorized pass for the (dominant)
    # first segment, sparse per-entry fills for overflow segments
    pm = np.full((n, 2, L), -1, np.int32)
    i_idx = np.arange(L, dtype=np.int32)
    ss0 = seg1[..., 0:1]
    sz0 = seg1[..., 1:2]
    m0 = (sz0 > 0) & (i_idx >= ss0) & (i_idx < ss0 + sz0)
    np.copyto(pm, tgt_base[..., None] + (i_idx - ss0), where=m0)
    if om.any():
        for r_, m_, s_ in zip(orow, omate, range(len(orow))):
            src, tgt, szv = (int(osrc[s_]), int(tgt_base[r_, m_])
                             + int(odt[s_]), int(osz[s_]))
            pm[r_, m_, src:src + szv] = tgt + np.arange(szv, dtype=np.int32)

    sz = np.where(segs[..., 2] > 0, segs[..., 2], 0)
    segv = sz > 0
    match = sz.sum(axis=-1)                              # [n, 2]
    nseg = np.maximum(segv.sum(axis=-1), 1)
    last = (nseg - 1)[..., None]
    ss = segs[..., 0, 0]
    src_last = np.take_along_axis(segs[..., 0], last, axis=-1)[..., 0]
    sz_last = np.take_along_axis(sz, last, axis=-1)[..., 0]
    se = src_last + sz_last
    ins = (se - ss) - match
    tea = np.take_along_axis(segs[..., 1], last, axis=-1)[..., 0] + sz_last
    dele = (tea - tgt_base) - match
    qlen = plens[p_ids][:, None].astype(np.int32)
    te_ref = tgt_base + qlen + dele - ins
    return dict(
        pair_id=(p_ids + start).astype(np.int32),
        fr=fr,
        score=score,
        source_start=ss.astype(np.int32),
        source_end=se.astype(np.int32),
        source_gap=ins.astype(np.int32),
        source_size=np.broadcast_to(qlen, ins.shape).copy(),
        target_start=tgt_base,
        target_end=te_ref.astype(np.int32),
        target_gap=dele.astype(np.int32),
        pos_map=pm,
    )


@partial(jax.jit, static_argnames=("seed_len", "stride", "pad", "C", "K",
                                   "dlow", "dhigh", "bsteps", "sbits"))
def _align_pairs_compact(genome, sorted_kmers, sorted_posflip, bucket_lo, seqs,
                         plens, *, seed_len, stride, pad, C, K, dlow, dhigh,
                         bsteps, sbits):
    """_align_pairs_device + valid-slot compaction of the transfer.

    The [P, K] hit table averages ~1 valid slot per pair; the device->host
    tunnel is bandwidth-bound, so only the valid slots are shipped, with
    M-block segments packed to int16 (src_start, tgt_start - tgt_base,
    size).  Capacity is 3P/2 slots; `n_valid` lets the host detect
    overflow and fall back to the full layout."""
    out = _align_pairs_device.__wrapped__(
        genome, sorted_kmers, sorted_posflip, bucket_lo, seqs, plens,
        seed_len=seed_len, stride=stride, pad=pad, C=C, K=K, dlow=dlow,
        dhigh=dhigh, bsteps=bsteps, sbits=sbits)
    P = out["valid"].shape[0]
    M = (3 * P) // 2
    valid_f = out["valid"].reshape(P * K)
    order = jnp.argsort(~valid_f, stable=True)   # valid slots first, in
    slots = order[:M].astype(jnp.int32)          # (pair, k) order
    svalid = valid_f[slots]
    p_ids = slots // K
    k_ids = slots % K

    def g(a):
        return a[p_ids, k_ids]

    segs = g(out["segs"])                        # [M, 2, S, 3] int32
    tgt_base = g(out["tgt_start"])               # [M, 2]
    segv = segs[..., 2] > 0
    seg_src = segs[..., 0].astype(jnp.int16)
    seg_dt = jnp.where(segv, segs[..., 1] - tgt_base[..., None],
                       -1).astype(jnp.int16)
    seg_sz = segs[..., 2].astype(jnp.int16)
    return dict(
        n_valid=jnp.sum(valid_f.astype(jnp.int32)),
        slot_id=jnp.where(svalid, slots, -1),
        fr=g(out["fr"]),
        score=g(out["score"]).astype(jnp.int16),
        tgt_base=tgt_base,
        segs16=jnp.stack([seg_src, seg_dt, seg_sz], axis=-1),
    )
