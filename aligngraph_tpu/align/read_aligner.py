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
    pack_query_seeds, select_candidates,
)

SCORE_MIN_CONST = 5.0   # bowtie2 --score-min G,5,2
SCORE_MIN_COEFF = 2.0
MAX_PAIR_HITS = 5       # bowtie2 -k 5
MAXSEG = 8              # M-block segments per alignment (transfer format)

_COMP = jnp.array([3, 2, 1, 0, 4], dtype=jnp.int8)


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
    """Holds the genome on device + seed index; aligns batches of pairs."""
    genome: jax.Array          # [G] int8
    index: SeedIndex
    cfg: Config
    batch_pairs: int = 4096

    @classmethod
    def build(cls, genome_codes: np.ndarray, cfg: Config,
              batch_pairs: int = 4096) -> "ReadAligner":
        idx = build_index(genome_codes, cfg.seed_len)
        return cls(genome=jnp.asarray(genome_codes), index=idx, cfg=cfg,
                   batch_pairs=batch_pairs)

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
            dev = _align_pairs_compact(
                self.genome, self.index.sorted_kmers, self.index.sorted_pos,
                self.index.bucket_lo, jnp.asarray(seqs), jnp.asarray(plens),
                seed_len=cfg.seed_len, stride=cfg.seed_stride,
                pad=cfg.band_pad, C=cfg.max_candidates,
                K=MAX_PAIR_HITS, dlow=cfg.distance_low,
                dhigh=cfg.distance_high,
                bsteps=self.index.search_steps,
                sbits=self.index.suffix_bits)
            pending.append((start, cnt, dev, np.asarray(seqs), plens))
        out_chunks = []
        for start, cnt, dev, seqs, plens in pending:
            res = jax.tree_util.tree_map(np.asarray, dev)
            if int(res["n_valid"]) > res["slot_id"].shape[0]:
                # compaction overflow (pathological multi-mapping batch):
                # re-run through the uncompacted path
                full = _align_pairs_device(
                    self.genome, self.index.sorted_kmers,
                    self.index.sorted_pos, self.index.bucket_lo,
                    jnp.asarray(seqs),
                    jnp.asarray(plens), seed_len=cfg.seed_len,
                    stride=cfg.seed_stride, pad=cfg.band_pad,
                    C=cfg.max_candidates, K=MAX_PAIR_HITS,
                    dlow=cfg.distance_low, dhigh=cfg.distance_high,
                    bsteps=self.index.search_steps,
                    sbits=self.index.suffix_bits)
                full = jax.tree_util.tree_map(np.asarray, full)
                out_chunks.append(_expand_full(full, start, cnt, L))
            else:
                out_chunks.append(
                    _expand_compact(res, start, cnt, L, plens))
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


@partial(jax.jit, static_argnames=("seed_len", "stride", "pad", "C", "K",
                                   "dlow", "dhigh", "bsteps", "sbits"))
def _align_pairs_device(genome, sorted_kmers, sorted_pos, bucket_lo, seqs,
                        plens, *, seed_len, stride, pad, C, K, dlow, dhigh,
                        bsteps, sbits):
    """One batch of P pairs -> top-K pair alignments per pair."""
    G = genome.shape[0]
    R, L = seqs.shape            # R = 2P (mate-interleaved)
    P = R // 2
    W = 2 * pad
    WL = L + W
    rlens = jnp.repeat(plens, 2)                     # [R]
    rc = _revcomp_padded(seqs, rlens)
    qseqs = jnp.concatenate([seqs, rc])              # [2R, L]
    qlens = jnp.concatenate([rlens, rlens])

    # --- seeding (both orientations) ---
    packed, offs, valid = pack_query_seeds(qseqs, seed_len, stride)
    valid = valid & (offs[None, :] <= (qlens[:, None] - seed_len))
    hits = lookup_seeds_bucketed(sorted_kmers, sorted_pos, bucket_lo,
                                 packed, valid, 8, bsteps, sbits)
    diags2, votes2 = select_candidates(hits, offs, pad, C)   # [2R, C]

    # --- joint-orientation top-C per read (most candidate slots of the
    # wrong orientation are empty; selecting over both halves the DP
    # batch) ---
    diag_j = jnp.concatenate([diags2[:R], diags2[R:]], axis=1)   # [R, 2C]
    votes_j = jnp.concatenate([votes2[:R], votes2[R:]], axis=1)
    orient_j = jnp.broadcast_to(
        (jnp.arange(2 * C, dtype=jnp.int32) // C)[None, :], (R, 2 * C))
    o1 = jnp.argsort(jnp.where(votes_j > 0, diag_j, INVALID_DIAG),
                     axis=1, stable=True)
    o2 = jnp.argsort(jnp.take_along_axis(-votes_j, o1, axis=1), axis=1,
                     stable=True)
    sel = jnp.take_along_axis(o1, o2, axis=1)[:, :C]             # [R, C]
    diag_s = jnp.take_along_axis(diag_j, sel, axis=1)
    votes_s = jnp.take_along_axis(votes_j, sel, axis=1)
    orient_s = jnp.take_along_axis(orient_j, sel, axis=1)
    diag_s = jnp.where(votes_s > 0, diag_s, INVALID_DIAG)

    # --- validity compaction: most candidate slots are empty (avg ~1.2
    # real candidates/read); sort valid-first and run DP/traceback/stats
    # on the top quarter only (avg capacity 2 candidates/read).  The
    # flatten is RANK-major (all rank-0 candidates of every read first),
    # so when a repeat-heavy batch overflows capacity, only the lowest-
    # vote-rank candidates are shed (deterministic; PARITY.md).
    diag_f = diag_s.T.reshape(-1)                    # [C*R] rank-major
    cvalid_f = diag_f != INVALID_DIAG
    B_full = R * C
    TOP = B_full // 4
    order = jnp.argsort(~cvalid_f, stable=True)      # valid rows first
    top = order[:TOP]
    inv = jnp.full(B_full, -1, jnp.int32).at[top].set(
        jnp.arange(TOP, dtype=jnp.int32))            # full row -> top row

    cvalid = cvalid_f[top]
    diag_safe = jnp.where(cvalid, diag_f[top], 0)
    rr = top % R                                     # read row of each slot
    qidx = orient_s.T.reshape(-1)[top] * R + rr      # row in qseqs
    x = (diag_safe[:, None] - pad
         + jnp.arange(WL, dtype=jnp.int32)[None, :])
    windows = jnp.where((x >= 0) & (x < G),
                        genome[jnp.clip(x, 0, G - 1)], jnp.int8(4))
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


@partial(jax.jit, static_argnames=("seed_len", "stride", "pad", "C", "K",
                                   "dlow", "dhigh", "bsteps", "sbits"))
def _align_pairs_compact(genome, sorted_kmers, sorted_pos, bucket_lo, seqs,
                         plens, *, seed_len, stride, pad, C, K, dlow, dhigh,
                         bsteps, sbits):
    """_align_pairs_device + valid-slot compaction of the transfer.

    The [P, K] hit table averages ~1 valid slot per pair; the device->host
    tunnel is bandwidth-bound, so only the valid slots are shipped, with
    M-block segments packed to int16 (src_start, tgt_start - tgt_base,
    size).  Capacity is 3P/2 slots; `n_valid` lets the host detect
    overflow and fall back to the full layout."""
    out = _align_pairs_device.__wrapped__(
        genome, sorted_kmers, sorted_pos, bucket_lo, seqs, plens,
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
