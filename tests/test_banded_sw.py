"""Banded SW kernel vs brute-force full affine local SW oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from aligngraph_tpu.ops.banded_sw import (
    GAP_EXT, GAP_OPEN, MATCH, MISMATCH, N_PEN, banded_sw, sw_traceback,
)

NEGI = -(10**7)


def full_sw_score(read, window):
    """Full (unbanded) local affine SW, numpy oracle. Returns best score."""
    L, Wn = len(read), len(window)
    H = np.zeros((L + 1, Wn + 1), np.int64)
    E = np.full((L + 1, Wn + 1), NEGI, np.int64)  # gap consuming read base
    F = np.full((L + 1, Wn + 1), NEGI, np.int64)  # gap consuming window base
    for i in range(1, L + 1):
        for j in range(1, Wn + 1):
            r, w = read[i - 1], window[j - 1]
            if r < 4 and r == w:
                s = MATCH
            elif r >= 4 or w >= 4:
                s = N_PEN
            else:
                s = MISMATCH
            E[i][j] = max(H[i - 1][j] - GAP_OPEN - GAP_EXT,
                          E[i - 1][j] - GAP_EXT)
            F[i][j] = max(H[i][j - 1] - GAP_OPEN - GAP_EXT,
                          F[i][j - 1] - GAP_EXT)
            H[i][j] = max(0, H[i - 1][j - 1] + s, E[i][j], F[i][j])
    return int(H.max())


def make_case(rng, L, pad, n_mut=3, indel=True):
    """Read sampled from a genome window with mutations; returns
    (read, window, g0_offset_in_window)."""
    W = 2 * pad
    g = rng.integers(0, 4, size=L + 2 * W).astype(np.int8)
    start = W  # read corresponds to window position W .. W+L
    read = g[start:start + L].copy()
    for _ in range(n_mut):
        k = rng.integers(0, len(read))
        op = rng.integers(0, 3 if indel else 1)
        if op == 0:
            read[k] = (read[k] + rng.integers(1, 4)) % 4
        elif op == 1 and len(read) > 10:
            read = np.delete(read, k)
        else:
            read = np.insert(read, k, rng.integers(0, 4))
    read = read[:L]
    rlen = len(read)
    padded = np.full(L, 4, np.int8)
    padded[:rlen] = read
    # window for the DP: windows[x] = genome[g0 - pad + x], x in [0, L+W)
    # with g0 = start (read base 0 ~ genome[start])
    win = g[start - pad:start - pad + L + W].astype(np.int8)
    return padded, rlen, win


def score_from_pos_map(read, rlen, pos_map, genome_at):
    """Recompute alignment score from the traceback position map."""
    aligned = [(i, int(pos_map[i])) for i in range(rlen) if pos_map[i] >= 0]
    if not aligned:
        return 0
    score = 0
    prev_i, prev_g = None, None
    for i, g in aligned:
        r, w = int(read[i]), int(genome_at(g))
        if r < 4 and r == w:
            score += MATCH
        elif r >= 4 or w >= 4:
            score += N_PEN
        else:
            score += MISMATCH
        if prev_i is not None:
            di, dg = i - prev_i, g - prev_g
            assert di >= 1 and dg >= 1, "pos_map not monotone"
            if di > 1:  # read gap (unaligned read bases)
                score -= GAP_OPEN + GAP_EXT * (di - 1)
            if dg > 1:  # genome gap (deleted genome bases)
                score -= GAP_OPEN + GAP_EXT * (dg - 1)
        prev_i, prev_g = i, g
    return score


@pytest.mark.parametrize("seed", range(8))
def test_banded_matches_full_sw(seed):
    rng = np.random.default_rng(seed)
    L, pad = 64, 16
    B = 16
    reads, rlens, wins = [], [], []
    for _ in range(B):
        r, rl, w = make_case(rng, L, pad, n_mut=int(rng.integers(0, 6)))
        reads.append(r)
        rlens.append(rl)
        wins.append(w)
    reads = jnp.asarray(np.stack(reads))
    rlens_a = jnp.asarray(np.array(rlens, np.int32))
    wins_a = jnp.asarray(np.stack(wins))
    res = banded_sw(reads, rlens_a, wins_a, pad=pad)
    for k in range(B):
        oracle = full_sw_score(np.asarray(reads[k])[: rlens[k]],
                               np.asarray(wins_a[k]))
        assert int(res.score[k]) == oracle, f"case {k}"


@pytest.mark.parametrize("seed", range(6))
def test_traceback_score_consistency(seed):
    rng = np.random.default_rng(100 + seed)
    L, pad = 80, 16
    B = 12
    reads, rlens, wins = [], [], []
    for _ in range(B):
        r, rl, w = make_case(rng, L, pad, n_mut=int(rng.integers(0, 8)))
        reads.append(r)
        rlens.append(rl)
        wins.append(w)
    reads_a = jnp.asarray(np.stack(reads))
    rlens_a = jnp.asarray(np.array(rlens, np.int32))
    wins_a = jnp.asarray(np.stack(wins))
    res = banded_sw(reads_a, rlens_a, wins_a, pad=pad)
    g0 = jnp.zeros(B, jnp.int32)  # window-local coordinates
    pos_map = np.asarray(sw_traceback(res.tb, res.best_i, res.best_b,
                                      g0, pad=pad))
    for k in range(B):
        win = np.asarray(wins_a[k])

        def genome_at(g, win=win):
            x = g + pad  # window[x] = genome[g0 - pad + x], g0 = 0
            return win[x] if 0 <= x < len(win) else 4

        s = score_from_pos_map(np.asarray(reads_a[k]), rlens[k],
                               pos_map[k], genome_at)
        assert s == int(res.score[k]), f"case {k}: {s} != {int(res.score[k])}"


def test_perfect_match_score():
    rng = np.random.default_rng(42)
    L, pad = 50, 8
    g = rng.integers(0, 4, size=L + 4 * pad).astype(np.int8)
    read = g[pad:pad + L]
    win = g[0:L + 2 * pad]
    res = banded_sw(jnp.asarray(read[None, :]),
                    jnp.asarray(np.array([L], np.int32)),
                    jnp.asarray(win[None, :]), pad=pad)
    assert int(res.score[0]) == MATCH * L
    pos_map = np.asarray(sw_traceback(
        res.tb, res.best_i, res.best_b, jnp.asarray([pad], jnp.int32),
        pad=pad))[0]
    # read base i aligns genome pos pad + i (g0 = pad)
    np.testing.assert_array_equal(pos_map, np.arange(pad, pad + L))


def test_no_alignment_scores_zero():
    # all-N read vs genome: only N penalties -> local best 0
    read = np.full((1, 30), 4, np.int8)
    win = np.zeros((1, 30 + 16), np.int8)
    res = banded_sw(jnp.asarray(read), jnp.asarray([30], jnp.int32),
                    jnp.asarray(win), pad=8)
    assert int(res.score[0]) == 0


def test_posmap_pallas_interpret_equals_xla():
    """Fused Pallas DP + row-sweep traceback (interpret mode on CPU) must
    be bit-equal to banded_sw + sw_traceback."""
    import jax.numpy as jnp
    import numpy as np

    from aligngraph_tpu.ops.banded_sw import banded_sw, sw_traceback
    from aligngraph_tpu.ops.banded_sw_pallas import banded_sw_posmap_pallas

    rng = np.random.default_rng(21)
    B, L, pad = 128, 60, 8
    genome = rng.integers(0, 4, 5000).astype(np.int8)
    reads = np.full((B, L), 4, np.int8)
    rlens = np.zeros(B, np.int32)
    g0 = np.zeros(B, np.int32)
    for i in range(B):
        ln = int(rng.integers(30, L + 1))
        st = int(rng.integers(0, len(genome) - ln - 2 * pad))
        seq = genome[st:st + ln].copy()
        # mutations + indels
        mi = rng.random(ln) < 0.05
        seq[mi] = (seq[mi] + rng.integers(1, 4, mi.sum())) % 4
        if rng.random() < 0.3 and ln > 10:
            cut = int(rng.integers(5, ln - 5))
            seq = np.concatenate([seq[:cut], seq[cut + 2:]])
            ln = len(seq)
        reads[i, :ln] = seq
        rlens[i] = ln
        g0[i] = st
    wl = L + 2 * pad
    x = g0[:, None] - pad + np.arange(wl)[None, :]
    windows = np.where((x >= 0) & (x < len(genome)),
                       genome[np.clip(x, 0, len(genome) - 1)],
                       np.int8(4)).astype(np.int8)
    # a few zero-length (invalid) lanes
    rlens[::17] = 0

    res = banded_sw(jnp.asarray(reads), jnp.asarray(rlens),
                    jnp.asarray(windows), pad=pad)
    pm_ref = sw_traceback(res.tb, res.best_i, res.best_b,
                          jnp.asarray(g0), pad=pad)
    score_p, pm_p = banded_sw_posmap_pallas(
        jnp.asarray(reads), jnp.asarray(rlens), jnp.asarray(windows),
        jnp.asarray(g0), pad=pad, interpret=True)
    np.testing.assert_array_equal(np.asarray(res.score),
                                  np.asarray(score_p))
    np.testing.assert_array_equal(np.asarray(pm_ref), np.asarray(pm_p))


def test_posmap_fast_interpret_equals_cpu_auto():
    """Gapless-fast-path variants must agree: the compacted Pallas
    traceback (interpret mode) vs the CPU auto path (XLA traceback +
    gapless select)."""
    import jax.numpy as jnp
    import numpy as np

    from aligngraph_tpu.ops.banded_sw import (
        banded_sw, gapless_diag, sw_traceback)
    from aligngraph_tpu.ops.banded_sw_pallas import banded_sw_posmap_fast

    rng = np.random.default_rng(33)
    B, L, pad = 256, 60, 8
    genome = rng.integers(0, 4, 5000).astype(np.int8)
    reads = np.full((B, L), 4, np.int8)
    rlens = np.zeros(B, np.int32)
    g0 = np.zeros(B, np.int32)
    for i in range(B):
        ln = int(rng.integers(30, L + 1))
        st = int(rng.integers(0, len(genome) - ln - 2 * pad))
        seq = genome[st:st + ln].copy()
        mi = rng.random(ln) < 0.04
        seq[mi] = (seq[mi] + rng.integers(1, 4, mi.sum())) % 4
        if rng.random() < 0.3 and ln > 10:   # ~30% of lanes get an indel
            cut = int(rng.integers(5, ln - 5))
            seq = np.concatenate([seq[:cut], seq[cut + 2:]])
            ln = len(seq)
        reads[i, :ln] = seq
        rlens[i] = ln
        g0[i] = st
    rlens[::23] = 0
    wl = L + 2 * pad
    x = g0[:, None] - pad + np.arange(wl)[None, :]
    windows = np.where((x >= 0) & (x < len(genome)),
                       genome[np.clip(x, 0, len(genome) - 1)],
                       np.int8(4)).astype(np.int8)

    # CPU auto semantics, spelled out
    res = banded_sw(jnp.asarray(reads), jnp.asarray(rlens),
                    jnp.asarray(windows), pad=pad)
    pm_tb = sw_traceback(res.tb, res.best_i, res.best_b,
                         jnp.asarray(g0), pad=pad)
    gb, gs, ge = gapless_diag(jnp.asarray(reads), jnp.asarray(rlens),
                              jnp.asarray(windows), pad)
    need = np.asarray(res.score > gb)
    j = np.arange(L)
    syn_on = (~need[:, None]) & (np.asarray(res.score) > 0)[:, None] \
        & (j[None, :] >= np.asarray(gs)[:, None]) \
        & (j[None, :] <= np.asarray(ge)[:, None])
    pm_ref = np.where(need[:, None], np.asarray(pm_tb),
                      np.where(syn_on, g0[:, None] + j[None, :], -1))
    # gapless lanes must score identically through the synthesized map
    assert need.sum() < B // 2 and (~need).sum() > 0

    score_f, pm_f = banded_sw_posmap_fast(
        jnp.asarray(reads), jnp.asarray(rlens), jnp.asarray(windows),
        jnp.asarray(g0), pad=pad, interpret=True)
    np.testing.assert_array_equal(np.asarray(res.score),
                                  np.asarray(score_f))
    np.testing.assert_array_equal(pm_ref, np.asarray(pm_f))
