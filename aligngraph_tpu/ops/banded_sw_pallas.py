"""Pallas TPU kernel for the banded affine local DP (speed-of-light path).

Same semantics as ops/banded_sw.banded_sw (tested for equivalence), with a
TPU-native layout:
  - candidates on the LANE axis (TB per grid tile), band on sublanes:
    all DP state tensors are (W, TB) so every op is a dense VPU op
  - rows processed in slabs of 8 so every dynamic sublane slice is
    8-aligned (Mosaic constraint); within-slab row offsets are static
  - the exact within-row F recurrence is the same log-step max-decay scan
    as the reference implementation, as sublane shifts
  - traceback bits written slab-wise into the VMEM-resident (L, W, TB)
    output block

Outputs match banded_sw bit-for-bit: scores/best cells [B], tb [L, B, W].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aligngraph_tpu.ops.banded_sw import (
    GAP_EXT, GAP_OPEN, MATCH, MISMATCH, N_PEN, SWResult, gapless_diag,
)

NEG = -(10**7)    # python int: jnp scalars would be captured consts
TB = 128          # candidates per grid tile (lane width)
SLAB = 8          # rows per aligned slab


def _shift_down(a, s):
    """out[b] = a[b-s] along sublanes (NEG fill)."""
    return jnp.concatenate(
        [jnp.full((s, a.shape[1]), NEG, a.dtype), a[:-s]], axis=0)


def _shift_up(a, s):
    return jnp.concatenate(
        [a[s:], jnp.full((s, a.shape[1]), NEG, a.dtype)], axis=0)


def _kernel(r_ref, w_ref, len_ref, tb_ref, score_ref, bi_ref, bb_ref, *,
            L: int, W: int):
    lens = len_ref[0, 0, :]                           # (TB,) int32

    def slab(k, carry):
        Hprev, Eprev, bs, bi, bb = carry
        base = pl.multiple_of(k * SLAB, SLAB)
        rslab = r_ref[0, pl.ds(base, SLAB), :].astype(jnp.int32)
        wslab = w_ref[0, pl.ds(base, W + SLAB), :].astype(jnp.int32)
        tb_rows = []
        for j in range(SLAB):
            i = k * SLAB + j + 1                      # 1-based row
            rb = rslab[j][None, :]
            wb = wslab[j:j + W]                       # (W, TB), static j
            eq = (rb == wb) & (rb < 4)
            anyn = (rb >= 4) | (wb >= 4)
            s = jnp.where(eq, MATCH, jnp.where(anyn, N_PEN, MISMATCH))
            M = Hprev + s
            e_open = _shift_up(Hprev, 1) - (GAP_OPEN + GAP_EXT)
            e_ext = _shift_up(Eprev, 1) - GAP_EXT
            E = jnp.maximum(e_open, e_ext)
            e_flag = e_ext > e_open
            Hno = jnp.maximum(jnp.maximum(M, E), 0)
            G = Hno - GAP_OPEN
            sh = 1
            while sh < W:
                G = jnp.maximum(G, _shift_down(G, sh) - GAP_EXT * sh)
                sh *= 2
            F = _shift_down(G, 1) - GAP_EXT
            H = jnp.maximum(Hno, F)
            f_open = _shift_down(Hno, 1) - (GAP_OPEN + GAP_EXT)
            f_flag = F > f_open
            choice = jnp.where(
                H == 0, 0,
                jnp.where(M == H, 1, jnp.where(E == H, 2, 3)))
            tb_rows.append((choice
                            | (e_flag.astype(jnp.int32) << 2)
                            | (f_flag.astype(jnp.int32) << 3)
                            ).astype(jnp.uint8)[None])
            valid = (i <= lens)[None, :]
            Hm = jnp.where(valid, H, NEG)
            row_best = jnp.max(Hm, axis=0)
            bidx = jax.lax.broadcasted_iota(jnp.int32, (W, TB), 0)
            row_arg = jnp.min(
                jnp.where(Hm == row_best[None, :], bidx, W), axis=0)
            upd = row_best > bs
            bs = jnp.where(upd, row_best, bs)
            bi = jnp.where(upd, i, bi)
            bb = jnp.where(upd, row_arg, bb)
            Hprev, Eprev = H, E
        tb_ref[0, pl.ds(base, SLAB), :, :] = jnp.concatenate(tb_rows,
                                                             axis=0)
        return Hprev, Eprev, bs, bi, bb

    H0 = jnp.zeros((W, TB), jnp.int32)
    E0 = jnp.full((W, TB), NEG, jnp.int32)
    z = jnp.zeros((TB,), jnp.int32)
    H, E, bs, bi, bb = jax.lax.fori_loop(
        0, L // SLAB, slab, (H0, E0, z, z, z))
    score_ref[0, 0, :] = bs
    bi_ref[0, 0, :] = bi
    bb_ref[0, 0, :] = bb


@functools.partial(jax.jit, static_argnames=("pad",))
def banded_sw_pallas(reads, rlens, windows, pad: int) -> SWResult:
    """Drop-in for banded_sw (same inputs/outputs), Pallas TPU kernel.

    reads [B, L] int8; rlens [B] int32; windows [B, L+2*pad] int8.
    B must be a multiple of TB (the caller pads the batch).
    """
    B, L = reads.shape
    W = 2 * pad
    assert windows.shape[1] == L + W
    assert B % TB == 0, f"batch {B} not a multiple of {TB}"
    nb = B // TB
    L8 = ((L + SLAB - 1) // SLAB) * SLAB

    if L8 != L:
        reads = jnp.pad(reads, ((0, 0), (0, L8 - L)), constant_values=4)
        windows = jnp.pad(windows, ((0, 0), (0, L8 - L)),
                          constant_values=4)

    reads_t = reads.T.reshape(L8, nb, TB).swapaxes(0, 1)       # (nb,L8,TB)
    win_t = windows.T.reshape(L8 + W, nb, TB).swapaxes(0, 1)
    lens_t = rlens.reshape(nb, 1, TB)

    kernel = functools.partial(_kernel, L=L8, W=W)
    tb, score, bi, bb = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, L8, TB), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, L8 + W, TB), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, 1, TB), lambda t: (t, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, L8, W, TB), lambda t: (t, 0, 0, 0)),
            pl.BlockSpec((1, 1, TB), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, 1, TB), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, 1, TB), lambda t: (t, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, L8, W, TB), jnp.uint8),
            jax.ShapeDtypeStruct((nb, 1, TB), jnp.int32),
            jax.ShapeDtypeStruct((nb, 1, TB), jnp.int32),
            jax.ShapeDtypeStruct((nb, 1, TB), jnp.int32),
        ],
    )(reads_t, win_t, lens_t)
    # back to banded_sw layout: tb [L, B, W] with B = t*TB + lane
    tb_out = jnp.transpose(tb, (1, 0, 3, 2)).reshape(L8, B, W)[:L]
    return SWResult(score.reshape(B), bi.reshape(B), bb.reshape(B),
                    tb_out)


def _kernel_score(r_ref, w_ref, len_ref, score_ref, *, L: int, W: int):
    """Score-only DP (no traceback-bit writes): the gapless fast path
    first pass — skipping the (nb, L8, W, TB) uint8 HBM writes."""
    lens = len_ref[0, 0, :]

    def slab(k, carry):
        Hprev, Eprev, bs = carry
        base = pl.multiple_of(k * SLAB, SLAB)
        rslab = r_ref[0, pl.ds(base, SLAB), :].astype(jnp.int32)
        wslab = w_ref[0, pl.ds(base, W + SLAB), :].astype(jnp.int32)
        for j in range(SLAB):
            i = k * SLAB + j + 1
            rb = rslab[j][None, :]
            wb = wslab[j:j + W]
            eq = (rb == wb) & (rb < 4)
            anyn = (rb >= 4) | (wb >= 4)
            s = jnp.where(eq, MATCH, jnp.where(anyn, N_PEN, MISMATCH))
            M = Hprev + s
            e_open = _shift_up(Hprev, 1) - (GAP_OPEN + GAP_EXT)
            e_ext = _shift_up(Eprev, 1) - GAP_EXT
            E = jnp.maximum(e_open, e_ext)
            Hno = jnp.maximum(jnp.maximum(M, E), 0)
            G = Hno - GAP_OPEN
            sh = 1
            while sh < W:
                G = jnp.maximum(G, _shift_down(G, sh) - GAP_EXT * sh)
                sh *= 2
            F = _shift_down(G, 1) - GAP_EXT
            H = jnp.maximum(Hno, F)
            valid = (i <= lens)[None, :]
            Hm = jnp.where(valid, H, NEG)
            bs = jnp.maximum(bs, jnp.max(Hm, axis=0))
            Hprev, Eprev = H, E
        return Hprev, Eprev, bs

    H0 = jnp.zeros((W, TB), jnp.int32)
    E0 = jnp.full((W, TB), NEG, jnp.int32)
    z = jnp.zeros((TB,), jnp.int32)
    _, _, bs = jax.lax.fori_loop(0, L // SLAB, slab, (H0, E0, z))
    score_ref[0, 0, :] = bs


def _masked_read(slab, b, W):
    """slab (W, TB) int32, b (TB,) int32 in [0, W) -> slab[b, lane]."""
    widx = jax.lax.broadcasted_iota(jnp.int32, slab.shape, 0)
    return jnp.max(jnp.where(widx == b[None, :], slab, 0), axis=0)


def _tb_kernel(tb_ref, bi_ref, bb_ref, g0_ref, pm_ref, *, L: int, W: int,
               pad: int):
    """Row-sweep traceback: identical semantics to banded_sw.sw_traceback.

    All lanes walk their path during a single descending sweep over rows
    (every traceback move is row-non-increasing).  A lane activates when
    the sweep reaches its best row; within a row, micro-steps replicate
    sw_traceback.step_once exactly (H/E/F phases, gap-extension bits),
    with the per-lane traceback byte obtained by a band-masked VMEM read
    instead of an HBM gather.  Diag emissions of row i land at read base
    i-1, so pos_map rows are written directly — no scatter."""
    best_i = bi_ref[0, 0, :]
    best_b = bb_ref[0, 0, :]
    g0 = g0_ref[0, 0, :]

    def row(k, carry):
        li, b, phase, alive = carry                   # alive: int32 0/1
        i = L - k                                     # row L..1
        slab = tb_ref[0, i - 1, :, :].astype(jnp.int32)   # (W, TB)

        def micro(state):
            li, b, phase, alive, emit = state
            in_row = (alive != 0) & (li == i)
            inb = in_row & (b >= 0) & (b < W)
            byte = _masked_read(slab, jnp.clip(b, 0, W - 1), W)
            byte = jnp.where(inb, byte, 0)
            choice = byte & 3
            e_ext = (byte >> 2) & 1
            f_ext = (byte >> 3) & 1
            in_h = inb & (phase == 0)
            in_e = inb & (phase == 1)
            in_f = inb & (phase == 2)
            stop = in_h & (choice == 0)
            diag = in_h & (choice == 1)
            to_e = in_h & (choice == 2)
            to_f = in_h & (choice == 3)
            gpos = g0 + (i - 1) + b - pad
            emit = jnp.where(diag, gpos, emit)
            li = jnp.where(diag | in_e, li - 1, li)
            b = jnp.where(in_e, b + 1, jnp.where(in_f, b - 1, b))
            nphase = jnp.where(
                to_e | (in_e & (e_ext == 1)), 1,
                jnp.where(to_f | (in_f & (f_ext == 1)), 2, 0))
            phase = jnp.where(in_row, nphase, phase)
            dead = stop | (in_row & ~inb)
            alive = jnp.where(dead, 0, alive)
            return li, b, phase, alive, emit

        def cond(state):
            li, _, _, alive, _ = state
            return jnp.any((alive != 0) & (li == i))

        emit0 = jnp.full(li.shape, -1, jnp.int32)
        li, b, phase, alive, emit = jax.lax.while_loop(
            cond, micro, (li, b, phase, alive, emit0))
        pm_ref[0, i - 1, :] = emit
        return li, b, phase, alive

    z = jnp.zeros(best_i.shape, jnp.int32)
    jax.lax.fori_loop(
        0, L, row,
        (best_i, best_b, z, (best_i > 0).astype(jnp.int32)))


@functools.partial(jax.jit, static_argnames=("pad", "interpret"))
def banded_sw_posmap_pallas(reads, rlens, windows, g0, pad: int,
                            interpret: bool = False):
    """Fused DP + traceback on TPU: returns (score [B], pos_map [B, L]).

    Same results as banded_sw + sw_traceback (tested bit-equal), but the
    traceback bits never leave the tiled (nb, L8, W, TB) layout and the
    position map is produced without the [L, B, W] transpose or the
    XLA gather-per-step walk."""
    B, L = reads.shape
    W = 2 * pad
    assert windows.shape[1] == L + W
    assert B % TB == 0, f"batch {B} not a multiple of {TB}"
    nb = B // TB
    L8 = ((L + SLAB - 1) // SLAB) * SLAB

    if L8 != L:
        reads = jnp.pad(reads, ((0, 0), (0, L8 - L)), constant_values=4)
        windows = jnp.pad(windows, ((0, 0), (0, L8 - L)),
                          constant_values=4)

    reads_t = reads.T.reshape(L8, nb, TB).swapaxes(0, 1)       # (nb,L8,TB)
    win_t = windows.T.reshape(L8 + W, nb, TB).swapaxes(0, 1)
    lens_t = rlens.reshape(nb, 1, TB)

    kernel = functools.partial(_kernel, L=L8, W=W)
    tb, score, bi, bb = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, L8, TB), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, L8 + W, TB), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, 1, TB), lambda t: (t, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, L8, W, TB), lambda t: (t, 0, 0, 0)),
            pl.BlockSpec((1, 1, TB), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, 1, TB), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, 1, TB), lambda t: (t, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, L8, W, TB), jnp.uint8),
            jax.ShapeDtypeStruct((nb, 1, TB), jnp.int32),
            jax.ShapeDtypeStruct((nb, 1, TB), jnp.int32),
            jax.ShapeDtypeStruct((nb, 1, TB), jnp.int32),
        ],
        interpret=interpret,
    )(reads_t, win_t, lens_t)

    g0_t = g0.astype(jnp.int32).reshape(nb, 1, TB)
    tbk = functools.partial(_tb_kernel, L=L8, W=W, pad=pad)
    pm = pl.pallas_call(
        tbk,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, L8, W, TB), lambda t: (t, 0, 0, 0)),
            pl.BlockSpec((1, 1, TB), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, 1, TB), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, 1, TB), lambda t: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, L8, TB), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nb, L8, TB), jnp.int32),
        interpret=interpret,
    )(tb, bi, bb, g0_t)
    # (nb, L8, TB) -> [B, L]
    pm_out = jnp.transpose(pm, (1, 0, 2)).reshape(L8, B).T[:, :L]
    return score.reshape(B), pm_out


def _dp_tiled(reads, rlens, windows, pad: int, interpret: bool):
    """Full DP (with traceback bits) in the tiled layout."""
    B, L = reads.shape
    W = 2 * pad
    nb = B // TB
    L8 = ((L + SLAB - 1) // SLAB) * SLAB
    if L8 != L:
        reads = jnp.pad(reads, ((0, 0), (0, L8 - L)), constant_values=4)
        windows = jnp.pad(windows, ((0, 0), (0, L8 - L)),
                          constant_values=4)
    reads_t = reads.T.reshape(L8, nb, TB).swapaxes(0, 1)
    win_t = windows.T.reshape(L8 + W, nb, TB).swapaxes(0, 1)
    lens_t = rlens.reshape(nb, 1, TB)
    kernel = functools.partial(_kernel, L=L8, W=W)
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, L8, TB), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, L8 + W, TB), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, 1, TB), lambda t: (t, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, L8, W, TB), lambda t: (t, 0, 0, 0)),
            pl.BlockSpec((1, 1, TB), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, 1, TB), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, 1, TB), lambda t: (t, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, L8, W, TB), jnp.uint8),
            jax.ShapeDtypeStruct((nb, 1, TB), jnp.int32),
            jax.ShapeDtypeStruct((nb, 1, TB), jnp.int32),
            jax.ShapeDtypeStruct((nb, 1, TB), jnp.int32),
        ],
        interpret=interpret,
    )(reads_t, win_t, lens_t)


def _traceback_tiled(tb, bi, bb, g0, L: int, pad: int, interpret: bool):
    """Row-sweep traceback over tiled tb bits -> pos_map [B, L]."""
    nb, L8, W, _ = tb.shape
    B = nb * TB
    tbk = functools.partial(_tb_kernel, L=L8, W=W, pad=pad)
    pm = pl.pallas_call(
        tbk,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, L8, W, TB), lambda t: (t, 0, 0, 0)),
            pl.BlockSpec((1, 1, TB), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, 1, TB), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, 1, TB), lambda t: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, L8, TB), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nb, L8, TB), jnp.int32),
        interpret=interpret,
    )(tb, bi.reshape(nb, 1, TB), bb.reshape(nb, 1, TB),
      g0.reshape(nb, 1, TB))
    return jnp.transpose(pm, (1, 0, 2)).reshape(L8, B).T[:, :L]


@functools.partial(jax.jit, static_argnames=("pad", "interpret"))
def banded_sw_posmap_fast(reads, rlens, windows, g0, pad: int,
                          smin=None, interpret: bool = False):
    """Two-pass DP with the gapless fast path.

    Pass 1 is a score-only DP (no traceback-bit HBM writes).  Lanes
    whose banded score equals the gapless best on the seed diagonal
    (most 100bp reads) get pos_map synthesized as one iota range.  The
    remaining lanes are compacted to the front (cheap input-row
    gathers — reads/windows, not the 300+ MB bit tensor) and re-run
    through the full DP + traceback on ceil(B/4) lanes.  If more lanes
    than that need traceback (indel-heavy batch), the full-lane pass
    runs instead — identical results either way, and identical to the
    CPU auto path (tested)."""
    B, L = reads.shape
    W = 2 * pad
    assert B % TB == 0
    nb = B // TB
    L8 = ((L + SLAB - 1) // SLAB) * SLAB

    readsp = reads
    windowsp = windows
    if L8 != L:
        readsp = jnp.pad(reads, ((0, 0), (0, L8 - L)), constant_values=4)
        windowsp = jnp.pad(windows, ((0, 0), (0, L8 - L)),
                           constant_values=4)
    reads_t = readsp.T.reshape(L8, nb, TB).swapaxes(0, 1)
    win_t = windowsp.T.reshape(L8 + W, nb, TB).swapaxes(0, 1)
    lens_t = rlens.reshape(nb, 1, TB)

    skern = functools.partial(_kernel_score, L=L8, W=W)
    score = pl.pallas_call(
        skern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, L8, TB), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, L8 + W, TB), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, 1, TB), lambda t: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, TB), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nb, 1, TB), jnp.int32),
        interpret=interpret,
    )(reads_t, win_t, lens_t)
    score_f = score.reshape(B)
    g0_i = g0.astype(jnp.int32)

    gb, gs, ge = gapless_diag(reads, rlens, windows, pad)
    need = score_f > gb
    if smin is not None:
        # sub-acceptance lanes are filtered downstream: synthesized
        # diagonal maps suffice, keeping the traceback set small
        need = need & (score_f >= smin)
    j = jnp.arange(L, dtype=jnp.int32)
    syn_on = (~need[:, None]) & (score_f > 0)[:, None] \
        & (j[None, :] >= gs[:, None]) & (j[None, :] <= ge[:, None])
    pm_syn = jnp.where(syn_on, g0_i[:, None] + j[None, :], -1)

    TOPT = max(TB, ((B // 4) + TB - 1) // TB * TB)
    n_need = jnp.sum(need.astype(jnp.int32))
    # lane permutation: traceback-needing lanes first (stable)
    _, perm = jax.lax.sort(
        ((~need).astype(jnp.int32), jnp.arange(B, dtype=jnp.int32)),
        num_keys=1, is_stable=True)

    def compact_path(_):
        sel = perm[:TOPT]
        sneed = need[sel]
        tb_c, _, bi_c, bb_c = _dp_tiled(
            reads[sel], jnp.where(sneed, rlens[sel], 0), windows[sel],
            pad, interpret)
        pm_c = _traceback_tiled(
            tb_c, jnp.where(sneed, bi_c.reshape(TOPT), 0),
            bb_c.reshape(TOPT), g0_i[sel], L, pad, interpret)
        upd = jnp.where(sneed[:, None], pm_c, pm_syn[sel])
        return pm_syn.at[sel].set(upd)

    def full_path(_):
        tb_a, _, bi_a, bb_a = _dp_tiled(reads, rlens, windows, pad,
                                        interpret)
        pm_f = _traceback_tiled(
            tb_a, jnp.where(need, bi_a.reshape(B), 0), bb_a.reshape(B),
            g0_i, L, pad, interpret)
        return jnp.where(need[:, None], pm_f, pm_syn)

    pm = jax.lax.cond(n_need <= TOPT, compact_path, full_path, 0)
    return score_f, pm
