"""Pallas TPU kernel: banded affine Smith-Waterman forward pass.

Hand-scheduled version of align_jax.sw_forward_meta for the Mosaic TPU
compiler: the band (128) sits on the VPU lane axis, 8 pairs on the sublane
axis, rows advance in a fori_loop with all state in registers/VMEM.  The
lane-wise prefix max needed for the E term is 7 shift-and-max steps
(log2(128)) built from pltpu.roll with edge masking.

Outputs per pair: best score, end coordinates, and NM carried along the
winning path (same metadata propagation as align_jax, scores tie-broken
identically within a row; across-row ties keep the earliest row).

Used for NM-only scoring call sites; validated against the host DP in
tests/test_pallas.py (interpret mode on CPU, compiled on TPU).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .align import GAP_EXT, GAP_OPEN, MATCH, MISMATCH

NEG = -20000
PAIR_BLOCK = 8  # pairs per grid step (sublane dimension)


def _lane_prefix_max(x, band: int):
    """Exclusive prefix max along the lane axis: out[:, j] = max_{j'<j} x[:, j'].

    log2(band) shift-and-max steps; lanes shifted in from the left are -inf.
    """
    lane = lax.broadcasted_iota(jnp.int32, x.shape, 1)
    # inclusive prefix max first
    acc = x
    shift = 1
    while shift < band:
        rolled = pltpu.roll(acc, shift, axis=1)
        rolled = jnp.where(lane >= shift, rolled, NEG)
        acc = jnp.maximum(acc, rolled)
        shift *= 2
    # exclusive: shift the inclusive result right by one lane
    excl = pltpu.roll(acc, 1, axis=1)
    return jnp.where(lane >= 1, excl, NEG)


def _sw_kernel(q_ref, t_ref, lo_ref, tlen_ref, out_ref, *, band: int, n_rows: int):
    """One grid step: PAIR_BLOCK pairs, full row scan."""
    B = PAIR_BLOCK
    lane = lax.broadcasted_iota(jnp.int32, (B, band), 1)
    tlen = tlen_ref[:, 0][:, None]  # (B, 1)

    def gather_rows(r):
        """t codes in each pair's band window at row r: (B, band)."""
        rows = []
        for i in range(B):
            start = lo_ref[i, r]
            rows.append(t_ref[i, pl.ds(start, band)])
        return jnp.stack(rows, axis=0)

    def shift_prev(arr, dl, fill):
        """out[:, j] = arr[:, j + dl_i] per pair (dl >= 0), fill beyond."""
        # dl is (B, 1); per-pair roll via select over the two common cases
        # (dl in {0, 1} almost always); general case uses a gather.
        src = lane + dl
        in_rng = src < band
        # roll left by dl: use jnp.take_along_axis (lowered as dynamic gather)
        taken = jnp.take_along_axis(arr, jnp.minimum(src, band - 1), axis=1)
        return jnp.where(in_rng, taken, fill)

    def body(r, carry):
        H, F, nmh, nmf, best_v, best_r, best_j, best_nm = carry
        qc = q_ref[:, r - 1][:, None]  # (B, 1)
        l = lo_ref[:, r][:, None]
        lprev = lo_ref[:, r - 1][:, None]
        dl = l - lprev
        cols = l + lane
        valid = cols < tlen
        tc = gather_rows(r)
        is_match = (tc == qc) & (qc < 4) & (tc < 4)
        s = jnp.where(is_match, MATCH, MISMATCH)

        Hup = shift_prev(H, dl, NEG)
        Fup = shift_prev(F, dl, NEG)
        nmh_up = shift_prev(nmh, dl, 0)
        nmf_up = shift_prev(nmf, dl, 0)

        srcd = lane + dl - 1
        d_in = (srcd >= 0) & (srcd < band)
        Hdiag = jnp.take_along_axis(H, jnp.clip(srcd, 0, band - 1), axis=1)
        nmd = jnp.take_along_axis(nmh, jnp.clip(srcd, 0, band - 1), axis=1)
        Hdiag = jnp.where(d_in, Hdiag, NEG)
        nmd = jnp.where(d_in, nmd, 0)
        left_edge = (srcd < 0) & (cols == 0)
        Hdiag = jnp.where(left_edge, 0, Hdiag)
        nmd = jnp.where(left_edge, 0, nmd)

        from_h = (Hup - GAP_OPEN) >= Fup
        Fr = jnp.maximum(jnp.maximum(Hup - GAP_OPEN, Fup) - GAP_EXT, NEG)
        nmf_n = jnp.where(from_h, nmh_up, nmf_up) + 1

        diag_v = Hdiag + s
        Gr = jnp.maximum(jnp.maximum(0, diag_v), Fr)
        g_zero = Gr == 0
        g_f = (~g_zero) & (Gr == Fr)
        nmg = jnp.where(g_zero, 0, jnp.where(g_f, nmf_n, nmd + (~is_match).astype(jnp.int32)))

        # E via lane prefix max of packed (G + e*j, j)
        packed = ((Gr + 32768) << 8) | lane
        pmax = _lane_prefix_max(packed, band)
        best_val = (pmax >> 8) - 32768
        bj = pmax & 0xFF
        Er = jnp.maximum(best_val - GAP_OPEN - GAP_EXT * (lane - bj), NEG)
        Er = jnp.where(lane == 0, NEG, Er)
        nme = jnp.take_along_axis(nmg, bj, axis=1) + (lane - bj)

        use_g = Gr >= Er
        Hr = jnp.where(use_g, Gr, Er)
        nmh_n = jnp.where(use_g, nmg, nme)
        Hr = jnp.where(valid, Hr, NEG)

        # per-lane running best over rows (strictly greater -> earliest row)
        better = Hr > best_v
        best_v = jnp.where(better, Hr, best_v)
        best_r = jnp.where(better, r, best_r)
        best_j = jnp.where(better, cols + 1, best_j)  # exclusive target end
        best_nm = jnp.where(better, nmh_n, best_nm)
        return Hr, Fr, nmh_n, nmf_n, best_v, best_r, best_j, best_nm

    zero = jnp.zeros((B, band), jnp.int32)
    init = (zero, zero + NEG, zero, zero, zero, zero, zero, zero)
    H, F, nmh, nmf, best_v, best_r, best_j, best_nm = lax.fori_loop(1, n_rows + 1, body, init)

    # reduce across lanes: max value; ties -> earliest row, then lowest lane
    # (tb is unique per lane, so exactly one lane is chosen per pair)
    tb = (n_rows - best_r) * (band + 1) + (band - lane)
    vmax = jnp.max(best_v, axis=1, keepdims=True)
    is_best = best_v == vmax
    tb_masked = jnp.where(is_best, tb, -1)
    tbmax = jnp.max(tb_masked, axis=1, keepdims=True)
    chosen = is_best & (tb_masked == tbmax)

    def pick_val(x):
        return jnp.sum(jnp.where(chosen, x, 0), axis=1)

    out_ref[:, 0] = pick_val(best_v)
    out_ref[:, 1] = pick_val(best_r)  # query end (exclusive)
    out_ref[:, 2] = pick_val(best_j)  # target end (exclusive)
    out_ref[:, 3] = pick_val(best_nm)


@partial(jax.jit, static_argnames=("band", "interpret"))
def sw_forward_pallas(q, t, lo, tlens, band: int = 128, interpret: bool = False):
    """Batched forward scoring: q (B, Lq) int32, t (B, Lt) int32,
    lo (B, Lq+1) int32, tlens (B,) int32 with B % 8 == 0.
    Returns (B, 4) int32: [score, q_end, t_end, nm]."""
    B, Lq = q.shape
    Lt = t.shape[1]
    assert B % PAIR_BLOCK == 0
    grid = (B // PAIR_BLOCK,)
    kernel = partial(_sw_kernel, band=band, n_rows=Lq)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((PAIR_BLOCK, Lq), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PAIR_BLOCK, Lt), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PAIR_BLOCK, Lq + 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PAIR_BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((PAIR_BLOCK, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 4), jnp.int32),
        interpret=interpret,
    )(q, t, lo, tlens[:, None].astype(jnp.int32))
