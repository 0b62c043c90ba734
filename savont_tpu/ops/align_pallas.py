"""Pallas TPU kernel: banded affine Smith-Waterman forward pass.

Mosaic-friendly layout: PAIRS on the lane axis (128 per grid block), the
BAND on the sublane axis.  With smooth_lo band offsets (per-row advance in
{0,1}, see align_jax.smooth_lo) every previous-row access is a STATIC
sublane shift, the per-row target column stream is pre-gathered outside the
kernel, and the E-term prefix max runs as log2(band) static roll-and-select
steps with metadata riding along — the kernel contains no dynamic lane or
sublane indexing at all.

Outputs per pair: best score, end coordinates, NM (same path-metadata
propagation and tie-breaking as align_jax.sw_forward_meta / the host DP).
Validated in interpret mode (tests/test_pallas.py) and compiled on TPU.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .jax_init import ensure_jax_cache

ensure_jax_cache()

from .align import GAP_EXT, GAP_OPEN, MATCH, MISMATCH

import os as _os

NEG = -20000
PAIR_BLOCK = 128  # pairs per grid step (lane dimension)
# rows per fori_loop iteration (row count host-padded to a multiple);
# SAVONT_PALLAS_UNROLL overrides for experiments
UNROLL = int(_os.environ.get("SAVONT_PALLAS_UNROLL", "8"))

# DP plane dtype.  int16 would double VPU lane throughput and every in-loop
# quantity fits for amplicon lengths, and the kernel fully supports it
# (interpret-mode parity pinned by tests) — but the CURRENT libtpu Mosaic
# backend cannot legalize 16-bit integer vector ops on v5e: measured on
# chip 2026-08-19 via scripts/pallas_probe_i16ops.py — arith.maxsi/cmpi on
# vector<...xi16> "failed to legalize", tpu.dynamic_rotate is 32-bit-only
# (bitcast word-rolls work: scripts/pallas_probe_bitcast.py), and (1,128)
# i1 broadcasts hit "Invalid relayout".  SAVONT_PALLAS_I16=1 re-enables the
# int16 planes for newer stacks; default stays int32.


def _plane_dtype(Lq: int, Lt: int):
    if not _os.environ.get("SAVONT_PALLAS_I16") or _os.environ.get("SAVONT_PALLAS_I32"):
        return jnp.int32
    # < 29000: row/col indices (incl. UNROLL padding) must stay below the
    # 30000 winner-reduce sentinel, scores below int16 range
    fits = MATCH * min(Lq, Lt) < 29000 and max(Lq, Lt) + UNROLL + 2 < 29000
    return jnp.int16 if fits else jnp.int32


def _roll_sub(x, k: int, interpret: bool = False):
    """Static sublane roll: out[j, :] = x[(j - k) % band, :].

    pltpu.roll lowers to tpu.dynamic_rotate, which Mosaic only implements
    for 32-bit lanes.  int16 planes roll through the packed i32 bitcast
    view: even shifts are word rolls; odd shifts add one halfword step
    ((w << 16) | (roll(w,1) >> 16) — pairing lo-half-of-word-m == sublane
    2m, verified ON CHIP by scripts/pallas_probe_bitcast.py on v5e).
    Interpret mode uses a plain concat (bitcast packing is hardware-defined)."""
    k = k % x.shape[0]
    if k == 0:
        return x
    if x.dtype == jnp.int32:
        return pltpu.roll(x, k, axis=0)
    if interpret:
        return jnp.concatenate([x[-k:], x[:-k]], axis=0)
    w = pltpu.bitcast(x, jnp.int32)
    if k % 2 == 0:
        return pltpu.bitcast(pltpu.roll(w, k // 2, axis=0), jnp.int16)
    w2 = pltpu.roll(w, (k - 1) // 2, axis=0) if k > 1 else w
    y = (w2 << 16) | lax.shift_right_logical(pltpu.roll(w2, 1, axis=0), 16)
    return pltpu.bitcast(y, jnp.int16)


def _sub_shift_down(x, fill, interpret: bool = False):
    """out[j, :] = x[j-1, :] (shift toward larger sublane index)."""
    rolled = _roll_sub(x, 1, interpret)
    # build the edge mask at x's bitwidth: an i1 mask produced by an i32
    # compare carries a 32-bit tile layout, and Mosaic cannot relayout it
    # to select between 16-bit vectors
    row = lax.broadcasted_iota(jnp.int32, x.shape, 0).astype(x.dtype)
    return jnp.where(row >= 1, rolled, fill)


def _sub_shift_up(x, fill, interpret: bool = False):
    """out[j, :] = x[j+1, :]."""
    band = x.shape[0]
    rolled = _roll_sub(x, band - 1, interpret)
    row = lax.broadcasted_iota(jnp.int32, x.shape, 0).astype(x.dtype)
    return jnp.where(row <= band - 2, rolled, fill)


def _sub_shift_up2(x, fill, interpret: bool = False):
    """out[j, :] = x[j+2, :] (the dl=2 band-advance shift)."""
    band = x.shape[0]
    rolled = _roll_sub(x, band - 2, interpret)
    row = lax.broadcasted_iota(jnp.int32, x.shape, 0).astype(x.dtype)
    return jnp.where(row <= band - 3, rolled, fill)


def _prepare_streams(q, t, lo, tlens, band):
    """XLA/host-side pre-gather: per-row incoming target codes (the band
    column band-1 code for each row) and the initial window t[lo0:lo0+band)
    per pair.  lo must be smooth (increments in {0,1}, see smooth_lo)."""
    B, Lq = q.shape
    lo = np.asarray(lo, dtype=np.int32)
    t = np.asarray(t)
    Lt = t.shape[1]
    new_cols = np.minimum(lo[:, 1:] + band - 1, Lt - 1)  # (B, Lq)
    new_codes = np.take_along_axis(t, new_cols, axis=1)
    iw_cols = np.minimum(lo[:, :1] + np.arange(band)[None, :], Lt - 1)
    init_win = np.take_along_axis(t, iw_cols, axis=1)
    return lo, new_codes, init_win


def _pallas_call_traced(q_rows, new_rows, dl_rows, locur_rows, tlen_row, init_win, band: int, interpret: bool, plane_i16: bool = False, emit_payload: bool = False, new2_rows=None):
    Lq = q_rows.shape[0]
    P_total = q_rows.shape[1]
    grid = (P_total // PAIR_BLOCK,)
    has_new2 = new2_rows is not None

    # row streams are int32 and consumed as (UNROLL, P) chunk loads at
    # provably-UNROLL-aligned offsets: per-row DYNAMIC single-row loads
    # dominated the kernel (band 64 -> 32 only changed time ~10%, measured
    # on v5e), and Mosaic requires 8-row alignment for sub-32-bit refs.
    # dl/locur replace the lo ref so no row needs two adjacent lo reads.
    # new2_rows (optional) carries the SECOND incoming target code per row
    # (column band-2) and enables exact dl=2 band advances — the d2 shift
    # selects only compile in when the stream is present.
    def kernel(q_ref, new_ref, dl_ref, locur_ref, tlen_ref, iw_ref, *rest):
        if has_new2:
            new2_ref, out_ref, *pay = rest
        else:
            new2_ref = None
            out_ref, *pay = rest
        _sw_kernel_with_init(
            q_ref, new_ref, dl_ref, locur_ref, tlen_ref, iw_ref, out_ref,
            band=band, n_rows=Lq, plane_i16=plane_i16, interpret=interpret,
            pay_ref=pay[0] if pay else None, new2_ref=new2_ref,
        )

    out_specs = pl.BlockSpec((4, PAIR_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((4, P_total), jnp.int32)
    if emit_payload:
        # traceback decision payload, FOUR rows packed per i32 word (no
        # sub-32-bit vector ops anywhere; the XLA walk unpacks bytes)
        out_specs = (out_specs, pl.BlockSpec(
            (Lq // 4, band, PAIR_BLOCK), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        ))
        out_shape = (out_shape, jax.ShapeDtypeStruct((Lq // 4, band, P_total), jnp.int32))

    # the payload output block (Lq/4 x band x PAIR_BLOCK i32) pushes the
    # Mosaic scoped-VMEM footprint past the 16 MB default on v5e (measured
    # 23.7 MB at Lq=1512/band=48); the chip has 128 MB VMEM, so raise the
    # kernel's limit rather than shrinking the lane block
    params = (
        pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
        if emit_payload else None
    )
    in_specs = [
        pl.BlockSpec((Lq, PAIR_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((Lq, PAIR_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((Lq, PAIR_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((Lq, PAIR_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, PAIR_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((band, PAIR_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    args = [q_rows, new_rows, dl_rows, locur_rows, tlen_row, init_win]
    if has_new2:
        in_specs.append(
            pl.BlockSpec((Lq, PAIR_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)
        )
        args.append(new2_rows)
    return pl.pallas_call(
        kernel,
        grid=grid,
        compiler_params=params,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)


_pallas_call = jax.jit(_pallas_call_traced, static_argnames=("band", "interpret", "plane_i16", "emit_payload"))


def sw_forward_pallas_traced(q, t, lo, tlens, band: int, interpret: bool = False):
    """Traced Pallas forward for use INSIDE jit/shard_map (the mesh stage-7
    step): q (B, Lq) / t (B, Lt) / lo (B, Lq+1) / tlens (B,) device arrays.
    lo must ALREADY be smooth (increments in {0,1} — mesh_stage7_tie_break
    smooths host-side).  Returns {score, q_end, t_end, nm}, each (B,) i32 —
    the sw_forward_meta fields the tie-break consumes, with identical values
    on smooth bands (both kernels are tested against the host DP)."""
    B, Lq = q.shape
    Lt = t.shape[1]
    Lq4 = ((Lq + UNROLL - 1) // UNROLL) * UNROLL
    if Lq4 != Lq:
        q = jnp.pad(q, ((0, 0), (0, Lq4 - Lq)), constant_values=5)
        lo = jnp.pad(lo, ((0, 0), (0, Lq4 - Lq)), mode="edge")
    new_cols = jnp.minimum(lo[:, 1:] + band - 1, Lt - 1)
    new_codes = jnp.take_along_axis(t, new_cols, axis=1)
    iw_cols = jnp.minimum(lo[:, :1] + jnp.arange(band, dtype=lo.dtype)[None, :], Lt - 1)
    init_win = jnp.take_along_axis(t, iw_cols, axis=1)
    P = ((B + PAIR_BLOCK - 1) // PAIR_BLOCK) * PAIR_BLOCK
    if P != B:
        pad = P - B
        q = jnp.pad(q, ((0, pad), (0, 0)), constant_values=5)
        new_codes = jnp.pad(new_codes, ((0, pad), (0, 0)))
        lo = jnp.pad(lo, ((0, pad), (0, 0)))
        init_win = jnp.pad(init_win, ((0, pad), (0, 0)), constant_values=6)
        tlens = jnp.pad(tlens, (0, pad))
    dl = lo[:, 1:] - lo[:, :-1]  # (B, Lq) row-advance stream
    locur = lo[:, 1:]            # (B, Lq): lo[r] for row r = 1..Lq
    out = _pallas_call_traced(
        q.T.astype(jnp.int32),
        new_codes.T.astype(jnp.int32),
        dl.T.astype(jnp.int32),
        locur.T.astype(jnp.int32),
        tlens.astype(jnp.int32)[None, :],
        init_win.T.astype(jnp.int32),
        band=band,
        interpret=interpret,
        plane_i16=_plane_dtype(int(Lq), int(Lt)) == jnp.int16,
    )
    return {
        "score": out[0, :B],
        "q_end": out[1, :B],
        "t_end": out[2, :B],
        "nm": out[3, :B],
    }


def sw_payload_pallas_traced(q, t, lo, tlens, band: int, interpret: bool = False):
    """Traced Pallas PAYLOAD forward for use inside jit/shard_map (the mesh
    stage-4 pileup step): q (B, Lq) / t (B, Lt) / lo (B, Lq+1) / tlens (B,)
    device arrays.  Returns (payload (B, Lq4*band) i32 bytes, lo_pad
    (B, Lq4+1) i32, score, ri, bj) for align_jax.sw_traceback_from_payload
    / _pileup_counts_from_payload.  EXACT on corridors with advances <= 2
    per row (the new2 stream + static shift-by-2 selects); callers gate
    larger jumps to the XLA barrel-shift forward.  Lq is padded to a
    multiple of 128 rows (inert dl=0/qc=5 rows) so the number of distinct
    Mosaic shapes stays bounded across panels."""
    B, Lq = q.shape
    Lt = t.shape[1]
    Lq4 = -(-Lq // 128) * 128
    if Lq4 != Lq:
        q = jnp.pad(q, ((0, 0), (0, Lq4 - Lq)), constant_values=5)
        lo = jnp.pad(lo, ((0, 0), (0, Lq4 - Lq)), mode="edge")
    new_cols = jnp.minimum(lo[:, 1:] + band - 1, Lt - 1)
    new_codes = jnp.take_along_axis(t, new_cols, axis=1)
    new2_cols = jnp.minimum(lo[:, 1:] + band - 2, Lt - 1)
    new2_codes = jnp.take_along_axis(t, new2_cols, axis=1)
    iw_cols = jnp.minimum(lo[:, :1] + jnp.arange(band, dtype=lo.dtype)[None, :], Lt - 1)
    init_win = jnp.take_along_axis(t, iw_cols, axis=1)
    P = ((B + PAIR_BLOCK - 1) // PAIR_BLOCK) * PAIR_BLOCK
    if P != B:
        pad = P - B
        q = jnp.pad(q, ((0, pad), (0, 0)), constant_values=5)
        new_codes = jnp.pad(new_codes, ((0, pad), (0, 0)))
        new2_codes = jnp.pad(new2_codes, ((0, pad), (0, 0)))
        lo = jnp.pad(lo, ((0, pad), (0, 0)))
        init_win = jnp.pad(init_win, ((0, pad), (0, 0)), constant_values=6)
        tlens = jnp.pad(tlens, (0, pad))
    dl = lo[:, 1:] - lo[:, :-1]
    locur = lo[:, 1:]
    out, pay_words = _pallas_call_traced(
        q.T.astype(jnp.int32),
        new_codes.T.astype(jnp.int32),
        dl.T.astype(jnp.int32),
        locur.T.astype(jnp.int32),
        tlens.astype(jnp.int32)[None, :],
        init_win.T.astype(jnp.int32),
        band=band, interpret=interpret, plane_i16=False, emit_payload=True,
        new2_rows=new2_codes.T.astype(jnp.int32),
    )
    score, ri, t_end = out[0], out[1], out[2]
    lo32 = lo.astype(jnp.int32)
    lo_ri = jnp.take_along_axis(lo32, jnp.clip(ri, 0, Lq4)[:, None], axis=1)[:, 0]
    bj = jnp.where(score > 0, t_end - 1 - lo_ri, 0)
    w = jnp.transpose(pay_words, (2, 0, 1))  # (P, W, band)
    bts = jnp.stack([(w >> (8 * k)) & 0xFF for k in range(4)], axis=2)
    payload = bts.reshape(w.shape[0], Lq4 * band)
    return payload[:B], lo32[:B], score[:B], ri[:B], bj[:B]


def _sw_kernel_with_init(q_ref, new_ref, dl_ref, locur_ref, tlen_ref, iw_ref, out_ref, *, band, n_rows, plane_i16=False, interpret=False, pay_ref=None, new2_ref=None):
    """Wrapper passing the initial window from a dedicated input ref.
    Row streams (q / new-code / dl / lo-cur) are int32, loaded as one
    (UNROLL, P) chunk per outer iteration at a provably-aligned offset —
    per-row dynamic single-row loads dominated the kernel (band 64 -> 32
    moved time ~10% on v5e).  The (band, P) DP planes run in int16 when
    plane_i16 (2x VPU lane width; blocked on current libtpu, see
    _plane_dtype); the final winner reduce is int32 either way."""
    P = PAIR_BLOCK
    pd = jnp.int16 if plane_i16 else jnp.int32
    jrow = lax.broadcasted_iota(jnp.int32, (band, P), 0).astype(pd)
    tlen = tlen_ref[0, :][None, :].astype(pd)
    # loop-invariant roll-validity masks for the E prefix scan
    scan_masks = {}
    shift = 1
    while shift < band:
        scan_masks[shift] = jrow >= shift
        shift *= 2

    def body(r, rows, carry):
        """One DP row.  r: traced row number (for best_r); rows: the
        statically-sliced (1, P) int32 q/new/dl/locur rows of this step."""
        q_row, new_row, dl_row, lo_row = rows[:4]
        new2_row = rows[4] if len(rows) > 4 else None
        H, F, nmh, nmf, win, best_v, best_r, best_j, best_nm = carry
        # broadcast VALUES to full (band, P) shape BEFORE any comparison:
        # comparing a (1, P) row produces a (1, P) i1 whose broadcast to
        # (band, P) is a mask relayout Mosaic lacks for 16-bit planes —
        # broadcasting the value first keeps every mask full-layout
        qc = jnp.broadcast_to(q_row, (band, P)).astype(pd)
        dl_full = jnp.broadcast_to(dl_row, (band, P)).astype(pd)
        d1 = dl_full == 1
        # dl=2 support (new2_ref present): the same static-shift scheme one
        # row deeper — shift-by-2 variants selected where dl==2, exactly the
        # XLA barrel-shift semantics (align_jax._forward_payload) for dl=2.
        d2 = (dl_full == 2) if new2_row is not None else None
        cols = jnp.broadcast_to(lo_row, (band, P)).astype(pd) + jrow
        valid = cols < tlen

        new_code = jnp.broadcast_to(new_row, (band, P)).astype(pd)
        shifted = _sub_shift_up(win, 0, interpret)
        shifted = jnp.where(jrow == band - 1, new_code, shifted)
        if d2 is not None:
            new2_code = jnp.broadcast_to(new2_row, (band, P)).astype(pd)
            shifted2 = _sub_shift_up2(win, 0, interpret)
            shifted2 = jnp.where(jrow == band - 2, new2_code, shifted2)
            shifted2 = jnp.where(jrow == band - 1, new_code, shifted2)
            win = jnp.where(d2, shifted2, jnp.where(d1, shifted, win))
        else:
            win = jnp.where(d1, shifted, win)
        tc = win

        is_match = (tc == qc) & (qc < 4) & (tc < 4)
        s = jnp.where(is_match, jnp.asarray(MATCH, pd), jnp.asarray(MISMATCH, pd))

        def up(a, fill):
            base = jnp.where(d1, _sub_shift_up(a, fill, interpret), a)
            if d2 is not None:
                base = jnp.where(d2, _sub_shift_up2(a, fill, interpret), base)
            return base

        def diag(a, fill):
            base = jnp.where(d1, a, _sub_shift_down(a, fill, interpret))
            if d2 is not None:
                base = jnp.where(d2, _sub_shift_up(a, fill, interpret), base)
            return base

        Hup, Fup = up(H, NEG), up(F, NEG)
        nmh_up, nmf_up = up(nmh, 0), up(nmf, 0)
        Hdiag, nmd = diag(H, NEG), diag(nmh, 0)
        left_edge = (~d1) & (jrow == 0) & (cols == 0)
        Hdiag = jnp.where(left_edge, 0, Hdiag)
        nmd = jnp.where(left_edge, 0, nmd)

        from_h = (Hup - GAP_OPEN) >= Fup
        Fr = jnp.maximum(jnp.maximum(Hup - GAP_OPEN, Fup) - GAP_EXT, NEG)
        nmf_n = jnp.where(from_h, nmh_up, nmf_up) + 1

        Gr = jnp.maximum(jnp.maximum(0, Hdiag + s), Fr)
        g_zero = Gr == 0
        g_f = (~g_zero) & (Gr == Fr)
        nmg = jnp.where(g_zero, 0, jnp.where(g_f, nmf_n, nmd + (~is_match).astype(pd)))

        sv = Gr + GAP_EXT * jrow
        sm = nmg - jrow
        shift = 1
        while shift < band:
            rv = _roll_sub(sv, shift, interpret)
            rm = _roll_sub(sm, shift, interpret)
            rv = jnp.where(scan_masks[shift], rv, NEG)
            take_cur = sv >= rv
            sv = jnp.where(take_cur, sv, rv)
            sm = jnp.where(take_cur, sm, rm)
            shift *= 2
        run_v = _sub_shift_down(sv, NEG, interpret)
        run_m = _sub_shift_down(sm, 0, interpret)
        Er = jnp.maximum(run_v - GAP_OPEN - GAP_EXT * jrow, NEG)
        Er = jnp.where(jrow == 0, NEG, Er)
        nme = run_m + jrow

        use_g = Gr >= Er
        Hr = jnp.where(use_g, Gr, Er)
        nmh_n = jnp.where(use_g, nmg, nme)
        Hr = jnp.where(valid, Hr, NEG)

        pay = None
        if pay_ref is not None:
            # traceback decision bits (the align_jax._forward_payload
            # layout): bit0 use_g, bit1 g_zero, bit2 g_f, bit3 exitE
            # (E exits to G at j-1), bit4 from_h, bit5 mismatch
            exitE = Er == (_sub_shift_down(Gr, NEG, interpret) - (GAP_OPEN + GAP_EXT))
            one = jnp.asarray(1, jnp.int32)
            zero32 = jnp.asarray(0, jnp.int32)
            pay = (
                jnp.where(use_g, one, zero32)
                | (jnp.where(g_zero, one, zero32) << 1)
                | (jnp.where(g_f, one, zero32) << 2)
                | (jnp.where(exitE, one, zero32) << 3)
                | (jnp.where(from_h, one, zero32) << 4)
                | (jnp.where(is_match, zero32, one) << 5)
            )

        # plane-carried running best: one compare + four selects per row
        # instead of per-row cross-sublane reductions (max/min/sum shuffle
        # trees); the single lexicographic reduce happens after the loop.
        # Strict > at fixed j records the EARLIEST row hitting that plane's
        # max, which the final (max v, min row, min j) reduce needs.
        better = Hr > best_v
        best_v = jnp.where(better, Hr, best_v)
        best_r = jnp.where(better, lax.convert_element_type(r, pd), best_r)
        best_j = jnp.where(better, cols + 1, best_j)
        best_nm = jnp.where(better, nmh_n, best_nm)
        return (Hr, Fr, nmh_n, nmf_n, win, best_v, best_r, best_j, best_nm), pay

    zero = jnp.zeros((band, P), pd)
    init = (zero, zero + NEG, zero, zero, iw_ref[:, :].astype(pd), zero, zero, zero, zero)
    # manual multi-row step (Mosaic's fori_loop cannot partially unroll):
    # carries stay in vector registers across the UNROLL rows of one
    # iteration, and the four row streams are loaded as ONE (UNROLL, P)
    # chunk each at base = (i-1)*UNROLL — provably UNROLL-aligned, so the
    # loads are plain vector loads; rows come off the chunks as STATIC
    # slices.  n_rows is host-padded to a multiple of UNROLL with dl=0 /
    # qc=5 rows, which can never update the running best (strict-> update;
    # see sw_forward_pallas).
    def outer(i, carry):
        base = (i - 1) * UNROLL
        qch = q_ref[pl.ds(base, UNROLL), :]
        nch = new_ref[pl.ds(base, UNROLL), :]
        dch = dl_ref[pl.ds(base, UNROLL), :]
        lch = locur_ref[pl.ds(base, UNROLL), :]
        n2ch = new2_ref[pl.ds(base, UNROLL), :] if new2_ref is not None else None
        pays = []
        for u in range(UNROLL):
            rows = (qch[u][None, :], nch[u][None, :], dch[u][None, :], lch[u][None, :])
            if n2ch is not None:
                rows = rows + (n2ch[u][None, :],)
            carry, pay = body(base + u + 1, rows, carry)
            if pay_ref is not None:
                pays.append(pay)
        if pay_ref is not None:
            # FOUR payload bytes packed per i32 word (rows base..base+3 in
            # bits 0..7, 8..15, ...), stored as one aligned chunk per outer
            # iteration — no sub-32-bit vector ops, no dynamic single-row
            # stores
            words = [
                pays[w * 4]
                | (pays[w * 4 + 1] << 8)
                | (pays[w * 4 + 2] << 16)
                | (pays[w * 4 + 3] << 24)
                for w in range(UNROLL // 4)
            ]
            pay_ref[pl.ds(base // 4, UNROLL // 4), :, :] = jnp.stack(words, axis=0)
        return carry

    H, F, nmh, nmf, win, best_v, best_r, best_j, best_nm = lax.fori_loop(
        1, n_rows // UNROLL + 1, outer, init
    )

    # lexicographic winner across the band planes: max value, then earliest
    # row, then lowest j — exactly the sequential rule (strict > per row;
    # leftmost j within the winning row).  A value seen at row r' < r_j at
    # plane j would have made that plane's recorded row r' instead, so
    # min-row-among-max-value is the first row reaching the global max.
    # Stays in the plane dtype end-to-end (i32 only at the out_ref writes):
    # mixing 16- and 32-bit-born i1 masks forces relayouts Mosaic lacks.
    # masks stay at the plane bitwidth (mixing 16- and 32-bit-born i1s
    # forces relayouts Mosaic lacks); cross-sublane REDUCTIONS run on i32
    # copies (Pallas has no i16 reductions), results cast back for compares.
    # sentinel above any row index: int16 planes are guarded to < 29000
    # rows by _plane_dtype; int32 planes keep the wide sentinel so long
    # queries (operon mode) stay correct
    big = jnp.asarray(30000 if pd == jnp.int16 else (1 << 30), pd)
    zero_pd = jnp.asarray(0, pd)
    glob_v = jnp.max(best_v.astype(jnp.int32), axis=0, keepdims=True)
    at_v = best_v == glob_v.astype(pd)
    glob_r = jnp.min(
        jnp.where(at_v, best_r, big).astype(jnp.int32), axis=0, keepdims=True
    )
    at_r = at_v & (best_r == glob_r.astype(pd))
    win_j = jnp.min(
        jnp.where(at_r, jrow, jnp.asarray(band, pd)).astype(jnp.int32),
        axis=0, keepdims=True,
    )
    winner = at_r & (jrow == win_j.astype(pd))
    out_ref[0, :] = glob_v[0, :]
    out_ref[1, :] = jnp.where(glob_v > 0, glob_r, 0)[0, :]
    out_ref[2, :] = jnp.sum(jnp.where(winner, best_j, zero_pd).astype(jnp.int32), axis=0)
    out_ref[3, :] = jnp.sum(jnp.where(winner, best_nm, zero_pd).astype(jnp.int32), axis=0)


def sw_forward_pallas(q, t, lo, tlens, band: int = 128, interpret: bool = False):
    """Batched forward scoring (host-facing): q (B, Lq) int32, t (B, Lt),
    lo (B, Lq+1) smooth band offsets, tlens (B,).  B padded to 128.
    Returns np.ndarray (B, 4): [score, q_end, t_end, nm].
    lo is smoothed internally (increments forced into {0,1})."""
    from .align_jax import smooth_lo

    q = np.asarray(q)
    t = np.asarray(t)
    lo = smooth_lo(np.asarray(lo, dtype=np.int32))
    B, Lq = q.shape
    P = ((B + PAIR_BLOCK - 1) // PAIR_BLOCK) * PAIR_BLOCK
    if P != B:
        q = np.concatenate([q, np.full((P - B, Lq), 5, q.dtype)])
        t = np.concatenate([t, np.full((P - B, t.shape[1]), 6, t.dtype)])
        lo = np.concatenate([lo, np.zeros((P - B, lo.shape[1]), lo.dtype)])
        tlens = np.concatenate([np.asarray(tlens), np.zeros(P - B, np.int32)])
    lo2, new_codes, init_win = _prepare_streams(q, t, lo, tlens, band)
    # pad the row count to a multiple of UNROLL with inert rows: qc=5 never
    # matches, dl=0 keeps the window static, and the running best cannot be
    # updated (every padded-row H is strictly below the carried best; the
    # update is strict >), so results are identical to the unpadded loop
    Lq4 = ((Lq + UNROLL - 1) // UNROLL) * UNROLL
    if Lq4 != Lq:
        pad = Lq4 - Lq
        q = np.concatenate([q, np.full((q.shape[0], pad), 5, q.dtype)], axis=1)
        new_codes = np.concatenate(
            [new_codes, np.zeros((new_codes.shape[0], pad), new_codes.dtype)], axis=1
        )
        lo2 = np.concatenate([lo2, np.repeat(lo2[:, -1:], pad, axis=1)], axis=1)
    dl = lo2[:, 1:] - lo2[:, :-1]
    locur = lo2[:, 1:]
    out = _pallas_call(
        jnp.asarray(q.T, jnp.int32),
        jnp.asarray(new_codes.T, jnp.int32),
        jnp.asarray(dl.T, np.int32),
        jnp.asarray(locur.T, np.int32),
        jnp.asarray(np.asarray(tlens, np.int32)[None, :]),
        jnp.asarray(init_win.T, jnp.int32),
        band=band,
        interpret=interpret,
        plane_i16=_plane_dtype(int(Lq), int(t.shape[1])) == jnp.int16,
    )
    return np.asarray(out).T[:B]


@partial(jax.jit, static_argnames=("band", "ops_max", "maxrun", "interpret"))
def _pallas_tb_combined(q_rows, new_rows, dl_rows, locur_rows, tlen_row, init_win,
                        lo_pad, new2_rows, band: int, ops_max: int, maxrun: int,
                        interpret: bool):
    """Pallas payload forward + XLA walk + RLE in one jit (one dispatch).
    new2_rows enables exact dl<=2 raw-band corridors in the Mosaic forward."""
    from .align_jax import sw_traceback_from_payload

    out, pay_words = _pallas_call_traced(
        q_rows, new_rows, dl_rows, locur_rows, tlen_row, init_win,
        band=band, interpret=interpret, plane_i16=False, emit_payload=True,
        new2_rows=new2_rows,
    )
    score = out[0]
    ri = out[1]
    t_end = out[2]
    Lq4 = lo_pad.shape[1] - 1
    lo_ri = jnp.take_along_axis(
        lo_pad, jnp.clip(ri, 0, Lq4)[:, None], axis=1
    )[:, 0]
    bj = jnp.where(score > 0, t_end - 1 - lo_ri, 0)
    # unpack: words (W, band, P) -> payload rows (P, Lq4*band); reshape of
    # the (W, 4, band) byte stack flattens to row-major (row, band) exactly
    w = jnp.transpose(pay_words, (2, 0, 1))  # (P, W, band)
    bts = jnp.stack([(w >> (8 * k)) & 0xFF for k in range(4)], axis=2)
    payload = bts.reshape(w.shape[0], Lq4 * band)
    return sw_traceback_from_payload(payload, lo_pad, score, ri, bj, band, ops_max, maxrun)


def _pack_jobs_pallas_streams(cjobs, band: int):
    """Pack AlignJobs into the kernel's row-stream layout: (q_rows, new_rows,
    dl_rows, locur_rows, tlen_row, init_win, lo2, Lt) — pairs padded to a
    PAIR_BLOCK multiple, rows to an UNROLL multiple (inert qc=5/dl=0 rows)."""
    from .align_jax import _pack_jobs

    q, t, lo, tlens = _pack_jobs(cjobs, band)
    # pad dims to multiples of 128 rows / 256 target cols: bounds the number
    # of distinct Mosaic shapes across buckets (each costs a multi-minute
    # remote compile on the dev rig)
    Lqp = -(-q.shape[1] // 128) * 128
    Ltp = -(-t.shape[1] // 256) * 256
    if Lqp > q.shape[1]:
        lo = np.pad(lo, ((0, 0), (0, Lqp - lo.shape[1] + 1)), mode="edge")
        q = np.pad(q, ((0, 0), (0, Lqp - q.shape[1])), constant_values=5)
    if Ltp > t.shape[1]:
        t = np.pad(t, ((0, 0), (0, Ltp - t.shape[1])), constant_values=6)
    B = q.shape[0]
    P = ((B + PAIR_BLOCK - 1) // PAIR_BLOCK) * PAIR_BLOCK
    if P != B:
        q = np.concatenate([q, np.full((P - B, q.shape[1]), 5, q.dtype)])
        t = np.concatenate([t, np.full((P - B, t.shape[1]), 6, t.dtype)])
        lo = np.concatenate([lo, np.zeros((P - B, lo.shape[1]), lo.dtype)])
        tlens = np.concatenate([tlens, np.full(P - B, t.shape[1], tlens.dtype)])
    lo2, new_codes, init_win = _prepare_streams(q, t, lo, tlens, band)
    # second incoming code per row (column band-2), consumed only where
    # dl==2 — the raw-band kernel path (jumps up to 2 per row)
    Lt_full = t.shape[1]
    new2_cols = np.minimum(lo2[:, 1:] + band - 2, Lt_full - 1)
    new2_codes = np.take_along_axis(np.asarray(t), new2_cols, axis=1)
    Lq = q.shape[1]
    Lq4 = ((Lq + UNROLL - 1) // UNROLL) * UNROLL
    if Lq4 != Lq:
        pad = Lq4 - Lq
        q = np.concatenate([q, np.full((P, pad), 5, q.dtype)], axis=1)
        new_codes = np.concatenate(
            [new_codes, np.zeros((P, pad), new_codes.dtype)], axis=1
        )
        new2_codes = np.concatenate(
            [new2_codes, np.zeros((P, pad), new2_codes.dtype)], axis=1
        )
        lo2 = np.concatenate([lo2, np.repeat(lo2[:, -1:], pad, axis=1)], axis=1)
    dl = lo2[:, 1:] - lo2[:, :-1]
    locur = lo2[:, 1:]
    return (
        np.ascontiguousarray(q.T, np.int32),
        np.ascontiguousarray(new_codes.T, np.int32),
        np.ascontiguousarray(dl.T, np.int32),
        np.ascontiguousarray(locur.T, np.int32),
        np.asarray(tlens, np.int32)[None, :],
        np.ascontiguousarray(init_win.T, np.int32),
        np.asarray(lo2, np.int32),
        int(t.shape[1]),
        np.ascontiguousarray(new2_codes.T, np.int32),
    )


def sw_traceback_pallas_jobs(jobs, band: int = 128, maxrun: int = 512, interpret: bool | None = None):
    """run_jobs-contract traceback via the PALLAS payload forward.

    Jobs whose planner band advances are all <= 1/row (the overwhelming
    majority on amplicon data) ride the Mosaic forward + XLA walk in one
    dispatch; jobs with band jumps fall back to the exact barrel-shift XLA
    kernel (align_jax.sw_traceback_numpy_jobs), so results are bit-identical
    to the host kernels on EVERY job set."""
    from .align_jax import _pack_jobs, sw_traceback_numpy_jobs

    if not jobs:
        return []
    if interpret is None:
        # Mosaic needs real TPU hardware; everywhere else (CPU test meshes,
        # SAVONT_ALIGN_BACKEND=pallas on a dev box) runs the interpreter
        interpret = jax.default_backend() != "tpu"
    results: list[tuple | None] = [None] * len(jobs)
    smooth_idx: list[int] = []
    raw_idx: list[int] = []
    for i, j in enumerate(jobs):
        lo = np.asarray(j.lo, np.int64)
        if len(lo) < 2 or (lo[1:] - lo[:-1] <= 2).all():
            # advances up to 2/row ride the Mosaic kernel EXACTLY (the
            # new2 stream + static shift-by-2 selects); only larger jumps
            # (structural indels) take the XLA barrel-shift kernel
            smooth_idx.append(i)
        else:
            raw_idx.append(i)
    if raw_idx:
        for i, r in zip(
            raw_idx, sw_traceback_numpy_jobs([jobs[i] for i in raw_idx], band, maxrun)
        ):
            results[i] = r

    order = sorted(smooth_idx, key=lambda i: len(jobs[i].qcodes))
    bucket = 2 * PAIR_BLOCK
    overflow: list[int] = []
    # dispatch every bucket, then ONE batched device_get (a per-key
    # np.asarray fetch paid a full tunnel roundtrip per output per bucket)
    chunks: list[list[int]] = []
    outs: list[dict] = []
    for start in range(0, len(order), bucket):
        chunk = order[start : start + bucket]
        cjobs = [jobs[i] for i in chunk]
        streams = _pack_jobs_pallas_streams(cjobs, band)
        (q_rows, new_rows, dl_rows, locur_rows, tlen_row, init_win, lo2,
         Lt, new2_rows) = streams
        ops_max = q_rows.shape[0] + Lt
        chunks.append(chunk)
        outs.append(_pallas_tb_combined(
            jnp.asarray(q_rows), jnp.asarray(new_rows),
            jnp.asarray(dl_rows), jnp.asarray(locur_rows),
            jnp.asarray(tlen_row), jnp.asarray(init_win),
            jnp.asarray(lo2, jnp.int32),
            jnp.asarray(new2_rows),
            band=band, ops_max=ops_max, maxrun=maxrun, interpret=interpret,
        ))
    hosts = jax.device_get(outs)
    for chunk, host in zip(chunks, hosts):
        for x, i in enumerate(chunk):
            if host["score"][x] <= 0:
                results[i] = None
            elif host["n_runs"][x] > maxrun:
                overflow.append(i)
            else:
                results[i] = (
                    int(host["score"][x]),
                    int(host["q_start"][x]),
                    int(host["q_end"][x]),
                    int(host["t_start"][x]),
                    int(host["t_end"][x]),
                    host["cigar"][x, : host["n_runs"][x]].astype(np.uint32),
                    int(host["nm"][x]),
                )
    if overflow:
        import os

        from .align_batch import run_jobs

        env = os.environ.pop("SAVONT_ALIGN_BACKEND", None)
        try:
            host_res = run_jobs([jobs[i] for i in overflow], band=band)
        finally:
            if env is not None:
                os.environ["SAVONT_ALIGN_BACKEND"] = env
        for i, r in zip(overflow, host_res):
            results[i] = r
    return results
