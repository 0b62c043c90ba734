"""TPU banded affine Smith-Waterman (JAX), batched over pairs.

Same recurrence as ops/align.py banded_sw (prefix-max E formulation), as a
lax.scan over query rows with the band across VPU lanes.  Instead of
materializing traceback matrices (device->host transfer is the bottleneck
on this system), the kernel propagates METADATA along the winning path:

    nm  — edit count (mismatches + gap bases) of the optimal path,
    qs/ts — start coordinates of the optimal path,

so a full Mapping (score, NM, query/target spans) comes back as 6 scalars
per pair.  Tie-breaking matches the host traceback exactly:
    H: prefer G over E;  G: prefer zero, then F, then diagonal;
    E: nearest origin j' (largest);  F: prefer H-origin over extension.

CIGAR-needing call sites (pileups, adjusted errors, chimera scans) run on
sw_traceback_full below: direction planes + a batched traceback walk +
on-device run-length encoding, so only packed CIGAR runs leave the chip.

Both kernels handle RAW planner bands exactly (barrel-shifted planes on
band jumps, the device analog of native/swalign.cpp's pre-shift), so all
results are bit-identical to the host kernels on any job set — no
smooth_lo caveat.  The opt-in smooth=True path of sw_forward_meta (one
static shift per plane; requires pre-smoothed lo) remains for the mesh /
Pallas callers, with the documented large-indel caveat.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .align import GAP_EXT, GAP_OPEN, MATCH, MISMATCH

NEG = -20000


from .align import smooth_lo  # numpy helper shared with the native NM kernel


def _dyn_shl(a, dl, fill):
    """Barrel left-shift along lanes: out[:, j] = a[:, j + dl[b]], filled
    past the end.  dl is (B,) int32 >= 0, already clamped to < 2**stages.
    Implemented as bit_length(band) static lane shifts + selects — the
    TPU-friendly way to do a per-pair dynamic shift (lane rolls are cheap on
    the VPU; per-element gathers along the minor axis are not).  This is the
    device analog of the native kernel's plane pre-shift on band jumps
    (native/swalign.cpp), and is what makes the device kernels EXACT on raw
    planner bands (no smooth_lo result caveat)."""
    B, band = a.shape
    out = a
    k = 1
    while k <= band:
        shifted = jnp.concatenate(
            [out[:, k:], jnp.full((B, k), fill, out.dtype)], axis=1
        )
        out = jnp.where((dl[:, None] & k) != 0, shifted, out)
        k <<= 1
    return out


def _dl_clamp(dl, band):
    """Clamp raw band advances so every set bit is covered by _dyn_shl's
    stages (any dl >= band shifts the whole row to fill either way)."""
    lim = 1
    while lim <= band:
        lim <<= 1
    return jnp.minimum(dl, lim - 1)


@partial(jax.jit, static_argnames=("band", "smooth"))
def sw_forward_meta(q, t, lo, tlens, band: int = 128, smooth: bool = True):
    """Batched forward banded SW with path metadata.

    q: (B, Lq) int32 codes 0..3 (4 ambiguous, >=5 padding)
    t: (B, Lt) int32 codes
    lo: (B, Lq+1) int32 band lower bound per row, non-decreasing.
        smooth=True (the shard_map/mesh fast path) requires per-row
        increments of AT MOST 1 (see smooth_lo): every previous-row access
        is ONE static lane shift.  smooth=False handles RAW planner bands
        exactly (matching native/swalign.cpp bit-for-bit on any input) via
        barrel shifts — ~bit_length(band) static shifts per plane.
    tlens: (B,) int32
    Returns dict of (B,) arrays: score, q_start, q_end, t_start, t_end, nm.
    """
    B, Lq = q.shape
    je = jnp.arange(band, dtype=jnp.int32)

    # pre-gather the per-row target windows OUTSIDE the scan (one big gather)
    cols_all = lo[:, 1:, None] + je[None, None, :]  # (B, Lq, band)
    valid_all = cols_all < tlens[:, None, None]
    gather_cols = jnp.minimum(cols_all, tlens[:, None, None] - 1).reshape(B, Lq * band)
    tc_all = jnp.take_along_axis(t.astype(jnp.int32), gather_cols, axis=1).reshape(B, Lq, band)

    def shl1(a, fill):  # out[:, j] = a[:, j+1]
        return jnp.concatenate([a[:, 1:], jnp.full((B, 1), fill, a.dtype)], axis=1)

    def shr1(a, fill):  # out[:, j] = a[:, j-1]
        return jnp.concatenate([jnp.full((B, 1), fill, a.dtype), a[:, :-1]], axis=1)

    def step(carry, xs):
        H, F, nmh, qsh, tsh, nmf, qsf, tsf, best = carry
        qc, l, dl, r, tc, valid = xs  # (B,), (B,), (B,), scalar, (B,band), (B,band)

        cols = l[:, None] + je[None, :]
        is_match = (tc == qc[:, None]) & (qc[:, None] < 4) & (tc < 4)
        s = jnp.where(is_match, MATCH, MISMATCH)

        if smooth:
            d1 = (dl == 1)[:, None]  # band advanced one column this row

            def up(a, fill):  # same COLUMN in the previous row: j + dl
                return jnp.where(d1, shl1(a, fill), a)

            def diag(a, fill):  # column j-1 of the previous row: j + dl - 1
                return jnp.where(d1, a, shr1(a, fill))

            Hup, Fup = up(H, NEG), up(F, NEG)
            nmh_up, qsh_up, tsh_up = up(nmh, 0), up(qsh, 0), up(tsh, 0)
            nmf_up, qsf_up, tsf_up = up(nmf, 0), up(qsf, 0), up(tsf, 0)

            Hdiag = diag(H, NEG)
            nmd, qsd, tsd = diag(nmh, 0), diag(qsh, 0), diag(tsh, 0)
        else:
            # raw planner bands: per-pair barrel shifts.  diag planes shift
            # by dl-1; up planes = diag result shifted one more lane (shared
            # barrels), except dl==0 rows where up is identity / diag is the
            # static right-shift.
            dlc = _dl_clamp(dl, band)
            dm1 = jnp.maximum(dlc - 1, 0)
            d0 = (dl == 0)[:, None]

            def updiag(a, fill):
                pos = _dyn_shl(a, dm1, fill)  # shift by dl-1 (dl >= 1 rows)
                a_up = jnp.where(d0, a, shl1(pos, fill))
                a_diag = jnp.where(d0, shr1(a, fill), pos)
                return a_up, a_diag

            Hup, Hdiag = updiag(H, NEG)
            nmh_up, nmd = updiag(nmh, 0)
            qsh_up, qsd = updiag(qsh, 0)
            tsh_up, tsd = updiag(tsh, 0)
            Fup = _dyn_shl(F, dlc, NEG)
            nmf_up = _dyn_shl(nmf, dlc, 0)
            qsf_up = _dyn_shl(qsf, dlc, 0)
            tsf_up = _dyn_shl(tsf, dlc, 0)
        # left of the band is the free zero boundary only at column 0
        # (cols==0 forces l==0 and, lo being non-decreasing from lo[0]>=0,
        # dl==0 — so no dl term is needed in the predicate)
        left_edge = (je[None, :] == 0) & (cols == 0)
        Hdiag = jnp.where(left_edge, 0, Hdiag)
        nmd = jnp.where(left_edge, 0, nmd)
        qsd = jnp.where(left_edge, r - 1, qsd)
        tsd = jnp.where(left_edge, cols, tsd)

        # F (vertical, consumes query base): prefer H-origin on ties
        from_h = (Hup - GAP_OPEN) >= Fup
        Fr = jnp.maximum(jnp.maximum(Hup - GAP_OPEN, Fup) - GAP_EXT, NEG)
        nmf_n = jnp.where(from_h, nmh_up, nmf_up) + 1
        qsf_n = jnp.where(from_h, qsh_up, qsf_up)
        tsf_n = jnp.where(from_h, tsh_up, tsf_up)

        # G = max(0, diag + s, F): priority zero > F > diag (traceback order)
        Gr = jnp.maximum(jnp.maximum(0, Hdiag + s), Fr)
        g_zero = Gr == 0
        g_f = (~g_zero) & (Gr == Fr)
        nmg = jnp.where(g_zero, 0, jnp.where(g_f, nmf_n, nmd + (~is_match).astype(jnp.int32)))
        qsg = jnp.where(g_zero, r, jnp.where(g_f, qsf_n, qsd))
        tsg = jnp.where(g_zero, cols + 1, jnp.where(g_f, tsf_n, tsd))

        # E via an inclusive prefix max of (G + e*j) with metadata riding
        # along the argmax (ties -> largest j', i.e. right operand)
        def combine(a, b):
            take_b = b[0] >= a[0]
            return tuple(jnp.where(take_b, y, x) for x, y in zip(a, b))

        scanned = lax.associative_scan(
            combine,
            (Gr + GAP_EXT * je[None, :], nmg - je[None, :], qsg, tsg),
            axis=1,
        )
        run_v = shr1(scanned[0], NEG)
        run_nm = shr1(scanned[1], 0)
        run_qs = shr1(scanned[2], 0)
        run_ts = shr1(scanned[3], 0)
        Er = run_v - GAP_OPEN - GAP_EXT * je[None, :]
        Er = jnp.maximum(jnp.where(je[None, :] == 0, NEG, Er), NEG)
        nme = run_nm + je[None, :]
        qse = run_qs
        tse = run_ts

        # H = max(G, E): prefer G on ties
        use_g = Gr >= Er
        Hr = jnp.where(use_g, Gr, Er)
        nmh_n = jnp.where(use_g, nmg, nme)
        qsh_n = jnp.where(use_g, qsg, qse)
        tsh_n = jnp.where(use_g, tsg, tse)
        Hr = jnp.where(valid, Hr, NEG)

        # per-lane running best (strictly greater -> keeps the earliest row)
        bv, bqs, bts, bqe, bte, bnm = best
        better = Hr > bv
        best_n = (
            jnp.where(better, Hr, bv),
            jnp.where(better, qsh_n, bqs),
            jnp.where(better, tsh_n, bts),
            jnp.where(better, r, bqe),
            jnp.where(better, cols + 1, bte),
            jnp.where(better, nmh_n, bnm),
        )
        return (Hr, Fr, nmh_n, qsh_n, tsh_n, nmf_n, qsf_n, tsf_n, best_n), None

    # derive the init carry from q AND t so its sharding "varying" type
    # matches the scan outputs inside shard_map regardless of which input is
    # the sharded one (zero-cost: x & 0)
    vary2 = (
        (q[:, :1].astype(jnp.int32) & 0)
        + (t[:, :1].astype(jnp.int32) & 0)
        + (tlens[:, None].astype(jnp.int32) & 0)
        + jnp.zeros((B, band), jnp.int32)
    )
    init = (
        vary2,  # H row 0 = 0 (local alignment)
        vary2 + NEG,
        vary2, vary2, vary2, vary2, vary2, vary2,
        (vary2, vary2, vary2, vary2, vary2, vary2),  # per-lane best planes
    )
    rows = jnp.arange(1, Lq + 1, dtype=jnp.int32)
    xs = (
        q.T.astype(jnp.int32),            # (Lq, B)
        lo[:, 1:].T.astype(jnp.int32),    # l per row
        (lo[:, 1:] - lo[:, :-1]).T.astype(jnp.int32),  # dl per row
        rows,
        jnp.swapaxes(tc_all, 0, 1),       # (Lq, B, band)
        jnp.swapaxes(valid_all, 0, 1),
    )
    (_, _, _, _, _, _, _, _, best), _ = lax.scan(step, init, xs)
    bv, bqs, bts, bqe, bte, bnm = best

    # reduce lanes: max value; ties -> earliest row (bqe), then lowest lane
    # (equivalent to the row-major flat argmax of the full DP matrix)
    vmax = bv.max(axis=1, keepdims=True)
    is_best = bv == vmax
    tb = jnp.where(is_best, (Lq + 1 - bqe) * (band + 1) + (band - je[None, :]), -1)
    chosen = is_best & (tb == tb.max(axis=1, keepdims=True))

    def pick(x):
        return jnp.sum(jnp.where(chosen, x, 0), axis=1)

    return {
        "score": pick(bv),
        "q_start": pick(bqs),
        "t_start": pick(bts),
        "q_end": pick(bqe),
        "t_end": pick(bte),
        "nm": pick(bnm),
    }


# ── device traceback: direction planes + batched walk + on-device CIGAR RLE ──
#
# The reference pipeline is CIGAR-driven end to end (pileups walk CIGARs,
# alignment.rs:520-564; adjusted-error merging classifies CIGAR runs,
# alignment.rs:101-188; chimera detection walks CIGARs from both ends,
# chimera.rs:274-398).  This kernel produces full CIGARs ON DEVICE,
# bit-identical to the host traceback (ops/align.py _traceback and
# native/swalign.cpp sw_tb_batch) given the same (smoothed) bands:
#
#   forward scan  — same recurrence as sw_forward_meta, but instead of path
#                   metadata it stores FIVE decision bits per cell (one u8
#                   plane per row, band lanes wide):
#                     bit0 use_g   H == G        (H-state: go G, else E)
#                     bit1 g_zero  G == 0        (G-state: stop)
#                     bit2 g_f     G == F        (G-state: go F, else diag)
#                     bit3 exitE   E[j] == G[j-1] - o - e   (E-state: exit to G)
#                     bit4 from_h  F[j] == H_up - o - e     (F-state: exit to H)
#   walk          — a batched lax.while_loop replaying the host state machine
#                   (H>G>E priority, zero>F>diag, nearest-origin gap exits);
#                   every iteration emits exactly one CIGAR base-op, so the
#                   iteration count equals the longest path in the batch.
#   RLE           — reverse + run-length encode on device; only packed u32
#                   (len<<4 | op) runs leave the chip (the ~30 MB/s
#                   device->host link makes shipping per-base ops or
#                   traceback matrices a non-starter on this system).
ST_H, ST_G, ST_E, ST_F = 0, 1, 2, 3


@partial(jax.jit, static_argnames=("band", "ops_max", "maxrun"))
def sw_traceback_full(q, t, lo, tlens, band: int, ops_max: int, maxrun: int):
    """Batched banded SW with full on-device traceback.

    Inputs as sw_forward_meta; lo is the RAW planner band (arbitrary
    non-decreasing advances — handled exactly via barrel shifts).
    Returns dict with per-pair score/q_start/q_end/t_start/t_end/nm plus
    cigar (B, maxrun) packed u32 and n_runs (n_runs > maxrun = overflow,
    caller re-runs that pair on the host kernel).
    """
    B, Lq = q.shape
    je = jnp.arange(band, dtype=jnp.int32)
    ooe = GAP_OPEN + GAP_EXT

    cols_all = lo[:, 1:, None] + je[None, None, :]
    valid_all = cols_all < tlens[:, None, None]
    gather_cols = jnp.minimum(cols_all, tlens[:, None, None] - 1).reshape(B, Lq * band)
    tc_all = jnp.take_along_axis(t.astype(jnp.int32), gather_cols, axis=1).reshape(B, Lq, band)

    def shl1(a, fill):
        return jnp.concatenate([a[:, 1:], jnp.full((B, 1), fill, a.dtype)], axis=1)

    def shr1(a, fill):
        return jnp.concatenate([jnp.full((B, 1), fill, a.dtype), a[:, :-1]], axis=1)

    def step(carry, xs):
        H, F, bv, brow = carry
        qc, l, dl, r, tc, valid = xs

        cols = l[:, None] + je[None, :]
        is_match = (tc == qc[:, None]) & (qc[:, None] < 4) & (tc < 4)
        s = jnp.where(is_match, MATCH, MISMATCH)

        # RAW planner bands (exact vs native/swalign.cpp on any lo): barrel
        # shifts by dl-1 for the diagonal plane, +1 static lane for "up"
        dlc = _dl_clamp(dl, band)
        d0 = (dl == 0)[:, None]
        Hd_pos = _dyn_shl(H, jnp.maximum(dlc - 1, 0), NEG)
        Hup = jnp.where(d0, H, shl1(Hd_pos, NEG))
        Hdiag = jnp.where(d0, shr1(H, NEG), Hd_pos)
        Fup = _dyn_shl(F, dlc, NEG)
        left_edge = (je[None, :] == 0) & (cols == 0)
        Hdiag = jnp.where(left_edge, 0, Hdiag)

        from_h = (Hup - GAP_OPEN) >= Fup
        Fr = jnp.maximum(jnp.maximum(Hup - GAP_OPEN, Fup) - GAP_EXT, NEG)
        Gr = jnp.maximum(jnp.maximum(0, Hdiag + s), Fr)

        run_v = shr1(lax.associative_scan(jnp.maximum, Gr + GAP_EXT * je[None, :], axis=1), NEG)
        Er = run_v - GAP_OPEN - GAP_EXT * je[None, :]
        Er = jnp.maximum(jnp.where(je[None, :] == 0, NEG, Er), NEG)

        g_zero = Gr == 0
        g_f = (~g_zero) & (Gr == Fr)
        use_g = Gr >= Er
        exitE = Er == (shr1(Gr, NEG) - ooe)

        dirs = (
            use_g.astype(jnp.uint8)
            | (g_zero.astype(jnp.uint8) << 1)
            | (g_f.astype(jnp.uint8) << 2)
            | (exitE.astype(jnp.uint8) << 3)
            | (from_h.astype(jnp.uint8) << 4)
        )

        Hr = jnp.where(use_g, Gr, Er)
        Hr = jnp.where(valid, Hr, NEG)

        better = Hr > bv  # strictly greater -> per-lane earliest row
        bv_n = jnp.where(better, Hr, bv)
        brow_n = jnp.where(better, r, brow)
        return (Hr, Fr, bv_n, brow_n), dirs

    vary2 = (
        (q[:, :1].astype(jnp.int32) & 0)
        + (t[:, :1].astype(jnp.int32) & 0)
        + (tlens[:, None].astype(jnp.int32) & 0)
        + jnp.zeros((B, band), jnp.int32)
    )
    init = (vary2, vary2 + NEG, vary2 + NEG, vary2)
    rows = jnp.arange(1, Lq + 1, dtype=jnp.int32)
    xs = (
        q.T.astype(jnp.int32),
        lo[:, 1:].T.astype(jnp.int32),
        (lo[:, 1:] - lo[:, :-1]).T.astype(jnp.int32),
        rows,
        jnp.swapaxes(tc_all, 0, 1),
        jnp.swapaxes(valid_all, 0, 1),
    )
    (_, _, bv, brow), dirs_rows = lax.scan(step, init, xs)
    dirs = jnp.swapaxes(dirs_rows, 0, 1).reshape(B, Lq * band)  # (B, Lq*band)

    # start cell = row-major flat argmax of H[1:]: earliest row, lowest lane
    vmax = bv.max(axis=1, keepdims=True)
    is_best = bv == vmax
    tb = jnp.where(is_best, (Lq + 1 - brow) * (band + 1) + (band - je[None, :]), -1)
    chosen = is_best & (tb == tb.max(axis=1, keepdims=True))

    def pick(x):
        return jnp.sum(jnp.where(chosen, x, 0), axis=1)

    score = pick(bv)
    ri = pick(brow)
    bj = pick(jnp.broadcast_to(je[None, :], bv.shape))

    # ── batched walk (host _traceback state machine, one op per iteration) ──
    bidx = jnp.arange(B)
    r0 = ri
    j0 = bj
    st0 = jnp.full((B,), ST_H, jnp.int32)
    done0 = score <= 0
    cnt0 = jnp.zeros((B,), jnp.int32)
    nm0 = jnp.zeros((B,), jnp.int32)
    nins0 = jnp.zeros((B,), jnp.int32)
    ndel0 = jnp.zeros((B,), jnp.int32)
    ops0 = jnp.zeros((B, ops_max), jnp.uint8)

    def cond(c):
        return jnp.any(~c[5])

    def body(c):
        r, j, st, cnt, nm, done, nins, ndel, ops = c
        act = ~done
        cell = jnp.clip((r - 1) * band + j, 0, Lq * band - 1)
        d = jnp.take_along_axis(dirs, cell[:, None], axis=1)[:, 0]
        use_g = (d & 1) != 0
        g_zero = (d & 2) != 0
        g_f = (d & 4) != 0
        exitE = (d & 8) != 0
        from_h = (d & 16) != 0

        st1 = jnp.where(st == ST_H, jnp.where(use_g, ST_G, ST_E), st)
        is_stop = (st1 == ST_G) & g_zero
        st2 = jnp.where((st1 == ST_G) & g_f, ST_F, st1)
        is_diag = (st2 == ST_G) & ~is_stop
        is_f = (st2 == ST_F) & ~is_stop
        is_e = (st2 == ST_E) & ~is_stop

        l_r = jnp.take_along_axis(lo, jnp.clip(r, 0, Lq)[:, None], axis=1)[:, 0]
        l_m = jnp.take_along_axis(lo, jnp.clip(r - 1, 0, Lq)[:, None], axis=1)[:, 0]
        dl = l_r - l_m
        col = l_r + j
        qc = jnp.take_along_axis(q, jnp.clip(r - 1, 0, Lq - 1)[:, None], axis=1)[:, 0]
        tc = jnp.take_along_axis(t, jnp.clip(col, 0, t.shape[1] - 1)[:, None], axis=1)[:, 0]
        mm = (qc != tc) | ((qc == 4) & (tc == 4))

        emit = act & ~is_stop
        op = jnp.where(is_diag, 0, jnp.where(is_f, 1, 2)).astype(jnp.uint8)
        ops = ops.at[bidx, jnp.where(emit, cnt, ops_max)].set(op, mode="drop")
        nm = nm + jnp.where(emit, jnp.where(is_diag, mm.astype(jnp.int32), 1), 0)
        nins = nins + (emit & is_f).astype(jnp.int32)
        ndel = ndel + (emit & is_e).astype(jnp.int32)
        cnt = cnt + emit.astype(jnp.int32)

        # moves (host order: emit, move, then boundary breaks)
        up = j + dl
        j_d, r_d = j + dl - 1, r - 1
        exit_f = from_h & (up < band)
        exit_e = exitE & (j - 1 >= 0)

        r_n = jnp.where(is_diag | is_f, r - 1, r)
        j_n = jnp.where(is_diag, j_d, jnp.where(is_f, up, jnp.where(is_e, j - 1, j)))
        st_n = jnp.where(
            is_diag,
            ST_H,
            jnp.where(
                is_f,
                jnp.where(exit_f, ST_H, ST_F),
                jnp.where(is_e, jnp.where(exit_e, ST_G, ST_E), st2),
            ),
        )
        term = is_stop | (r_n <= 0) | (j_n < 0) | (j_n >= band) | (cnt >= ops_max)
        done_n = done | (act & term)

        r = jnp.where(act, r_n, r)
        j = jnp.where(act, j_n, j)
        st = jnp.where(act, st_n, st)
        return (r, j, st, cnt, nm, done_n, nins, ndel, ops)

    (_, _, _, cnt, nm, _, nins, ndel, ops) = lax.while_loop(
        cond, body, (r0, j0, st0, cnt0, nm0, done0, nins0, ndel0, ops0)
    )

    q_end = ri
    t_end = jnp.take_along_axis(lo, jnp.clip(ri, 0, Lq)[:, None], axis=1)[:, 0] + bj + 1
    q_start = q_end - (cnt - ndel)
    t_start = t_end - (cnt - nins)

    # reverse (ops were emitted end->start) and run-length encode
    ii = jnp.arange(ops_max)
    rev_idx = cnt[:, None] - 1 - ii[None, :]
    valid = rev_idx >= 0
    ops_f = jnp.take_along_axis(ops, jnp.clip(rev_idx, 0, ops_max - 1), axis=1)
    prev = jnp.concatenate([jnp.full((B, 1), 255, jnp.uint8), ops_f[:, :-1]], axis=1)
    bnd = valid & (ops_f != prev)
    rid = jnp.cumsum(bnd.astype(jnp.int32), axis=1) - 1
    n_runs = bnd.sum(axis=1).astype(jnp.int32)
    rid_c = jnp.clip(rid, 0, maxrun - 1)
    b2 = bidx[:, None]
    run_len = jnp.zeros((B, maxrun), jnp.int32).at[
        b2, jnp.where(valid, rid_c, maxrun)
    ].add(1, mode="drop")
    run_op = jnp.zeros((B, maxrun), jnp.uint32).at[
        b2, jnp.where(bnd, rid_c, maxrun)
    ].set(ops_f.astype(jnp.uint32), mode="drop")
    cigar = (run_len.astype(jnp.uint32) << 4) | run_op
    cigar = jnp.where(ii[None, :maxrun] < jnp.minimum(n_runs, maxrun)[:, None], cigar, 0)

    return {
        "score": score,
        "q_start": q_start,
        "q_end": q_end,
        "t_start": t_start,
        "t_end": t_end,
        "nm": nm,
        "cigar": cigar,
        "n_runs": n_runs,
    }


def _pack_jobs(jobs, band):
    """Shared padding for the device wrappers (codes 5/6 never match; lo
    extended flat past the real rows).  Raw planner lo — the kernels handle
    arbitrary band advances exactly (no smoothing)."""
    B = len(jobs)
    Lq = max(len(j.qcodes) for j in jobs)
    Lt = max(len(j.tcodes) for j in jobs)
    q = np.full((B, Lq), 5, dtype=np.int32)
    t = np.full((B, Lt), 6, dtype=np.int32)
    lo = np.zeros((B, Lq + 1), dtype=np.int32)
    tlens = np.zeros(B, dtype=np.int32)
    for i, j in enumerate(jobs):
        q[i, : len(j.qcodes)] = j.qcodes
        t[i, : len(j.tcodes)] = j.tcodes
        lo[i, 1 : len(j.lo) + 1] = j.lo
        lo[i, 0] = j.lo[0]
        if len(j.lo) < Lq:
            lo[i, len(j.lo) + 1 :] = j.lo[-1]
        tlens[i] = len(j.tcodes)
    return q, t, lo, tlens


def sw_traceback_numpy_jobs(jobs, band: int = 128, maxrun: int = 512):
    """Run AlignJobs through the device traceback kernel; returns per-job
    (score, q0, q1, t0, t1, cigar_u32, nm) tuples or None — the run_jobs
    contract.  Pairs whose CIGAR overflows maxrun runs (pathological, >2x
    any observed amplicon alignment) are re-run on the host kernel."""
    if not jobs:
        return []
    results: list[tuple | None] = [None] * len(jobs)
    order = sorted(range(len(jobs)), key=lambda i: len(jobs[i].qcodes))
    bucket = 256
    overflow: list[int] = []
    for start in range(0, len(order), bucket):
        chunk = order[start : start + bucket]
        cjobs = [jobs[i] for i in chunk]
        q, t, lo, tlens = _pack_jobs(cjobs, band)
        # pad dims to multiples of 64 rows / 256 cols: bounds the number of
        # distinct compiled shapes across buckets
        Lq = -(-q.shape[1] // 64) * 64
        Lt = -(-t.shape[1] // 256) * 256
        if Lq > q.shape[1]:
            q = np.pad(q, ((0, 0), (0, Lq - q.shape[1])), constant_values=5)
            lo = np.pad(lo, ((0, 0), (0, Lq - lo.shape[1] + 1)), mode="edge")
        if Lt > t.shape[1]:
            t = np.pad(t, ((0, 0), (0, Lt - t.shape[1])), constant_values=6)
        if len(cjobs) < bucket and len(order) > bucket:
            pad = bucket - len(cjobs)
            q = np.pad(q, ((0, pad), (0, 0)), constant_values=5)
            t = np.pad(t, ((0, pad), (0, 0)), constant_values=6)
            lo = np.pad(lo, ((0, pad), (0, 0)))
            tlens = np.pad(tlens, (0, pad), constant_values=Lt)
        out = sw_traceback_full(
            jnp.asarray(q), jnp.asarray(t), jnp.asarray(lo), jnp.asarray(tlens),
            band=band, ops_max=Lq + Lt, maxrun=maxrun,
        )
        host = {k: np.asarray(v) for k, v in out.items()}
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
        # host redo (the native kernel computes the same raw-band DP, so the
        # result is bit-identical to what the device chose)
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


from functools import lru_cache


@lru_cache(maxsize=8)
def _sharded_forward(band: int):
    """jitted shard_map of the forward kernel over the pair ("dp") axis —
    the multi-chip path for NM-only scoring batches."""
    from jax.sharding import Mesh, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()), ("dp",))

    def fn(q, t, lo, tlens):
        return sw_forward_meta(q, t, lo, tlens, band=band, smooth=False)

    sharded = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P("dp", None), P("dp", None), P("dp", None), P("dp")),
        out_specs=P("dp"),
    )
    return jax.jit(sharded)


def sw_scores_numpy_jobs(jobs, band: int = 128):
    """Run AlignJobs through the device kernel; returns per-job dicts
    (score<=0 -> None).  Used by NM-only call sites.  Raw planner bands —
    results are bit-identical to the host kernels on ANY job set (the
    barrel-shift forward handles arbitrary band advances)."""
    if not jobs:
        return []
    q, t, lo, tlens = _pack_jobs(jobs, band)
    B = len(jobs)
    n_dev = jax.device_count()
    if n_dev > 1:
        # shard the pair axis over the mesh: each chip scores its slice of
        # the batch (stage-7 EM / classify scale-out across devices)
        pad = (-B) % n_dev
        if pad:
            q = np.concatenate([q, np.full((pad, q.shape[1]), 5, q.dtype)])
            t = np.concatenate([t, np.full((pad, t.shape[1]), 6, t.dtype)])
            lo = np.concatenate([lo, np.zeros((pad, lo.shape[1]), lo.dtype)])
            tlens = np.concatenate([tlens, np.full(pad, t.shape[1], tlens.dtype)])
        out = _sharded_forward(band)(
            jnp.asarray(q), jnp.asarray(t), jnp.asarray(lo), jnp.asarray(tlens)
        )
    else:
        out = sw_forward_meta(
            jnp.asarray(q), jnp.asarray(t), jnp.asarray(lo), jnp.asarray(tlens),
            band=band, smooth=False,
        )
    host = {k: np.asarray(v) for k, v in out.items()}
    res = []
    for i in range(B):
        if host["score"][i] <= 0:
            res.append(None)
        else:
            res.append(
                {
                    "score": int(host["score"][i]),
                    "q_start": int(host["q_start"][i]),
                    "q_end": int(host["q_end"][i]),
                    "t_start": int(host["t_start"][i]),
                    "t_end": int(host["t_end"][i]),
                    "nm": int(host["nm"][i]),
                }
            )
    return res
