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

CIGAR-needing call sites (pileups, adjusted errors, chimera scans) use the
host batch kernel; NM-only call sites (EM tie-break, classification,
orientation) run here.
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


@partial(jax.jit, static_argnames=("band",))
def sw_forward_meta(q, t, lo, tlens, band: int = 128):
    """Batched forward banded SW with path metadata.

    q: (B, Lq) int32 codes 0..3 (4 ambiguous, >=5 padding)
    t: (B, Lt) int32 codes
    lo: (B, Lq+1) int32 band lower bound per row, non-decreasing with
        per-row increments of AT MOST 1 (see smooth_lo) — this lets every
        previous-row access be a static lane shift instead of a gather.
        CAVEAT: smoothing a band whose chain jumps >1 column per row (large
        structural deletions) can change results vs the raw-band oracle;
        the host NM kernel (native/swalign.cpp sw_nm_batch) handles raw
        bands exactly and is the default.  The device paths are opt-in.
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
        # left of the band is the free zero boundary only at column 0
        left_edge = (~d1) & (je[None, :] == 0) & (cols == 0)
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


from functools import lru_cache


@lru_cache(maxsize=8)
def _sharded_forward(band: int):
    """jitted shard_map of the forward kernel over the pair ("dp") axis —
    the multi-chip path for NM-only scoring batches."""
    from jax.sharding import Mesh, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()), ("dp",))

    def fn(q, t, lo, tlens):
        return sw_forward_meta(q, t, lo, tlens, band=band)

    sharded = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P("dp", None), P("dp", None), P("dp", None), P("dp")),
        out_specs=P("dp"),
    )
    return jax.jit(sharded)


def sw_scores_numpy_jobs(jobs, band: int = 128):
    """Run AlignJobs through the device kernel; returns per-job dicts
    (score<=0 -> None).  Used by NM-only call sites."""
    if not jobs:
        return []
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
    lo = smooth_lo(lo)  # device kernel requires per-row advances <= 1
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
        out = sw_forward_meta(jnp.asarray(q), jnp.asarray(t), jnp.asarray(lo), jnp.asarray(tlens), band=band)
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
