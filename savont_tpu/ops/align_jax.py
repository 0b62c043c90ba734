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


@partial(jax.jit, static_argnames=("band",))
def sw_forward_meta(q, t, lo, tlens, band: int = 128):
    """Batched forward banded SW with path metadata.

    q: (B, Lq) int32 codes 0..3 (4 ambiguous, >=5 padding)
    t: (B, Lt) int32 codes
    lo: (B, Lq+1) int32 band lower bound per row (non-decreasing)
    tlens: (B,) int32
    Returns dict of (B,) arrays: score, q_start, q_end, t_start, t_end, nm.
    """
    B, Lq = q.shape
    je = jnp.arange(band, dtype=jnp.int32)

    def step(carry, xs):
        H, F, nmh, qsh, tsh, nmf, qsf, tsf, best = carry
        qc, l, dl, r = xs  # qc (B,), l (B,), dl (B,), r scalar row index

        cols = l[:, None] + je[None, :]
        valid = cols < tlens[:, None]
        tc = jnp.take_along_axis(t, jnp.minimum(cols, tlens[:, None] - 1), axis=1)
        is_match = (tc == qc[:, None]) & (qc[:, None] < 4) & (tc < 4)
        s = jnp.where(is_match, MATCH, MISMATCH)

        # shift previous row into this row's band frame: src = j + dl
        src = je[None, :] + dl[:, None]
        in_rng = src < band
        src_c = jnp.minimum(src, band - 1)

        def gat(a):
            return jnp.where(in_rng, jnp.take_along_axis(a, src_c, axis=1), NEG)

        Hup, Fup = gat(H), gat(F)
        nmh_up = jnp.where(in_rng, jnp.take_along_axis(nmh, src_c, axis=1), 0)
        qsh_up = jnp.where(in_rng, jnp.take_along_axis(qsh, src_c, axis=1), 0)
        tsh_up = jnp.where(in_rng, jnp.take_along_axis(tsh, src_c, axis=1), 0)
        nmf_up = jnp.where(in_rng, jnp.take_along_axis(nmf, src_c, axis=1), 0)
        qsf_up = jnp.where(in_rng, jnp.take_along_axis(qsf, src_c, axis=1), 0)
        tsf_up = jnp.where(in_rng, jnp.take_along_axis(tsf, src_c, axis=1), 0)

        srcd = src - 1
        d_in = (srcd >= 0) & (srcd < band)
        srcd_c = jnp.clip(srcd, 0, band - 1)
        Hdiag = jnp.where(d_in, jnp.take_along_axis(H, srcd_c, axis=1), NEG)
        nmd = jnp.where(d_in, jnp.take_along_axis(nmh, srcd_c, axis=1), 0)
        qsd = jnp.where(d_in, jnp.take_along_axis(qsh, srcd_c, axis=1), 0)
        tsd = jnp.where(d_in, jnp.take_along_axis(tsh, srcd_c, axis=1), 0)
        left_edge = (srcd < 0) & (cols == 0)
        Hdiag = jnp.where(left_edge, 0, Hdiag)
        # fresh diagonal start from the virtual zero column at col -1:
        # consumes q[r-1] and t[0], so the path starts at (r-1, 0)
        nmd = jnp.where(left_edge, 0, nmd)
        qsd = jnp.where(left_edge, (r - 1) * jnp.ones((B, band), jnp.int32), qsd)
        tsd = jnp.where(left_edge, cols, tsd)

        # F (vertical, consumes query base): prefer H-origin on ties
        from_h = (Hup - GAP_OPEN) >= Fup
        Fr = jnp.maximum(Hup - GAP_OPEN, Fup) - GAP_EXT
        Fr = jnp.maximum(Fr, NEG)
        nmf_n = jnp.where(from_h, nmh_up, nmf_up) + 1
        qsf_n = jnp.where(from_h, qsh_up, qsf_up)
        tsf_n = jnp.where(from_h, tsh_up, tsf_up)

        # G = max(0, diag + s, F): priority zero > F > diag (traceback order)
        diag_v = Hdiag + s
        Gr = jnp.maximum(jnp.maximum(0, diag_v), Fr)
        g_zero = Gr == 0
        g_f = (~g_zero) & (Gr == Fr)
        # zero cell consumed nothing: a later diagonal from it starts at
        # (r, col+1); F-origin and diagonal inherit their sources' starts
        nmg = jnp.where(g_zero, 0, jnp.where(g_f, nmf_n, nmd + (~is_match).astype(jnp.int32)))
        qsg = jnp.where(g_zero, r * jnp.ones((B, band), jnp.int32), jnp.where(g_f, qsf_n, qsd))
        tsg = jnp.where(g_zero, cols + 1, jnp.where(g_f, tsf_n, tsd))

        # E via prefix max of (G + e*j), argmax = largest j' (packed cummax)
        packed = ((Gr + 32768) << 8) | je[None, :]
        run = lax.cummax(packed, axis=1)
        run_shift = jnp.concatenate([jnp.full((B, 1), (NEG + 32768) << 8, run.dtype), run[:, :-1]], axis=1)
        best_val = (run_shift >> 8) - 32768
        best_j = run_shift & 0xFF
        # E[j] = G[j'] - o - e*(j - j') with j' = argmax(G + e*j'), ties -> largest j'
        Er = best_val - GAP_OPEN - GAP_EXT * (je[None, :] - best_j)
        Er = jnp.where(je[None, :] == 0, NEG, Er)
        Er = jnp.maximum(Er, NEG)
        nme = jnp.take_along_axis(nmg, best_j, axis=1) + (je[None, :] - best_j)
        qse = jnp.take_along_axis(qsg, best_j, axis=1)
        tse = jnp.take_along_axis(tsg, best_j, axis=1)

        # H = max(G, E): prefer G on ties
        use_g = Gr >= Er
        Hr = jnp.where(use_g, Gr, Er)
        nmh_n = jnp.where(use_g, nmg, nme)
        qsh_n = jnp.where(use_g, qsg, qse)
        tsh_n = jnp.where(use_g, tsg, tse)
        Hr = jnp.where(valid, Hr, NEG)

        # update running best (first maximum wins, row-major like argmax)
        row_best_j = jnp.argmax(Hr, axis=1)
        row_best_v = jnp.take_along_axis(Hr, row_best_j[:, None], axis=1)[:, 0]
        bv, bqs, bts, bqe, bte, bnm = best
        better = row_best_v > bv
        sel = lambda new, old: jnp.where(better, new, old)
        bj = row_best_j[:, None]
        best_n = (
            sel(row_best_v, bv),
            sel(jnp.take_along_axis(qsh_n, bj, axis=1)[:, 0], bqs),
            sel(jnp.take_along_axis(tsh_n, bj, axis=1)[:, 0], bts),
            sel(r * jnp.ones(B, jnp.int32), bqe),
            sel(l + row_best_j.astype(jnp.int32) + 1, bte),
            sel(jnp.take_along_axis(nmh_n, bj, axis=1)[:, 0], bnm),
        )
        return (Hr, Fr, nmh_n, qsh_n, tsh_n, nmf_n, qsf_n, tsf_n, best_n), None

    # derive the init carry from q so its sharding "varying" type matches the
    # scan outputs when running inside shard_map (zero-cost: q & 0)
    vary2 = (q[:, :1].astype(jnp.int32) & 0) + jnp.zeros((B, band), jnp.int32)
    vary1 = q[:, 0].astype(jnp.int32) & 0
    init = (
        vary2,  # H row 0 = 0 (local alignment)
        vary2 + NEG,
        vary2, vary2, vary2, vary2, vary2, vary2,
        (vary1, vary1, vary1, vary1, vary1, vary1),  # best: v, qs, ts, qe, te, nm
    )
    rows = jnp.arange(1, Lq + 1, dtype=jnp.int32)
    xs = (
        q.T.astype(jnp.int32),            # (Lq, B)
        lo[:, 1:].T.astype(jnp.int32),    # l per row
        (lo[:, 1:] - lo[:, :-1]).T.astype(jnp.int32),  # dl per row
        rows,
    )
    (_, _, _, _, _, _, _, _, best), _ = lax.scan(step, init, xs)
    bv, bqs, bts, bqe, bte, bnm = best
    return {
        "score": bv,
        "q_start": bqs,
        "t_start": bts,
        "q_end": bqe,
        "t_end": bte,
        "nm": bnm,
    }


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
