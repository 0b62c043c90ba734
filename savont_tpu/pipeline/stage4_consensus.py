"""Stage 4: consensus generation + pileup-based Bayesian polishing.

Reference: alignment.rs:190-1153.  The spoa POA graph (C++ FFI) is replaced
by a TPU-friendly seed + iterative pileup-vote consensus: pick the
90th-percentile-length read as template, batch-align the top-quality reads
to it with the banded kernel, and take the quality-weighted majority at each
column (including short insertions).  The reference's own Bayesian polish
(which only FLAGS positions; the base calls come from the consensus) then
runs unchanged on pileups of up to 250 reads.
"""
from __future__ import annotations

import logging
import math
from collections import Counter

import numpy as np

from ..config import ClusterArgs
from ..constants import DEFAULT_ERR_RATE, MAX_INSERTION_LENGTH, MAX_SEQS_CONSENSUS, MAX_SEQS_POA
from ..core import ConsensusSequence, TwinRead
from ..ops.align import Mapping, align_pair
from ..ops.encode import homopolymer_compress, revcomp_bytes

log = logging.getLogger("savont")


# ── pileup structures ────────────────────────────────────────────────────────

# a pileup position is a dict with:
#   ref_pos, ref_base (ASCII code), ref_hp_length,
#   bases: list of ('B', base, qual, hp) | ('D',) | ('I', [(base,qual,hp)...])
#   alt_posterior: float | None


class Pileup:
    __slots__ = ("ref_pos", "ref_base", "ref_hp_length", "bases", "alt_posterior")

    def __init__(self, ref_pos: int, ref_base: int, ref_hp_length: int):
        self.ref_pos = ref_pos
        self.ref_base = ref_base
        self.ref_hp_length = ref_hp_length
        self.bases: list[tuple] = []
        self.alt_posterior: float | None = None

    def depth(self) -> int:
        return len(self.bases)


def _read_seq_and_qual(tr: TwinRead) -> tuple[bytes, np.ndarray]:
    """ASCII sequence + per-base expanded binned qualities
    (alignment.rs:231-258)."""
    return tr.seq_bytes(), tr.expanded_qual_ascii()


def _avg_qual(tr: TwinRead) -> float:
    """Mean per-BIN accuracy (alignment.rs:239-245 computes the average over
    the binned quality values, one per 4-base bin)."""
    if tr.qual_levels is None:
        return 1.0
    q = tr.qual_levels.astype(np.float64) * 3 + 33
    return float((1.0 - np.power(10.0, -(q - 33) / 10.0)).mean())


# ── consensus via template + weighted column vote (spoa replacement) ─────────


def _vote_consensus(
    template: bytes,
    oriented: list[tuple[bytes, np.ndarray]],
    mappings: list[Mapping],
) -> bytes:
    """One round of quality-weighted majority vote against the template.

    For each template column: votes for observed base vs deletion; the
    winning base (or removal) replaces the template base.  Insertions after
    a column are applied when their weighted support exceeds half the
    column's weighted coverage (ties broken toward no insertion).
    """
    n = len(template)
    t_arr = np.frombuffer(template, dtype=np.uint8)
    base_w = np.zeros((n, 4), dtype=np.float64)  # A C G T weighted votes
    del_w = np.zeros(n, dtype=np.float64)
    cov_w = np.zeros(n, dtype=np.float64)
    ins_votes: dict[int, Counter] = {}
    ins_w: dict[int, float] = {}
    code = {65: 0, 67: 1, 71: 2, 84: 3}

    for (oseq, oqual), m in zip(oriented, mappings):
        tp = m.target_start
        qp = m.query_start if m.strand == 1 else len(oseq) - m.query_end
        for length, op in m.cigar:
            if op == 0:
                for j in range(length):
                    b = oseq[qp + j]
                    w = float(oqual[qp + j])
                    c = code.get(b)
                    if c is not None:
                        base_w[tp + j, c] += w
                    cov_w[tp + j] += w
                qp += length
                tp += length
            elif op == 1:
                w = float(oqual[qp])
                ins = oseq[qp : qp + length]
                key = tp - 1
                if key >= 0:
                    ins_votes.setdefault(key, Counter())[ins] += w
                    ins_w[key] = ins_w.get(key, 0.0) + w
                qp += length
            else:  # deletion: weight by the quality of the next aligned base
                w = float(oqual[min(qp, len(oqual) - 1)]) if len(oqual) else 63.0
                for j in range(length):
                    del_w[tp + j] += w
                    cov_w[tp + j] += w
                tp += length

    out = bytearray()
    bases = b"ACGT"
    for i in range(n):
        if cov_w[i] == 0:
            out.append(t_arr[i])
        else:
            best_c = int(np.argmax(base_w[i]))
            if del_w[i] > base_w[i].sum():
                pass  # majority deletion: drop this column
            elif base_w[i, best_c] > 0:
                out.append(bases[best_c])
            else:
                out.append(t_arr[i])
        iv = ins_votes.get(i)
        if iv:
            ins_seq, w = iv.most_common(1)[0]
            if w * 2 > cov_w[i] and cov_w[i] > 0:
                out.extend(ins_seq)
    return bytes(out)


def _consensus_for_cluster(
    cluster: list[int], twin_reads: list[TwinRead], cluster_idx: int, args: ClusterArgs
) -> bytes | None:
    """alignment.rs:226-392 — seed pick, read orientation, consensus."""
    seqs: list[bytes] = []
    quals: list[np.ndarray] = []
    avg_quals: list[float] = []
    for rid in cluster:
        s, q = _read_seq_and_qual(twin_reads[rid])
        seqs.append(s)
        quals.append(q)
        avg_quals.append(_avg_qual(twin_reads[rid]))

    # seed = 90th-percentile-length sequence (alignment.rs:266-280)
    lengths_i = sorted((len(s), i) for i, s in enumerate(seqs))
    seed_idx = lengths_i[int(len(lengths_i) * 0.9)][1]
    # top-75 by average quality, stable on ties
    order = sorted(range(len(seqs)), key=lambda i: -avg_quals[i])[:MAX_SEQS_POA]

    seed = seqs[seed_idx]
    oriented: list[tuple[bytes, np.ndarray]] = []
    mappings: list[Mapping] = []
    collected: list[int] = []
    for i in sorted(order):  # reference sorts mappings by read index (l.305)
        if i == seed_idx:
            continue
        m = align_pair(seqs[i], seed)
        if m is None:
            continue
        if m.strand == -1:
            oriented.append((revcomp_bytes(seqs[i]), quals[i][::-1]))
        else:
            oriented.append((seqs[i], quals[i]))
        mappings.append(m)
        collected.append(i)
        if len(oriented) + 1 > MAX_SEQS_POA:
            break

    # iterative template polish (2 rounds); round 1 reuses the seed mappings
    template = seed
    for it in range(2):
        if it > 0:
            new_mappings = []
            new_oriented = []
            for (oseq, oqual) in oriented:
                m = align_pair(oseq, template)
                if m is None:
                    continue
                # oseq is already oriented to the seed; template keeps that
                # orientation, so re-orient only if the aligner disagrees
                if m.strand == -1:
                    oseq, oqual = revcomp_bytes(oseq), oqual[::-1]
                    m = align_pair(oseq, template)
                    if m is None:
                        continue
                new_mappings.append(m)
                new_oriented.append((oseq, oqual))
            mappings, oriented = new_mappings, new_oriented
        if not mappings:
            break
        template = _vote_consensus(template, oriented, mappings)

    if args.use_hpc:
        hpc, _ = homopolymer_compress(np.frombuffer(template, dtype=np.uint8), True)
        template = hpc.tobytes()

    if len(template) < 40:  # buffer*2 check (alignment.rs:378-381)
        log.warning("consensus for cluster %d too short (%d)", cluster_idx, len(template))
        return None
    return template


def align_and_consensus(
    twin_reads: list[TwinRead], clusters: list[list[int]], args: ClusterArgs
) -> list[ConsensusSequence]:
    """alignment.rs:218-405."""
    out: list[tuple[int, bytes, int, list[int]]] = []
    for cluster_idx, cluster in enumerate(clusters):
        cons = _consensus_for_cluster(cluster, twin_reads, cluster_idx, args)
        if cons is None:
            continue
        out.append((cluster_idx, cons, len(cluster), list(cluster)))
        log.debug("consensus %d: %d reads, %d bp", cluster_idx, len(cluster), len(cons))
    out.sort(key=lambda x: -x[2])  # depth desc, stable
    res = [
        ConsensusSequence(
            sequence=np.frombuffer(seq, dtype=np.uint8).copy(),
            hp_lengths=np.ones(len(seq), dtype=np.uint8),
            depth=depth,
            id=cid,
            cluster=cluster,
        )
        for cid, seq, depth, cluster in out
    ]
    log.info("Stage 4a: %d consensus sequences", len(res))
    return res


# ── pileup generation (alignment.rs:409-652) ─────────────────────────────────


def generate_consensus_pileups(
    twin_reads: list[TwinRead], consensuses: list[ConsensusSequence], args: ClusterArgs
) -> list[list[Pileup]]:
    pileups: list[list[Pileup]] = []
    for cons in consensuses:
        cseq = cons.sequence.tobytes()
        pile = [Pileup(p, cons.sequence[p], int(cons.hp_lengths[p])) for p in range(len(cseq))]
        n_align = min(len(cons.cluster), MAX_SEQS_CONSENSUS)
        for i in range(n_align):
            tr = twin_reads[cons.cluster[i]]
            seq, qual = _read_seq_and_qual(tr)
            if args.use_hpc:
                arr = np.frombuffer(seq, dtype=np.uint8)
                hpc_seq, hp_lens = homopolymer_compress(arr, True)
                # min-quality per run
                # (utils.rs:136-184; expand via run boundaries)
                idx = np.repeat(np.arange(len(hpc_seq)), hp_lens.astype(np.int64))
                hq = np.full(len(hpc_seq), 255, dtype=np.uint8)
                np.minimum.at(hq, idx, qual)
                seq, qual, hp = hpc_seq.tobytes(), hq, hp_lens
            else:
                hp = np.ones(len(seq), dtype=np.uint8)
            m = align_pair(seq, cseq)
            if m is None:
                continue
            if m.strand == -1:
                oseq = revcomp_bytes(seq)
                oqual = qual[::-1]
                ohp = hp[::-1]
                q0 = len(seq) - m.query_end
            else:
                oseq, oqual, ohp = seq, qual, hp
                q0 = m.query_start
            tp = m.target_start
            qp = q0
            for length, op in m.cigar:
                if op == 0:
                    for j in range(length):
                        if tp + j < len(pile) and qp + j < len(oseq):
                            pile[tp + j].bases.append(("B", oseq[qp + j], int(oqual[qp + j]), int(ohp[qp + j])))
                    tp += length
                    qp += length
                elif op == 1:
                    if tp > 0 and tp - 1 < len(pile) and qp + length <= len(oseq):
                        ins = [
                            (oseq[qp + j], int(oqual[qp + j]), int(ohp[qp + j]))
                            for j in range(min(length, MAX_INSERTION_LENGTH))
                        ]
                        pile[tp - 1].bases.append(("I", ins))
                    qp += length
                else:
                    for j in range(length):
                        if tp + j < len(pile):
                            pile[tp + j].bases.append(("D",))
                    tp += length
        pileups.append(pile)

    # modal (median) HP length per position (alignment.rs:580-620)
    for pile in pileups:
        for p in pile:
            hps = sorted(b[3] for b in p.bases if b[0] == "B")
            if hps:
                mid = len(hps) // 2
                p.ref_hp_length = (hps[mid - 1] + hps[mid]) // 2 if len(hps) % 2 == 0 else hps[mid]
            else:
                p.ref_hp_length = 1
    for cons, pile in zip(consensuses, pileups):
        cons.hp_lengths = np.array([p.ref_hp_length for p in pile], dtype=np.uint8)
    return pileups


# ── quality calibration (alignment.rs:656-779) ───────────────────────────────


def estimate_quality_error_rates(
    pileups: list[list[Pileup]], consensuses: list[ConsensusSequence], top_frac: float = 0.1
) -> dict[int, float]:
    depths = sorted(((c.depth, i) for i, c in enumerate(consensuses)), key=lambda x: -x[0])
    n_top = round(top_frac * len(depths))
    top = [i for _, i in depths[:n_top]]
    stats: dict[int, list[int]] = {}  # qual -> [errors, total] with +1/+1 prior
    for ci in top:
        if ci >= len(pileups):
            continue
        for p in pileups[ci]:
            total = len(p.bases)
            if total == 0:
                continue
            errs = sum(
                1
                for b in p.bases
                if b[0] != "B" or b[1] != p.ref_base
            )
            if errs / total >= 0.05:
                continue
            for b in p.bases:
                if b[0] == "B":
                    st = stats.setdefault(b[2], [1, 1])
                    st[1] += 1
                    if b[1] != p.ref_base:
                        st[0] += 1
    return {q: (e / t if t else 0.0) for q, (e, t) in stats.items()}


# ── Bayesian polish / flagging (alignment.rs:857-1153) ───────────────────────


def _log_sum_exp(a: float, b: float) -> float:
    m = max(a, b)
    if m == -math.inf:
        return -math.inf
    return m + math.log(math.exp(a - m) + math.exp(b - m))


def analyze_pileup_consensuses(
    pileups: list[list[Pileup]],
    consensuses: list[ConsensusSequence],
    quality_error_map: dict[int, float],
    args: ClusterArgs,
) -> list[ConsensusSequence]:
    """Trim low-coverage ends, flag low-posterior positions, N-mask bad end
    regions, split off low-quality consensuses.  Returns the low-quality
    ones; `consensuses` is filtered in place."""
    bad_length_threshold = 100
    min_cov_abs = max(args.min_cluster_size * 3 // 4, 2)
    indel_q = 48
    indel_rate = quality_error_map.get(indel_q, DEFAULT_ERR_RATE)
    ln = math.log

    for ci, pile in enumerate(pileups):
        if not pile:
            continue
        max_depth = max(p.depth() for p in pile)
        min_cov = max(max_depth // 3, min_cov_abs)
        start_idx = 0
        end_idx = len(pile)
        for i, p in enumerate(pile):
            if p.depth() >= min_cov:
                start_idx = i
                break
        for i in range(len(pile) - 1, -1, -1):
            if pile[i].depth() >= min_cov:
                end_idx = i + 1
                break
        if start_idx >= end_idx:
            log.warning("consensus %d has no sufficiently covered positions", ci)
            continue
        trimmed = pile[start_idx:end_idx]
        pileups[ci] = trimmed

        post_threshold = min(args.posterior_threshold_ln, args.min_cluster_size * 3)
        for p in trimmed:
            lp_ref = 0.0
            lp_alt = 0.0
            for b in p.bases:
                if b[0] == "B":
                    er = quality_error_map.get(b[2], DEFAULT_ERR_RATE)
                    acc = 1.0 - er
                    if b[1] == p.ref_base:
                        lp_ref += ln(acc)
                        lp_alt += ln(er)
                    else:
                        lp_ref += ln(er)
                        lp_alt += ln(acc)
                elif b[0] == "D":
                    lp_ref += ln(indel_rate)
                    lp_alt += ln(1.0 - indel_rate)
                else:  # insertion: single evidence from its first base
                    q0 = b[1][0][1] if b[1] else indel_q
                    er = quality_error_map.get(q0, DEFAULT_ERR_RATE)
                    lp_alt += ln(1.0 - er)
                    lp_ref += ln(er)
            alt_post = lp_alt - _log_sum_exp(lp_ref, lp_alt)
            if alt_post > -post_threshold:
                p.alt_posterior = alt_post

    # N-mask end regions + record low-quality positions (alignment.rs:1072-1121)
    for ci, cons in enumerate(consensuses):
        pile = pileups[ci]
        if not pile:
            continue
        low_conf = [p.ref_pos for p in pile if p.alt_posterior is not None]
        left_start = pile[0].ref_pos
        right_end = pile[-1].ref_pos + 1
        start_polish = bad_length_threshold + left_start
        end_polish = right_end - bad_length_threshold
        lc_left = max((p for p in low_conf if p < start_polish), default=left_start)
        lc_right = min((p for p in low_conf if p >= end_polish), default=right_end)
        if lc_left > 0:
            cons.sequence[:lc_left] = ord("N")
        if lc_right < len(cons.sequence):
            cons.sequence[lc_right:] = ord("N")
        for p in pile:
            if p.alt_posterior is not None:
                if args.mask_low_quality:
                    cons.sequence[p.ref_pos] = ord("N")
                if lc_left < p.ref_pos < lc_right:
                    cons.low_quality_positions.append(p.ref_pos)

    def lq(c: ConsensusSequence) -> bool:
        n = len(c.low_quality_positions)
        return n > 0 and c.depth // (n * n) < args.n_depth_cutoff

    low_quality = [c for c in consensuses if lq(c)]
    consensuses[:] = [c for c in consensuses if not lq(c)]
    log.info("Stage 4: %d low-quality consensuses split off, %d kept", len(low_quality), len(consensuses))
    return low_quality
