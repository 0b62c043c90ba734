"""Stage 4: consensus generation + pileup-based Bayesian polishing.

Reference: alignment.rs:190-1153.  The spoa POA graph (C++ FFI) is replaced
by a TPU-friendly seed + iterative pileup-vote consensus: pick the
90th-percentile-length read as template, batch-align the top-quality reads
to it with the banded kernel, and take the quality-weighted majority at each
column (including short insertions).  The reference's own Bayesian polish
(which only FLAGS positions; the base calls come from the consensus) then
runs unchanged on pileups of up to 250 reads.

All alignments across ALL clusters are batched into single banded-DP sweeps
(ops/align_batch) — the batching discipline that buys TPU throughput.
"""
from __future__ import annotations

import logging
import math
from collections import Counter

import numpy as np

from ..config import ClusterArgs
from ..constants import DEFAULT_ERR_RATE, MAX_INSERTION_LENGTH, MAX_SEQS_CONSENSUS, MAX_SEQS_POA
from ..core import ConsensusSequence, TwinRead
from ..ops.align import Mapping
from ..ops.align_batch import align_pairs
from ..ops.encode import homopolymer_compress, revcomp_bytes

log = logging.getLogger("savont")


class Pileup:
    __slots__ = ("ref_pos", "ref_base", "ref_hp_length", "bases", "alt_posterior")

    def __init__(self, ref_pos: int, ref_base: int, ref_hp_length: int):
        self.ref_pos = ref_pos
        self.ref_base = ref_base
        self.ref_hp_length = ref_hp_length
        # entries: ('B', base, qual, hp) | ('D',) | ('I', [(base,qual,hp)...])
        self.bases: list[tuple] = []
        self.alt_posterior: float | None = None

    def depth(self) -> int:
        return len(self.bases)


def _read_seq_and_qual(tr: TwinRead) -> tuple[bytes, np.ndarray]:
    """ASCII sequence + per-base expanded binned qualities
    (alignment.rs:231-258)."""
    return tr.seq_bytes(), tr.expanded_qual_ascii()


def _avg_qual(tr: TwinRead) -> float:
    """Mean per-BIN accuracy (alignment.rs:239-245: average over binned
    quality values, one per 4-base bin)."""
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
    """Quality-weighted majority vote against the template (one round)."""
    n = len(template)
    t_arr = np.frombuffer(template, dtype=np.uint8)
    base_w = np.zeros((n, 4), dtype=np.float64)
    del_w = np.zeros(n, dtype=np.float64)
    cov_w = np.zeros(n, dtype=np.float64)
    ins_votes: dict[int, Counter] = {}
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
                key = tp - 1
                if key >= 0:
                    ins_votes.setdefault(key, Counter())[oseq[qp : qp + length]] += w
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
                pass  # majority deletion: drop column
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


def align_and_consensus(
    twin_reads: list[TwinRead], clusters: list[list[int]], args: ClusterArgs
) -> list[ConsensusSequence]:
    """alignment.rs:218-405, with alignments batched across all clusters."""
    # per-cluster prep
    ctx = []
    for cluster in clusters:
        seqs, quals, avgq = [], [], []
        for rid in cluster:
            s, q = _read_seq_and_qual(twin_reads[rid])
            seqs.append(s)
            quals.append(q)
            avgq.append(_avg_qual(twin_reads[rid]))
        lengths_i = sorted((len(s), i) for i, s in enumerate(seqs))
        seed_idx = lengths_i[int(len(lengths_i) * 0.9)][1]
        order = sorted(range(len(seqs)), key=lambda i: -avgq[i])[:MAX_SEQS_POA]
        cands = sorted(i for i in order if i != seed_idx)
        ctx.append({"seqs": seqs, "quals": quals, "seed": seed_idx, "cands": cands})

    # round 1: align candidates to seed, batched over all clusters
    pairs, owners = [], []
    for cid, c in enumerate(ctx):
        seed_seq = c["seqs"][c["seed"]]
        for i in c["cands"]:
            pairs.append((c["seqs"][i], seed_seq))
            owners.append((cid, i))
    res = align_pairs(pairs)

    oriented_by_cluster: dict[int, list[tuple[bytes, np.ndarray]]] = {}
    mappings_by_cluster: dict[int, list[Mapping]] = {}
    for (cid, i), m in zip(owners, res):
        if m is None:
            continue
        c = ctx[cid]
        if m.strand == -1:
            o = (revcomp_bytes(c["seqs"][i]), c["quals"][i][::-1])
        else:
            o = (c["seqs"][i], c["quals"][i])
        oriented_by_cluster.setdefault(cid, []).append(o)
        mappings_by_cluster.setdefault(cid, []).append(m)

    templates: dict[int, bytes] = {}
    for cid, c in enumerate(ctx):
        seed_seq = c["seqs"][c["seed"]]
        ori = oriented_by_cluster.get(cid, [])
        mps = mappings_by_cluster.get(cid, [])
        templates[cid] = _vote_consensus(seed_seq, ori, mps) if mps else seed_seq

    # round 2: re-align oriented reads to round-1 templates, batched
    pairs2, owners2 = [], []
    for cid in range(len(ctx)):
        for slot, (oseq, _) in enumerate(oriented_by_cluster.get(cid, [])):
            pairs2.append((oseq, templates[cid]))
            owners2.append((cid, slot))
    res2 = align_pairs(pairs2)
    ori2: dict[int, list] = {}
    mps2: dict[int, list] = {}
    for (cid, slot), m in zip(owners2, res2):
        if m is None:
            continue
        oseq, oqual = oriented_by_cluster[cid][slot]
        if m.strand == -1:  # template flipped orientation (rare) — skip read
            continue
        ori2.setdefault(cid, []).append((oseq, oqual))
        mps2.setdefault(cid, []).append(m)

    out: list[tuple[int, bytes, int, list[int]]] = []
    for cid, cluster in enumerate(clusters):
        template = templates[cid]
        if mps2.get(cid):
            template = _vote_consensus(template, ori2[cid], mps2[cid])
        if args.use_hpc:
            hpc, _ = homopolymer_compress(np.frombuffer(template, dtype=np.uint8), True)
            template = hpc.tobytes()
        if len(template) < 40:  # 2*buffer check (alignment.rs:378-381)
            log.warning("consensus for cluster %d too short (%d bp)", cid, len(template))
            continue
        out.append((cid, template, len(cluster), list(cluster)))

    out.sort(key=lambda x: -x[2])  # depth desc, stable
    res_list = [
        ConsensusSequence(
            sequence=np.frombuffer(seq, dtype=np.uint8).copy(),
            hp_lengths=np.ones(len(seq), dtype=np.uint8),
            depth=depth,
            id=cid,
            cluster=cluster,
        )
        for cid, seq, depth, cluster in out
    ]
    log.info("Stage 4a: %d consensus sequences", len(res_list))
    return res_list


# ── pileup generation (alignment.rs:409-652) ─────────────────────────────────


def generate_consensus_pileups(
    twin_reads: list[TwinRead], consensuses: list[ConsensusSequence], args: ClusterArgs
) -> list[list[Pileup]]:
    # plan all read->consensus alignments in one batch
    pairs, owners, payload = [], [], []
    for ci, cons in enumerate(consensuses):
        cseq = cons.sequence.tobytes()
        for i in range(min(len(cons.cluster), MAX_SEQS_CONSENSUS)):
            tr = twin_reads[cons.cluster[i]]
            seq, qual = _read_seq_and_qual(tr)
            if args.use_hpc:
                arr = np.frombuffer(seq, dtype=np.uint8)
                hpc_seq, hp_lens = homopolymer_compress(arr, True)
                idx = np.repeat(np.arange(len(hpc_seq)), hp_lens.astype(np.int64))
                hq = np.full(len(hpc_seq), 255, dtype=np.uint8)
                np.minimum.at(hq, idx, qual)
                seq, qual, hp = hpc_seq.tobytes(), hq, hp_lens
            else:
                hp = np.ones(len(seq), dtype=np.uint8)
            pairs.append((seq, cseq))
            owners.append(ci)
            payload.append((seq, qual, hp))
    results = align_pairs(pairs)

    pileups: list[list[Pileup]] = [
        [Pileup(p, cons.sequence[p], int(cons.hp_lengths[p])) for p in range(len(cons.sequence))]
        for cons in consensuses
    ]
    for ci, (seq, qual, hp), m in zip(owners, payload, results):
        if m is None:
            continue
        pile = pileups[ci]
        if m.strand == -1:
            oseq = revcomp_bytes(seq)
            oqual = qual[::-1]
            ohp = hp[::-1]
            q0 = len(seq) - m.query_end
        else:
            oseq, oqual, ohp = seq, qual, hp
            q0 = m.query_start
        tp, qp = m.target_start, q0
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
            errs = sum(1 for b in p.bases if b[0] != "B" or b[1] != p.ref_base)
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
        start_idx, end_idx = 0, len(pile)
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
                else:  # insertion: single extra evidence from its first base
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
