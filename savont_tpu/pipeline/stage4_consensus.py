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
from collections import Counter

import numpy as np

from ..config import ClusterArgs
from ..constants import MAX_SEQS_POA
from ..core import ConsensusSequence, TwinRead
from ..ops.align import Mapping
from ..ops.align_batch import align_pairs
from ..ops.encode import homopolymer_compress, revcomp_bytes

log = logging.getLogger("savont")


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
