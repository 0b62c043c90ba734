"""Stage 7: EM depth refinement (alignment.rs:1512-2304)."""
from __future__ import annotations

import logging

import numpy as np

from ..config import ClusterArgs
from ..constants import EM_MAX_ITERATIONS, EM_MINIMIZER_RATIO_BASE, EM_RATIO_THRESHOLD
from ..core import ConsensusSequence, KmerGlobalInfo, TwinRead
from ..ops.align import TargetIndex
from ..ops.align_batch import align_pairs, map_batch
from ..ops.encode import U64

log = logging.getLogger("savont")


def _run_em(eq_classes: dict[tuple[int, ...], int], n_asvs: int, total_assigned: int) -> np.ndarray:
    """Standard EM over equivalence classes (alignment.rs:1951-2003)."""
    abund = np.full(n_asvs, 1.0 / n_asvs)
    conv = 0.01 / total_assigned
    for _ in range(EM_MAX_ITERATIONS):
        new = np.zeros(n_asvs)
        for asvs, count in eq_classes.items():
            denom = sum(abund[a] for a in asvs)
            if denom > 0:
                for a in asvs:
                    new[a] += count * abund[a] / denom
        if new.sum() > 0:
            new /= total_assigned
        max_change = float(np.abs(abund - new).max())
        abund = new
        if max_change < conv:
            break
    return abund


def _apply_depths(consensuses: list[ConsensusSequence], abund: np.ndarray, total: int) -> list[ConsensusSequence]:
    for i, c in enumerate(consensuses):
        c.depth = int(round(abund[i] * total))
    out = [c for c in consensuses if c.depth > 0]
    log.info("Stage 7: %d ASVs remain after EM (dropped %d zero-depth)", len(out), len(consensuses) - len(out))
    return out


def _snpmer_candidates(
    tr: TwinRead,
    asv_snpmer_index: dict[int, list[tuple[int, int]]],
    asv_mini_sets: list[np.ndarray],
    k: int,
    c_rate: int,
) -> list[tuple[int, int]]:
    """Candidate (asv_idx, snpmer_mismatches) pairs passing the ratio gates
    (alignment.rs:1779-1836)."""
    mask = U64(np.uint64(0xFFFFFFFFFFFFFFFF) ^ np.uint64(3 << (k - 1)))
    stats: dict[int, list[int]] = {}
    for km in tr.snpmer_kmers():
        for asv, ck in asv_snpmer_index.get(int(km & mask), ()):  # type: ignore[arg-type]
            st = stats.setdefault(asv, [0, 0])
            if int(km) == ck:
                st[0] += 1
            else:
                st[1] += 1

    read_minis = np.unique(tr.minimizer_kmers())
    min_ratio_thresh = EM_MINIMIZER_RATIO_BASE ** k
    scored: list[tuple[int, float, int]] = []
    for asv, (m, mm) in stats.items():
        asv_minis = asv_mini_sets[asv]
        mini_matches = int(np.isin(read_minis, asv_minis, assume_unique=True).sum())
        if mini_matches == 0:
            continue
        if mini_matches / min(len(read_minis), len(asv_minis)) < min_ratio_thresh:
            continue
        ratio = mm / mini_matches / c_rate
        scored.append((asv, ratio, mm))
    best = [(a, mm) for a, r, mm in scored if r <= EM_RATIO_THRESHOLD]
    if not best:
        return []
    best.sort(key=lambda x: x[1])
    lowest = best[0][1]
    return [(a, mm) for a, mm in best if mm == lowest]


def refine_asv_depths_with_em(
    twin_reads: list[TwinRead],
    consensuses: list[ConsensusSequence],
    kmer_info: KmerGlobalInfo,
    args: ClusterArgs,
    build_asv_twin_reads,
    sample_filter: int | None = None,
) -> tuple[list[ConsensusSequence], dict[tuple[int, ...], int], int]:
    """SNPmer-candidate + alignment-tie-break EM (alignment.rs:1716-2033).

    build_asv_twin_reads: callable returning the ASVs as TwinReads.
    sample_filter: if set, only reads with that file_idx participate
    (per-sample quantification, alignment.rs:2038-2209) and depths are NOT
    applied; returns (consensuses unchanged, eq_classes, total).
    """
    if not consensuses:
        return consensuses, {}, 0
    asv_trs: list[TwinRead] = build_asv_twin_reads()
    k = args.kmer_size
    mask = U64(np.uint64(0xFFFFFFFFFFFFFFFF) ^ np.uint64(3 << (k - 1)))

    asv_snpmer_index: dict[int, list[tuple[int, int]]] = {}
    for ai, atr in enumerate(asv_trs):
        _, kms = atr.snpmers_vec()
        for km in kms:
            asv_snpmer_index.setdefault(int(km & mask), []).append((ai, int(km)))
    asv_mini_sets = [np.unique(a.minimizer_kmers()) for a in asv_trs]
    asv_seqs = [a.seq_bytes() for a in asv_trs]

    eq_classes: dict[tuple[int, ...], int] = {}
    unambig = np.zeros(len(consensuses), dtype=np.int64)
    ambig = np.zeros(len(consensuses), dtype=np.int64)
    leq10 = np.zeros(len(consensuses), dtype=np.int64)
    total_assigned = 0
    filtered = 0

    # gather candidates for all reads, then batch the tie-break alignments
    read_list = [
        tr for tr in twin_reads if sample_filter is None or tr.file_idx == sample_filter
    ]
    read_cands: list[list[tuple[int, int]]] = []
    pairs, owners = [], []
    for ri, tr in enumerate(read_list):
        cands = _snpmer_candidates(tr, asv_snpmer_index, asv_mini_sets, k, args.c)
        read_cands.append(cands)
        if cands:
            read_seq = tr.seq_bytes()
            for asv, _mm in cands:
                pairs.append((asv_seqs[asv], read_seq))
                owners.append((ri, asv))
    aln_results = align_pairs(pairs)
    nm_by_read: dict[int, list[tuple[int, int]]] = {}
    for (ri, asv), m in zip(owners, aln_results):
        if m is not None:
            nm_by_read.setdefault(ri, []).append((asv, m.nm))

    for ri, tr in enumerate(read_list):
        if not read_cands[ri]:
            filtered += 1
            continue
        best_alns = nm_by_read.get(ri, [])
        if not best_alns:
            filtered += 1
            continue
        best_alns.sort(key=lambda x: x[1])
        best_nm = best_alns[0][1]
        best_set = sorted({a for a, nm in best_alns if nm == best_nm})
        if sample_filter is None:
            if len(best_set) == 1:
                unambig[best_set[0]] += 1
            else:
                for a in best_set:
                    ambig[a] += 1
            if best_nm <= 10:
                for a in best_set:
                    leq10[a] += 1
        eq_classes[tuple(best_set)] = eq_classes.get(tuple(best_set), 0) + 1
        total_assigned += 1

    log.info("Stage 7: %d reads assigned, %d filtered, %d eq classes", total_assigned, filtered, len(eq_classes))
    if not eq_classes:
        return consensuses, eq_classes, total_assigned

    if sample_filter is None:
        for i, c in enumerate(consensuses):
            c.unambig_best_read_map_count = int(unambig[i])
            c.ambig_read_map_count = int(ambig[i])
            c.num_map_leq_10nm = int(leq10[i])
        abund = _run_em(eq_classes, len(consensuses), total_assigned)
        consensuses = _apply_depths(consensuses, abund, total_assigned)
    return consensuses, eq_classes, total_assigned


def refine_asv_depths_with_minimap(
    twin_reads: list[TwinRead],
    consensuses: list[ConsensusSequence],
    args: ClusterArgs,
    sample_filter: int | None = None,
) -> tuple[list[ConsensusSequence], dict[tuple[int, ...], int], int]:
    """Low-polymorphism path: pure alignment mapping with mapq>0 gate
    (alignment.rs:1520-1712)."""
    if not consensuses:
        return consensuses, {}, 0
    index = TargetIndex([c.get_decompressed() for c in consensuses])
    eq_classes: dict[tuple[int, ...], int] = {}
    unambig = np.zeros(len(consensuses), dtype=np.int64)
    ambig = np.zeros(len(consensuses), dtype=np.int64)
    leq10 = np.zeros(len(consensuses), dtype=np.int64)
    total_assigned = 0
    filtered = 0
    read_list = [tr for tr in twin_reads if sample_filter is None or tr.file_idx == sample_filter]
    all_hits = map_batch(index, [tr.seq_bytes() for tr in read_list])
    for tr, raw_hits in zip(read_list, all_hits):
        hits = [m for m in raw_hits if m.mapq > 0]
        if not hits:
            filtered += 1
            continue
        best_nm = min(m.nm for m in hits)
        best_set = sorted({m.target_id for m in hits if m.nm == best_nm})
        if sample_filter is None:
            if len(best_set) == 1:
                unambig[best_set[0]] += 1
            else:
                for a in best_set:
                    ambig[a] += 1
            if best_nm <= 10:
                for a in best_set:
                    leq10[a] += 1
        eq_classes[tuple(best_set)] = eq_classes.get(tuple(best_set), 0) + 1
        total_assigned += 1

    log.info("Stage 7 (low-poly): %d assigned, %d filtered", total_assigned, filtered)
    if not eq_classes:
        return consensuses, eq_classes, total_assigned
    if sample_filter is None:
        for i, c in enumerate(consensuses):
            c.unambig_best_read_map_count = int(unambig[i])
            c.ambig_read_map_count = int(ambig[i])
            c.num_map_leq_10nm = int(leq10[i])
        abund = _run_em(eq_classes, len(consensuses), total_assigned)
        consensuses = _apply_depths(consensuses, abund, total_assigned)
    return consensuses, eq_classes, total_assigned


def compute_per_sample_depths(
    twin_reads: list[TwinRead],
    n_samples: int,
    consensuses: list[ConsensusSequence],
    kmer_info: KmerGlobalInfo,
    args: ClusterArgs,
    build_asv_twin_reads,
) -> list[list[int]]:
    """Per-sample EM (alignment.rs:2038-2304)."""
    n_asvs = len(consensuses)
    result = [[0] * n_samples for _ in range(n_asvs)]
    if n_asvs == 0 or n_samples == 0:
        return result
    for s in range(n_samples):
        if args.low_polymorphism:
            _, eq, total = refine_asv_depths_with_minimap(twin_reads, consensuses, args, sample_filter=s)
        else:
            _, eq, total = refine_asv_depths_with_em(
                twin_reads, consensuses, kmer_info, args, build_asv_twin_reads, sample_filter=s
            )
        if not eq or total == 0:
            continue
        abund = _run_em(eq, n_asvs, total)
        for i in range(n_asvs):
            result[i][s] = int(round(abund[i] * total))
    return result
