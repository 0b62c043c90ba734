"""Equivalence test for stage-7 SNPmer candidate generation: both the
bitmask minimizer join (n_asvs <= 64) and the pair-expansion fallback
(n_asvs > 64) must match a brute-force O(R*A) reference implementation
of alignment.rs:1779-1836 semantics."""
import numpy as np
import pytest

from savont_tpu.constants import EM_MINIMIZER_RATIO_BASE, EM_RATIO_THRESHOLD
from savont_tpu.core import TwinRead
from savont_tpu.ops.encode import U64
from savont_tpu.pipeline.stage7_em import _all_snpmer_candidates

K = 17
C_RATE = 11


def _mk_tr(rng, splitmer_pool, mini_pool, n_snp, n_mini, name):
    sp = rng.choice(splitmer_pool, size=n_snp, replace=True)
    mids = rng.integers(0, 4, size=n_snp).astype(np.uint64)
    kms = (sp | (mids << np.uint64(K - 1))).astype(U64)
    minis = rng.choice(mini_pool, size=n_mini, replace=True).astype(U64)
    tr = TwinRead(
        id=name,
        base_id=name,
        codes=np.zeros(64, np.uint8),
        k=K,
        l=3,
        snp_pos=np.arange(n_snp, dtype=np.uint32),
        snp_kmers_all=kms,
        mini_kmers_all=minis,
    )
    # prime the snpmers_vec cache so ASV-side lookups see our fabricated
    # k-mers instead of recomputing from the dummy codes
    tr._snp_vec_cache = (tr.snp_pos, kms)
    return tr


def _brute_force(read_list, asv_trs):
    mask = np.uint64(0xFFFFFFFFFFFFFFFF) ^ np.uint64(3 << (K - 1))
    out = []
    asv_data = []
    for atr in asv_trs:
        _, kms = atr.snpmers_vec()
        asv_data.append((kms & mask, kms, np.unique(atr.minimizer_kmers())))
    min_ratio = EM_MINIMIZER_RATIO_BASE**K
    for tr in read_list:
        rk = tr.snpmer_kmers()
        rsp = rk & mask
        rmini = np.unique(tr.minimizer_kmers())
        cands = []
        for ai, (asp, akm, amini) in enumerate(asv_data):
            mm = m = 0
            for q_sp, q_km in zip(rsp, rk):
                for t_sp, t_km in zip(asp, akm):
                    if q_sp == t_sp:
                        if q_km == t_km:
                            m += 1
                        else:
                            mm += 1
            shared = len(np.intersect1d(rmini, amini))
            denom = max(min(len(rmini), len(amini)), 1)
            if (
                (m + mm) > 0
                and shared > 0
                and shared / denom >= min_ratio
                and mm / max(shared, 1) / C_RATE <= EM_RATIO_THRESHOLD
            ):
                cands.append((ai, mm))
        if cands:
            lowest = min(mm for _, mm in cands)
            cands = [(ai, mm) for ai, mm in cands if mm == lowest]
        out.append(cands)
    return out


@pytest.mark.parametrize("n_asvs", [8, 70])
def test_candidates_match_brute_force(n_asvs):
    rng = np.random.default_rng(n_asvs)
    splitmer_pool = (
        rng.integers(0, 1 << 40, size=30, dtype=np.uint64)
        & (np.uint64(0xFFFFFFFFFFFFFFFF) ^ np.uint64(3 << (K - 1)))
    ).astype(U64)
    mini_pool = rng.integers(0, 1 << 40, size=120, dtype=np.uint64).astype(U64)
    asv_trs = [
        _mk_tr(rng, splitmer_pool, mini_pool, 12, 40, f"a{i}") for i in range(n_asvs)
    ]
    reads = [
        _mk_tr(rng, splitmer_pool, mini_pool, int(rng.integers(0, 10)), 30, f"r{i}")
        for i in range(40)
    ]
    cr, ca, cm = _all_snpmer_candidates(reads, asv_trs, K, C_RATE)
    got = [[] for _ in reads]
    for r, a, mm in zip(cr, ca, cm):
        got[r].append((int(a), int(mm)))
    want = _brute_force(reads, asv_trs)
    assert [sorted(g) for g in got] == [sorted(w) for w in want]


@pytest.mark.parametrize("n_asvs", [8, 20])
def test_candidates_fast_table_path(n_asvs):
    """ASVs with unique splitmers per ASV (the scan-time DEDUP_SNPMERS
    invariant) take the (splitmer x ASV) table fast path; results must
    still match brute force."""
    rng = np.random.default_rng(100 + n_asvs)
    splitmer_pool = (
        rng.integers(0, 1 << 40, size=40, dtype=np.uint64)
        & (np.uint64(0xFFFFFFFFFFFFFFFF) ^ np.uint64(3 << (K - 1)))
    ).astype(U64)
    mini_pool = rng.integers(0, 1 << 40, size=120, dtype=np.uint64).astype(U64)

    def mk_dedup_asv(i):
        sp = rng.choice(splitmer_pool, size=12, replace=False)  # unique per ASV
        mids = rng.integers(0, 4, size=12).astype(np.uint64)
        kms = (sp | (mids << np.uint64(K - 1))).astype(U64)
        minis = rng.choice(mini_pool, size=40, replace=True).astype(U64)
        tr = TwinRead(
            id=f"a{i}", base_id=f"a{i}", codes=np.zeros(64, np.uint8), k=K, l=3,
            snp_pos=np.arange(12, dtype=np.uint32), snp_kmers_all=kms,
            mini_kmers_all=minis,
        )
        tr._snp_vec_cache = (tr.snp_pos, kms)
        return tr

    asv_trs = [mk_dedup_asv(i) for i in range(n_asvs)]
    reads = [
        _mk_tr(rng, splitmer_pool, mini_pool, int(rng.integers(0, 10)), 30, f"r{i}")
        for i in range(40)
    ]
    cr, ca, cm = _all_snpmer_candidates(reads, asv_trs, K, C_RATE)
    got = [[] for _ in reads]
    for r, a, mm in zip(cr, ca, cm):
        got[r].append((int(a), int(mm)))
    want = _brute_force(reads, asv_trs)
    assert [sorted(g) for g in got] == [sorted(w) for w in want]
