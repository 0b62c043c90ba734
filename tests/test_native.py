"""Native C++ kernel == NumPy reference kernel on random jobs."""
import numpy as np
import pytest

from savont_tpu.ops.align import TargetIndex
from savont_tpu.ops.align_batch import _run_bucket, _run_native, plan_jobs
from savont_tpu.ops.encode import revcomp_bytes
from savont_tpu.ops.native_build import get_lib

RNG = np.random.default_rng(21)


def rand_seq(n):
    return RNG.choice(np.frombuffer(b"ACGT", dtype=np.uint8), n).astype(np.uint8).tobytes()


@pytest.mark.skipif(get_lib() is None, reason="no C++ compiler / native kernel")
def test_native_matches_numpy():
    jobs = []
    for _ in range(30):
        t = rand_seq(1200 + int(RNG.integers(0, 600)))
        q = bytearray(t)
        for p in RNG.choice(len(q), int(RNG.integers(0, 60)), replace=False):
            q[p] = b"ACGT"[RNG.integers(4)]
        if RNG.random() < 0.4:
            del q[500 : 500 + int(RNG.integers(1, 8))]
        if RNG.random() < 0.4:
            q[900:900] = rand_seq(int(RNG.integers(1, 6)))
        if RNG.random() < 0.3:
            q = bytearray(revcomp_bytes(bytes(q)))
        jobs.extend(plan_jobs(TargetIndex([t]), bytes(q), min_anchors=2))
    assert jobs
    numpy_res = []
    for start in range(0, len(jobs), 64):
        numpy_res.extend(_run_bucket(jobs[start : start + 64], 128))
    native_res = _run_native(jobs, 128, get_lib())
    for a, b in zip(numpy_res, native_res):
        assert (a is None) == (b is None)
        if a is not None:
            assert a[:5] == b[:5] and a[6] == b[6], f"native != numpy: {a[:5]} vs {b[:5]}"
            assert np.array_equal(a[5], b[5])


def test_window_minimizers_native_parity():
    from savont_tpu.ops.align import _window_minimizers_numpy
    from savont_tpu.ops.kmers_native import get_scan_lib, window_minimizers_native

    if get_scan_lib() is None:
        import pytest

        pytest.skip("native lib unavailable")
    seqs = []
    for i in range(40):
        n = int(RNG.integers(5, 2000))
        s = RNG.integers(0, 4, n).astype(np.uint8)
        for p in RNG.choice(n, min(n, int(RNG.integers(0, 5))), replace=False):
            s[p] = 4  # ambiguous
        seqs.append(s)
    for w, k in [(10, 15), (5, 21), (28, 31), (10, 1)]:
        native = window_minimizers_native(seqs, k, w)
        for s, (nh, npos, nf) in zip(seqs, native):
            h, pos, isf = _window_minimizers_numpy(s, w, k)
            assert np.array_equal(h, nh)
            assert np.array_equal(pos, npos)
            assert np.array_equal(isf, nf)


def test_chain_band_native_parity(monkeypatch):
    """Native chain+band planning produces identical jobs to the NumPy path."""
    from savont_tpu.ops import align_batch, kmers_native
    from savont_tpu.ops.align import TargetIndex
    from savont_tpu.ops.encode import revcomp_bytes

    if kmers_native.get_scan_lib() is None:
        import pytest

        pytest.skip("native lib unavailable")
    targets, queries = [], []
    for i in range(12):
        t = rand_seq(900 + int(RNG.integers(0, 900)))
        targets.append(t)
        for _ in range(4):
            q = bytearray(t)
            for p in RNG.choice(len(q), int(RNG.integers(0, 80)), replace=False):
                q[p] = b"ACGT"[RNG.integers(4)]
            if RNG.random() < 0.3:
                del q[400 : 400 + int(RNG.integers(1, 10))]
            if RNG.random() < 0.5:
                q = bytearray(revcomp_bytes(bytes(q)))
            queries.append(bytes(q))
    idx = TargetIndex(targets)
    jn, on = align_batch.plan_jobs_batch(idx, queries, band=96)
    monkeypatch.setattr(kmers_native, "get_scan_lib", lambda: None)
    jp, op = align_batch.plan_jobs_batch(idx, queries, band=96)
    assert on == op
    assert len(jn) == len(jp)
    for a, b in zip(jn, jp):
        assert a.target_id == b.target_id and a.strand == b.strand
        assert np.array_equal(a.qcodes, b.qcodes)
        assert np.array_equal(a.lo, b.lo), f"lo mismatch tid={a.target_id}"


def test_nm_kernel_exact_on_structural_indels():
    """The inter-pair SIMD NM kernel must equal the traceback kernel on raw
    planner bands, including rows with band jumps > 1 (large deletions) —
    band smoothing is NOT result-preserving there, so the kernel pre-shifts
    lanes instead."""
    from savont_tpu.ops.align import TargetIndex
    from savont_tpu.ops.align_batch import _run_native_nm, plan_jobs_batch, run_jobs
    from savont_tpu.ops.encode import revcomp_bytes
    from savont_tpu.ops.native_build import get_lib

    lib = get_lib()
    if lib is None:
        import pytest

        pytest.skip("native lib unavailable")
    targets = [rand_seq(x) for x in [1500] * 3 + [90, 400]]
    queries = []
    for t in targets:
        for _ in range(30):
            q = bytearray(t)
            for p in RNG.choice(len(q), max(2, len(q) // 20), replace=False):
                q[p] = b"ACGT"[RNG.integers(4)]
            if RNG.random() < 0.7 and len(q) > 1000:
                d = int(RNG.integers(300, 900))
                del q[d : d + int(RNG.integers(40, 160))]
            if RNG.random() < 0.5 and len(q) > 1000:
                d = int(RNG.integers(300, 900))
                q[d:d] = rand_seq(int(RNG.integers(40, 160)))
            if RNG.random() < 0.5:
                q = bytearray(revcomp_bytes(bytes(q)))
            queries.append(bytes(q))
    jobs, _ = plan_jobs_batch(TargetIndex(targets), queries, band=128)
    assert jobs
    tb = run_jobs(jobs, band=128)
    nm = _run_native_nm(jobs, 128, lib)
    for a, b in zip(tb, nm):
        assert (a is None) == (b is None)
        if a is not None:
            assert (a[0], a[1], a[2], a[3], a[4], a[6]) == (b[0], b[1], b[2], b[3], b[4], b[6])


def test_tb_kernel_bitidentical_to_per_pair():
    """The inter-pair SIMD traceback kernel (sw_tb_batch) must produce
    byte-identical tuples — including full CIGARs — to the per-pair kernel
    on raw planner bands with structural indels."""
    from savont_tpu.ops.align import TargetIndex
    from savont_tpu.ops.align_batch import _run_native, plan_jobs_batch
    from savont_tpu.ops.encode import revcomp_bytes
    from savont_tpu.ops.native_build import get_lib

    lib = get_lib()
    if lib is None:
        import pytest

        pytest.skip("native lib unavailable")
    targets = [rand_seq(x) for x in [1500] * 3 + [90, 400, 2600]]
    queries = []
    for t in targets:
        for _ in range(25):
            q = bytearray(t)
            for p in RNG.choice(len(q), max(2, len(q) // 16), replace=False):
                q[p] = b"ACGT"[RNG.integers(4)]
            if RNG.random() < 0.5 and len(q) > 1000:
                d = int(RNG.integers(300, 900))
                del q[d : d + int(RNG.integers(1, 160))]
            if RNG.random() < 0.4 and len(q) > 1000:
                d = int(RNG.integers(300, 900))
                q[d:d] = rand_seq(int(RNG.integers(1, 160)))
            if RNG.random() < 0.5:
                q = bytearray(revcomp_bytes(bytes(q)))
            queries.append(bytes(q))
    jobs, _ = plan_jobs_batch(TargetIndex(targets), queries, band=128)
    assert jobs
    a_res = _run_native(jobs, 128, lib, simd=False)
    b_res = _run_native(jobs, 128, lib, simd=True)
    for a, b in zip(a_res, b_res):
        assert (a is None) == (b is None)
        if a is not None:
            assert a[:5] == b[:5] and a[6] == b[6]
            assert np.array_equal(a[5], b[5])


def test_sortcount_native_matches_numpy():
    """native/sortcount.cpp count_flagged_u64 vs the np.unique formulation,
    including multi-thread determinism and skewed/dense key distributions."""
    from savont_tpu.ops.kmers_native import count_flagged_native

    rng = np.random.default_rng(7)
    for n, span in [(0, 1), (1, 1), (1000, 50), (200_000, 10_000), (300_000, 40)]:
        bare = rng.integers(0, span, size=n, dtype=np.uint64)
        flag = rng.integers(0, 2, size=n, dtype=np.uint64)
        allk = (bare | (flag << np.uint64(63))).astype(np.uint64)
        uniq, cnt = np.unique(allk, return_counts=True)
        b = uniq & np.uint64(0x7FFFFFFFFFFFFFFF)
        f = (uniq >> np.uint64(63)).astype(np.int64)
        kmers, inv = np.unique(b, return_inverse=True)
        counts = np.zeros((len(kmers), 2), dtype=np.uint32)
        np.add.at(counts, (inv, f), cnt.astype(np.uint32))
        for threads in (1, 4):
            got = count_flagged_native(allk, threads)
            if got is None:
                return  # no compiler: NumPy fallback covered elsewhere
            gk, gc = got
            assert np.array_equal(gk, kmers), (n, span, threads)
            assert np.array_equal(gc, counts), (n, span, threads)


def test_lsh_batch_native_matches_python():
    """native lsh_batch vs TwinRead.compute_lsh_signatures, including reads
    with < bucket minimizers (None signatures) and hash-tie stability."""
    from savont_tpu.core import TwinRead, compute_lsh_signatures_batch
    from savont_tpu.ops.kmers_native import get_scan_lib

    rng = np.random.default_rng(11)
    trs = []
    for i in range(50):
        n = int(rng.integers(0, 40)) if i % 7 == 0 else int(rng.integers(3, 400))
        # duplicate values force FxHash ties: stable pick must match numpy's
        minis = rng.integers(0, 50, size=n, dtype=np.uint64)
        tr = TwinRead(id=f"r{i}", base_id=f"r{i}", codes=np.zeros(8, np.uint8), k=17, l=3)
        tr.mini_kmers_all = minis
        trs.append(tr)
    want = []
    for tr in trs:
        tr.compute_lsh_signatures()
        want.append(list(tr.lsh_signatures))
        tr.lsh_signatures = []
    compute_lsh_signatures_batch(trs, threads=3)
    if get_scan_lib() is None:
        # fallback path materializes per-read lists; equality is trivial
        assert [list(tr.lsh_signatures) for tr in trs] == want
        return
    # native path fills the MATRIX cache only (stage 2 consumes it); the
    # per-read lists stay empty by design
    from savont_tpu.core import cached_lsh_matrix

    sigs, valid = cached_lsh_matrix(trs)
    got = [
        (sigs[i].tolist() if valid[i] else [None] * len(want[i]))
        for i in range(len(trs))
    ]
    assert got == want


def test_lsh_greedy_cluster_native_matches_python(monkeypatch):
    """Native greedy LSH clustering vs the Python loop on synthetic reads
    engineered to hit multi-candidate buckets and borderline containments."""
    from savont_tpu.config import ClusterArgs
    from savont_tpu.core import TwinRead, compute_lsh_signatures_batch
    from savont_tpu.ops.kmers_native import get_scan_lib
    from savont_tpu.pipeline import stage23_cluster as s23

    if get_scan_lib() is None:
        return
    rng = np.random.default_rng(23)
    pool = rng.integers(0, 1 << 40, size=400, dtype=np.uint64)
    trs = []
    for fam in range(6):
        base = rng.choice(pool, 120, replace=False)
        for j in range(25):
            m = base.copy()
            # mutate a varying handful of minimizers to scatter similarities
            nmut = int(rng.integers(0, 30))
            if nmut:
                m[rng.choice(len(m), nmut, replace=False)] = rng.choice(pool, nmut)
            tr = TwinRead(id=f"f{fam}r{j}", base_id=f"f{fam}r{j}",
                          codes=np.zeros(8, np.uint8), k=17, l=3)
            tr.mini_kmers_all = m
            trs.append(tr)
    compute_lsh_signatures_batch(trs)
    args = ClusterArgs(input_files=[], output_dir="", min_cluster_size=2)

    native = s23.cluster_reads_by_kmers(trs, args)
    monkeypatch.setattr(s23, "_cluster_native", lambda *a: None)
    python = s23.cluster_reads_by_kmers(trs, args)
    assert native == python


def test_snpmer_subcluster_native_matches_python(monkeypatch):
    """Native greedy SNPmer sub-clustering vs the Python loop, with shared
    splitmers across synthetic reads to exercise match/mismatch scoring and
    the (most-matches, smallest-cluster, smallest-id) tie-break."""
    from savont_tpu.core import TwinRead
    from savont_tpu.ops import kmers_native
    from savont_tpu.ops.kmers_native import get_scan_lib
    from savont_tpu.pipeline import stage23_cluster as s23

    if get_scan_lib() is None:
        return
    k = 17
    rng = np.random.default_rng(31)
    mask = np.uint64(0xFFFFFFFFFFFFFFFF) ^ np.uint64(3 << (k - 1))
    sp_pool = (rng.integers(0, 1 << 40, 60, dtype=np.uint64) & mask).astype(np.uint64)
    trs = []
    for i in range(80):
        n = int(rng.integers(0, 25))
        sp = rng.choice(sp_pool, n)
        mid = rng.integers(0, 4, n).astype(np.uint64)
        tr = TwinRead(id=f"r{i}", base_id=f"r{i}", codes=np.zeros(8, np.uint8), k=k, l=3)
        tr.snp_kmers_all = (sp | (mid << np.uint64(k - 1))).astype(np.uint64)
        trs.append(tr)
    cluster = list(range(len(trs)))

    native = s23._snpmer_subcluster(cluster, trs, k, 1)
    monkeypatch.setattr(kmers_native, "snpmer_subcluster_native", lambda *a: None)
    python = s23._snpmer_subcluster(cluster, trs, k, 1)
    assert native == python


def test_kmer_at_positions_native_matches_python():
    from savont_tpu.ops.kmers import kmer_at_position
    from savont_tpu.ops.kmers_native import kmer_at_positions_native

    rng = np.random.default_rng(41)
    k = 17
    codes_list, pos_lists = [], []
    for _ in range(30):
        n = int(rng.integers(5, 400))
        codes_list.append(rng.integers(0, 4, n).astype(np.uint8))
        npos = 0 if n < k else int(rng.integers(0, n - k + 1))
        pos_lists.append(
            np.sort(rng.choice(n - k + 1, npos, replace=False)).astype(np.uint32)
            if npos
            else np.zeros(0, np.uint32)
        )
    got = kmer_at_positions_native(codes_list, pos_lists, k, threads=3)
    if got is None:
        return
    for c, p, g in zip(codes_list, pos_lists, got):
        assert np.array_equal(g, kmer_at_position(c, p, k))


def test_anchor_keys_native_matches_numpy(monkeypatch):
    """plan_jobs_batch native anchor path vs the numpy expansion path:
    identical job lists (targets, strands, band offsets, owners)."""
    from savont_tpu.ops import kmers_native
    from savont_tpu.ops.align import TargetIndex
    from savont_tpu.ops.align_batch import plan_jobs_batch
    from savont_tpu.ops.kmers_native import get_sort_lib

    if get_sort_lib() is None:
        return
    rng = np.random.default_rng(53)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    targets = [rng.choice(bases, int(rng.integers(300, 700))).tobytes() for _ in range(7)]
    queries = []
    for i in range(12):
        t = bytearray(targets[i % len(targets)])
        for p in rng.choice(len(t), 12, replace=False):
            t[p] = b"ACGT"[rng.integers(4)]
        q = bytes(t)
        if i % 3 == 0:
            from savont_tpu.ops.encode import revcomp_bytes
            q = revcomp_bytes(q)
        queries.append(q)
    index = TargetIndex(targets)

    def run():
        jobs, owners = plan_jobs_batch(index, queries, band=64, min_anchors=2, no_diag=False)
        return [
            (o, j.target_id, j.strand, j.fwd_qlen, j.qcodes.tobytes(), j.lo.tobytes())
            for o, j in zip(owners, jobs)
        ]

    native = run()
    monkeypatch.setattr(kmers_native, "anchor_sorted_keys_native", lambda *a, **k: None)
    python = run()
    assert native == python and len(native) > 0


def test_snpmer_join_count_native_matches_numpy():
    from savont_tpu.ops.kmers_native import snpmer_join_count_native

    rng = np.random.default_rng(61)
    R, C = 60, 7
    c_sm = np.sort(rng.integers(0, 40, 50).astype(np.uint64))
    c_km = (c_sm | (rng.integers(0, 4, 50).astype(np.uint64) << np.uint64(16))).astype(np.uint64)
    c_cid = rng.integers(0, C, 50).astype(np.int64)
    lens = rng.integers(0, 20, R)
    ridx = np.repeat(np.arange(R, dtype=np.int64), lens)
    n = int(lens.sum())
    sms = rng.integers(0, 40, n).astype(np.uint64)
    kms = (sms | (rng.integers(0, 4, n).astype(np.uint64) << np.uint64(16))).astype(np.uint64)
    got = snpmer_join_count_native(sms, kms, ridx, c_sm, c_km, c_cid, R, C, threads=3)
    if got is None:
        return
    m_mat = np.zeros((R, C), np.int64)
    mm_mat = np.zeros((R, C), np.int64)
    for i in range(n):
        for j in range(len(c_sm)):
            if c_sm[j] == sms[i]:
                (m_mat if c_km[j] == kms[i] else mm_mat)[ridx[i], c_cid[j]] += 1
    assert np.array_equal(got[0], m_mat) and np.array_equal(got[1], mm_mat)


def test_solid_filter_batch_native_matches_python():
    from savont_tpu.ops.kmers_native import solid_filter_batch_native
    from savont_tpu.constants import MAX_KMER_COUNT_IN_READ

    rng = np.random.default_rng(71)
    hf = np.sort(rng.integers(0, 200, 30).astype(np.uint64))
    minis, snps = [], []
    for i in range(40):
        nm = int(rng.integers(0, 60))
        base = rng.integers(0, 200, nm).astype(np.uint64)
        if nm and i % 3 == 0:  # force a high-multiplicity k-mer
            base[: nm // 2] = base[0]
        minis.append(base)
        snps.append(rng.integers(0, 200, int(rng.integers(0, 20))).astype(np.uint64))
    got = solid_filter_batch_native(minis, snps, hf, 5, threads=3)
    if got is None:
        return
    for m, s, gm, gs in zip(minis, snps, got[0], got[1]):
        solid = np.ones(len(m), bool)
        if len(m):
            uniq, cnt = np.unique(m, return_counts=True)
            j = np.searchsorted(uniq, m)
            solid &= cnt[j] <= 5
            hj = np.clip(np.searchsorted(hf, m), 0, len(hf) - 1)
            solid &= hf[hj] != m
        assert np.array_equal(gm, solid)
        if len(s):
            hj = np.clip(np.searchsorted(hf, s), 0, len(hf) - 1)
            assert np.array_equal(gs, hf[hj] != s)
    # third element: per-read solid-minimizer counts (vectorized .sum())
    assert np.array_equal(got[2], np.array([int(m.sum()) for m in got[0]]))


@pytest.mark.skipif(get_lib() is None, reason="no C++ compiler / native kernel")
def test_align_pairs_nm_soa_matches_legacy():
    """The struct-of-arrays NM path must reproduce the AlignJob path exactly:
    same winners, same scores/NM/coordinates, same tie-breaks."""
    from savont_tpu.ops.align_batch import (
        _align_pairs_nm_soa,
        _jobs_to_mappings,
        _plan_pairs,
        run_jobs_nm,
    )

    rng = np.random.default_rng(97)
    targets = []
    for _ in range(6):
        targets.append(rand_seq(1200 + int(rng.integers(0, 600))))
    pairs = []
    for _ in range(120):
        t = targets[int(rng.integers(len(targets)))]
        q = bytearray(t)
        for p in rng.choice(len(q), int(rng.integers(0, 50)), replace=False):
            q[p] = b"ACGT"[rng.integers(4)]
        if rng.random() < 0.3:
            del q[400 : 400 + int(rng.integers(1, 6))]
        if rng.random() < 0.5:
            q = bytearray(revcomp_bytes(bytes(q)))
        pairs.append((bytes(q), t))
    # a duplicated pair and an unalignable query exercise edge paths
    pairs.append(pairs[0])
    pairs.append((rand_seq(1000), targets[0]))

    got = _align_pairs_nm_soa(pairs, 128)
    assert got is not None

    jobs, owner = _plan_pairs(pairs, 128)
    raw = run_jobs_nm(jobs, band=128)
    best = [None] * len(pairs)
    for o, job, r in zip(owner, jobs, raw):
        if r is None:
            continue
        (m,) = _jobs_to_mappings([job], [r])
        if best[o] is None or m.score > best[o].score:
            best[o] = m

    for g, b in zip(got, best):
        assert (g is None) == (b is None)
        if g is not None:
            assert (g.score, g.nm, g.strand, g.query_start, g.query_end,
                    g.target_start, g.target_end) == (
                b.score, b.nm, b.strand, b.query_start, b.query_end,
                b.target_start, b.target_end)


@pytest.mark.skipif(get_lib() is None, reason="no C++ compiler / native kernel")
def test_align_pairs_soa_traceback_matches_legacy():
    """The struct-of-arrays traceback path (align_pairs) must reproduce the
    AlignJob path exactly, INCLUDING CIGARs, and the CIGAR-overflow redo
    fallback must kick in for very fragmented alignments."""
    from savont_tpu.ops.align_batch import (
        _align_pairs_nm_soa,
        _jobs_to_mappings,
        _plan_pairs,
        run_jobs,
    )

    rng = np.random.default_rng(131)
    targets = [rand_seq(1200 + int(rng.integers(0, 600))) for _ in range(5)]
    pairs = []
    for _ in range(80):
        t = targets[int(rng.integers(len(targets)))]
        q = bytearray(t)
        for p in rng.choice(len(q), int(rng.integers(0, 50)), replace=False):
            q[p] = b"ACGT"[rng.integers(4)]
        if rng.random() < 0.3:
            del q[400 : 400 + int(rng.integers(1, 6))]
        if rng.random() < 0.5:
            q = bytearray(revcomp_bytes(bytes(q)))
        pairs.append((bytes(q), t))
    # CIGAR-overflow pair: 15 kb target (under the 1<<14 packed-key dim
    # guard) with 350 scattered single-base deletions -> 701 run-length
    # ops > the 512 buffer, forcing the per-pair redo path (mismatches
    # alone can't overflow: match+mismatch share one M run)
    big = rand_seq(15000)
    bq = bytearray(big)
    for p in sorted(rng.choice(np.arange(100, 14900, 25), 350, replace=False),
                    reverse=True):
        del bq[p]
    pairs.append((bytes(bq), big))
    pairs.append((rand_seq(1000), targets[0]))  # unalignable

    got = _align_pairs_nm_soa(pairs, 128, traceback=True)
    assert got is not None

    jobs, owner = _plan_pairs(pairs, 128)
    raw = run_jobs(jobs, band=128)
    best = [None] * len(pairs)
    for o, job, r in zip(owner, jobs, raw):
        if r is None:
            continue
        (m,) = _jobs_to_mappings([job], [r])
        if best[o] is None or m.score > best[o].score:
            best[o] = m

    assert got[-2] is not None and len(np.asarray(got[-2].cigar)) > 0
    for g, b in zip(got, best):
        assert (g is None) == (b is None)
        if g is not None:
            assert (g.score, g.nm, g.strand, g.query_start, g.query_end,
                    g.target_start, g.target_end) == (
                b.score, b.nm, b.strand, b.query_start, b.query_end,
                b.target_start, b.target_end)
            assert np.array_equal(np.asarray(g.cigar), np.asarray(b.cigar))


@pytest.mark.skipif(get_lib() is None, reason="no C++ compiler / native kernel")
def test_recluster_round_native_matches_python():
    """Native greedy consensus-merge round == the Python ConsensusPoly loop
    (merge decisions, membership order, merge counts) on random clusters."""
    from savont_tpu.pipeline.stage23_cluster import (
        _flat_marker_table,
        _reassign_reads,
        _recluster_one_round,
    )

    class FakeTR:
        def __init__(self, pos, kms):
            self._pos = np.asarray(pos, dtype=np.int64)
            self._kms = np.asarray(kms, dtype=np.uint64)

        def snpmers_vec(self):
            return self._pos, self._kms

    rng = np.random.default_rng(5)
    k = 17
    mask = ~np.uint64(3 << (k - 1))
    # 10 base haplotype profiles over a shared splitmer pool
    sm_pool = (rng.integers(1, 1 << 40, 60).astype(np.uint64) << np.uint64(k - 1)) & mask
    variants = [(sm | np.uint64(v << (k - 1))) & np.uint64((1 << 62) - 1) for sm in sm_pool for v in (0, 1)]
    trs = []
    for _ in range(400):
        hap = int(rng.integers(4))
        n = int(rng.integers(3, 25))
        idx = rng.choice(60, n, replace=False)
        kms = [(sm_pool[i] | np.uint64(((hap >> (i % 2)) & 1) << (k - 1))) for i in idx]
        trs.append(FakeTR(rng.integers(0, 1400, n), kms))
    clusters = []
    s = 0
    while s < len(trs):
        e = s + int(rng.integers(2, 40))
        clusters.append(list(range(s, min(e, len(trs)))))
        s = e
    flat = _flat_marker_table(trs, "snpmer")

    got_m, got_nm = _recluster_one_round(clusters, trs, k, flat=flat)
    want_m, want_nm = _recluster_one_round(clusters, trs, k)  # python path
    assert got_nm == want_nm
    assert got_m == want_m

    got_r = _reassign_reads(got_m, trs, k, 2, flat=flat)
    want_r = _reassign_reads(want_m, trs, k, 2)
    assert got_r == want_r


@pytest.mark.skipif(get_lib() is None, reason="no C++ compiler / native kernel")
def test_pileup_native_matches_numpy_chunk():
    """native/pileup.cpp scatter == the NumPy batched-walk bincount path on
    random (incl. out-of-bounds-crossing) CIGARs, with and without HPC."""
    from savont_tpu.pipeline.pileup import (
        NQ,
        PileupMatrix,
        _accumulate_native,
        _accumulate_pileup_chunk,
        _get_pileup_lib,
    )

    lib = _get_pileup_lib()
    if lib is None:
        pytest.skip("pileup native kernel unavailable")

    rng = np.random.default_rng(7)
    for use_hp in (False, True):
        n_cons = 4
        refs = [np.frombuffer(rand_seq(300 + int(rng.integers(0, 200))), np.uint8).copy()
                for _ in range(n_cons)]
        L_arr = np.fromiter((len(r) for r in refs), np.int64, n_cons)
        roff = np.zeros(n_cons + 1, np.int64)
        np.cumsum(L_arr, out=roff[1:])
        total_L = int(roff[-1])

        own, seqs, quals, hps, cigars, t0s, q0s = [], [], [], [], [], [], []
        for ci in range(n_cons):
            for _ in range(int(rng.integers(3, 9))):
                slen = int(rng.integers(150, 500))
                seqs.append(rand_seq(slen))
                quals.append(rng.integers(33, 94, slen).astype(np.uint8))
                hps.append(rng.integers(1, 90, slen).astype(np.int64))
                runs = []
                for _ in range(int(rng.integers(1, 25))):
                    op = int(rng.choice([0, 0, 0, 1, 2]))
                    ln = int(rng.integers(1, 60))
                    runs.append((ln << 4) | op)
                cigars.append(np.array(runs, dtype=np.uint32))
                own.append(ci)
                t0s.append(int(rng.integers(0, max(1, len(refs[ci]) - 50))))
                q0s.append(int(rng.integers(0, 40)))

        def fresh():
            bq = np.zeros(total_L * NQ * 2, np.int64)
            dl = np.zeros(total_L, np.int64)
            iq = np.zeros(total_L * NQ, np.int64)
            hh = np.zeros(total_L * 64, np.int64) if use_hp else None
            pms = []
            for ci in range(n_cons):
                L, o = int(L_arr[ci]), int(roff[ci])
                pms.append(PileupMatrix(
                    ref=refs[ci],
                    bq=bq[o * NQ * 2:(o + L) * NQ * 2].reshape(L, NQ, 2),
                    dels=dl[o:o + L],
                    ins_q=iq[o * NQ:(o + L) * NQ].reshape(L, NQ),
                    hp_hist=hh[o * 64:(o + L) * 64].reshape(L, 64) if use_hp else None,
                ))
            return pms, bq, dl, iq, hh

        pms_n, bq_n, dl_n, iq_n, hh_n = fresh()
        job_off = np.searchsorted(np.asarray(own, np.int64), np.arange(n_cons + 1))
        ok = _accumulate_native(
            lib, pms_n, np.ascontiguousarray(np.concatenate(refs)), roff, job_off,
            seqs, quals, hps if use_hp else None, cigars, t0s, q0s,
            bq_n, dl_n, iq_n, hh_n, 3,
        )
        assert ok

        pms_p, bq_p, dl_p, iq_p, hh_p = fresh()
        _accumulate_pileup_chunk(
            pms_p, 0, n_cons, roff, L_arr, own, seqs, quals,
            hps if use_hp else None, cigars, t0s, q0s,
        )
        assert np.array_equal(bq_n, bq_p)
        assert np.array_equal(dl_n, dl_p)
        assert np.array_equal(iq_n, iq_p)
        if use_hp:
            assert np.array_equal(hh_n, hh_p)


@pytest.mark.skipif(get_lib() is None, reason="no C++ compiler / native kernel")
def test_vote_batch_native_matches_python():
    """_vote_consensus_batch (native vote_accum_batch + run-level insertion
    votes) == per-cluster NumPy _vote_consensus on real aligned clusters."""
    from savont_tpu.ops.align_batch import align_pairs
    from savont_tpu.pipeline.stage4_consensus import (
        _vote_consensus,
        _vote_consensus_batch,
    )
    from savont_tpu.pipeline.pileup import _get_pileup_lib

    if _get_pileup_lib() is None:
        pytest.skip("pileup native kernel unavailable")

    rng = np.random.default_rng(53)
    templates, oriented_list, mappings_list = [], [], []
    pairs, owners = [], []
    for ci in range(6):
        tmpl = rand_seq(1100 + int(rng.integers(0, 500)))
        templates.append(tmpl)
        n_reads = int(rng.integers(4, 12))
        reads = []
        for _ in range(n_reads):
            q = bytearray(tmpl)
            for p in rng.choice(len(q), int(rng.integers(5, 60)), replace=False):
                q[p] = b"ACGT"[rng.integers(4)]
            if rng.random() < 0.5:
                d = int(rng.integers(100, len(q) - 100))
                del q[d : d + int(rng.integers(1, 5))]
            if rng.random() < 0.5:
                d = int(rng.integers(100, len(q) - 100))
                q[d:d] = rand_seq(int(rng.integers(1, 5)))
            if rng.random() < 0.4:
                q = bytearray(revcomp_bytes(bytes(q)))
            reads.append(bytes(q))
        for r in reads:
            pairs.append((r, tmpl))
            owners.append((ci, r))
    res = align_pairs(pairs, 128)
    per_cluster_or, per_cluster_mp = {}, {}
    for (ci, r), m in zip(owners, res):
        if m is None:
            continue
        qual = rng.integers(33, 94, len(r)).astype(np.uint8)
        if m.strand == -1:
            per_cluster_or.setdefault(ci, []).append((revcomp_bytes(r), qual[::-1]))
        else:
            per_cluster_or.setdefault(ci, []).append((r, qual))
        per_cluster_mp.setdefault(ci, []).append(m)

    ids = sorted(per_cluster_or)
    assert ids
    got = _vote_consensus_batch(
        [templates[ci] for ci in ids],
        [per_cluster_or[ci] for ci in ids],
        [per_cluster_mp[ci] for ci in ids],
        3,
    )
    want = [
        _vote_consensus(templates[ci], per_cluster_or[ci], per_cluster_mp[ci])
        for ci in ids
    ]
    assert got == want


def test_nm_nocoords_variant_matches_coords():
    """sw_nm_batch_nc (no start-coordinate planes) must agree with
    sw_nm_batch on score/nm/ends for every pair, including band jumps."""
    if get_lib() is None:
        pytest.skip("native kernels unavailable")
    from savont_tpu.ops.align_batch import _align_pairs_nm_soa

    rng = np.random.default_rng(11)

    def rand_seq(n):
        return bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), n))

    pairs = []
    for _ in range(60):
        t = bytearray(rand_seq(int(rng.integers(600, 1600))))
        q = bytearray(t)
        for p in rng.choice(len(q), int(rng.integers(5, 80)), replace=False):
            q[p] = b"ACGT"[rng.integers(4)]
        if rng.random() < 0.5:
            d = int(rng.integers(100, len(q) - 120))
            del q[d : d + int(rng.integers(1, 60))]  # structural indels too
        if rng.random() < 0.4:
            q = bytearray(revcomp_bytes(bytes(q)))
        pairs.append((bytes(q), bytes(t)))
    res_c = _align_pairs_nm_soa(pairs, 64, coords=True)
    res_n = _align_pairs_nm_soa(pairs, 64, coords=False)
    assert res_c is not None and res_n is not None
    for a, b in zip(res_c, res_n):
        assert (a is None) == (b is None)
        if a is None:
            continue
        assert (a.nm, a.score, a.strand) == (b.nm, b.score, b.strand)
        if a.strand == 1:
            assert (a.query_end, a.target_end) == (b.query_end, b.target_end)


def test_qual_fields_native_parity():
    """qual_fields_batch must be bit-identical to the NumPy batched path
    (est_id is a sort key and appears in outputs)."""
    import math

    from savont_tpu.ops.kmers_native import get_scan_lib, qual_fields_batch_native
    from savont_tpu.pipeline.stage1_kmers import _batched_qual_fields

    if get_scan_lib() is None:
        pytest.skip("native scan lib unavailable")
    rng = np.random.default_rng(3)
    quals: list[bytes | None] = []
    for i in range(300):
        n = int(rng.integers(0, 2000))
        quals.append(bytes(rng.integers(33, 94, n).astype(np.uint8)))
    quals.append(None)
    quals.append(b"IIII" * 10)  # all-equal -> est None
    quals.append(b"")

    est_n, lvl_n = _batched_qual_fields(quals)

    import savont_tpu.pipeline.stage1_kmers as s1
    import savont_tpu.ops.kmers_native as kn

    orig = kn.qual_fields_batch_native
    kn.qual_fields_batch_native = lambda *a, **k: None  # force numpy path
    try:
        est_p, lvl_p = _batched_qual_fields(quals)
    finally:
        kn.qual_fields_batch_native = orig

    assert len(est_n) == len(est_p)
    for a, b in zip(est_n, est_p):
        if a is None or b is None:
            assert a is None and b is None
        elif math.isnan(a) or math.isnan(b):
            assert math.isnan(a) and math.isnan(b)
        else:
            assert a == b  # bit-exact doubles
    for a, b in zip(lvl_n, lvl_p):
        if a is None or b is None:
            assert a is None and b is None
        else:
            assert np.array_equal(a, b)


@pytest.mark.skipif(get_lib() is None, reason="no C++ compiler / native kernel")
def test_align_pairs_nm_indexed_matches_tuple_path():
    """align_pairs_nm_indexed (unique pools + (qi, ti) index arrays) must
    reproduce align_pairs_nm exactly on the materialized tuples, including
    duplicate jobs, shared queries/targets, and the slab boundary (>8192
    jobs forces _run_indexed_slabs to split and re-pool per slab)."""
    from savont_tpu.ops.align_batch import align_pairs_nm, align_pairs_nm_indexed

    rng = np.random.default_rng(1234)
    targets = [rand_seq(420 + int(rng.integers(0, 120))) for _ in range(5)]
    queries = []
    for _ in range(40):
        t = targets[int(rng.integers(len(targets)))]
        q = bytearray(t)
        for p in rng.choice(len(q), int(rng.integers(0, 25)), replace=False):
            q[p] = b"ACGT"[rng.integers(4)]
        if rng.random() < 0.3:
            del q[150 : 150 + int(rng.integers(1, 5))]
        if rng.random() < 0.5:
            q = bytearray(revcomp_bytes(bytes(q)))
        queries.append(bytes(q))
    queries.append(rand_seq(400))  # unalignable

    n_jobs = 9000  # crosses the 8192 slab boundary
    qi = rng.integers(0, len(queries), n_jobs)
    ti = rng.integers(0, len(targets), n_jobs)
    qi[:3] = qi[3]  # explicit duplicates
    ti[:3] = ti[3]

    got = align_pairs_nm_indexed(queries, targets, qi, ti, coords=True)
    pairs = [(queries[a], targets[b]) for a, b in zip(qi.tolist(), ti.tolist())]
    want = align_pairs_nm(pairs, coords=True)
    assert len(got) == len(want) == n_jobs
    for g, w in zip(got, want):
        assert (g is None) == (w is None)
        if g is not None:
            assert (g.score, g.nm, g.strand, g.query_start, g.query_end,
                    g.target_start, g.target_end) == (
                w.score, w.nm, w.strand, w.query_start, w.query_end,
                w.target_start, w.target_end)


@pytest.mark.skipif(get_lib() is None, reason="no C++ compiler / native kernel")
def test_minimizer_sketch_native_parity():
    """Native minimizer_sketch_batch == the Python scalar loop, bit-exact,
    on 2-bit codes AND raw ASCII (both decode through BYTE_TO_SEQ), across
    edge lengths (empty, < k+w-1, == k+w-1) — including the reference's
    UNMASKED warm-up accumulator quirk (seeding.rs:123-141)."""
    import savont_tpu.ops.kmers_native as kn
    from savont_tpu.ops.kmers import minimizer_sketch

    rng = np.random.default_rng(77)
    cases = []
    for L in (0, 5, 29, 30, 31, 60, 100, 800, 1500):
        cases.append(rng.integers(0, 4, L).astype(np.uint8))
        cases.append(
            rng.choice(np.frombuffer(b"ACGTN", np.uint8), L).astype(np.uint8)
        )
    for (w, k) in ((10, 21), (28, 31), (10, 15)):
        nat = kn.minimizer_sketch_batch_native(cases, w, k)
        assert nat is not None
        real = kn.minimizer_sketch_batch_native
        kn.minimizer_sketch_batch_native = lambda seqs, w, k, threads=0: None
        try:
            py = [minimizer_sketch(c, w, k) for c in cases]
        finally:
            kn.minimizer_sketch_batch_native = real
        for (nv, npos), (pv, ppos) in zip(nat, py):
            assert np.array_equal(nv, pv)
            assert np.array_equal(npos, ppos)


@pytest.mark.skipif(get_lib() is None, reason="no C++ compiler / native kernel")
def test_align_pairs_nm_values_matches_mapping_path():
    """The flat NM-array variant must agree with the Mapping-returning
    indexed path on winners and NM (incl. -1 for unaligned jobs), across
    the slab boundary."""
    from savont_tpu.ops.align_batch import (
        align_pairs_nm_indexed,
        align_pairs_nm_values_indexed,
    )

    rng = np.random.default_rng(4321)
    targets = [rand_seq(420 + int(rng.integers(0, 120))) for _ in range(4)]
    queries = []
    for _ in range(30):
        t = targets[int(rng.integers(len(targets)))]
        q = bytearray(t)
        for p in rng.choice(len(q), int(rng.integers(0, 25)), replace=False):
            q[p] = b"ACGT"[rng.integers(4)]
        if rng.random() < 0.5:
            q = bytearray(revcomp_bytes(bytes(q)))
        queries.append(bytes(q))
    queries.append(rand_seq(400))  # unalignable

    n_jobs = 9000
    qi = rng.integers(0, len(queries), n_jobs)
    ti = rng.integers(0, len(targets), n_jobs)
    vals = align_pairs_nm_values_indexed(queries, targets, qi, ti)
    maps = align_pairs_nm_indexed(queries, targets, qi, ti, coords=False)
    assert len(vals) == n_jobs
    for v, m in zip(vals.tolist(), maps):
        if m is None:
            assert v == -1
        else:
            assert v == m.nm


def test_count_flagged_adaptive_digits_parity():
    """count_flagged_u64's adaptive radix digit selection must stay exact
    across populated bit widths (1 to 62 bits + the strand flag bit)."""
    from savont_tpu.ops.kmers_native import count_flagged_native

    if count_flagged_native(np.zeros(1, np.uint64), 4) is None:
        pytest.skip("no native sortcount library")
    rng = np.random.default_rng(3)
    for bits in (1, 8, 20, 34, 43, 55, 62):
        v = rng.integers(0, 1 << bits, 200_000, dtype=np.uint64) | (
            rng.integers(0, 2, 200_000, dtype=np.uint64) << np.uint64(63)
        )
        u, c = count_flagged_native(v, 4)
        bare = v & np.uint64((1 << 63) - 1)
        eu, inv = np.unique(bare, return_inverse=True)
        ec = np.zeros((len(eu), 2), np.uint32)
        np.add.at(ec, (inv, (v >> np.uint64(63)).astype(int)), 1)
        assert np.array_equal(u, eu) and np.array_equal(c, ec), bits


def test_anchor_keys_sorted_emission_matches_radix_sort():
    """anchor_pack_keys_sorted (direct sorted emission, singleton tables)
    must be bit-identical to anchor_pack_keys(jid_shift=29) + radix sort on
    realistic planner inputs (pool-gathered minis, build_singletons tie
    order)."""
    from savont_tpu.ops.align import TargetIndex, window_minimizers_cached_batch
    from savont_tpu.ops.kmers_native import (
        anchor_search_multi_native,
        anchor_sorted_keys_native,
        anchor_sorted_keys_singleton_native,
        get_sort_lib,
    )

    if get_sort_lib() is None:
        return
    rng = np.random.default_rng(97)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    targets = [rng.choice(bases, int(rng.integers(400, 1600))).tobytes() for _ in range(6)]
    queries = []
    for i in range(40):
        t = bytearray(targets[i % len(targets)])
        for p in rng.choice(len(t), 25, replace=False):
            t[p] = b"ACGT"[rng.integers(4)]
        q = bytes(t)
        if i % 2 == 0:
            from savont_tpu.ops.encode import revcomp_bytes

            q = revcomp_bytes(q)
        queries.append(q)
    job_uq = rng.integers(0, len(queries), 120).astype(np.int64)
    job_ti = rng.integers(0, len(targets), 120).astype(np.int64)

    qmini = window_minimizers_cached_batch(queries, 10, 15)
    indexes = TargetIndex.build_singletons(targets)
    tab_off = np.zeros(len(indexes) + 1, dtype=np.int64)
    np.cumsum([len(ix.h_sorted) for ix in indexes], out=tab_off[1:])
    h_cat = np.concatenate([ix.h_sorted for ix in indexes])
    tpos_cat = np.concatenate([ix.h_tpos for ix in indexes])
    isf_cat = np.concatenate([ix.h_isf for ix in indexes])
    tid_cat = np.zeros(len(h_cat), dtype=np.int32)

    q_mcnt = np.fromiter((len(m[0]) for m in qmini), np.int64, len(qmini))
    mini_counts = q_mcnt[job_uq]
    q_moff = np.zeros(len(qmini) + 1, dtype=np.int64)
    np.cumsum(q_mcnt, out=q_moff[1:])
    job_moff = np.zeros(len(job_uq) + 1, dtype=np.int64)
    np.cumsum(mini_counts, out=job_moff[1:])
    flat = np.repeat(q_moff[job_uq] - job_moff[:-1], mini_counts)
    flat += np.arange(int(mini_counts.sum()), dtype=np.int64)
    all_h = np.concatenate([m[0] for m in qmini])[flat]
    all_p = np.concatenate([m[1] for m in qmini])[flat].astype(np.int32)
    all_f = np.concatenate([m[2] for m in qmini])[flat]
    jid = np.repeat(np.arange(len(job_uq), dtype=np.int32), mini_counts)
    gid = np.repeat(job_ti, mini_counts).astype(np.int32)
    qlens_all = np.fromiter((len(q) for q in queries), np.int64, len(queries))

    left, counts, total = anchor_search_multi_native(h_cat, tab_off, gid, all_h)
    assert total > 0
    ref = anchor_sorted_keys_native(
        left, counts, all_p, all_f, jid, qlens_all[job_uq],
        tid_cat, tpos_cat, isf_cat, 15, False, threads=4, jid_shift=29,
    )
    got = anchor_sorted_keys_singleton_native(
        left, counts, job_moff, all_p, all_f, qlens_all[job_uq],
        tpos_cat, isf_cat, 15, threads=4,
    )
    assert np.array_equal(ref, got) and len(got) == total


def test_adjusted_errors_batch_matches_per_call():
    """calculate_adjusted_errors_batch must equal the per-call function on
    real alignments (incl. rc queries, indel runs, homopolymer contexts)."""
    from savont_tpu.ops.align_batch import align_pairs
    from savont_tpu.ops.encode import revcomp_bytes
    from savont_tpu.pipeline.stage5_merge import (
        calculate_adjusted_errors,
        calculate_adjusted_errors_batch,
    )

    rng = np.random.default_rng(31)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    targets = [rng.choice(bases, int(rng.integers(500, 1500))).tobytes() for _ in range(5)]
    pairs, metas = [], []
    for i in range(30):
        t = bytearray(targets[i % len(targets)])
        for p in rng.choice(len(t) - 10, 20, replace=False):
            r = rng.integers(3)
            if r == 0:
                t[p] = b"ACGT"[rng.integers(4)]
            elif r == 1:
                del t[p]
            else:
                t.insert(p, b"ACGT"[rng.integers(4)])
        q = bytes(t)
        if i % 2 == 0:
            q = revcomp_bytes(q)
        pairs.append((q, targets[i % len(targets)]))
    res = align_pairs(pairs)
    cigs, q_arrs, t_arrs, qs, ts, expected = [], [], [], [], [], []
    for (q, t), m in zip(pairs, res):
        if m is None:
            continue
        qarr = np.frombuffer(q, dtype=np.uint8)
        tarr = np.frombuffer(t, dtype=np.uint8)
        if m.strand == -1:
            qarr = np.frombuffer(revcomp_bytes(q), dtype=np.uint8)
            q0 = len(q) - m.query_end
        else:
            q0 = m.query_start
        cigs.append(m.cigar)
        q_arrs.append(qarr)
        t_arrs.append(tarr)
        qs.append(q0)
        ts.append(m.target_start)
        expected.append(calculate_adjusted_errors(m.cigar, qarr, tarr, q0, m.target_start))
    assert len(expected) > 10
    got = calculate_adjusted_errors_batch(cigs, q_arrs, t_arrs, qs, ts)
    assert got.tolist() == expected
    # native CIGAR-walk kernel vs the NumPy batch fallback (same inputs)
    from savont_tpu.pipeline import stage5_merge as s5

    nat = s5._adjusted_errors_native(
        cigs, q_arrs, t_arrs, qs, ts,
        np.fromiter((len(c) for c in cigs), np.int64, len(cigs)), 35,
    )
    if nat is not None:
        assert nat.tolist() == expected


def test_adjusted_errors_native_with_ns_and_homopolymers():
    """Native adjusted-errors kernel vs BOTH the NumPy batch path and the
    scalar per-call on sequences salted with Ns and long homopolymer runs
    (the branches the real-alignment test rarely hits)."""
    from savont_tpu.pipeline import stage5_merge as s5

    rng = np.random.default_rng(77)
    bases = np.frombuffer(b"ACGTN", dtype=np.uint8)
    cigs, q_arrs, t_arrs, qs, ts, expected = [], [], [], [], [], []
    for i in range(40):
        L = int(rng.integers(200, 900))
        t = rng.choice(bases, L, p=[0.23, 0.23, 0.23, 0.23, 0.08])
        # salt homopolymer runs
        for p in rng.choice(L - 8, 6, replace=False):
            t[p : p + int(rng.integers(3, 7))] = t[p]
        q = t.copy()
        # synthetic CIGAR: alternating M/I/D runs with varied lengths
        cig, ops = [], [0, 1, 2, 0, 2, 1, 0]
        for j, op in enumerate(ops):
            ln = int(rng.integers(1, 60)) if op else int(rng.integers(20, 120))
            if op == 1 and rng.random() < 0.3:
                ln = int(rng.integers(10, 15))  # >=10: counts full length
            cig.append((ln << 4) | op)
        cigs.append(np.array(cig, np.uint32))
        q_arrs.append(q)
        t_arrs.append(t)
        qs.append(int(rng.integers(0, 40)))
        ts.append(int(rng.integers(0, 40)))
        expected.append(
            s5.calculate_adjusted_errors(cigs[-1], q, t, qs[-1], ts[-1])
        )
    n_runs = np.fromiter((len(c) for c in cigs), np.int64, len(cigs))
    nat = s5._adjusted_errors_native(cigs, q_arrs, t_arrs, qs, ts, n_runs, 35)
    if nat is not None:
        assert nat.tolist() == expected
    # NumPy batch fallback on the same inputs
    import unittest.mock as mock

    with mock.patch.object(s5, "_adjusted_errors_native", lambda *a, **k: None):
        got = s5.calculate_adjusted_errors_batch(cigs, q_arrs, t_arrs, qs, ts)
    assert got.tolist() == expected


def test_parent_span_c_probe_matches_python():
    """The pyhelpers C span probe must accept exactly the layouts the
    Python loop accepts and reject every broken pattern."""
    from savont_tpu.ops import kmers_native as KN

    base = np.arange(1000, dtype=np.uint8)
    views = [base[i * 100 : (i + 1) * 100] for i in range(10)]

    def py_ref(arrays):
        if not arrays:
            return None
        b = arrays[0].base
        if not isinstance(b, np.ndarray) or b.ndim != 1:
            return None
        item = arrays[0].itemsize
        pos = arrays[0].__array_interface__["data"][0]
        start = pos
        for a in arrays:
            if a.base is not b or a.__array_interface__["data"][0] != pos or not a.flags.c_contiguous:
                return None
            pos += a.nbytes
        b0 = b.__array_interface__["data"][0]
        lo = (start - b0) // item
        return b[lo : lo + (pos - start) // item]

    cases = [
        views,                                   # full run
        views[2:7],                              # interior run
        [views[0], views[2]],                    # gap -> None
        [views[1], views[0]],                    # permuted -> None
        [views[0], np.arange(5, dtype=np.uint8)],# foreign base -> None
        [base[::2]],                             # non-contiguous -> None
        [np.frombuffer(b"abcd", np.uint8)],      # non-ndarray base -> None
        [v for v in views] + [base[999:999]],    # empty tail view (still consecutive?)
    ]
    for case in cases:
        want = py_ref(case)
        got = KN._parent_span(case)
        if want is None:
            assert got is None, case
        else:
            assert got is not None and np.array_equal(got, want)
            assert got.base is views[0].base or got is want


def test_fused_anchor_keys_match_expanded_path(monkeypatch):
    """anchor_keys_indexed_native (fused pooled-mini probing) must emit the
    exact key stream of the expansion path (anchor_search_multi +
    anchor_sorted_keys_singleton over np.repeat-expanded arrays), across
    duplicate-kmer tables, missing keys, and multi-job queries."""
    from savont_tpu.ops import align_batch, kmers_native
    from savont_tpu.ops.kmers_native import anchor_keys_indexed_native, get_sort_lib

    if get_sort_lib() is None:
        return
    rng = np.random.default_rng(47)
    base = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), 900)
    qry_bytes, tgt_bytes = [], []
    for i in range(40):  # queries: mutated copies (shared minis + misses)
        b = base.copy()
        pos = rng.choice(len(b), int(rng.integers(10, 80)), replace=False)
        b[pos] = np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, len(pos))]
        qry_bytes.append(b.tobytes())
    for i in range(6):  # targets incl. a duplicated-window one
        b = base.copy()
        pos = rng.choice(len(b), 15, replace=False)
        b[pos] = np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, 15)]
        t = b.tobytes()
        if i == 0:
            t = t + t[100:400]  # duplicate k-mers -> cnt > 1 ranges
        tgt_bytes.append(t)
    job_uq = np.repeat(np.arange(40, dtype=np.int64), 2)
    job_ti = np.tile(np.arange(2, dtype=np.int64), 40)
    job_ti[5:] = (job_ti[5:] + rng.integers(0, 6, 75)) % 6

    plan_fused = align_batch._plan_soa_indexed(qry_bytes, tgt_bytes, job_uq, job_ti, 64)
    monkeypatch.setattr(kmers_native, "anchor_keys_indexed_native", lambda *a, **k: None)
    # align_batch imports the symbol inside the function, so patch the module attr
    import savont_tpu.ops.kmers_native as kn
    plan_exp = align_batch._plan_soa_indexed(qry_bytes, tgt_bytes, job_uq, job_ti, 64)
    assert not isinstance(plan_fused, (str, type(None)))
    assert not isinstance(plan_exp, (str, type(None)))
    for a, b in zip(plan_fused, plan_exp):
        if isinstance(a, np.ndarray):
            np.testing.assert_array_equal(a, b)
        else:
            assert a == b


def test_window_minimizers_flat_matches_tuple_paths():
    """window_minimizers_flat_batch: the large-batch native-flat path, the
    small-batch cached-tuple path, and the per-query numpy oracle must all
    agree (values and per-query offsets)."""
    from savont_tpu.ops import align as align_mod
    from savont_tpu.ops.align import (
        _window_minimizers_numpy,
        ascii_to_align_codes,
        window_minimizers_flat_batch,
    )
    from savont_tpu.ops.kmers_native import get_scan_lib

    if get_scan_lib() is None:
        return
    rng = np.random.default_rng(59)
    queries = [
        rng.choice(np.frombuffer(b"ACGTN", dtype=np.uint8),
                   int(rng.integers(20, 600))).tobytes()
        for _ in range(2100)  # >= 2048 -> flat native path
    ]
    h, p, f, off = window_minimizers_flat_batch(queries, 10, 15)
    assert len(off) == len(queries) + 1 and off[-1] == len(h)
    # small-batch (cached tuple) path on a subset must slice-match
    sub = queries[:64]
    align_mod._MINI_CACHE.clear()
    h2, p2, f2, off2 = window_minimizers_flat_batch(sub, 10, 15)
    np.testing.assert_array_equal(h[: off[64]], h2)
    np.testing.assert_array_equal(p[: off[64]], p2)
    np.testing.assert_array_equal(f[: off[64]], f2)
    # numpy oracle spot-check on a handful
    for i in (0, 7, 63, 2099):
        oh, op, of = _window_minimizers_numpy(ascii_to_align_codes(queries[i]), 10, 15)
        np.testing.assert_array_equal(h[off[i]:off[i + 1]], oh)
        np.testing.assert_array_equal(p[off[i]:off[i + 1]], op)
        np.testing.assert_array_equal(f[off[i]:off[i + 1]], of)


def test_revcomp_codes_ranges_native_parity():
    """One-sweep native reverse-complement of align-code ranges == the
    NumPy reversed-span gather it replaces in _qcodes_cached_batch
    (codes >= 4 pass through unchanged, empty ranges allowed)."""
    from savont_tpu.ops.kmers_native import get_scan_lib, revcomp_codes_ranges_native

    if get_scan_lib() is None:
        import pytest

        pytest.skip("native scan lib unavailable")
    rng = np.random.default_rng(91)
    lens = np.concatenate(([0, 1], rng.integers(0, 600, 60)))
    off = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(lens, out=off[1:])
    cat = rng.integers(0, 6, int(off[-1])).astype(np.uint8)
    out = revcomp_codes_ranges_native(cat, off, threads=3)
    assert out is not None
    for i in range(len(lens)):
        s = cat[off[i] : off[i + 1]][::-1].copy()
        s[s < 4] = 3 - s[s < 4]
        assert np.array_equal(out[off[i] : off[i + 1]], s)
