"""Aligner tests: NM correctness, CIGAR consistency, strand handling."""
import numpy as np
import pytest

from savont_tpu.ops.align import TargetIndex, align_pair, map_query
from savont_tpu.ops.encode import revcomp_bytes

RNG = np.random.default_rng(11)


def rand_seq(n):
    return RNG.choice(np.frombuffer(b"ACGT", dtype=np.uint8), n).astype(np.uint8).tobytes()


def unpack_cigar(cigar):
    import numpy as _np

    return [(int(v) >> 4, int(v) & 0xF) for v in _np.asarray(cigar, dtype=_np.uint32)]


def check_cigar_consistency(m, qlen, tlen):
    runs = unpack_cigar(m.cigar)
    q_span = sum(l for l, op in runs if op != 2)
    t_span = sum(l for l, op in runs if op != 1)
    assert m.query_end - m.query_start == q_span
    assert m.target_end - m.target_start == t_span
    assert 0 <= m.query_start <= m.query_end <= qlen
    assert 0 <= m.target_start <= m.target_end <= tlen


def test_identical():
    t = rand_seq(1500)
    m = align_pair(t, t)
    assert m.nm == 0 and m.strand == 1
    assert (m.query_start, m.query_end, m.target_start, m.target_end) == (0, 1500, 0, 1500)
    check_cigar_consistency(m, 1500, 1500)


def test_substitutions_counted():
    t = rand_seq(1500)
    q = bytearray(t)
    for p in [100, 400, 700, 1000, 1300]:
        q[p] = ord("A") if q[p] != ord("A") else ord("C")
    m = align_pair(bytes(q), t)
    assert m.nm == 5
    check_cigar_consistency(m, 1500, 1500)


def test_reverse_complement():
    t = rand_seq(1500)
    m = align_pair(revcomp_bytes(t), t)
    assert m.nm == 0 and m.strand == -1
    check_cigar_consistency(m, 1500, 1500)


def test_indels():
    t = rand_seq(1500)
    q = bytearray(t)
    del q[500:502]
    q[900:900] = b"GGG"
    m = align_pair(bytes(q), t)
    assert m.nm == 5
    gaps = sorted((l, op) for l, op in unpack_cigar(m.cigar) if op != 0)
    assert gaps == [(2, 2), (3, 1)]


def test_containment_and_overlap():
    t = rand_seq(1500)
    m = align_pair(t[200:1200], t)
    assert m.nm == 0 and (m.target_start, m.target_end) == (200, 1200)
    q = t[800:] + rand_seq(400)
    m = align_pair(q, t)
    assert m.nm == 0 and m.target_start == 800 and m.query_start == 0


def test_n_never_matches():
    t = rand_seq(600)
    q = bytearray(t)
    q[300] = ord("N")
    m = align_pair(bytes(q), t)
    assert m.nm == 1


def test_multi_target_ranking():
    t0 = rand_seq(1500)
    t1 = bytearray(t0)
    for p in range(0, 1500, 50):
        t1[p] = ord("A") if t1[p] != ord("A") else ord("G")
    idx = TargetIndex([t0, bytes(t1)])
    hits = map_query(idx, t0)
    assert hits[0].target_id == 0 and hits[0].is_primary and hits[0].nm == 0
    assert len(hits) == 2 and hits[1].nm > 0
    assert hits[0].mapq == 60


def test_mapq_zero_on_tie():
    t0 = rand_seq(1500)
    idx = TargetIndex([t0, t0])
    hits = map_query(idx, t0)
    assert hits[0].mapq == 0


def test_divergent_pair():
    t = rand_seq(1500)
    q = bytearray(t)
    pos = RNG.choice(1500, 150, replace=False)
    for p in pos:
        q[p] = b"ACGT"[RNG.integers(4)]
    m = align_pair(bytes(q), t)
    assert m is not None
    expected = sum(1 for p in pos if bytes(q)[p] != t[p])
    assert abs(m.nm - expected) <= 3  # end clipping may shave a couple


def test_qcodes_big_batch_matches_small_path_incl_U():
    """The >=4096-item bypass of _qcodes_cached_batch (fwd-encode once,
    derive - strands from + codes) must equal the cached per-item path,
    including U/u bases where revcomp_bytes and the align LUT disagree."""
    from savont_tpu.ops.align import ascii_to_align_codes
    from savont_tpu.ops.align_batch import _qcodes_cached_batch
    from savont_tpu.ops.encode import revcomp_bytes

    rng = np.random.default_rng(53)
    alpha = np.frombuffer(b"ACGTNU" + b"acgtnu", dtype=np.uint8)
    items = []
    for i in range(2100):
        qb = rng.choice(alpha, int(rng.integers(20, 120))).tobytes()
        items.append((qb, 1))
        items.append((qb, -1))
    got = _qcodes_cached_batch(items)  # 4200 items -> bypass branch
    for (qb, st), g in zip(items, got):
        want = ascii_to_align_codes(qb if st == 1 else revcomp_bytes(qb))
        np.testing.assert_array_equal(g, want)


def test_idcode_cache_eviction_no_nameerror():
    """Crossing _IDCODE_CACHE_MAX must evict, not NameError: the evict
    branch only fires in long-lived processes (several 100k-read runs in
    one interpreter), which no other test reaches."""
    from savont_tpu.ops import align_batch as ab

    old_max = ab._IDCODE_CACHE_MAX
    ab._IDCODE_CACHE.clear()
    ab._IDCODE_CACHE_MAX = 4
    try:
        items = [(bytes(b"ACGTAC") + bytes([65 + i]), 1) for i in range(16)]
        got = ab._qcodes_cached_batch(items)
        assert len(got) == 16
        assert len(ab._IDCODE_CACHE) <= 4 + 16
    finally:
        ab._IDCODE_CACHE_MAX = old_max


def test_prime_idmini_cache_matches_inline_scan():
    """prime_idmini_cache (the stage 4-6 background prefetch) must leave
    the planner's id-cache with entries BIT-IDENTICAL to the inline
    first-touch scan of window_minimizers_flat_batch."""
    from savont_tpu.ops import align
    from savont_tpu.ops.kmers_native import get_scan_lib

    if get_scan_lib() is None:
        pytest.skip("native scan kernel unavailable")
    rng = np.random.default_rng(7)
    BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
    queries = [rng.choice(BASES, int(rng.integers(200, 1500))).tobytes()
               for _ in range(64)]
    ref = align.window_minimizers_flat_batch(list(queries), 10, 15)

    for q in queries:
        align._IDMINI_CACHE.pop(id(q), None)
    added = align.prime_idmini_cache(queries, threads=2, chunk=17)
    assert added == len(queries)
    for q in queries:
        e = align._IDMINI_CACHE.get(id(q))
        assert e is not None and e[0] is q
    # the primed entries serve a big-batch call without any native rescan
    # (2048+ dummy hits share the id-cache path); spot-check pool equality
    h, p, f, off = ref
    for i, q in enumerate(queries):
        e = align._IDMINI_CACHE[id(q)]
        s = e[8]
        np.testing.assert_array_equal(e[1][s : s + e[7]], h[off[i] : off[i + 1]])
        np.testing.assert_array_equal(e[2][s : s + e[7]], p[off[i] : off[i + 1]])
        np.testing.assert_array_equal(e[3][s : s + e[7]], f[off[i] : off[i + 1]])
