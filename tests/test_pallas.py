"""Pallas banded-SW kernel == host DP (interpret mode; compiled path is
exercised on real TPU hardware by bench/driver runs)."""
import numpy as np
import pytest

from savont_tpu.ops.align import TargetIndex
from savont_tpu.ops.align_batch import plan_jobs, run_jobs

RNG = np.random.default_rng(33)


def rand_seq(n):
    return RNG.choice(np.frombuffer(b"ACGT", dtype=np.uint8), n).astype(np.uint8).tobytes()


@pytest.mark.slow
def test_pallas_interpret_matches_host():
    import jax.numpy as jnp

    from savont_tpu.ops.align_pallas import sw_forward_pallas

    jobs = []
    while len(jobs) < 8:
        t = rand_seq(192)
        q = bytearray(t)
        for p in RNG.choice(len(q), int(RNG.integers(3, 10)), replace=False):
            q[p] = b"ACGT"[RNG.integers(4)]
        if RNG.random() < 0.4:
            del q[100 : 100 + int(RNG.integers(1, 5))]
        jobs.extend(plan_jobs(TargetIndex([t]), bytes(q), band=64, min_anchors=2))
    jobs = jobs[:8]
    host = run_jobs(jobs, band=64)

    Lq = max(len(j.qcodes) for j in jobs)
    Lt = max(len(j.tcodes) for j in jobs)
    B = 8
    qa = np.full((B, Lq), 5, np.int32)
    ta = np.full((B, Lt), 6, np.int32)
    lo = np.zeros((B, Lq + 1), np.int32)
    tl = np.zeros(B, np.int32)
    for i, j in enumerate(jobs):
        qa[i, : len(j.qcodes)] = j.qcodes
        ta[i, : len(j.tcodes)] = j.tcodes
        lo[i, 1 : len(j.lo) + 1] = j.lo
        lo[i, 0] = j.lo[0]
        if len(j.lo) < Lq:
            lo[i, len(j.lo) + 1 :] = j.lo[-1]
        tl[i] = len(j.tcodes)
    out = np.asarray(
        sw_forward_pallas(jnp.asarray(qa), jnp.asarray(ta), jnp.asarray(lo), jnp.asarray(tl), band=64, interpret=True)
    )
    for i, h in enumerate(host):
        want = (h[0], h[2], h[4], h[6]) if h else None  # score, q_end, t_end, nm
        got = tuple(int(x) for x in out[i])
        assert want == got


@pytest.mark.slow
def test_pallas_int16_matches_int32(monkeypatch):
    """The int16 DP planes (default for amplicon lengths) must equal the
    int32 planes value-for-value (interpret mode; no overflow by
    _plane_dtype construction)."""
    import jax.numpy as jnp

    from savont_tpu.ops import align_pallas as ap

    B, Lq, Lt, band = 8, 300, 300, 64
    rng = np.random.default_rng(5)
    base = rng.integers(0, 4, (1, Lt)).astype(np.int32)
    t = np.repeat(base, B, axis=0)
    q = t.copy()
    for i in range(B):
        pos = rng.choice(Lq, 12, replace=False)
        q[i, pos] = (q[i, pos] + rng.integers(1, 4, 12)) % 4
    lo = np.clip(np.arange(Lq + 1)[None, :] - band // 2, 0, Lt - band).astype(np.int32) * np.ones((B, 1), np.int32)
    tl = np.full(B, Lt, np.int32)

    monkeypatch.setenv("SAVONT_PALLAS_I16", "1")
    assert ap._plane_dtype(Lq, Lt) == jnp.int16
    out16 = ap.sw_forward_pallas(q, t, lo, tl, band=band, interpret=True)
    monkeypatch.delenv("SAVONT_PALLAS_I16")
    assert ap._plane_dtype(Lq, Lt) == jnp.int32  # i32 default: current
    # libtpu Mosaic cannot legalize i16 vector ops (see align_pallas.py)
    out32 = ap.sw_forward_pallas(q, t, lo, tl, band=band, interpret=True)
    np.testing.assert_array_equal(out16, out32)
    assert (out16[:, 0] > 0).all()


@pytest.mark.slow
def test_pallas_traceback_jobs_matches_host():
    """sw_traceback_pallas_jobs (Mosaic payload forward + XLA walk) returns
    the exact host run_jobs tuples — score/coords/NM AND full CIGARs — on a
    mixed job set including raw-band structural-indel jobs (those route to
    the exact XLA barrel-shift kernel; smooth jobs ride the Pallas forward
    in interpret mode here, compiled on real TPU by the bench)."""
    from savont_tpu.ops.align_pallas import sw_traceback_pallas_jobs

    jobs = []
    rng = np.random.default_rng(77)
    for trial in range(6):
        L = int(rng.integers(200, 700))
        t = rand_seq(L)
        q = bytearray(t)
        for p in rng.choice(len(q), int(0.04 * L), replace=False):
            q[p] = b"ACGT"[rng.integers(4)]
        if trial % 3 == 2:  # structural indel -> raw band jump -> XLA path
            del q[L // 2 : L // 2 + 60]
        elif rng.random() < 0.5:
            p = int(rng.integers(20, L - 20))
            q[p:p] = rand_seq(int(rng.integers(1, 4)))
        jobs.extend(plan_jobs(TargetIndex([t]), bytes(q), band=48, min_anchors=2))
    assert jobs
    host = run_jobs(jobs, band=48)
    dev = sw_traceback_pallas_jobs(jobs, band=48, interpret=True)
    for h, d in zip(host, dev):
        assert (h is None) == (d is None)
        if h is None:
            continue
        assert h[:5] == d[:5] and h[6] == d[6]
        assert np.array_equal(np.asarray(h[5], np.uint32), np.asarray(d[5], np.uint32))


@pytest.mark.slow
def test_pallas_traceback_dl2_exact():
    """Corridors with band advances of exactly 2 now ride the Mosaic
    payload forward (new2 stream + static shift-by-2 selects) instead of
    the XLA fallback — results must stay byte-identical to host run_jobs.
    Small 2-6 bp deletions produce dl=2 rows; >2 jumps still take the XLA
    kernel (the partition is asserted so the d2 path provably runs)."""
    from savont_tpu.ops.align_pallas import sw_traceback_pallas_jobs

    rng = np.random.default_rng(1234)
    jobs = []
    n_d2 = 0
    for trial in range(10):
        L = int(rng.integers(300, 900))
        t = rand_seq(L)
        q = bytearray(t)
        for p in rng.choice(len(q), int(0.05 * L), replace=False):
            q[p] = b"ACGT"[rng.integers(4)]
        # a few short deletions scattered along the read: each bends the
        # anchor chain by 2-6 columns, yielding dl=2 rows after chaining
        for _ in range(int(rng.integers(1, 4))):
            p = int(rng.integers(30, len(q) - 40))
            del q[p : p + int(rng.integers(2, 7))]
        jobs.extend(plan_jobs(TargetIndex([t]), bytes(q), band=48, min_anchors=2))
    assert jobs
    for j in jobs:
        lo = np.asarray(j.lo, np.int64)
        d = lo[1:] - lo[:-1]
        if len(d) and d.max() == 2:
            n_d2 += 1
    assert n_d2 > 0, "no dl=2 jobs generated — test construction broke"
    host = run_jobs(jobs, band=48)
    dev = sw_traceback_pallas_jobs(jobs, band=48, interpret=True)
    for h, d in zip(host, dev):
        assert (h is None) == (d is None)
        if h is None:
            continue
        assert h[:5] == d[:5] and h[6] == d[6]
        assert np.array_equal(np.asarray(h[5], np.uint32), np.asarray(d[5], np.uint32))


def test_plane_dtype_guard(monkeypatch):
    """int16 is opt-in (Mosaic can't legalize it on current libtpu); long
    sequences whose scores could overflow int16 must fall back even then."""
    import jax.numpy as jnp

    from savont_tpu.ops.align_pallas import _plane_dtype

    assert _plane_dtype(1500, 1500) == jnp.int32  # default: i32
    monkeypatch.setenv("SAVONT_PALLAS_I16", "1")
    assert _plane_dtype(1500, 1500) == jnp.int16
    assert _plane_dtype(16000, 16000) == jnp.int32  # 2*16000 > 30000
    assert _plane_dtype(40000, 1500) == jnp.int32   # index width
