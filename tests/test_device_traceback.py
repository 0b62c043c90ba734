"""Device-side traceback/CIGAR kernel (ops/align_jax.sw_traceback_full).

The reference pipeline is CIGAR-driven end to end (pileups walk CIGARs,
alignment.rs:520-564; adjusted errors classify runs, alignment.rs:101-188;
chimera walks, chimera.rs:274-398) — these tests pin the device kernel to
the host kernels bit-for-bit, including CIGARs, on RAW planner bands
(structural indels included: the barrel-shift forward removed the old
smooth_lo caveat), plus full-pipeline byte-identity under
SAVONT_ALIGN_BACKEND=jax."""
import numpy as np
import pytest

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def _mutate(rng, t, sub_rate, n_indel, max_indel):
    q = bytearray(t)
    for p in rng.choice(len(q), int(sub_rate * len(q)), replace=False):
        q[p] = b"ACGT"[rng.integers(4)]
    for _ in range(n_indel):
        p = int(rng.integers(10, max(11, len(q) - 10)))
        if rng.random() < 0.5:
            del q[p : p + int(rng.integers(1, max_indel + 1))]
        else:
            q[p:p] = rng.choice(BASES, int(rng.integers(1, max_indel + 1))).tobytes()
    return bytes(q)


def _fuzz_jobs(seed, n_targets=10, band=48):
    from savont_tpu.ops.align import TargetIndex
    from savont_tpu.ops.align_batch import plan_jobs

    rng = np.random.default_rng(seed)
    jobs = []
    for trial in range(n_targets):
        L = int(rng.integers(150, 1600))
        t = rng.choice(BASES, L).astype(np.uint8).tobytes()
        kind = trial % 4
        if kind == 0:
            q = _mutate(rng, t, 0.02, 2, 3)      # high identity
        elif kind == 1:
            q = _mutate(rng, t, 0.08, 8, 5)      # nanopore-like
        elif kind == 2:
            q = _mutate(rng, t, 0.05, 3, 80)     # structural indels
        else:
            q = rng.choice(BASES, L).astype(np.uint8).tobytes()  # unrelated
        if trial % 2:
            q = bytes(q).translate(bytes.maketrans(b"ACGT", b"TGCA"))[::-1]
        jobs.extend(plan_jobs(TargetIndex([t]), q, band=band, min_anchors=2))
    return jobs


@pytest.mark.parametrize("seed", [100, 101, 102])
def test_device_traceback_matches_host(seed):
    """Device CIGARs == host native sw_tb_batch on raw planner bands,
    including structural indels that make the band jump >1 column/row."""
    from savont_tpu.ops.align_batch import run_jobs
    from savont_tpu.ops.align_jax import sw_traceback_numpy_jobs

    jobs = _fuzz_jobs(seed)
    assert jobs
    host = run_jobs(jobs, band=48)
    dev = sw_traceback_numpy_jobs(jobs, band=48)
    for h, d in zip(host, dev):
        assert (h is None) == (d is None)
        if h is None:
            continue
        assert h[:5] == d[:5]
        assert h[6] == d[6]
        assert np.array_equal(
            np.asarray(h[5], np.uint32), np.asarray(d[5], np.uint32)
        ), "CIGAR mismatch"


def test_device_nm_kernel_raw_bands_matches_host():
    """The NM-only device kernel (smooth=False) is exact on raw bands too —
    no smooth_lo divergence even on large structural indels."""
    from savont_tpu.ops.align_batch import run_jobs_nm
    from savont_tpu.ops.align_jax import sw_scores_numpy_jobs

    jobs = _fuzz_jobs(103)
    host = run_jobs_nm(jobs, band=48)
    dev = sw_scores_numpy_jobs(jobs, band=48)
    for h, d in zip(host, dev):
        assert (h is None) == (d is None)
        if h is None:
            continue
        assert (h[0], h[1], h[2], h[3], h[4], h[6]) == (
            d["score"], d["q_start"], d["q_end"], d["t_start"], d["t_end"], d["nm"],
        )


def test_run_jobs_routes_device_traceback(monkeypatch):
    """SAVONT_ALIGN_BACKEND=jax routes run_jobs (the CIGAR producer for
    stage-4 votes / pileups / stage-5 / stage-6) through the device kernel
    with identical results; SAVONT_DEVICE_TB=0 keeps CIGARs on host."""
    from savont_tpu.ops.align_batch import run_jobs

    jobs = _fuzz_jobs(104, n_targets=6)
    host = run_jobs(jobs, band=48)
    monkeypatch.setenv("SAVONT_ALIGN_BACKEND", "jax")
    dev = run_jobs(jobs, band=48)
    monkeypatch.setenv("SAVONT_DEVICE_TB", "0")
    host2 = run_jobs(jobs, band=48)
    for h, d, h2 in zip(host, dev, host2):
        assert (h is None) == (d is None) == (h2 is None)
        if h is None:
            continue
        assert h[:5] == d[:5] == h2[:5] and h[6] == d[6] == h2[6]
        assert np.array_equal(np.asarray(h[5], np.uint32), np.asarray(d[5], np.uint32))


def test_cigar_overflow_falls_back_to_host():
    """Pairs whose CIGAR run count exceeds maxrun are re-run on the host
    kernel with identical results."""
    from savont_tpu.ops.align_batch import run_jobs
    from savont_tpu.ops.align_jax import sw_traceback_numpy_jobs

    jobs = _fuzz_jobs(105, n_targets=4)
    host = run_jobs(jobs, band=48)
    dev = sw_traceback_numpy_jobs(jobs, band=48, maxrun=4)  # force overflow
    for h, d in zip(host, dev):
        assert (h is None) == (d is None)
        if h is None:
            continue
        assert h[:5] == d[:5] and h[6] == d[6]
        assert np.array_equal(np.asarray(h[5], np.uint32), np.asarray(d[5], np.uint32))


def test_pipeline_jax_backend_byte_identical(tmp_path, monkeypatch):
    """Full asv pipeline with SAVONT_ALIGN_BACKEND=jax (ALL alignment —
    CIGAR stages 4/5/6 included — on the device kernels) is byte-identical
    to the host run."""
    import gzip

    from savont_tpu.config import ClusterArgs
    from savont_tpu.ops.encode import revcomp_bytes
    from savont_tpu.pipeline.asv import run_cluster

    rng = np.random.default_rng(23)
    t1 = bytearray(rng.choice(BASES, 1200).tobytes())
    t2 = bytearray(t1)
    for p in (150, 430, 700, 1000):
        t2[p] = b"ACGT"[(b"ACGT".index(bytes([t2[p]])) + 1) % 4]
    # one template with a 60 bp deletion: exercises raw-band jumps
    t3 = bytes(t1[:400]) + bytes(t1[460:])
    reads = []
    for tpl in (bytes(t1), bytes(t2), t3):
        for i in range(30):
            b = bytearray(tpl)
            for p in rng.choice(len(b), 3, replace=False):
                b[p] = b"ACGT"[rng.integers(4)]
            r = bytes(b)
            reads.append(revcomp_bytes(r) if i % 2 else r)
    fq = tmp_path / "reads.fq.gz"
    with gzip.open(fq, "wt") as f:
        for i, r in enumerate(reads):
            f.write(f"@r{i}\n{r.decode()}\n+\n{'Z' * len(r)}\n")

    outs = {}
    for tag in ("host", "jax"):
        if tag == "jax":
            monkeypatch.setenv("SAVONT_ALIGN_BACKEND", "jax")
        else:
            monkeypatch.delenv("SAVONT_ALIGN_BACKEND", raising=False)
        out = tmp_path / tag
        run_cluster(ClusterArgs(input_files=[str(fq)], output_dir=str(out), threads=2, min_cluster_size=5))
        outs[tag] = out

    for rel in ("final_asvs.fasta", "feature-table.tsv", "temp/read_to_asv_mappings.tsv"):
        a = (outs["host"] / rel).read_bytes()
        b = (outs["jax"] / rel).read_bytes()
        assert a == b, f"{rel} differs between host and device-backend run"


def test_stage6_hit_reuse_contract(monkeypatch):
    """Stage-6 trusts stage-5's precomputed hits only when tagged with the
    IDENTICAL list object; a different list (even same length) recomputes."""
    from savont_tpu.config import ClusterArgs
    from savont_tpu.core import ConsensusSequence
    from savont_tpu.pipeline import stage6_chimera

    rng = np.random.default_rng(3)
    seqs = [rng.choice(BASES, 400).tobytes() for _ in range(3)]
    cons = [
        ConsensusSequence(
            sequence=np.frombuffer(s, np.uint8),
            hp_lengths=np.ones(len(s), np.uint8),
            depth=10 * (i + 1), id=i, cluster=[i],
        )
        for i, s in enumerate(seqs)
    ]
    for c in cons:
        c.decompress()
    args = ClusterArgs(input_files=[], output_dir="/tmp/x", min_read_length=100)

    calls = {"n": 0}
    from savont_tpu.ops import align_batch

    real = align_batch.map_batch

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr("savont_tpu.ops.align_batch.map_batch", counting)

    # identical tag -> no recompute
    from savont_tpu.ops.align import TargetIndex

    index = TargetIndex([c.get_decompressed() for c in cons])
    hits = real(index, [c.get_decompressed().tobytes() for c in cons], no_diag=True)
    stage6_chimera.detect_chimeras(cons, args, precomputed_hits=(hits, cons))
    assert calls["n"] == 0

    # same-length but different list object -> recompute
    other = list(cons)
    stage6_chimera.detect_chimeras(cons, args, precomputed_hits=(hits, other))
    assert calls["n"] == 1
