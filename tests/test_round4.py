"""Round-4 additions: quality-aware per-read HPC (utils.rs:135-184)."""
import numpy as np


def test_hpc_with_quality_reference_example():
    """The utils.rs:135 doc example: (b"AAACGT", [30,35,40,25,30,35]) ->
    (b"ACGT", [30,25,30,35], [3,1,1,1])."""
    from savont_tpu.ops.encode import homopolymer_compress_with_quality

    seq = np.frombuffer(b"AAACGT", dtype=np.uint8)
    qual = np.array([30, 35, 40, 25, 30, 35], dtype=np.uint8)
    hs, hq, hl = homopolymer_compress_with_quality(seq, qual)
    assert hs.tobytes() == b"ACGT"
    assert hq.tolist() == [30, 25, 30, 35]
    assert hl.tolist() == [3, 1, 1, 1]


def test_hpc_with_quality_min_is_per_run():
    from savont_tpu.ops.encode import homopolymer_compress_with_quality

    seq = np.frombuffer(b"GGGGTTAA", dtype=np.uint8)
    qual = np.array([9, 3, 7, 8, 2, 6, 5, 4], dtype=np.uint8)
    hs, hq, hl = homopolymer_compress_with_quality(seq, qual)
    assert hs.tobytes() == b"GTA"
    assert hq.tolist() == [3, 2, 4]
    assert hl.tolist() == [4, 2, 2]


def test_hpc_with_quality_255_run_split():
    """Runs cap at 255 (u8) and split, each split segment carrying the min
    quality of its own span — the reference's `current_length < 255` rule."""
    from savont_tpu.ops.encode import homopolymer_compress_with_quality

    seq = np.frombuffer(b"A" * 300 + b"C", dtype=np.uint8)
    qual = np.full(301, 40, dtype=np.uint8)
    qual[10] = 5     # in the first 255-segment
    qual[280] = 7    # in the 45-segment
    hs, hq, hl = homopolymer_compress_with_quality(seq, qual)
    assert hs.tobytes() == b"AAC"
    assert hl.tolist() == [255, 45, 1]
    assert hq.tolist() == [5, 7, 40]


def test_hpc_with_quality_edge_cases():
    from savont_tpu.ops.encode import homopolymer_compress_with_quality

    # empty
    hs, hq, hl = homopolymer_compress_with_quality(
        np.zeros(0, np.uint8), np.zeros(0, np.uint8)
    )
    assert len(hs) == len(hq) == len(hl) == 0
    # length mismatch -> empties (reference returns empty tuples)
    hs, hq, hl = homopolymer_compress_with_quality(
        np.frombuffer(b"ACGT", np.uint8), np.array([30], np.uint8)
    )
    assert len(hs) == len(hq) == len(hl) == 0
    # do_hpc=False passes through with run lengths of 1
    seq = np.frombuffer(b"AACC", np.uint8)
    qual = np.array([1, 2, 3, 4], np.uint8)
    hs, hq, hl = homopolymer_compress_with_quality(seq, qual, do_hpc=False)
    assert hs.tobytes() == b"AACC" and hq.tolist() == [1, 2, 3, 4]
    assert hl.tolist() == [1, 1, 1, 1]


def test_hpc_quality_matches_decompress_roundtrip():
    """hp_lengths from the quality variant decompress back to the input."""
    from savont_tpu.ops.encode import (
        homopolymer_compress_with_quality,
        homopolymer_decompress,
    )

    rng = np.random.default_rng(5)
    seq = rng.choice(np.frombuffer(b"ACGT", np.uint8), 500)
    # force some runs
    seq[50:70] = ord("A")
    seq[200:230] = ord("T")
    qual = rng.integers(0, 60, 500).astype(np.uint8)
    hs, hq, hl = homopolymer_compress_with_quality(seq, qual)
    assert homopolymer_decompress(hs, hl).tobytes() == seq.tobytes()


def test_use_hpc_pipeline_runs_and_recovers(tmp_path):
    """--use-hpc end-to-end with per-read quality-aware HPC: the consensus
    is computed in HPC space and decompressed through the modal-HP
    machinery, so both templates (incl. a 5 bp homopolymer) must come back
    EXACTLY at full length."""
    import gzip

    from savont_tpu.config import ClusterArgs
    from savont_tpu.ops.encode import revcomp_bytes
    from savont_tpu.pipeline.asv import run_cluster

    rng = np.random.default_rng(11)
    BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
    t1 = bytearray(rng.choice(BASES, 1400).tobytes())
    t1[100:105] = b"AAAAA"  # homopolymer
    t2 = bytearray(t1)
    for p in (160, 480, 800, 1200):
        t2[p] = b"ACGT"[(b"ACGT".index(bytes([t2[p]])) + 1) % 4]
    reads = []
    for tpl in (bytes(t1), bytes(t2)):
        for i in range(40):
            b = bytearray(tpl)
            for p in rng.choice(len(b), 2, replace=False):
                b[p] = b"ACGT"[rng.integers(4)]
            r = bytes(b)
            reads.append(revcomp_bytes(r) if i % 2 else r)
    fq = tmp_path / "reads.fq.gz"
    with gzip.open(fq, "wt") as f:
        for i, r in enumerate(reads):
            f.write(f"@r{i}\n{r.decode()}\n+\n{'Z' * len(r)}\n")
    out = tmp_path / "out"
    run_cluster(
        ClusterArgs(
            input_files=[str(fq)], output_dir=str(out), threads=2,
            min_cluster_size=5, use_hpc=True,
        )
    )
    fasta = (out / "final_asvs.fasta").read_text().split(">")[1:]
    asvs = {e.split("\n", 1)[1].replace("\n", "") for e in fasta}
    want = {bytes(t1).decode(), bytes(t2).decode()}
    assert want <= asvs, "templates not recovered exactly under --use-hpc"


def test_indexed_slab_pipeline_fallback(monkeypatch):
    """The pipelined multi-slab runner (plan i+1 overlapping DP i) must
    (a) produce results identical to the serial runner, and (b) fall back
    to the tuple path for the WHOLE call when a mid-stream slab's planner
    prerequisite is missing."""
    import numpy as np

    from savont_tpu.ops import align_batch as ab

    rng = np.random.default_rng(3)
    BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
    targets = [rng.choice(BASES, 600).tobytes() for _ in range(4)]
    n = 20000  # > 2 slabs of 8192
    reps = []
    for i in range(64):
        b = bytearray(targets[i % 4])
        for p in rng.choice(len(b), 6, replace=False):
            b[p] = b"ACGT"[rng.integers(4)]
        reps.append(bytes(b))
    queries = [reps[i % 64] for i in range(n)]
    qi = np.arange(n, dtype=np.int64)
    ti = (qi % 4).astype(np.int64)

    monkeypatch.setenv("SAVONT_SLAB_WORKERS", "1")  # serial reference
    want = ab.align_pairs_nm_values_indexed(queries, targets, qi, ti, 48)
    monkeypatch.delenv("SAVONT_SLAB_WORKERS")
    got = ab.align_pairs_nm_values_indexed(queries, targets, qi, ti, 48)
    assert np.array_equal(got, want)

    # fail the planner on the SECOND slab only: the runner must signal
    # fallback and the public wrapper must still return correct values
    calls = {"n": 0}
    orig = ab._plan_soa_indexed

    def flaky(*a, **k):
        calls["n"] += 1
        if calls["n"] == 2:
            return None
        return orig(*a, **k)

    monkeypatch.setattr(ab, "_plan_soa_indexed", flaky)
    assert ab._run_indexed_slabs(queries, targets, qi, ti, 48, False, nm_values=True) is None
    calls["n"] = 0
    got2 = ab.align_pairs_nm_values_indexed(queries, targets, qi, ti, 48)
    assert np.array_equal(got2, want)


def test_seq_bytes_prefill_matches_decode(tmp_path):
    """Stage-1.5 hands pure-ACGT reads the parsed bytes object as the
    seq_bytes memo; reads with Ns must still decode (N->A sanitized)."""
    import gzip

    import numpy as np

    from savont_tpu.config import ClusterArgs
    from savont_tpu.ops.encode import decode_seq
    from savont_tpu.pipeline import stage1_kmers as s1

    from savont_tpu.ops.encode import revcomp_bytes

    rng = np.random.default_rng(9)
    BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
    tpl = rng.choice(BASES, 1300).tobytes()
    reads = []
    for i in range(30):
        b = bytearray(tpl)
        for p in rng.choice(len(b), 3, replace=False):
            b[p] = b"ACGT"[rng.integers(4)]
        if i % 5 == 0:
            b[600] = ord("N")  # sanitized to A at encode
        r = bytes(b)
        reads.append(revcomp_bytes(r) if i % 2 else r)
    fq = tmp_path / "r.fq.gz"
    with gzip.open(fq, "wt") as f:
        for i, r in enumerate(reads):
            f.write(f"@r{i}\n{r.decode()}\n+\n{'I' * len(r)}\n")
    args = ClusterArgs(input_files=[str(fq)], output_dir=str(tmp_path / "o"),
                       min_read_length=100, max_read_length=5000)
    kmers, counts = s1.read_to_split_kmers(args)
    info = s1.get_snpmers(kmers, counts, args)
    trs = s1.twin_reads_from_files(info, args)
    assert len(trs) == 30
    by_id = {t.id: t for t in trs}
    for i, r in enumerate(reads):
        tr = by_id[f"r{i}"]
        want = decode_seq(tr.codes)
        assert tr.seq_bytes() == want
        if b"N" not in r:
            assert tr.seq_bytes() == r
