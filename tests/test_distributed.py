"""Multi-host scaffolding test (SURVEY.md §5.8): a 2-process CPU
jax.distributed mesh must produce bit-identical stage-7 results to the
single-process 8-device mesh — same NM/score winners, same assigned count,
EM abundances equal to f32 reduction-order tolerance.  This is the
scaling-efficiency prerequisite BASELINE.md names (≥80% at 2 hosts becomes
measurable the day multi-host hardware exists)."""
import socket
import subprocess
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
from _dist_stage7_worker import make_pairs  # noqa: E402


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_mesh_matches_single_process(tmp_path):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    # single-process reference on the in-process 8-device mesh
    from savont_tpu.parallel.mesh import make_mesh, mesh_stage7_tie_break

    pairs, rr, ca, n_reads, n_asvs = make_pairs()
    best, abund_sp, count_sp = mesh_stage7_tie_break(pairs, rr, ca, n_reads, n_asvs, band=64, mesh=make_mesh(8))
    nm_sp = np.array([(-1 if b is None else b.nm) for b in best], dtype=np.int64)
    score_sp = np.array([(-1 if b is None else b.score) for b in best], dtype=np.int64)

    worker = Path(__file__).parent / "_dist_stage7_worker.py"
    coord = f"localhost:{_free_port()}"
    outs = [tmp_path / f"out{i}.npz" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), coord, str(outs[i])],
            cwd="/root/repo", stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    for p in procs:
        try:
            _, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err[-2000:]

    for out in outs:
        d = np.load(out)
        assert np.array_equal(d["nm"], nm_sp), "NM winners differ across process counts"
        assert np.array_equal(d["score"], score_sp)
        assert int(d["count"]) == count_sp
        # f32 psum order differs between 1- and 2-process reductions
        assert np.allclose(d["abund"], abund_sp, atol=1e-6)


def test_two_process_full_pipeline_byte_identical(tmp_path):
    """COMPLETE asv run under a 2-process CPU jax.distributed mesh (stage-4
    and stage-7 on the global 8-device mesh) must write byte-identical
    final_asvs.fasta / feature-table.tsv on every rank, equal to the
    single-process host run — BASELINE.md's 2-host scaling correctness
    half."""
    import gzip

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    rng = np.random.default_rng(41)
    BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
    from savont_tpu.ops.encode import revcomp_bytes

    t1 = bytearray(rng.choice(BASES, 1200).tobytes())
    t2 = bytearray(t1)
    for p in (140, 420, 760, 1100):
        t2[p] = b"ACGT"[(b"ACGT".index(bytes([t2[p]])) + 1) % 4]
    reads = []
    for tpl in (bytes(t1), bytes(t2)):
        for i in range(36):
            b = bytearray(tpl)
            for p in rng.choice(len(b), 2, replace=False):
                b[p] = b"ACGT"[rng.integers(4)]
            r = bytes(b)
            reads.append(revcomp_bytes(r) if i % 2 else r)
    fq = tmp_path / "reads.fq.gz"
    with gzip.open(fq, "wt") as f:
        for i, r in enumerate(reads):
            f.write(f"@r{i}\n{r.decode()}\n+\n{'Z' * len(r)}\n")

    # single-process host reference
    from savont_tpu.config import ClusterArgs
    from savont_tpu.pipeline.asv import run_cluster

    ref_dir = tmp_path / "ref"
    run_cluster(ClusterArgs(input_files=[str(fq)], output_dir=str(ref_dir), threads=2, min_cluster_size=5))

    worker = Path(__file__).parent / "_dist_pipeline_worker.py"
    coord = f"localhost:{_free_port()}"
    rank_dirs = [tmp_path / f"rank{i}" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), coord, str(fq), str(rank_dirs[i])],
            cwd="/root/repo", stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    for p in procs:
        try:
            _, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err[-3000:]

    for rel in ("final_asvs.fasta", "feature-table.tsv", "temp/read_to_asv_mappings.tsv"):
        want = (ref_dir / rel).read_bytes()
        for rd in rank_dirs:
            got = (rd / rel).read_bytes()
            assert got == want, f"{rel} differs on {rd.name} vs single-process host run"
