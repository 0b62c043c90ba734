#!/usr/bin/env python
"""Multi-host scaling measurement harness (BASELINE.md: >=80% reads/s
scaling efficiency at 2 hosts).

Runs the production stage-7 mesh step (align + tie sets + EM,
parallel/mesh.sharded_stage7_step) on the SAME fixed workload under 1 and
2 jax.distributed processes and records steady-state pairs/s + efficiency
to SCALING.json.

On this build VM only CPU virtual devices exist, so the recorded number
measures the software path (shard_map + psum over the 2-process mesh),
NOT real ICI/DCN — it proves the measurement methodology and the
multi-controller code path; run on real multi-host TPU for the BASELINE
target.  Device count per process is fixed (4) so total devices double
with process count, matching the "add a host" scaling question.

Usage: python scripts/scaling_bench.py            # orchestrator
       python scripts/scaling_bench.py worker <pid> <nproc> <coord> <out>
"""
import json
import os
import socket
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

B = 512          # pairs per run
L = 1200         # read length
N_ASVS = 8
DEV_PER_PROC = 4


def make_pairs():
    import numpy as np

    rng = np.random.default_rng(7)
    BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
    asvs = [rng.choice(BASES, L).tobytes() for _ in range(N_ASVS)]
    pairs, rr, ca = [], [], []
    for r in range(B):
        b = bytearray(asvs[r % N_ASVS])
        for p in rng.choice(L, 12, replace=False):
            b[p] = b"ACGT"[rng.integers(4)]
        pairs.append((bytes(b), asvs[r % N_ASVS]))
        rr.append(r)
        ca.append(r % N_ASVS)
    return pairs, np.array(rr), np.array(ca)


def run_step(n_proc: int, pid: int) -> float:
    """Steady-state seconds per full tie-break step on this process."""
    import numpy as np  # noqa: F401

    sys.path.insert(0, str(REPO))
    from savont_tpu.parallel.mesh import make_mesh, mesh_stage7_tie_break

    pairs, rr, ca = make_pairs()
    mesh = make_mesh()
    mesh_stage7_tie_break(pairs, rr, ca, B, N_ASVS, band=64, mesh=mesh)  # compile
    best = 9e9
    for _ in range(3):
        t0 = time.perf_counter()
        _, _, count = mesh_stage7_tie_break(pairs, rr, ca, B, N_ASVS, band=64, mesh=mesh)
        best = min(best, time.perf_counter() - t0)
        assert count == B
    return best


def worker() -> int:
    pid, n_proc, coord, out = int(sys.argv[2]), int(sys.argv[3]), sys.argv[4], sys.argv[5]
    os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={DEV_PER_PROC}"
    import jax

    jax.config.update("jax_platforms", "cpu")
    if n_proc > 1:
        jax.distributed.initialize(coordinator_address=coord, num_processes=n_proc, process_id=pid)
    secs = run_step(n_proc, pid)
    Path(out).write_text(json.dumps({"pid": pid, "secs": secs}))
    return 0


def orchestrate() -> int:
    import tempfile

    results = {}
    for n_proc in (1, 2):
        coord = f"localhost:{_free_port()}"
        with tempfile.TemporaryDirectory() as td:
            outs = [Path(td) / f"o{i}.json" for i in range(n_proc)]
            procs = [
                subprocess.Popen(
                    [sys.executable, __file__, "worker", str(i), str(n_proc), coord, str(outs[i])],
                    cwd=str(REPO), stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
                )
                for i in range(n_proc)
            ]
            for p in procs:
                _, err = p.communicate(timeout=600)
                if p.returncode != 0:
                    print(err[-2000:], file=sys.stderr)
                    return 1
            secs = max(json.loads(o.read_text())["secs"] for o in outs)
            results[n_proc] = B / secs
            print(f"{n_proc} process(es) x {DEV_PER_PROC} devices: {secs:.3f}s = {B/secs:.0f} pairs/s", flush=True)
    record = {
        "workload": f"stage-7 mesh tie-break, {B} pairs x {L} bp, {N_ASVS} ASVs, band 64",
        "devices_per_process": DEV_PER_PROC,
        "pairs_per_s_1proc": round(results[1], 1),
        "pairs_per_s_2proc": round(results[2], 1),
        "throughput_ratio_2v1": round(results[2] / results[1], 3),
        "note": (
            "cpu-virtual on ONE contended host: both process counts share 4 "
            "cores, so no speedup is possible here — this records that the "
            "2-process multi-controller path runs the identical workload at "
            "near-parity overhead.  On real multi-host TPU, scaling "
            "efficiency = pairs_per_s_2hosts / (2 * pairs_per_s_1host); the "
            "BASELINE target is >= 0.8."
        ),
    }
    (REPO / "SCALING.json").write_text(json.dumps(record) + "\n")
    print(json.dumps(record))
    return 0


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


if __name__ == "__main__":
    sys.exit(worker() if len(sys.argv) > 1 and sys.argv[1] == "worker" else orchestrate())
