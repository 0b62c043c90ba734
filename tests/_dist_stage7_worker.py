"""Worker for tests/test_distributed.py: joins a 2-process CPU
jax.distributed job (4 virtual devices each -> 8 global) and runs the
production stage-7 mesh step on seeded synthetic pairs.

Usage: python _dist_stage7_worker.py <process_id> <coordinator> <out.npz>
"""
import os
import sys


def make_pairs(seed: int = 23, n_reads: int = 24, n_asvs: int = 3, L: int = 400):
    import numpy as np

    rng = np.random.default_rng(seed)
    BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
    asvs = [rng.choice(BASES, L).tobytes() for _ in range(n_asvs)]
    pairs, rr, ca = [], [], []
    for r in range(n_reads):
        b = bytearray(asvs[r % n_asvs])
        for p in rng.choice(L, 5, replace=False):
            b[p] = b"ACGT"[rng.integers(4)]
        read = bytes(b)
        for a in sorted({r % n_asvs, (r + 1) % n_asvs}):
            pairs.append((read, asvs[a]))
            rr.append(r)
            ca.append(a)
    return pairs, np.array(rr), np.array(ca), n_reads, n_asvs


def main() -> None:
    pid, coordinator, out_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coordinator, num_processes=2, process_id=pid)
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from savont_tpu.parallel.mesh import make_mesh, mesh_stage7_tie_break

    assert len(jax.devices()) == 8, jax.devices()
    pairs, rr, ca, n_reads, n_asvs = make_pairs()
    best, abund, count = mesh_stage7_tie_break(pairs, rr, ca, n_reads, n_asvs, band=64, mesh=make_mesh(8))
    nm = np.array([(-1 if b is None else b.nm) for b in best], dtype=np.int64)
    score = np.array([(-1 if b is None else b.score) for b in best], dtype=np.int64)
    np.savez(out_path, nm=nm, score=score, abund=abund, count=count)


if __name__ == "__main__":
    main()
