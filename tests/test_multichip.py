"""Multi-chip sharding dry run on the virtual 8-device CPU mesh
(conftest sets XLA_FLAGS=--xla_force_host_platform_device_count=8)."""
import jax
import numpy as np
import pytest


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_kernel_matches_host_on_cpu():
    """Device kernel == host DP on a few random banded jobs."""
    from savont_tpu.ops.align import TargetIndex
    from savont_tpu.ops.align_batch import plan_jobs, run_jobs
    from savont_tpu.ops.align_jax import sw_scores_numpy_jobs

    rng = np.random.default_rng(13)
    jobs = []
    for _ in range(6):
        t = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), 400).astype(np.uint8).tobytes()
        q = bytearray(t)
        for p in rng.choice(len(q), 8, replace=False):
            q[p] = b"ACGT"[rng.integers(4)]
        jobs.extend(plan_jobs(TargetIndex([t]), bytes(q), band=64, min_anchors=2))
    host = run_jobs(jobs, band=64)
    dev = sw_scores_numpy_jobs(jobs, band=64)
    for h, d in zip(host, dev):
        ht = (h[0], h[1], h[2], h[3], h[4], h[6]) if h else None
        dt = (d["score"], d["q_start"], d["q_end"], d["t_start"], d["t_end"], d["nm"]) if d else None
        assert ht == dt
