"""Worker for tests/test_distributed.py::test_two_process_full_pipeline:
joins a 2-process CPU jax.distributed job (4 virtual devices each -> 8
global) and runs the COMPLETE asv pipeline with the stage-4 and stage-7
mesh backends over the global mesh, writing to a rank-local output dir.

Usage: python _dist_pipeline_worker.py <process_id> <coordinator> <fastq> <outdir>
"""
import os
import sys


def main() -> None:
    pid, coordinator, fastq, outdir = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["SAVONT_STAGE4_BACKEND"] = "mesh"
    os.environ["SAVONT_STAGE7_BACKEND"] = "mesh"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=2, process_id=int(pid)
    )
    assert len(jax.devices()) == 8, jax.devices()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from savont_tpu.config import ClusterArgs
    from savont_tpu.pipeline.asv import run_cluster

    run_cluster(
        ClusterArgs(
            input_files=[fastq], output_dir=outdir, threads=2, min_cluster_size=5
        )
    )


if __name__ == "__main__":
    main()
