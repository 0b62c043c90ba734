#!/usr/bin/env python
"""Benchmark: fastq -> ASV throughput on the bundled ONT Zymo dataset.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline denominator: single-thread Rust savont on the same 902-read file.
The reference repo publishes no numbers ("takes a few seconds",
README.md:59) and no Rust toolchain exists in this image, so the baseline is
pinned to 300 reads/s (902 reads / ~3 s) per BASELINE.md's procedure note.

Correctness gate: the run only counts if every emitted ASV matches the Zymo
reference with NM=0 (the reference's own acceptance test).
"""
import json
import logging
import shutil
import sys
import tempfile
import time
from pathlib import Path

READS = Path("/root/reference/tests/data/ont_zymo_1000.trimmed.fq.gz")
REF_ASVS = Path("/root/reference/tests/data/zymo_ref_asvs.fa.gz")
BASELINE_READS_PER_S = 300.0  # single-thread Rust savont estimate (see above)
N_READS = 902


def main() -> int:
    logging.basicConfig(level=logging.WARNING)
    from savont_tpu.config import ClusterArgs
    from savont_tpu.pipeline.asv import run_cluster
    from savont_tpu.validate import validate_asvs

    # best of 3 runs: the VM has visible hypervisor steal time, so a single
    # run can be dominated by neighbor noise; min wall-clock is the standard
    # way to measure the code rather than the neighbors.
    out = Path(tempfile.mkdtemp(prefix="savont_bench_"))
    try:
        from savont_tpu.pipeline import stage1_kmers

        wall = float("inf")
        for _ in range(3):
            shutil.rmtree(out, ignore_errors=True)
            stage1_kmers._READ_CACHE.clear()  # each run pays the full parse
            t0 = time.time()
            args = ClusterArgs(input_files=[str(READS)], output_dir=str(out), threads=4)
            run_cluster(args)
            wall = min(wall, time.time() - t0)

        results = validate_asvs(str(out / "final_asvs.fasta"), str(REF_ASVS))
        ok = bool(results) and all(r.nm == 0 for r in results)
        reads_per_s = N_READS / wall if ok else 0.0
        print(
            json.dumps(
                {
                    "metric": "reads/s/chip for ASV generation (ONT 16S, fastq->ASV wall-clock)",
                    "value": round(reads_per_s, 2),
                    "unit": "reads/s",
                    "vs_baseline": round(reads_per_s / BASELINE_READS_PER_S, 3),
                    "wall_s": round(wall, 2),
                    "n_asvs": len(results),
                    "all_nm0": ok,
                }
            )
        )
        return 0 if ok else 1
    finally:
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
