#!/usr/bin/env python
"""Benchmark: fastq -> ASV throughput.

Prints TWO JSON lines:
  1. steady-state throughput on 20k synthetic reads (best of 4; large-N
     behavior can't be flattered by small-N fixed costs),
  2. the headline 902-read ONT Zymo number (best of 7; the driver reads the
     LAST line).

Baseline denominator: single-thread Rust savont on the same 902-read file.
The reference repo publishes no numbers ("takes a few seconds",
README.md:59) and no Rust toolchain exists in this image, so the baseline is
pinned to 300 reads/s (902 reads / ~3 s) per BASELINE.md's procedure note.

Correctness gates: every emitted ASV must match the Zymo reference with
NM=0 (the reference's own acceptance test); the 20k synthetic run must
recover >= 8 template ASVs, all NM=0.
"""
import gzip
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
N_SYNTH = 20000


def _gen_synth(path: Path) -> None:
    """20k synthetic ONT-like reads from 10 Zymo templates (the same
    construction as tests/test_scale.py, seed-pinned)."""
    import numpy as np

    from savont_tpu.io.fastx import read_fastx
    from savont_tpu.ops.encode import revcomp_bytes

    refs = [(r.id, r.seq.upper()) for r in read_fastx(str(REF_ASVS))]
    seen, picked = set(), []
    for rid, seq in refs:
        contig = rid.split("::")[1].split(":")[0]
        if contig not in seen and 1300 < len(seq) < 1700:
            seen.add(contig)
            picked.append(seq)
    picked = picked[:10]
    rng = np.random.default_rng(42)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    with gzip.open(path, "wt") as out:
        for ti, seq in enumerate(picked):
            arr = np.frombuffer(seq, dtype=np.uint8)
            for i in range(N_SYNTH // 10):
                b = arr.copy()
                nsub = rng.binomial(len(b), 0.015)
                pos = rng.choice(len(b), nsub, replace=False)
                b[pos] = bases[(np.searchsorted(bases, b[pos]) + rng.integers(1, 4, nsub)) % 4]
                s = b.tobytes()
                if rng.random() < 0.3:
                    p = int(rng.integers(50, len(s) - 50))
                    s = s[:p] + s[p + int(rng.integers(1, 3)):]
                if rng.random() < 0.5:
                    s = revcomp_bytes(s)
                out.write(f"@t{ti}_r{i}\n{s.decode()}\n+\n{'I' * len(s)}\n")


def _run_once(inp: Path, out: Path) -> float:
    from savont_tpu.config import ClusterArgs
    from savont_tpu.pipeline import stage1_kmers
    from savont_tpu.pipeline.asv import run_cluster

    shutil.rmtree(out, ignore_errors=True)
    stage1_kmers._READ_CACHE.clear()  # each run pays the full parse
    t0 = time.time()
    run_cluster(ClusterArgs(input_files=[str(inp)], output_dir=str(out), threads=4))
    return time.time() - t0


def main() -> int:
    logging.basicConfig(level=logging.WARNING)
    from savont_tpu.validate import validate_asvs

    work = Path(tempfile.mkdtemp(prefix="savont_bench_"))
    try:
        # ── line 1: 20k synthetic steady state ────────────────────────────
        # best of 6 (vs 7 on the 902 line): hypervisor steal on this VM can
        # inflate any single run 50%+, and bursts last tens of seconds — a
        # 4-run span (~30 s) can sit entirely inside one burst, so spread
        # the samples wider
        synth = work / "synth20k.fq.gz"
        _gen_synth(synth)
        out20k = work / "out20k"
        wall20k = min(_run_once(synth, out20k) for _ in range(6))
        res20k = validate_asvs(str(out20k / "final_asvs.fasta"), str(REF_ASVS))
        ok20k = len(res20k) >= 8 and all(r.nm == 0 for r in res20k)
        print(
            json.dumps(
                {
                    "metric": "steady-state reads/s/chip (20k synthetic ONT reads, fastq->ASV)",
                    "value": round(N_SYNTH / wall20k, 2) if ok20k else 0.0,
                    "unit": "reads/s",
                    "vs_baseline": round(N_SYNTH / wall20k / BASELINE_READS_PER_S, 3) if ok20k else 0.0,
                    "wall_s": round(wall20k, 2),
                    "n_asvs": len(res20k),
                    "all_nm0": ok20k,
                }
            ),
            flush=True,
        )

        # ── line 2 (the driver reads the LAST line): 902-read Zymo set ────
        # best of 7 (each run is ~0.25 s): the VM shows ~8% hypervisor steal
        # with bursts that can double a single run, so the floor needs a few
        # samples to surface
        out = work / "out902"
        wall = min(_run_once(READS, out) for _ in range(7))
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
        return 0 if (ok and ok20k) else 1
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
