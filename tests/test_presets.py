"""Preset / mode coverage: --rrna-operon (~4.5 kb reads, longer DP bands),
--hifi, --use-hpc, --skip-chimera-detection."""
import gzip
from pathlib import Path

import numpy as np
import pytest

from savont_tpu.config import ClusterArgs
from savont_tpu.pipeline.asv import run_cluster

RNG = np.random.default_rng(41)


def rand_seq(n):
    return RNG.choice(np.frombuffer(b"ACGT", dtype=np.uint8), n).astype(np.uint8).tobytes()


def mutate(seq, rate):
    b = bytearray(seq)
    for p in RNG.choice(len(b), int(len(b) * rate), replace=False):
        b[p] = b"ACGT"[RNG.integers(4)]
    return bytes(b)


def write_fastq(path, reads):
    with gzip.open(path, "wt") as f:
        for i, r in enumerate(reads):
            f.write(f"@operon_read_{i}\n{r.decode()}\n+\n{'Z' * len(r)}\n")


def _two_template_reads(length, n_per, snp_positions):
    """Two templates differing at fixed SNP positions; noisy reads of each."""
    t1 = bytearray(rand_seq(length))
    t2 = bytearray(t1)
    for p in snp_positions:
        t2[p] = b"ACGT"[(b"ACGT".index(bytes([t2[p]])) + 1) % 4]
    reads = []
    from savont_tpu.ops.encode import revcomp_bytes

    for tpl in (bytes(t1), bytes(t2)):
        for i in range(n_per):
            r = mutate(tpl, 0.004)
            if i % 2:
                r = revcomp_bytes(r)
            reads.append(r)
    return bytes(t1), bytes(t2), reads


def test_rrna_operon_preset(tmp_path):
    t1, t2, reads = _two_template_reads(4400, 30, [500, 1500, 2500, 3500])
    fq = tmp_path / "operon.fq.gz"
    write_fastq(fq, reads)
    out = tmp_path / "operon_out"
    args = ClusterArgs(
        input_files=[str(fq)], output_dir=str(out), threads=4,
        rrna_operon=True, min_cluster_size=5,
    )
    run_cluster(args)
    lines = (out / "final_asvs.fasta").read_text().splitlines()
    seqs = [l for l in lines if not l.startswith(">")]
    assert len(seqs) == 2, f"expected 2 operon ASVs, got {len(seqs)}"
    # each ASV must be an exact substring of one template, either strand
    from savont_tpu.ops.encode import revcomp_bytes

    refs = [t1, t2, revcomp_bytes(t1), revcomp_bytes(t2)]
    for s in seqs:
        assert any(s.encode() in r for r in refs), "operon ASV has errors"


def test_hifi_preset_lowers_min_cluster(tmp_path):
    args = ClusterArgs(input_files=[], hifi=True)
    args.apply_presets()
    assert args.min_cluster_size == 4


def test_use_hpc_and_skip_chimera(tmp_path):
    t1, t2, reads = _two_template_reads(1500, 25, [400, 900])
    fq = tmp_path / "hpc.fq.gz"
    write_fastq(fq, reads)
    out = tmp_path / "hpc_out"
    args = ClusterArgs(
        input_files=[str(fq)], output_dir=str(out), threads=4,
        use_hpc=True, skip_chimera_detection=True, min_cluster_size=5,
    )
    run_cluster(args)
    # skip_chimera_detection returns before stage 7 (main.rs:122-125)
    assert not (out / "final_asvs.fasta").exists()
    assert (out / "temp" / "merged_consensus_sequences.fasta").exists()
