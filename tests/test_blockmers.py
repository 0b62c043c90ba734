"""Blockmer subsystem: extraction, calling, clustering mode (--use-blockmers)."""
import gzip

import numpy as np
import pytest

from savont_tpu.config import ClusterArgs
from savont_tpu.ops.encode import encode_seq, revcomp_bytes
from savont_tpu.ops.kmers import blockmer_hits_scan, blockmer_scan, count_blockmers
from savont_tpu.pipeline import stage1_kmers
from savont_tpu.pipeline.asv import run_cluster

RNG = np.random.default_rng(61)


def rand_seq(n):
    return RNG.choice(np.frombuffer(b"ACGT", dtype=np.uint8), n).astype(np.uint8).tobytes()


def test_blockmer_scan_strand_symmetry():
    """blockmer values are RC-invariant as a multiset (anchor-canonical)."""
    s = rand_seq(300)
    k1, f1 = blockmer_scan(encode_seq(s), None, 17, 3, 25)
    k2, f2 = blockmer_scan(encode_seq(revcomp_bytes(s)), None, 17, 3, 25)
    assert sorted(map(int, k1)) == sorted(map(int, k2))
    # orientations flip on the reverse strand
    assert f1.sum() + f2.sum() == len(k1)


def test_blockmer_counting_strand_split():
    s = rand_seq(300)
    a = blockmer_scan(encode_seq(s), None, 17, 3, 25)
    b = blockmer_scan(encode_seq(revcomp_bytes(s)), None, 17, 3, 25)
    kmers, counts = count_blockmers([a, b])
    assert (counts.sum(axis=1) == 2).all()
    assert (counts[:, 0] == 1).all() and (counts[:, 1] == 1).all()


def test_blockmer_hits_scan_finds_planted():
    s = rand_seq(300)
    kms, _ = blockmer_scan(encode_seq(s), None, 17, 3, 25)
    target = np.unique(kms[:5])
    pos, fwd = blockmer_hits_scan(encode_seq(s), None, 17, 3, np.sort(target), 25)
    assert len(pos) >= len(target)
    # reconstructed values are members of the set
    from savont_tpu.ops.kmers import kmer_at_position_oriented

    vals = kmer_at_position_oriented(encode_seq(s), pos, 20, fwd)
    assert all(int(v) in set(map(int, target)) for v in vals)


def test_use_blockmers_pipeline(tmp_path):
    """Two strains with suffix-adjacent SNPs; --use-blockmers end-to-end."""
    t1 = rand_seq(1500)
    t2 = bytearray(t1)
    for p in (400, 900, 1300):
        t2[p] = b"ACGT"[(b"ACGT".index(bytes([t2[p]])) + 1) % 4]
    reads = []
    for tpl in (t1, bytes(t2)):
        for i in range(25):
            b = bytearray(tpl)
            for p in RNG.choice(len(b), 6, replace=False):
                b[p] = b"ACGT"[RNG.integers(4)]
            r = bytes(b)
            if i % 2:
                r = revcomp_bytes(r)
            reads.append(r)
    fq = tmp_path / "blk.fq.gz"
    with gzip.open(fq, "wt") as f:
        for i, r in enumerate(reads):
            f.write(f"@blkread_{i}\n{r.decode()}\n+\n{'Z' * len(r)}\n")
    out = tmp_path / "blk_out"
    stage1_kmers._READ_CACHE.clear()
    run_cluster(ClusterArgs(input_files=[str(fq)], output_dir=str(out), threads=4,
                            use_blockmers=True, min_cluster_size=5))
    stage1_kmers._READ_CACHE.clear()
    assert (out / "final_asvs.fasta").exists()
    seqs = [l for l in (out / "final_asvs.fasta").read_text().splitlines() if not l.startswith(">")]
    assert len(seqs) >= 1
