"""Failure-path robustness: malformed/degenerate inputs must exit cleanly
with the reference's abort semantics (SURVEY §5.3), never crash."""
import gzip

import numpy as np
import pytest

from savont_tpu.config import ClusterArgs
from savont_tpu.pipeline import stage1_kmers
from savont_tpu.pipeline.asv import run_cluster

RNG = np.random.default_rng(9)


def rand_seq(n):
    return RNG.choice(np.frombuffer(b"ACGT", dtype=np.uint8), n).astype(np.uint8).tobytes()


def _run(tmp_path, writer, **kw):
    stage1_kmers._READ_CACHE.clear()
    fq = tmp_path / "in.fq.gz"
    writer(fq)
    try:
        run_cluster(ClusterArgs(input_files=[str(fq)], output_dir=str(tmp_path / "out"), threads=2, min_cluster_size=3, **kw))
    finally:
        stage1_kmers._READ_CACHE.clear()


def test_empty_input_exits(tmp_path):
    def w(p):
        with gzip.open(p, "wt"):
            pass

    with pytest.raises(SystemExit, match="No k-mers"):
        _run(tmp_path, w)


def test_too_short_reads_exit(tmp_path):
    def w(p):
        with gzip.open(p, "wt") as f:
            f.write("@r1\nACGTACGT\n+\nZZZZZZZZ\n")

    with pytest.raises(SystemExit, match="No k-mers"):
        _run(tmp_path, w)


def test_single_orientation_data_aborts_with_hint(tmp_path):
    """Forward-only data fails the both-strands filter with the
    --single-strand hint (seq_parse.rs:69-72)."""
    t = rand_seq(1400)

    def w(p):
        with gzip.open(p, "wt") as f:
            for i in range(20):
                f.write(f"@r{i}\n{t.decode()}\n+\n{'Z' * 1400}\n")

    with pytest.raises(SystemExit, match="single-strand"):
        _run(tmp_path, w)


def test_reads_with_ns_sanitized(tmp_path):
    """N bases are sanitized to A (seeding.rs:604-626) and the pipeline runs."""
    from savont_tpu.ops.encode import revcomp_bytes

    t = rand_seq(1400)

    def w(p):
        with gzip.open(p, "wt") as f:
            for i in range(24):
                b = bytearray(t)
                for pos in RNG.choice(1400, 5, replace=False):
                    b[pos] = b"ACGT"[RNG.integers(4)]
                for pos in RNG.choice(1400, 8, replace=False):
                    b[pos] = ord("N")
                r = bytes(b) if i % 2 else revcomp_bytes(bytes(b))
                f.write(f"@n{i}\n{r.decode()}\n+\n{'Z' * 1400}\n")

    _run(tmp_path, w)  # must not raise


def test_missing_input_file_cli():
    from savont_tpu.cli import main

    assert main(["asv", "/nonexistent/file.fq.gz", "-o", "/tmp/x"]) == 1


def test_markdown_help(capsys):
    """--markdown-help prints markdown CLI docs and returns 0 (cli.rs:175,
    the hidden clap-markdown flag)."""
    from savont_tpu.cli import main

    assert main(["--markdown-help"]) in (0, None)
    out = capsys.readouterr().out
    assert "# " in out and "asv" in out and "classify" in out
