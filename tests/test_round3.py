"""Round-3 regression tests: oracle coverage floor, sample-name parity,
FASTA-path native scan parity, and DB registry download construction."""
from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

DATA = Path(__file__).parent / "data"


def _rand_seq(rng, n) -> bytes:
    return rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), n).tobytes()


# ─────────────────────────── validation oracle ───────────────────────────

def _write_fasta(path, recs):
    with open(path, "w") as f:
        for rid, seq in recs:
            f.write(f">{rid}\n{seq.decode()}\n")


def test_validate_rejects_chimeric_tail(tmp_path):
    """An ASV whose first half matches a reference perfectly but whose tail
    is foreign must FAIL: a clean local span is not NM=0 evidence
    (minimap2-primary-mapping semantics, integration_test.rs:147-159)."""
    from savont_tpu.validate import validate_asvs

    rng = np.random.default_rng(7)
    ref = _rand_seq(rng, 1500)
    chimera = ref[:800] + _rand_seq(rng, 700)
    _write_fasta(tmp_path / "ref.fa", [("ref1", ref)])
    _write_fasta(tmp_path / "asv.fa", [("chimera", chimera)])
    res = validate_asvs(str(tmp_path / "asv.fa"), str(tmp_path / "ref.fa"))
    assert len(res) == 1
    assert res[0].nm is None  # rejected despite the clean 800bp local hit
    assert res[0].coverage < 0.95


def test_validate_accepts_full_coverage_with_nm(tmp_path):
    from savont_tpu.validate import validate_asvs

    rng = np.random.default_rng(8)
    ref = bytearray(_rand_seq(rng, 1500))
    asv = bytearray(ref)
    for p in (300, 900):  # two substitutions, full-length otherwise
        asv[p] = ord("ACGT"[(b"ACGT".index(bytes([asv[p]])) + 1) % 4])
    _write_fasta(tmp_path / "ref.fa", [("ref1", bytes(ref))])
    _write_fasta(tmp_path / "asv.fa", [("mut2", bytes(asv))])
    res = validate_asvs(str(tmp_path / "asv.fa"), str(tmp_path / "ref.fa"))
    assert len(res) == 1
    assert res[0].nm == 2
    assert res[0].coverage >= 0.95


# ─────────────────────────── sample-name parity ───────────────────────────

def test_sample_names_file_stem_semantics():
    """Rust Path::file_stem strips ONLY the last extension (main.rs:152-156)."""
    from savont_tpu.pipeline.outputs import sample_names_from_inputs

    got = sample_names_from_inputs(
        ["/a/b/x.trimmed.fq.gz", "plain.fastq", "noext", "/d/.hidden", ""]
    )
    assert got == ["x.trimmed.fq", "plain", "noext", ".hidden", "sample"]


# ─────────────────── FASTA-path native scan parity (ADVICE) ───────────────

def test_twin_reads_from_fasta_native_matches_python(tmp_path, monkeypatch):
    """twin_reads_from_fasta's native batched scan (quals=None) vs the
    build_twin_read Python fallback: identical minimizer/SNPmer positions
    and k-mer vectors."""
    from savont_tpu.config import ClusterArgs
    from savont_tpu.core import KmerGlobalInfo, SnpmerInfo
    from savont_tpu.ops.encode import encode_seq
    from savont_tpu.ops.kmers import split_kmer_mid
    from savont_tpu.ops.kmers_native import get_scan_lib
    from savont_tpu.pipeline import stage1_kmers

    if get_scan_lib() is None:
        pytest.skip("native scan lib unavailable")

    args = ClusterArgs(input_files=[], output_dir="")
    k = args.kmer_size
    rng = np.random.default_rng(31)
    seqs = [_rand_seq(rng, int(n)) for n in rng.integers(200, 1400, size=12)]

    # Build a SNPmer set from k-mers genuinely present in the sequences so
    # the snp positions are non-trivial.
    bit63 = np.uint64(1) << np.uint64(63)
    infos = []
    for s in seqs[:6]:
        flagged = split_kmer_mid(encode_seq(s), None, k, args.minimum_base_quality)
        for km in flagged[:: max(1, len(flagged) // 5)][:5]:
            kmer = int(km & ~bit63)
            split = kmer & ~(3 << (k - 1))
            mid = (kmer >> (k - 1)) & 3
            infos.append(SnpmerInfo(split, (mid, (mid + 1) % 4), (5, 5), k))
    kmer_info = KmerGlobalInfo(
        snpmer_info=infos,
        high_freq_kmers=np.zeros(0, dtype=np.uint64),
        high_freq_thresh=1e9,
        read_files=[],
    )

    fa = tmp_path / "asvs.fasta"
    _write_fasta(fa, [(f"s{i}", s) for i, s in enumerate(seqs)])

    native = stage1_kmers.twin_reads_from_fasta(fa, kmer_info, args)
    monkeypatch.setattr("savont_tpu.ops.kmers_native.get_scan_lib", lambda: None)
    python = stage1_kmers.twin_reads_from_fasta(fa, kmer_info, args)

    assert len(native) == len(python) == len(seqs)
    some_snp = False
    for a, b in zip(native, python):
        np.testing.assert_array_equal(a.mini_pos, b.mini_pos)
        np.testing.assert_array_equal(a.snp_pos, b.snp_pos)
        np.testing.assert_array_equal(a.mini_kmers_all, b.mini_kmers_all)
        np.testing.assert_array_equal(a.snp_kmers_all, b.snp_kmers_all)
        pa, ka = a.snpmers_vec()
        pb, kb = b.snpmers_vec()
        np.testing.assert_array_equal(pa, pb)
        np.testing.assert_array_equal(ka, kb)
        some_snp |= len(pa) > 0
    assert some_snp  # the engineered SNPmer set must actually fire


# ─────────────────────────── DB registry tests ───────────────────────────

def test_download_command_construction(tmp_path, monkeypatch):
    """Mocked `download`: wget/tar/gzip command construction per
    databases.rs:110-190, marker file written (download.rs:5-31)."""
    from savont_tpu.db import registry

    calls = []
    monkeypatch.setattr(registry, "_run", lambda cmd: calls.append(cmd))
    registry.download(str(tmp_path), ["emu-1", "silva-138.2", "greengenes2-2024.09"])

    flat = ["\x00".join(c) for c in calls]
    # EMU: OSF tarball via wget --content-disposition, then tar -xzf
    assert any(c[0] == "wget" and "--content-disposition" in c and
               "https://osf.io/8qcwd/download" in c for c in calls)
    assert any(c[0] == "tar" and "-xzf" in c for c in calls)
    # SILVA: two wgets + gzip -d of the taxmap
    assert any("SILVA_138.2_SSURef_NR99_tax_silva_trunc.fasta.gz" in f for f in flat)
    assert any("taxmap_slv_ssu_ref_nr_138.2.txt.gz" in f and c[0] == "wget"
               for f, c in zip(flat, calls))
    assert any(c[0] == "gzip" and c[1] == "-d" for c in calls)
    # GG2: zenodo trainset
    assert any("gg2_2024_09_toSpecies_trainset.fa.gz" in f for f in flat)
    # markers
    for kw in ("emu-1", "silva-138.2", "greengenes2-2024.09"):
        assert (tmp_path / kw / registry.MARKER_FILE).read_text() == kw


def test_download_unknown_db_exits(tmp_path):
    from savont_tpu.db import registry

    with pytest.raises(SystemExit):
        registry.download(str(tmp_path), ["not-a-db"])


# Real-database soft-skip tests (integration_test.rs:36-86): enabled only
# when a real database has been downloaded to tests/data/<keyword>/.

def _soft_db(keyword: str, probe) -> Path:
    d = DATA / keyword
    if not d.is_dir() or not probe(d):
        pytest.skip(
            f"{keyword} database not found at {d}. Run: "
            f"python -m savont_tpu download --location {DATA} --dbs {keyword}"
        )
    return d


def test_emu_db_load_real():
    from savont_tpu.db import registry

    d = _soft_db("emu-1", lambda p: (p / "species_taxid.fasta").exists())
    db = registry.load_database(d)
    assert len(db.taxonomy) > 1000


def test_silva_db_load_real():
    from savont_tpu.db import registry

    d = _soft_db("silva-138.2", lambda p: any(
        n.name.endswith((".fasta.gz", ".fasta")) for n in p.iterdir()))
    db = registry.load_database(d)
    assert len(db.taxonomy) > 1000


def test_gg2_db_load_real():
    from savont_tpu.db import registry

    d = _soft_db("greengenes2-2024.09", lambda p: any(
        n.name.endswith((".fa.gz", ".fa")) for n in p.iterdir()))
    db = registry.load_database(d)
    assert len(db.taxonomy) > 1000
