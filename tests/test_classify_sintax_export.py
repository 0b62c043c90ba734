"""Tests for classify / sintax / export using a synthetic mini-database and
the GTDB/GG2/EMU parsers (mirrors integration_test.rs:253-305 style)."""
import gzip
from pathlib import Path

import numpy as np
import pytest

from savont_tpu.config import ClassifyArgs, ExportArgs, SintaxArgs
from savont_tpu.db import taxonomy as tax
from savont_tpu.pipeline.classify import classify
from savont_tpu.pipeline.export import export, fuzzy_merge_table, seq_hash
from savont_tpu.pipeline.sintax import Xorshift, extract_kmers, sintax

RNG = np.random.default_rng(99)


def rand_seq(n):
    return RNG.choice(np.frombuffer(b"ACGT", dtype=np.uint8), n).astype(np.uint8).tobytes()


# ── parsers ──────────────────────────────────────────────────────────────────


def test_gtdb_taxonomy_parser(tmp_path):
    fna = tmp_path / "mock_gtdb.fna"
    fna.write_text(
        ">RS_GCF_000001405.40~NC_000001.11 d__Bacteria;p__Pseudomonadota;"
        "c__Gammaproteobacteria;o__Enterobacterales;f__Enterobacteriaceae;"
        "g__Escherichia;s__Escherichia coli [location=1..1500]\nACGT\n"
        ">GB_GCA_000007185.1~AE017221.1 d__Archaea;p__Thermoproteota;"
        "c__Thermoprotei;o__Thermoproteales;f__Thermoproteaceae;"
        "g__Thermoproteus;s__Thermoproteus tenax [location=1..1200]\nTTTT\n"
    )
    db = tax.load_gtdb(tmp_path)
    assert len(db.taxonomy) == 2
    e = db.taxonomy["RS_GCF_000001405.40~NC_000001.11"]
    assert (e.superkingdom, e.genus, e.species) == ("Bacteria", "Escherichia", "Escherichia coli")
    a = db.taxonomy["GB_GCA_000007185.1~AE017221.1"]
    assert (a.superkingdom, a.species) == ("Archaea", "Thermoproteus tenax")


def test_gg2_parser_unannotated_fill(tmp_path):
    fa = tmp_path / "gg2_mock.fa"
    fa.write_text(">d__Bacteria;p__Bacillota;c__;o__;f__;g__Listeria;s__monocytogenes;\nACGT\n")
    db = tax.load_gg2(tmp_path)
    e = next(iter(db.taxonomy.values()))
    assert e.genus == "Listeria"
    assert e.species == "Listeria monocytogenes"
    assert e.class_ == "Greengenes_unannotated"


def test_yarza_rank_assignment():
    e = tax.TaxonomyEntry(tax_id="1", species="S", genus="G", family="F", order="O",
                          class_="C", phylum="P", clade="Cl", superkingdom="K")
    a = tax.assign_taxonomy(e, 99.5, 99.0, 94.5, "h", False)
    assert a.species == "S"
    a = tax.assign_taxonomy(e, 96.0, 99.0, 94.5, "h", False)
    assert a.species == "UNCLASSIFIED" and a.genus == "G"
    a = tax.assign_taxonomy(e, 90.0, 99.0, 94.5, "h", False)
    assert a.genus == "UNCLASSIFIED" and a.family == "F"
    a = tax.assign_taxonomy(e, 80.0, 99.0, 94.5, "h", False)
    assert a.order == "UNCLASSIFIED" and a.class_ == "C"
    a = tax.assign_taxonomy(e, 70.0, 99.0, 94.5, "h", False)
    assert a.phylum == "UNCLASSIFIED" and a.superkingdom == "UNCLASSIFIED"


# ── classify end-to-end on a synthetic EMU-format DB ─────────────────────────


@pytest.fixture()
def mini_emu_db(tmp_path):
    db_dir = tmp_path / "emu-1"
    db_dir.mkdir()
    species = [("101", "Listeria monocytogenes", "Listeria"),
               ("102", "Pseudomonas aeruginosa", "Pseudomonas"),
               ("103", "Escherichia coli", "Escherichia")]
    seqs = {tid: rand_seq(1500) for tid, _, _ in species}
    with open(db_dir / "species_taxid.fasta", "w") as f:
        for tid, _, _ in species:
            f.write(f">{tid}:emu_db:1\n{seqs[tid].decode()}\n")
    with open(db_dir / "taxonomy.tsv", "w") as f:
        f.write("tax_id\tspecies\tgenus\tfamily\torder\tclass\tphylum\tclade\tsuperkingdom\tsubspecies\tssg\tsg\n")
        for tid, sp, g in species:
            f.write(f"{tid}\t{sp}\t{g}\tFam\tOrd\tCls\tPhy\t\tBacteria\t\t\t\n")
    return db_dir, seqs


def _write_asv_dir(tmp_path, name, asv_seqs_with_depths):
    d = tmp_path / name
    d.mkdir(exist_ok=True)
    with open(d / "final_asvs.fasta", "w") as f:
        for i, (seq, depth) in enumerate(asv_seqs_with_depths):
            f.write(f">final_consensus_{i}_depth_{depth}\n{seq.decode()}\n")
    with open(d / "feature-table.tsv", "w") as f:
        f.write(f"#OTU ID\t{name}\n")
        for i, (_, depth) in enumerate(asv_seqs_with_depths):
            f.write(f"final_consensus_{i}_depth_{depth}\t{depth}\n")
    return d


def test_classify_mini_db(tmp_path, mini_emu_db):
    db_dir, seqs = mini_emu_db
    # ASV 0 = exact 101; ASV 1 = 101 with ~6% errors (genus level)
    asv0 = seqs["101"]
    asv1 = bytearray(seqs["102"])
    for p in RNG.choice(1500, 60, replace=False):
        asv1[p] = b"ACGT"[RNG.integers(4)]
    in_dir = _write_asv_dir(tmp_path, "run1", [(asv0, 100), (bytes(asv1), 50)])

    from savont_tpu.db.registry import load_database

    db = load_database(db_dir)
    classify(ClassifyArgs(input_dir=str(in_dir), db=str(db_dir)), db)

    sp = (in_dir / "species_abundance.tsv").read_text().splitlines()
    assert any("Listeria monocytogenes" in l for l in sp)
    mappings = (in_dir / "asv_mappings.tsv").read_text().splitlines()
    assert len(mappings) >= 3
    # the degraded ASV should be genus-level (species UNCLASSIFIED)
    row1 = next(l for l in mappings[1:] if l.startswith("final_consensus_1"))
    fields = row1.split("\t")
    assert fields[5] == "UNCLASSIFIED" and fields[6] == "Pseudomonas"


def test_sintax_mini_db(tmp_path, mini_emu_db):
    db_dir, seqs = mini_emu_db
    in_dir = _write_asv_dir(tmp_path, "run_sintax", [(seqs["103"], 77)])
    from savont_tpu.db.registry import load_database

    db = load_database(db_dir)
    sintax(SintaxArgs(input_dir=str(in_dir), db=str(db_dir)), db)
    rows = (in_dir / "asv_mappings.tsv").read_text().splitlines()
    assert len(rows) == 2
    fields = rows[1].split("\t")
    assert fields[0].startswith("final_consensus_0")
    assert "Escherichia" in rows[1]
    assert fields[9] == "UNCLASSIFIED"  # sintax is genus-level max


def test_xorshift_determinism():
    r1 = Xorshift(42)
    r2 = Xorshift(42)
    assert [r1.next() for _ in range(5)] == [r2.next() for _ in range(5)]
    assert Xorshift(0).s == 1  # seed.max(1)


def test_extract_kmers_canonical():
    from savont_tpu.ops.encode import revcomp_bytes

    s = rand_seq(100)
    a = sorted(extract_kmers(s).tolist())
    b = sorted(extract_kmers(revcomp_bytes(s)).tolist())
    assert a == b


# ── export / merge ───────────────────────────────────────────────────────────


def test_seq_hash_rc_canonical():
    from savont_tpu.ops.encode import revcomp_bytes

    s = b"ACGTTGCAACGT"
    assert seq_hash(s) == seq_hash(revcomp_bytes(s))
    assert seq_hash(b"ACGT") == seq_hash(b"acgt")
    assert seq_hash(b"ACGTACGT") != seq_hash(b"TGCATGCA")


def test_fuzzy_merge_absorbs_prefix():
    s1 = (b"ACGT" * 25)
    s1 = rand_seq(120)
    s2 = s1 + rand_seq(7)
    h1, h2 = seq_hash(s1), seq_hash(s2)
    table = {h1: (s1, [3, 0]), h2: (s2, [0, 5])}
    lineage = {h1: "Bacteria;Firmicutes"}
    n = fuzzy_merge_table(table, lineage)
    assert n == 1 and h1 not in table and table[h2][1] == [3, 5]
    assert lineage[h2] == "Bacteria;Firmicutes"


def test_fuzzy_merge_respects_length_limit():
    s1 = rand_seq(120)
    s2 = s1 + rand_seq(15)  # > 10 bp longer
    table = {seq_hash(s1): (s1, [10]), seq_hash(s2): (s2, [10])}
    assert fuzzy_merge_table(table, {}) == 0 and len(table) == 2


def test_export_two_runs(tmp_path):
    shared = rand_seq(1500)
    only1 = rand_seq(1480)
    d1 = _write_asv_dir(tmp_path, "r1", [(shared, 30), (only1, 12)])
    d2 = _write_asv_dir(tmp_path, "r2", [(shared, 40)])
    out = tmp_path / "merged"
    export(ExportArgs(input_dirs=[str(d1), str(d2)], output_dir=str(out)))

    lines = (out / "merged_feature_table.tsv").read_text().splitlines()
    assert lines[0] == "#OTU ID\tr1\tr2"
    rows = {l.split("\t")[0]: l.split("\t")[1:] for l in lines[1:]}
    assert rows[seq_hash(shared)] == ["30", "40"]
    assert rows[seq_hash(only1)] == ["12", "0"]
    rep_ids = {
        l[1:] for l in (out / "merged_rep_seqs.fasta").read_text().splitlines() if l.startswith(">")
    }
    assert rep_ids == set(rows)
    assert (out / "merged_asv_taxonomy.tsv").exists()


def test_download_flow_with_mocked_fetch(tmp_path, monkeypatch):
    """download.rs:5-31: per-keyword dest dir, fetch, .savont_db marker;
    unknown keywords abort.  Network fetches are mocked."""
    from savont_tpu.db import registry

    calls = []
    monkeypatch.setattr(registry, "_run", lambda cmd: calls.append(cmd))
    registry.download(str(tmp_path), ["emu-1"])
    dest = tmp_path / "emu-1"
    assert (dest / registry.MARKER_FILE).exists()
    assert registry.read_marker(dest) == "emu-1"
    assert any("wget" in c[0] for c in calls)

    import pytest

    with pytest.raises(SystemExit, match="Unknown database"):
        registry.download(str(tmp_path), ["not-a-db"])


def test_classify_keeps_all_min_nm_ties_beyond_50(tmp_path):
    """Recall guard (classify.rs:152-189 keeps ALL min-NM ties): 60 refs
    each one substitution away from the query must ALL survive candidate
    selection and appear in the tie set — a top-K cardinality cap would
    silently drop 10 of them and shift EM abundances."""
    template = rand_seq(1500)
    db_dir = tmp_path / "emu-1"
    db_dir.mkdir()
    n_ties = 60
    positions = RNG.choice(np.arange(100, 1400), n_ties, replace=False)
    with open(db_dir / "species_taxid.fasta", "w") as f, open(db_dir / "taxonomy.tsv", "w") as t:
        t.write("tax_id\tspecies\tgenus\tfamily\torder\tclass\tphylum\tclade\tsuperkingdom\tsubspecies\tssg\tsg\n")
        for i, p in enumerate(positions):
            s = bytearray(template)
            s[p] = {65: 67, 67: 71, 71: 84, 84: 65}[s[p]]  # A->C->G->T->A
            f.write(f">{200 + i}:emu_db:1\n{bytes(s).decode()}\n")
            t.write(f"{200 + i}\tSpecies {i}\tGenus{i}\tFam\tOrd\tCls\tPhy\t\tBacteria\t\t\t\n")
        # two decoy refs far from the query
        for j in range(2):
            f.write(f">{900 + j}:emu_db:1\n{rand_seq(1500).decode()}\n")
            t.write(f"{900 + j}\tDecoy {j}\tDecoy\tFam\tOrd\tCls\tPhy\t\tBacteria\t\t\t\n")
    in_dir = _write_asv_dir(tmp_path, "run_ties", [(template, 100)])

    from savont_tpu.db.registry import load_database

    db = load_database(db_dir)
    classify(ClassifyArgs(input_dir=str(in_dir), db=str(db_dir)), db)

    rows = (in_dir / "asv_mappings.tsv").read_text().splitlines()[1:]
    tie_rows = [r for r in rows if r.startswith("final_consensus_0")]
    assert len(tie_rows) == n_ties


def test_export_joins_classify_taxonomy(tmp_path, mini_emu_db):
    """merge_with_classify (integration_test.rs:374): export after classify
    joins the run's asv_mappings.tsv lineage into merged_asv_taxonomy.tsv
    and the taxon counts."""
    db_dir, seqs = mini_emu_db
    in_dir = _write_asv_dir(tmp_path, "run_cls", [(seqs["101"], 64)])
    from savont_tpu.db.registry import load_database

    db = load_database(db_dir)
    classify(ClassifyArgs(input_dir=str(in_dir), db=str(db_dir)), db)
    out = tmp_path / "merged_cls"
    export(ExportArgs(input_dirs=[str(in_dir)], output_dir=str(out)))

    tax_lines = (out / "merged_asv_taxonomy.tsv").read_text().splitlines()
    h = seq_hash(seqs["101"])
    row = next(l for l in tax_lines if l.startswith(h))
    assert "Listeria" in row and "Unclassified" not in row
    counts = (out / "merged_taxon_counts.tsv").read_text()
    assert "Listeria" in counts


def test_pooled_classify_wide_tables(tmp_path, mini_emu_db):
    """pooled_samples_classify (integration_test.rs): a multi-column
    feature table makes classify emit per-sample wide abundance tables."""
    db_dir, seqs = mini_emu_db
    d = tmp_path / "pooledrun"
    d.mkdir()
    with open(d / "final_asvs.fasta", "w") as f:
        f.write(f">final_consensus_0_depth_90\n{seqs['101'].decode()}\n")
        f.write(f">final_consensus_1_depth_30\n{seqs['103'].decode()}\n")
    with open(d / "feature-table.tsv", "w") as f:
        f.write("#OTU ID\tsampleA\tsampleB\n")
        f.write("final_consensus_0_depth_90\t60\t30\n")
        f.write("final_consensus_1_depth_30\t10\t20\n")
    from savont_tpu.db.registry import load_database

    db = load_database(db_dir)
    classify(ClassifyArgs(input_dir=str(d), db=str(db_dir)), db)
    sp = (d / "species_abundance.tsv").read_text().splitlines()
    header = sp[0].split("\t")
    assert "sampleA" in header and "sampleB" in header
    lis = next(l for l in sp[1:] if "Listeria" in l)
    assert len(lis.split("\t")) == len(header)


def test_export_joins_sintax_taxonomy(tmp_path, mini_emu_db):
    """merge_with_sintax (integration_test.rs:424): export after sintax
    joins the bootstrap-format asv_mappings.tsv lineage (genus-level,
    species UNCLASSIFIED) into the merged taxonomy."""
    db_dir, seqs = mini_emu_db
    in_dir = _write_asv_dir(tmp_path, "run_sx", [(seqs["103"], 41)])
    from savont_tpu.db.registry import load_database

    db = load_database(db_dir)
    sintax(SintaxArgs(input_dir=str(in_dir), db=str(db_dir)), db)
    out = tmp_path / "merged_sx"
    export(ExportArgs(input_dirs=[str(in_dir)], output_dir=str(out)))
    tax_lines = (out / "merged_asv_taxonomy.tsv").read_text().splitlines()
    h = seq_hash(seqs["103"])
    row = next(l for l in tax_lines if l.startswith(h))
    assert "Escherichia" in row
