"""Subset-DB builder (tools/subset_db.py) vs the bundled fixture databases.

xdb_subset_combo12.db contains the union of subset1's and subset2's genomes
(reference data/subset_db.py:282-307), with subset1's four genomes first — so
building a 4-genome subset of combo12 with subset1's names must reproduce
xdb_subset1.db's content exactly (the reference derived both from the same
master with the same remap semantics)."""

import sqlite3

import numpy as np
import pytest

from parfastaai_tpu.tools.subset_db import build_subset_db

SUBSET1_NAMES = [
    "Xanthomonas_albilineans_GCA_000962915_1.fna.gz",
    "Xanthomonas_albilineans_GCA_000962945_1.fna.gz",
    "Xanthomonas_albilineans_GCA_000963065_1.fna.gz",
    "Xanthomonas_albilineans_GCA_000963195_1.fna.gz",
]


@pytest.fixture(scope="module")
def built_subset1(tmp_path_factory, combo12_db):
    dst = tmp_path_factory.mktemp("subsetdb") / "rebuilt_subset1.db"
    build_subset_db(combo12_db, str(dst), SUBSET1_NAMES)
    return str(dst)


def _rows(path, query):
    conn = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        return conn.execute(query).fetchall()
    finally:
        conn.close()


def test_metadata_tables_match(built_subset1, subset1_db):
    for q in (
        "SELECT * FROM genome_metadata ORDER BY genome_id",
        "SELECT * FROM scp_data ORDER BY genome_id, SCP_acc",
        "SELECT * FROM index_protein ORDER BY protein_number",
        "SELECT * FROM protein_index ORDER BY protein_string",
    ):
        assert _rows(built_subset1, q) == _rows(subset1_db, q)


def test_all_scp_tables_match(built_subset1, subset1_db):
    prots = [r[0] for r in _rows(subset1_db, "SELECT DISTINCT SCP_acc FROM scp_data")]
    assert prots
    for prot in prots:
        for tbl, key in ((f"'{prot}_tetras'", "tetramer"), (f"'{prot}_genomes'", "genome_id")):
            q = f"SELECT * FROM {tbl} ORDER BY {key}"
            assert _rows(built_subset1, q) == _rows(subset1_db, q), tbl


def test_engine_on_built_subset_matches_golden(built_subset1, data_dir, tmp_path):
    """End-to-end: run the CLI over the rebuilt subset DB; the AJI CSV must be
    byte-identical to the reference golden for xdb_subset1."""
    from parfastaai_tpu.cli import run

    out = tmp_path / "aji.csv"
    assert run([built_subset1, str(out), "--quiet"]) == 0
    with open(out, "rb") as f, open(
        f"{data_dir}/xdb_subset1_aji_matrix_wheader.csv", "rb"
    ) as g:
        assert f.read() == g.read()


def test_missing_genome_rejected(combo12_db, tmp_path):
    with pytest.raises(ValueError, match="NOT_A_GENOME"):
        build_subset_db(
            combo12_db, str(tmp_path / "x.db"), ["NOT_A_GENOME"]
        )


def test_refuses_overwrite(combo12_db, tmp_path):
    dst = tmp_path / "exists.db"
    dst.write_bytes(b"")
    with pytest.raises(FileExistsError):
        build_subset_db(combo12_db, str(dst), SUBSET1_NAMES)
