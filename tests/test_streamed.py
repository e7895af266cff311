"""Streaming large-G engine (engine.compute_streamed) vs the exact engine."""

import csv

import numpy as np

from parfastaai_tpu.engine import compute, compute_streamed
from parfastaai_tpu.etl.database import SCPDatabase
from parfastaai_tpu.io.csv_writer import aji_matrix
from parfastaai_tpu.modes import all_vs_all


def _read_csv(path, sep=","):
    with open(path) as fp:
        rows = list(csv.reader(fp, delimiter=sep))
    header = rows[0]
    assert header[0] == ""
    names = header[1:]
    row_names = [r[0] for r in rows[1:]]
    vals = np.array([[float(v) for v in r[1:]] for r in rows[1:]])
    return names, row_names, vals


def test_streamed_matches_exact_all_vs_all(subset1_db, tmp_path):
    db = SCPDatabase(subset1_db)
    pres = db.load_presence()
    db.close()
    pairs = all_vs_all(db.meta)
    exact_mat = aji_matrix(pairs, compute(pres, pairs).aji)

    out = tmp_path / "streamed.csv"
    g = len(db.meta.genome_set)
    ids = np.arange(g, dtype=np.int32)
    # Tiny blocks exercise banding, chunking, and padding paths (G=4, band=3).
    compute_streamed(
        pres, ids, ids, str(out), db.meta.genome_set, db.meta.genome_set,
        band=3, col_chunk=3,
    )
    names, row_names, vals = _read_csv(str(out))
    assert tuple(names) == db.meta.genome_set
    assert tuple(row_names) == db.meta.genome_set
    np.testing.assert_array_equal(np.diag(vals), 0.0)
    np.testing.assert_allclose(vals, exact_mat, rtol=1e-6, atol=0)
