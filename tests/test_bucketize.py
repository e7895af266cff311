"""Width bucketing of the presence tensor (etl.database.bucketize_presence)."""

import numpy as np
import pytest

from parfastaai_tpu.engine import compute, compute_fast
from parfastaai_tpu.etl.database import SCPDatabase, bucketize_presence
from parfastaai_tpu.modes import all_vs_all


@pytest.fixture(scope="module")
def combo(combo12_db):
    db = SCPDatabase(combo12_db)
    pres = db.load_presence()
    db.close()
    return db.meta, pres


def test_buckets_partition_proteins(combo):
    _, pres = combo
    buckets = bucketize_presence(pres, max_buckets=4)
    assert 1 <= len(buckets) <= 4
    all_idx = np.concatenate([idx for idx, _, _ in buckets])
    assert sorted(all_idx.tolist()) == list(range(pres.m.shape[0]))
    for idx, m_b, t_b in buckets:
        kb = m_b.shape[2]
        assert kb % 128 == 0
        assert (pres.widths[idx] <= kb).all()
        # Slices carry the full data: rowsums must still equal T.
        np.testing.assert_array_equal(m_b.sum(axis=2, dtype=np.int32), t_b)


def test_buckets_cut_padded_work(combo):
    _, pres = combo
    buckets = bucketize_presence(pres, max_buckets=4)
    full = pres.m.shape[0] * pres.m.shape[2]
    bucketed = sum(m_b.shape[0] * m_b.shape[2] for _, m_b, _ in buckets)
    # combo12 widths span 66..818: bucketing must at least halve padded work.
    assert bucketed < 0.55 * full


def test_compute_fast_bucketed_matches_exact(combo):
    meta, pres = combo
    pairs = all_vs_all(meta)
    exact = compute(pres, pairs)
    fast = compute_fast(pres, pairs)
    np.testing.assert_array_equal(fast.n, exact.n)
    np.testing.assert_allclose(fast.aji, exact.aji, rtol=1e-6)


def test_single_bucket_degenerate():
    """Uniform widths => one bucket, identical tensor."""
    from parfastaai_tpu.etl.database import PresenceData
    from parfastaai_tpu.types import DBMetaData

    rng = np.random.default_rng(0)
    m = (rng.random((5, 6, 128)) < 0.5).astype(np.uint8)
    pres = PresenceData(
        meta=DBMetaData(protein_set=("a",) * 5, genome_set=("g",) * 6),
        m=m,
        t=m.sum(axis=2, dtype=np.int32),
        widths=np.full(5, 128, np.int32),
        tetramer_ids=[np.arange(128, dtype=np.int32)] * 5,
    )
    buckets = bucketize_presence(pres)
    assert len(buckets) == 1
    np.testing.assert_array_equal(buckets[0][1], m[buckets[0][0]])
