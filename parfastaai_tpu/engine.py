"""The AJI compute engine: device intersection counts + exact f64 finish.

Replaces the reference's Phase 3/4 (ParFAAIImpl::computeJAC / computeAJI,
algorithm_impl.hpp:222-329).  The per-pair, per-protein Jaccard is

    J_p(A, B) = cnt / (T[p, A] + T[p, B] - cnt)        (cnt > 0 only)
    S(A, B)   = sum over proteins with cnt > 0, ascending protein order
    N(A, B)   = count of such proteins
    AJI(A, B) = S / N                                   (NaN when N == 0)

Intersection counts are integers and computed exactly on device (MXU int8
matmul, ops/intersect.py).  The S accumulation is O(|P|) ~ 80 flops per pair
and must match the reference's sequential f64 operation order bit-for-bit
(tests require exact double equality on AJI, tests/pfaai_tests.cpp:355-454),
so the finish runs on host in f64 with a sequential ascending-protein loop —
vectorized across pairs, sequential across proteins, exactly the reference's
E-block walk order (E sorted by (G_A, G_B, proteinIndex), interface.hpp:103).
"""

from __future__ import annotations

import numpy as np

from .etl.database import PresenceData
from .modes import PairSpace
from .ops.intersect import pair_counts
from .types import JacResult


def jaccard_finish(
    counts: np.ndarray,  # int32 (P, n_pairs)
    denom_ta: np.ndarray,  # int32 (P, n_pairs) — T[p, denom_a]
    denom_tb: np.ndarray,  # int32 (P, n_pairs) — T[p, denom_b]
) -> tuple[np.ndarray, np.ndarray]:
    """Sequential ascending-protein f64 accumulation of (S, N) per pair."""
    P, n = counts.shape
    s = np.zeros(n, dtype=np.float64)
    nacc = np.zeros(n, dtype=np.int32)
    for p in range(P):
        c = counts[p]
        mask = c > 0
        if not mask.any():
            continue
        cm = c[mask].astype(np.float64)
        dm = (denom_ta[p][mask] + denom_tb[p][mask] - c[mask]).astype(np.float64)
        s[mask] += cm / dm
        nacc += mask
    return s, nacc


def compute(presence: PresenceData, pairs: PairSpace) -> JacResult:
    """Run the engine over one pair space and return the JAC/AJI columns."""
    counts = pair_counts(presence.m, pairs.db_a, pairs.db_b)
    t = presence.t.astype(np.int64)
    s, n = jaccard_finish(counts, t[:, pairs.denom_a], t[:, pairs.denom_b])
    return JacResult(
        genome_a=pairs.jac_a.astype(np.int32),
        genome_b=pairs.jac_b.astype(np.int32),
        s=s,
        n=n,
    )
