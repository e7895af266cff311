"""Intersection-count ops: the TPU-native replacement for the reference's
E-array machinery.

The reference materializes every (protein, genomeA, genomeB) co-occurrence as
an explicit sorted tuple list and counts runs (ds_helper.hpp:206-357,
algorithm_impl.hpp:222-277).  On TPU the same quantity is a batched boolean
Gram matrix: with ``M_p`` the {0,1} genome x tetramer presence matrix of
protein p, ``cnt_p = M_p @ M_p.T`` — an int8 x int8 -> int32 contraction that
maps straight onto the MXU.  Counts are integers, so this is exact on any
backend.

Inputs use the compacted tetramer axis built by the ETL (etl/database.py);
zero padding columns contribute nothing to the products.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import DEFAULT_TILE


@jax.jit
def _gram_int32(m: jax.Array) -> jax.Array:
    """counts[p, a, b] = sum_k m[p, a, k] * m[p, b, k], int32 accumulation.

    int8 operands with int32 accumulation: per-protein row sums reach the
    hundreds, so an int8 accumulator would overflow (survey §7.2); the MXU
    natively supports s8 x s8 -> s32.
    """
    m8 = m.astype(jnp.int8)
    return jax.lax.dot_general(
        m8,
        m8,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )


def intersection_counts(m: np.ndarray | jax.Array) -> np.ndarray:
    """Full (P, G, G) intersection-count tensor, returned to host.

    Suitable for test-scale problems; production uses the tiled/fused paths
    (pair tiles + on-device Jaccard) to avoid materializing G x G.
    """
    return np.asarray(_gram_int32(jnp.asarray(m)))


@jax.jit
def _gram_tile(ma: jax.Array, mb: jax.Array) -> jax.Array:
    """counts[p, i, j] for a row tile ``ma`` (P, TA, K) against ``mb`` (P, TB, K)."""
    return jax.lax.dot_general(
        ma.astype(jnp.int8),
        mb.astype(jnp.int8),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )


def pair_counts(
    m: np.ndarray,
    db_a: np.ndarray,
    db_b: np.ndarray,
    tile: int = DEFAULT_TILE,
) -> np.ndarray:
    """Intersection counts for an explicit pair list -> int32 (P, n_pairs).

    Device-side tiling over the distinct A-side genomes: each A tile is
    contracted against the full presence tensor on the MXU, then the needed
    (a, b) entries are gathered on host.  Keeps device memory at
    O(P * tile * G) instead of O(P * G^2).
    """
    P, G, _ = m.shape
    n = db_a.shape[0]
    out = np.empty((P, n), dtype=np.int32)
    uniq_a = np.unique(db_a)
    md = jnp.asarray(m)
    for start in range(0, len(uniq_a), tile):
        rows = uniq_a[start : start + tile]
        counts = np.asarray(_gram_tile(md[:, rows, :], md))  # (P, |rows|, G)
        sel = np.isin(db_a, rows)
        local = np.searchsorted(rows, db_a[sel])
        out[:, sel] = counts[:, local, db_b[sel]]
    return out
