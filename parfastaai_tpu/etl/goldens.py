"""Readers for the reference's cereal binary golden archives.

The reference serializes its test goldens with cereal's PortableBinary-style
layout (little-endian, no padding):

* ``std::vector<T>``  -> uint64 element count, then packed elements
  (tests/pfaai_tests.cpp golden load paths).
* ``DPair<int,int>``  -> two int32 (reference utils.hpp:222-224).
* ``ETriple<int>``    -> three int32: proteinIndex, genomeA, genomeB
  (reference interface.hpp:118-120).
* ``JACTuple``        -> int32 genomeA, int32 genomeB, float64 S, int32 N
  (reference interface.hpp:72-74) — 20 bytes packed.
* ``DMatrix<T>``      -> uint64 nrows, uint64 ncols, then the data vector
  (reference utils.hpp:285-287).

These readers exist purely for parity testing against the bundled goldens;
nothing in the production path depends on them.
"""

from __future__ import annotations

import struct

import numpy as np

_U64 = struct.Struct("<Q")


def _read_count(buf: bytes, off: int = 0) -> tuple[int, int]:
    (count,) = _U64.unpack_from(buf, off)
    return count, off + 8


def read_i32_vector(path: str) -> np.ndarray:
    buf = open(path, "rb").read()
    count, off = _read_count(buf)
    return np.frombuffer(buf, dtype="<i4", count=count, offset=off)


def read_f64_vector(path: str) -> np.ndarray:
    buf = open(path, "rb").read()
    count, off = _read_count(buf)
    return np.frombuffer(buf, dtype="<f8", count=count, offset=off)


def read_pair_vector(path: str) -> np.ndarray:
    """F-array of DPair(proteinIndex, genomeId) -> int32 array (n, 2)."""
    buf = open(path, "rb").read()
    count, off = _read_count(buf)
    flat = np.frombuffer(buf, dtype="<i4", count=2 * count, offset=off)
    return flat.reshape(count, 2)


def read_triple_vector(path: str) -> np.ndarray:
    """E-array of ETriple(proteinIndex, genomeA, genomeB) -> int32 (n, 3)."""
    buf = open(path, "rb").read()
    count, off = _read_count(buf)
    flat = np.frombuffer(buf, dtype="<i4", count=3 * count, offset=off)
    return flat.reshape(count, 3)


_JAC_DTYPE = np.dtype(
    [("genome_a", "<i4"), ("genome_b", "<i4"), ("s", "<f8"), ("n", "<i4")]
)


def read_jac_vector(path: str) -> np.ndarray:
    """JAC tuples -> structured array with fields genome_a, genome_b, s, n."""
    buf = open(path, "rb").read()
    count, off = _read_count(buf)
    return np.frombuffer(buf, dtype=_JAC_DTYPE, count=count, offset=off)


def read_dmatrix_i32(path: str) -> np.ndarray:
    buf = open(path, "rb").read()
    nrows, off = _read_count(buf)
    ncols, off = _read_count(buf, off)
    count, off = _read_count(buf, off)
    assert count == nrows * ncols, (count, nrows, ncols)
    return np.frombuffer(buf, dtype="<i4", count=count, offset=off).reshape(
        nrows, ncols
    )
