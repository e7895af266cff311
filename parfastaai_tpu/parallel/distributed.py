"""Multi-host / multi-device execution driver.

The reference is a single shared-memory process (SURVEY §2.3: OpenMP only, no
communication backend).  This framework scales the same computation over a
TPU slice: ``jax.distributed`` bootstraps the N-host runtime, the (rows, scp)
mesh from parallel/mesh.py shards the fused AJI step (genome row bands x
protein shards, psum over ICI), and per-host results are gathered so process
0 can write the CSV — the TPU-native replacement for the reference's
``omp barrier`` + shared-memory accumulation (algorithm_impl.hpp:295-322).

Bootstrap contract: ``init_distributed()`` must run BEFORE anything touches a
JAX backend (jax.devices(), any computation, even jax.process_count()), or
the local single-process backend wins and ``jax.distributed.initialize``
can never take effect.  cli.run calls it first thing.

Launch interface (every process runs the same CLI command):
  PARFASTAAI_COORDINATOR=host:port   coordinator address (process 0's)
  PARFASTAAI_NUM_PROCESSES=N         total process count
  PARFASTAAI_PROCESS_ID=i            this process's rank
or any environment ``jax.distributed.initialize()`` auto-detects (TPU pods,
GKE, SLURM) signalled by JAX_COORDINATOR_ADDRESS / COORDINATOR_ADDRESS.
"""

from __future__ import annotations

import os

import numpy as np

_initialized = False


def init_distributed() -> bool:
    """Bootstrap the JAX distributed runtime when launched multi-process.

    Returns True when a multi-process runtime was initialized, False for
    plain single-process runs (no coordinator configured).  Idempotent.
    Call BEFORE any JAX backend use (see module docstring).
    """
    global _initialized
    if _initialized:
        return True
    coord = os.environ.get("PARFASTAAI_COORDINATOR")
    auto = (
        "JAX_COORDINATOR_ADDRESS" in os.environ
        or "COORDINATOR_ADDRESS" in os.environ
    )
    if coord is None and not auto:
        return False
    import jax

    if coord is not None:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["PARFASTAAI_NUM_PROCESSES"]),
            process_id=int(os.environ["PARFASTAAI_PROCESS_ID"]),
        )
    else:
        # Launcher-managed environments (TPU pod slices, GKE, SLURM):
        # jax.distributed auto-detects coordinator/rank/world-size.
        jax.distributed.initialize()
    _initialized = True
    return True


def gather_to_host(x) -> np.ndarray:
    """Materialize a (possibly multi-process sharded) array on every host."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def broadcast_from_primary(value: int) -> int:
    """Agree on a host-side integer across processes (process 0's value wins).
    Used for the streamed-resume row count, which only the CSV-writing
    primary can read from disk."""
    import jax

    if jax.process_count() <= 1:
        return value
    from jax.experimental import multihost_utils

    out = multihost_utils.broadcast_one_to_all(
        np.asarray(value, dtype=np.int64)
    )
    return int(out)


def is_primary() -> bool:
    """True on the process that owns CSV/file output (reference semantics:
    one writer, src/main.cpp:133-175; everyone else only computes)."""
    import jax

    return jax.process_index() == 0
