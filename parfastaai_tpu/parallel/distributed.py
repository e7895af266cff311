"""Multi-host / multi-device execution driver.

The reference is a single shared-memory process (SURVEY §2.3: OpenMP only, no
communication backend).  This framework scales the same computation over a
TPU slice: ``jax.distributed`` bootstraps the N-host runtime, the (rows, scp)
mesh from parallel/mesh.py shards the fused AJI step (genome row bands x
protein shards, psum over ICI), and per-host results are gathered to process
0 for the CSV merge — the TPU-native replacement for the reference's
``omp barrier`` + shared-memory accumulation (algorithm_impl.hpp:295-322).
"""

from __future__ import annotations

import numpy as np


def init_distributed() -> None:
    """Initialize the JAX distributed runtime when launched multi-host.

    No-op for single-process runs.  Multi-host launchers (GKE, multislice)
    set the coordinator env vars that ``jax.distributed.initialize`` reads.
    """
    import jax

    if jax.process_count() > 1:
        return  # already initialized by the launcher
    try:
        import os

        if "JAX_COORDINATOR_ADDRESS" in os.environ or "COORDINATOR_ADDRESS" in os.environ:
            jax.distributed.initialize()
    except Exception:
        pass  # single-host fallback


def gather_to_host(x) -> np.ndarray:
    """Materialize a (possibly multi-host sharded) array on every host."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def is_primary() -> bool:
    import jax

    return jax.process_index() == 0
