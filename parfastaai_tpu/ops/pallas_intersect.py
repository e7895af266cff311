"""Pallas TPU kernel: fused presence-Gram + Jaccard accumulation.

One kernel replaces the reference's entire Phase 2-4 hot path (E-array
emission ds_helper.hpp:270-357, sort psort.hpp:27-53, and the E-walk
algorithm_impl.hpp:222-277): for each 128 x 128 genome-pair tile the MXU
computes the int8 presence Gram (intersection counts) per protein, the VPU
applies the Jaccard transform, and S/N accumulate in VMEM across the protein
grid dimension — counts never touch HBM.

Grid layout: (row tiles, col tiles, proteins) with proteins innermost, so
each output tile stays resident in VMEM while all proteins accumulate into
it.  Compared to the XLA scan path (ops/fused.py) this avoids writing the
per-protein (G, G) J/mask intermediates to HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import DEFAULT_TILE

# One (tile, K) int8 block per side must fit VMEM comfortably:
# 2 * 128 * 32768 = 8 MB of the ~16 MB budget.
MAX_K_SINGLE_BLOCK = 32768


def _kernel(ma_ref, mb_ref, ta_ref, tb_ref, s_ref, n_ref):
    p = pl.program_id(2)

    @pl.when(p == 0)
    def _():
        s_ref[:] = jnp.zeros_like(s_ref)
        n_ref[:] = jnp.zeros_like(n_ref)

    a = ma_ref[0]  # (TILE, K) int8
    b = mb_ref[0]  # (TILE, K) int8
    cnt = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )
    shared = cnt > 0
    # T tiles carry all P rows (TPU block shapes need >=8 sublanes); select
    # the current protein's row dynamically.
    ta = ta_ref[pl.ds(p, 1), :]  # (1, TILE)
    tb = tb_ref[pl.ds(p, 1), :]
    denom = (ta[0][:, None] + tb[0][None, :] - cnt).astype(jnp.float32)
    j = jnp.where(shared, cnt.astype(jnp.float32) / denom, 0.0)
    s_ref[:] += j
    n_ref[:] += shared.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("tile",))
def _pallas_sn(m: jax.Array, t: jax.Array, tile: int) -> tuple[jax.Array, jax.Array]:
    P, G, K = m.shape
    grid = (G // tile, G // tile, P)
    s, n = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, K), lambda i, j, p: (p, i, 0)),
            pl.BlockSpec((1, tile, K), lambda i, j, p: (p, j, 0)),
            pl.BlockSpec((P, tile), lambda i, j, p: (0, i)),
            pl.BlockSpec((P, tile), lambda i, j, p: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((tile, tile), lambda i, j, p: (i, j)),
            pl.BlockSpec((tile, tile), lambda i, j, p: (i, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, G), jnp.float32),
            jax.ShapeDtypeStruct((G, G), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * P * G * G * K,
            bytes_accessed=2 * P * G * K + 8 * G * G,
            transcendentals=0,
        ),
    )(m.astype(jnp.int8), m.astype(jnp.int8), t.astype(jnp.int32), t.astype(jnp.int32))
    return s, n


# Working VMEM budget for auto tile selection (of the ~16 MB per core).
_VMEM_BUDGET = 12 * 1024 * 1024


def auto_tile(g: int, k: int) -> int:
    """Largest power-of-two tile (128..1024) whose working set fits VMEM.

    Bigger tiles cut HBM re-reads linearly (each presence tile is fetched
    G/tile times), so pick the largest that fits: 2 int8 input tiles of
    (tile, K) plus the f32 S and int32 N output tiles of (tile, tile).
    Measured on v5e (G=1024, K=1280): 128 -> 308M pairs/s, 512 -> 586M,
    1024 -> 627M.
    """
    best = 128
    for tile in (128, 256, 512, 1024):
        if 2 * tile * k + 8 * tile * tile <= _VMEM_BUDGET:
            best = tile
    return best


def pallas_fused_aji(
    m: jax.Array, t: jax.Array, tile: int | None = None
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fused AJI via the Pallas tile kernel; pads G to the tile size.

    Same contract as ops.fused.fused_aji.  Padded (all-zero) genomes produce
    cnt == 0 everywhere -> masked J, N == 0; padded rows/cols are sliced off
    before returning.
    """
    P, G, K = m.shape
    if K > MAX_K_SINGLE_BLOCK:
        raise ValueError(
            f"K={K} exceeds single-block VMEM budget ({MAX_K_SINGLE_BLOCK}); "
            "use ops.fused.fused_aji (XLA scan) for very wide presence tensors"
        )
    if tile is None:
        tile = auto_tile(G, K)
    gp = ((G + tile - 1) // tile) * tile
    if gp != G:
        m = jnp.pad(m, ((0, 0), (0, gp - G), (0, 0)))
        t = jnp.pad(t, ((0, 0), (0, gp - G)))
    s, n = _pallas_sn(m, t, tile)
    s = s[:G, :G]
    n = n[:G, :G]
    aji = s / n.astype(jnp.float32)
    return aji, s, n
