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
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# One (tile, K) int8 block per side must fit VMEM comfortably:
# 2 * 128 * 32768 = 8 MB of the ~16 MB budget.  Wider presence tensors are
# NOT a capability cliff: the K-blocked kernels below add a fourth grid
# dimension over K_BLOCK-wide slices with an int32 count scratch in VMEM
# (counts accumulate across K blocks; the Jaccard transform runs once, on
# the last block).
# (values live in constants.py so the host-side bucket planner aligns
# widths to the same numbers without importing this jax-heavy module)
from ..constants import MAX_K_SINGLE_BLOCK

# K slice width of the K-blocked kernels.  4096 keeps the double-buffered
# input blocks at 2*2*tile*4096 bytes (8.4 MB at tile=512) so large tiles
# still fit VMEM alongside the f32+i32 output tiles and the i32 count
# scratch; K is padded to a multiple (zero columns add 0 to every count —
# normally pre-aligned host-side by etl.database.bucket_bounds, so the
# in-jit _pad_k below is a no-op on the engine paths).
from ..constants import K_BLOCK, KERNEL_K_BLOCK


def _interpret_mode() -> bool:
    """Pallas interpret mode (env PARFASTAAI_PALLAS_INTERPRET=1): evaluates
    the rectangular kernels as plain XLA ops on any backend.  Exists so the
    8-virtual-device CPU mesh tests can exercise the SAME
    pallas-under-shard_map code paths (parallel/mesh.py, engine mesh branch)
    that Mosaic can only compile on real TPU chips.  Read at call time and
    threaded as a static jit arg, so flipping the env between calls retraces
    instead of hitting a stale cache entry."""
    import os

    return bool(os.environ.get("PARFASTAAI_PALLAS_INTERPRET"))


def use_pallas_default(use_pallas: bool | None = None) -> bool:
    """Resolve a caller's use_pallas=None to the effective kernel choice:
    Pallas on real TPUs (Mosaic), Pallas-in-interpret-mode when the test env
    asks for it (_interpret_mode), XLA fallback otherwise."""
    if use_pallas is not None:
        return use_pallas
    return jax.default_backend() == "tpu" or _interpret_mode()


def _pack_nibbles(m: jax.Array) -> jax.Array:
    """(…, K) 0/1 int8 -> (…, K/2) int8, two presence columns per byte
    (column 2j in the low nibble, 2j+1 in the high).

    Counts stay exact: the kernel unpacks with int8 bitwise-ANDs and sums
    two half-width integer dots.  Measured on the bench chip (G=4096 K=1280
    tile=512, salted-chain timing): packing is ~1.4x SLOWER (14.1 vs 9.9
    ms/step) — the kernel is VPU-bound, not DMA-bound, and the per-step
    nibble masks add more VPU work than the halved DMA saves.  It remains
    available because it halves the presence tensor's HBM footprint,
    doubling the largest G that fits on one chip."""
    return m[..., 0::2] | (m[..., 1::2] << 4)


def _gram(a, b, packed, f32=False):
    """Integer intersection counts for one protein's (TILE, K[/2]) blocks.

    ``f32=True`` asks the MXU to emit the counts as f32 directly (exact:
    sums of 0/1 products bounded by K < 2^24), which would delete the
    per-cell int32->f32 VPU convert from the VPU-bound Jaccard transform —
    the r3 'f32gram' experiment.  RESULT (2026-08-20, on-chip): Mosaic
    REJECTS the op ("float acc with int lhs. Expected float lhs." on
    tpu.matmul i8 x i8 -> f32), so the convert can only move to the MXU by
    first converting the INPUTS to bf16 — 2*tile*K input-cell converts per
    step vs the 2*tile^2 output-cell converts saved, a 2.5x increase at
    tile=512 K=1280.  Dead end; the kernel keeps the int32 gram + per-cell
    astype."""
    if f32 and not packed:
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    if packed:
        # Mosaic (this version) lowers int8 bitwise-AND but not int8 shifts,
        # so the high nibble stays scaled: hi values are {0, 16}, the hi x hi
        # dot counts matches x256, one int32 shift rescales after the MXU.
        a_lo, a_hi = a & 0xF, a & 0x10
        b_lo, b_hi = b & 0xF, b & 0x10
        dims = (((1,), (1,)), ((), ()))
        return jax.lax.dot_general(
            a_lo, b_lo, dims, preferred_element_type=jnp.int32
        ) + (
            jax.lax.dot_general(
                a_hi, b_hi, dims, preferred_element_type=jnp.int32
            )
            >> 8
        )
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )


def _clamp_t(t) -> jax.Array:
    """T operand for every kernel wrapper: f32 (exact — tetramer counts <
    160000 << 2^24, so the denominator is pure f32 math) and pre-clamped to
    >= 1 so the kernel body needs no per-cell denominator clamp (the r4
    'lean' trim, adopted family-wide): cnt > 0 cells have real T >= cnt >= 1
    where the clamp is an identity, and cnt == 0 cells divide 0 by
    ta'+tb' >= 2 — 0/x == 0 exactly, so results are bit-identical to the
    clamped form (measured +1%, _pallas_sn_sym_2p docstring)."""
    return jnp.maximum(t, 1).astype(jnp.float32)


def _jaccard_terms(p, cnt, ta_ref, tb_ref, approx, precise, outer=None):
    """One protein's Jaccard tile (j, nterm) WITHOUT accumulating — shared
    by the accumulate-per-protein kernels (_jaccard_update) and the
    fused-update experiment (_sym_kernel_2p variants, which sum two
    proteins' terms before touching the VMEM accumulators).  ``outer``
    optionally supplies a precomputed ta[i]+tb[j] tile (the MXU outer-sum
    experiment).  Requires T pre-clamped >= 1 (_clamp_t); ``nterm`` is the
    int32 shared-protein indicator min(cnt, 1) — one VPU op instead of
    compare + select (the r4 lean trim)."""
    cf = cnt.astype(jnp.float32)
    if outer is None:
        # T tiles carry all P rows (TPU block shapes need >=8 sublanes);
        # select the current protein's row dynamically.
        ta = ta_ref[pl.ds(p, 1), :]  # (1, TILE) f32, pre-clamped >= 1
        tb = tb_ref[pl.ds(p, 1), :]
        outer = ta[0][:, None] + tb[0][None, :]
    denom = outer - cf  # >= 1 when cnt > 0; cnt == 0 gives j == 0 exactly
    if approx:
        # Raw lookup reciprocal: 1.6e-5 max rel err, fastest (1338M pairs/s
        # at G=4096 tile=512, clean-harness protocol 2026-08-20 — only +2%
        # over the Newton default, within a few run-to-run sigma; the large
        # gaps recorded earlier were measured under the r1-r2 bench harness
        # whose full-tensor perturbation inflated every step).
        j = cf * pl.reciprocal(denom, approx=True)
    elif precise:
        # IEEE f32 divide: 5.9e-8 (1 ulp), slowest (1189M pairs/s, same
        # protocol) — the multi-pass divide is the single largest VPU cost.
        j = cf / denom
    else:
        # Default: one Newton step on the lookup reciprocal — 1.4e-7 max rel
        # err (the f32-divide class, within the fused path's ~1e-7 contract)
        # at 1313-1322M pairs/s, +11% over the IEEE divide.
        r = pl.reciprocal(denom, approx=True)
        r = r * (2.0 - denom * r)
        j = cf * r
    return j, jnp.minimum(cnt, 1)


def _jaccard_update(p, cnt, ta_ref, tb_ref, s_ref, n_ref, approx, precise):
    """One protein's Jaccard transform of a finished count tile, accumulated
    into the VMEM-resident (S, N) tile."""
    j, nterm = _jaccard_terms(p, cnt, ta_ref, tb_ref, approx, precise)
    s_ref[:] += j
    n_ref[:] += nterm


def _accumulate(
    p, ma_ref, mb_ref, ta_ref, tb_ref, s_ref, n_ref, approx, packed,
    precise=False,
):
    """Shared kernel body: one protein's int8 Gram product + Jaccard
    accumulation into the VMEM-resident (S, N) tile."""
    cnt = _gram(ma_ref[0], mb_ref[0], packed)  # (TILE, TILE) int32
    _jaccard_update(p, cnt, ta_ref, tb_ref, s_ref, n_ref, approx, precise)


def _kernel(ma_ref, mb_ref, ta_ref, tb_ref, s_ref, n_ref, *, approx=False,
            packed=False, precise=False):
    p = pl.program_id(2)

    @pl.when(p == 0)
    def _():
        s_ref[:] = jnp.zeros_like(s_ref)
        n_ref[:] = jnp.zeros_like(n_ref)

    _accumulate(p, ma_ref, mb_ref, ta_ref, tb_ref, s_ref, n_ref, approx,
                packed, precise)


def _lean_update(p_i, cnt, ta_ref, tb_ref, s_ref, n_ref, approx, precise):
    """One protein's lean Jaccard update (see _sym_kernel_2p_lean: caller
    pre-clamps T >= 1, so no denominator clamp; min(cnt, 1) for N)."""
    cf = cnt.astype(jnp.float32)
    ta = ta_ref[pl.ds(p_i, 1), :]
    tb = tb_ref[pl.ds(p_i, 1), :]
    denom = (ta[0][:, None] + tb[0][None, :]) - cf
    if approx:
        j = cf * pl.reciprocal(denom, approx=True)
    elif precise:
        j = cf / denom
    else:
        r = pl.reciprocal(denom, approx=True)
        r = r * (2.0 - denom * r)
        j = cf * r
    s_ref[:] += j
    n_ref[:] += jnp.minimum(cnt, 1)


def _sym_kernel_2p_lean(
    rows_ref, cols_ref, ma_ref, mb_ref, ta_ref, tb_ref, s_ref, n_ref, *,
    approx=False, precise=False, counts_only=False,
):
    """r4 VPU-trim EXPERIMENT body (VERDICT r3 item 4): two per-cell VPU ops
    deleted from the transform, bit-identical results by construction:

    * the denominator clamp ``max(outer - cf, 1)`` is dropped — the caller
      pre-clamps T to >= 1 (``jnp.maximum(t, 1)``), so cnt == 0 cells divide
      by ta'+tb' >= 2 (0/x == 0 exactly) and cnt > 0 cells are untouched
      (both genomes then have real T >= cnt >= 1, where the clamp was
      already an identity);
    * ``n += (cnt > 0).astype(i32)`` (compare + select) becomes
      ``n += min(cnt, 1)`` (one VPU op).

    ``counts_only`` strips the transform to one convert+add per cell — the
    empirical VPU floor used to separate MXU/DMA time from transform time
    in the cycle budget (not a production mode; its S output is garbage)."""
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _():
        s_ref[:] = jnp.zeros_like(s_ref)
        n_ref[:] = jnp.zeros_like(n_ref)

    cnt0 = _gram(ma_ref[0], mb_ref[0], False)
    cnt1 = _gram(ma_ref[1], mb_ref[1], False)
    if counts_only:
        s_ref[:] += cnt0.astype(jnp.float32) + cnt1.astype(jnp.float32)
        return
    for p_i, cnt in ((2 * p, cnt0), (2 * p + 1, cnt1)):
        _lean_update(p_i, cnt, ta_ref, tb_ref, s_ref, n_ref, approx, precise)


def _sym_kernel_2p_pipe(
    rows_ref, cols_ref, ma_ref, mb_ref, ta_ref, tb_ref, s_ref, n_ref,
    cprev_ref, *, nsteps, approx=False, precise=False,
):
    """Cross-step MXU/VPU software-pipelining EXPERIMENT (VERDICT r4 weak
    #1: the one untried lever between lean's 0.78 MFU and the 0.860
    counts-only machinery ceiling, docs/DESIGN.md §6.1).

    The lean body exposes ~half the VPU transform because each step's
    transform DEPENDS on the grams it just issued.  Here step p issues its
    two MXU grams first and then transforms step p-1's counts, carried in
    a VMEM scratch across the protein grid steps — the transform is
    data-independent of the in-flight grams, giving Mosaic's scheduler the
    chance to hide the VPU cycles under the MXU/DMA time it does not
    software-pipeline on its own.  The last step transforms both the
    carried and its own counts.  Accumulation into (S, N) stays ascending
    protein order within each output tile, so results are bit-identical to
    the lean body.  +2 MB VMEM for the carried count pair at tile=512.

    RESULT (2026-08-21, interleaved A/B at G=4096 K=1280 tile=512, salted
    chains, min-of-reps slope): lean 1.310/1.318G pairs/s (MFU
    0.766/0.771) vs pipe 1.037/1.050G (0.606/0.614) — a consistent -21%.
    DEAD END, recorded per the family's decision standard: carrying the
    count pair through VMEM costs a 2 MB scratch write plus a 2 MB read
    per step (~4 MB of extra VPU load/store against the ~2 MB the
    transform otherwise touches), which swamps whatever MXU/VPU overlap
    the decoupling buys.  With this, every identified lever between lean's
    0.78 and the 0.860 machinery ceiling has been tried and measured; 0.78
    stands as the certified practical ceiling of the single-block family
    (the K-blocked family reaches 0.835 because its transform amortizes
    over 25 K-blocks — see KERNEL_K_BLOCK)."""
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _():
        s_ref[:] = jnp.zeros_like(s_ref)
        n_ref[:] = jnp.zeros_like(n_ref)

    cnt0 = _gram(ma_ref[0], mb_ref[0], False)
    cnt1 = _gram(ma_ref[1], mb_ref[1], False)

    @pl.when(p > 0)
    def _():
        _lean_update(2 * p - 2, cprev_ref[0, :, :], ta_ref, tb_ref, s_ref,
                     n_ref, approx, precise)
        _lean_update(2 * p - 1, cprev_ref[1, :, :], ta_ref, tb_ref, s_ref,
                     n_ref, approx, precise)

    if nsteps > 1:
        @pl.when(p < nsteps - 1)
        def _():
            cprev_ref[0, :, :] = cnt0
            cprev_ref[1, :, :] = cnt1

    @pl.when(p == nsteps - 1)
    def _():
        _lean_update(2 * p, cnt0, ta_ref, tb_ref, s_ref, n_ref, approx,
                     precise)
        _lean_update(2 * p + 1, cnt1, ta_ref, tb_ref, s_ref, n_ref, approx,
                     precise)


def _sym_kernel_2p(
    rows_ref, cols_ref, ma_ref, mb_ref, ta_ref, tb_ref, s_ref, n_ref, *,
    approx=False, precise=False, f32gram=False,
):
    """Two proteins per grid step over the triu prefetch grid — measured
    EXPERIMENT (VERDICT r1 item 8): both MXU grams issue before either VPU
    transform, amortizing per-step scheduling and giving Mosaic a longer
    window to overlap MXU and VPU work.  See _pallas_sn_sym_2p for the
    measured result."""
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _():
        s_ref[:] = jnp.zeros_like(s_ref)
        n_ref[:] = jnp.zeros_like(n_ref)

    cnt0 = _gram(ma_ref[0], mb_ref[0], False, f32=f32gram)
    cnt1 = _gram(ma_ref[1], mb_ref[1], False, f32=f32gram)
    _jaccard_update(2 * p, cnt0, ta_ref, tb_ref, s_ref, n_ref, approx, precise)
    _jaccard_update(
        2 * p + 1, cnt1, ta_ref, tb_ref, s_ref, n_ref, approx, precise
    )


def _sym_kernel_2p_fused(
    rows_ref, cols_ref, ma_ref, mb_ref, ta_ref, tb_ref, s_ref, n_ref, *,
    approx=False, precise=False, mxu_outer=False,
):
    """EXPERIMENT kernels for VERDICT r2 item 6 (the 'N via MXU' arm of r1
    item 8).  Two measured variants over the 2p triu grid:

    * fused update (mxu_outer=False): both proteins' Jaccard terms are
      computed first, then ONE read-modify-write per accumulator per grid
      step (s += j0+j1, n += m0+m1) instead of two.  The n update is
      mathematically the prescribed ones-vector contraction over the
      stacked shared masks — note the contraction axis has length 2 (the
      proteins-per-step), NOT a genome axis: N's per-cell update is
      elementwise, so there is no (tile, K) x (K, tile) formulation for the
      MXU to run; summing the per-step masks before accumulating is ALL the
      'dot with ones' can mean inside this grid.
    * mxu_outer=True: additionally builds the denominators' ta[i] + tb[j]
      outer sums on the MXU as (tile, 2) @ (2, tile) f32 rank-2 products —
      the only genuinely-MXU-shaped piece of the transform — freeing the
      VPU broadcast-adds.

    Measured results: see the _pallas_sn_sym_2p docstring."""
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _():
        s_ref[:] = jnp.zeros_like(s_ref)
        n_ref[:] = jnp.zeros_like(n_ref)

    cnt0 = _gram(ma_ref[0], mb_ref[0], False)
    cnt1 = _gram(ma_ref[1], mb_ref[1], False)
    outer0 = outer1 = None
    if mxu_outer:
        dims = (((1,), (0,)), ((), ()))
        ta0 = ta_ref[pl.ds(2 * p, 1), :][0]
        tb0 = tb_ref[pl.ds(2 * p, 1), :][0]
        ta1 = ta_ref[pl.ds(2 * p + 1, 1), :][0]
        tb1 = tb_ref[pl.ds(2 * p + 1, 1), :][0]
        ones = jnp.ones_like(ta0)
        # precision=HIGHEST: the MXU's default bf16 pass rounds the
        # integer-valued f32 T entries (up to 160000 >> bf16's 8-bit
        # mantissa) — measured 1.4e-3 rel error in the denominators.
        outer0 = jax.lax.dot_general(
            jnp.stack([ta0, ones], axis=1), jnp.stack([ones, tb0], axis=0),
            dims, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        outer1 = jax.lax.dot_general(
            jnp.stack([ta1, ones], axis=1), jnp.stack([ones, tb1], axis=0),
            dims, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    j0, m0 = _jaccard_terms(2 * p, cnt0, ta_ref, tb_ref, approx, precise,
                            outer=outer0)
    j1, m1 = _jaccard_terms(2 * p + 1, cnt1, ta_ref, tb_ref, approx, precise,
                            outer=outer1)
    s_ref[:] += j0 + j1
    n_ref[:] += m0 + m1


@functools.partial(
    jax.jit, static_argnames=("tile", "approx", "precise", "variant")
)
def _pallas_sn_sym_2p(
    m: jax.Array, t: jax.Array, tile: int, approx: bool = False,
    precise: bool = False, variant: str = "lean",
) -> tuple[jax.Array, jax.Array]:
    """_pallas_sn_sym with two proteins per grid step (P padded to even;
    an all-zero protein is inert: cnt == 0 -> j == 0, n += 0).

    Measured on the bench chip (G=4096 K=1280 tile=512, salted
    data-dependent chain): 7.44 ms/iter = 1127M pairs/s vs the one-protein
    triu grid's 7.96 ms = 1053M — +7%, the per-step VPU transform overlaps
    the next step's MXU grams better.  WINNER: this is the default
    symmetric kernel whenever the doubled (2, tile, K) input blocks fit
    VMEM (pallas_fused_aji routes here for k_eff <= MAX_K_SINGLE_BLOCK // 4,
    with the tile chosen by auto_tile(G, 2 * k_eff)).

    Pushing further was measured and lost (same protocol, 2026-08-19,
    2p/512 re-measured 1131M the same session): 4 proteins/step at tile=512
    exceeds scoped VMEM by 120 KB (Mosaic stack OOM, 16.12M > 16.00M);
    3/step at 512 drops to 954M (pp=3 breaks the even MXU/VPU interleave);
    4 or 8/step at tile=256 reach only ~760M (small tiles pay G/tile times
    more HBM re-reads, _REL_RATE).  Two per step is the VMEM-feasible
    optimum of this family.

    variant= A/Bs the r2-item-6 update experiments (same protocol,
    2026-08-20, base re-measured 1110M first / 1128M last in-session):
    * 'fused' (one RMW per accumulator per step: s += j0+j1, n += m0+m1 —
      the 'dot with ones over the stacked masks' reduced to what it means
      inside this grid, a length-2 elementwise sum): 1116M pairs/s, within
      session noise of base.  NOT adopted as default: no measurable win,
      and it reassociates s (j0+j1 before accumulate), which would break
      the bit-for-bit 2p==sym pin in tests.  Re-measured 2026-08-20 under
      the clean bench harness (direct sn calls, no aji divide): base
      1380/1480M vs fused 1371/1387M over two interleaved A/B passes —
      fused is neutral-to-slightly-worse; decision stands.
    * 'f32gram' (r3: MXU emits f32 counts, deleting the per-cell int32->f32
      convert): DOES NOT COMPILE — Mosaic requires float lhs for a float
      accumulator; see the _gram docstring for the measured-cost argument
      against the bf16-input workaround.
    * 'mxu_outer' (denominator outer sums ta[i]+tb[j] built on the MXU as
      (tile,2)@(2,tile) f32 rank-2 products): 652M pairs/s — 1.7x SLOWER.
      The MXU's native f32 pass is bf16 and rounds the integer T entries
      (measured 1.4e-3 rel error in denominators), so correctness forces
      precision=HIGHEST, whose multi-pass emulation costs far more than
      the VPU broadcast-adds it frees.  The MXU-N idea is a dead end in
      this kernel: N's update is elementwise per cell, and the only
      MXU-shaped piece (the outer sum) loses on precision grounds.
    * 'lean' (r4 DEFAULT, VERDICT r3 item 4): two per-cell VPU ops deleted
      with bit-identical results (pre-clamped T replaces the denominator
      max; min(cnt, 1) replaces the compare+select N update — see
      _sym_kernel_2p_lean).  Measured 2026-08-20, unbiased
      min-of-reps-per-chain estimator, interleaved A/B at G=4096 K=1280
      tile=512: base 6.345/6.323 ms/iter (1.322/1.326G pairs/s, MFU
      0.773/0.776) vs lean 6.284/6.269 ms (1.335/1.338G, MFU 0.781/0.783)
      — a consistent +1%, matching the cycle-budget prediction that only
      ~half the transform's VPU time is exposed (docs/DESIGN.md §6.1).
    * 'counts' (diagnostic, NOT a production mode): transform stripped to
      one convert+add per cell — 5.702 ms, MFU 0.860.  This is the
      empirical ceiling of the grid/DMA/MXU machinery with near-zero VPU
      work; the gap from lean's 0.78 to 0.86 is the exposed cost of the
      ~9 genuinely required transform ops, so ~0.78 is certified as the
      practical ceiling of this kernel family (docs/DESIGN.md §6.1).

    After the measurement, the lean trim was adopted FAMILY-WIDE: the
    shared _jaccard_terms body is now the lean form and every wrapper
    pre-clamps T (_clamp_t), so 'base' and 'lean' run identical code —
    the variant names remain for the measurement record above."""
    P, G, K = m.shape
    m = m.astype(jnp.int8)
    if P % 2:
        m = jnp.pad(m, ((0, 1), (0, 0), (0, 0)))
        t = jnp.pad(t, ((0, 1), (0, 0)))
        P += 1
    nt = G // tile
    rows, cols = np.triu_indices(nt)
    grid = (len(rows), P // 2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((2, tile, K), lambda q, p, r, c: (p, r[q], 0)),
            pl.BlockSpec((2, tile, K), lambda q, p, r, c: (p, c[q], 0)),
            pl.BlockSpec((P, tile), lambda q, p, r, c: (0, r[q])),
            pl.BlockSpec((P, tile), lambda q, p, r, c: (0, c[q])),
        ],
        out_specs=[
            pl.BlockSpec((tile, tile), lambda q, p, r, c: (r[q], c[q])),
            pl.BlockSpec((tile, tile), lambda q, p, r, c: (r[q], c[q])),
        ],
        # The pipe experiment carries the previous step's count pair
        # across protein grid steps (see _sym_kernel_2p_pipe).
        scratch_shapes=(
            [pltpu.VMEM((2, tile, tile), jnp.int32)]
            if variant == "pipe"
            else []
        ),
    )
    if variant == "pipe":
        kernel = functools.partial(
            _sym_kernel_2p_pipe, nsteps=P // 2, approx=approx,
            precise=precise,
        )
    elif variant in ("base", "f32gram"):
        kernel = functools.partial(
            _sym_kernel_2p, approx=approx, precise=precise,
            f32gram=(variant == "f32gram"),
        )
    elif variant in ("lean", "counts"):  # see _sym_kernel_2p_lean
        kernel = functools.partial(
            _sym_kernel_2p_lean, approx=approx, precise=precise,
            counts_only=(variant == "counts"),
        )
    else:  # "fused" / "mxu_outer": see _sym_kernel_2p_fused
        kernel = functools.partial(
            _sym_kernel_2p_fused, approx=approx, precise=precise,
            mxu_outer=(variant == "mxu_outer"),
        )
    # The lean family drops the in-kernel denominator clamp; T pre-clamped
    # to >= 1 makes that exact (see _sym_kernel_2p_lean).
    tf = _clamp_t(t)  # lean family-wide: see _clamp_t
    s, n = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((G, G), jnp.float32),
            jax.ShapeDtypeStruct((G, G), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * P * G * G * K * len(rows) // (nt * nt),
            bytes_accessed=2 * P * G * K + 8 * G * G,
            transcendentals=0,
        ),
    )(
        jnp.asarray(rows, jnp.int32),
        jnp.asarray(cols, jnp.int32),
        m,
        m,
        tf,
        tf,
    )
    upper = (jnp.arange(G)[:, None] // tile) <= (jnp.arange(G)[None, :] // tile)
    s = jnp.where(upper, s, s.T)
    n = jnp.where(upper, n, n.T)
    return s, n


def _kernel_kblocked(
    ma_ref, mb_ref, ta_ref, tb_ref, s_ref, n_ref, cnt_ref, *, nkb,
    p_dim, approx=False, precise=False,
):
    """K-blocked kernel body: grid (..., protein, K-block) with K innermost.
    Integer counts accumulate into a VMEM scratch across the K blocks; the
    Jaccard transform runs once per protein, on the last K block.  ``p_dim``
    is the grid dimension index of the protein axis (K is p_dim + 1)."""
    p = pl.program_id(p_dim)
    kb = pl.program_id(p_dim + 1)

    @pl.when((p == 0) & (kb == 0))
    def _():
        s_ref[:] = jnp.zeros_like(s_ref)
        n_ref[:] = jnp.zeros_like(n_ref)

    @pl.when(kb == 0)
    def _():
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

    cnt_ref[:] += _gram(ma_ref[0], mb_ref[0], False)

    @pl.when(kb == nkb - 1)
    def _():
        _jaccard_update(
            p, cnt_ref[:], ta_ref, tb_ref, s_ref, n_ref, approx, precise
        )


def _sym_kernel_kblocked(rows_ref, cols_ref, *args, **kwargs):
    """Scalar-prefetch wrapper: PrefetchScalarGridSpec hands the kernel the
    prefetched (rows, cols) tile maps first; the body does not need them."""
    _kernel_kblocked(*args, **kwargs)


def _pad_k(m: jax.Array, k_block: int) -> jax.Array:
    k = m.shape[2]
    kp = ((k + k_block - 1) // k_block) * k_block
    if kp != k:  # zero columns contribute 0 to every count
        m = jnp.pad(m, ((0, 0), (0, 0), (0, kp - k)))
    return m


@functools.partial(
    jax.jit, static_argnames=("tile", "k_block", "approx", "precise")
)
def _pallas_sn_kb(
    m: jax.Array, t: jax.Array, tile: int,
    k_block: int = KERNEL_K_BLOCK,
    approx: bool = False, precise: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Full-grid square S/N for presence tensors wider than one VMEM block:
    grid (row tile, col tile, protein, K block)."""
    m = _pad_k(m.astype(jnp.int8), k_block)
    P, G, K = m.shape
    nkb = K // k_block
    grid = (G // tile, G // tile, P, nkb)
    s, n = pl.pallas_call(
        functools.partial(
            _kernel_kblocked, nkb=nkb, p_dim=2, approx=approx, precise=precise
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, k_block), lambda i, j, p, kb: (p, i, kb)),
            pl.BlockSpec((1, tile, k_block), lambda i, j, p, kb: (p, j, kb)),
            pl.BlockSpec((P, tile), lambda i, j, p, kb: (0, i)),
            pl.BlockSpec((P, tile), lambda i, j, p, kb: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((tile, tile), lambda i, j, p, kb: (i, j)),
            pl.BlockSpec((tile, tile), lambda i, j, p, kb: (i, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, G), jnp.float32),
            jax.ShapeDtypeStruct((G, G), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((tile, tile), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * P * G * G * K,
            bytes_accessed=2 * P * G * K + 8 * G * G,
            transcendentals=0,
        ),
    )(m, m, _clamp_t(t), _clamp_t(t))
    return s, n


@functools.partial(
    jax.jit, static_argnames=("tile", "k_block", "approx", "precise")
)
def _pallas_sn_sym_kb(
    m: jax.Array, t: jax.Array, tile: int,
    k_block: int = KERNEL_K_BLOCK,
    approx: bool = False, precise: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Upper-triangle-only variant of _pallas_sn_kb (scalar-prefetched tile
    maps like _pallas_sn_sym, plus the K-block grid dimension)."""
    m = _pad_k(m.astype(jnp.int8), k_block)
    P, G, K = m.shape
    nkb = K // k_block
    nt = G // tile
    rows, cols = np.triu_indices(nt)
    grid = (len(rows), P, nkb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, k_block), lambda q, p, kb, r, c: (p, r[q], kb)),
            pl.BlockSpec((1, tile, k_block), lambda q, p, kb, r, c: (p, c[q], kb)),
            pl.BlockSpec((P, tile), lambda q, p, kb, r, c: (0, r[q])),
            pl.BlockSpec((P, tile), lambda q, p, kb, r, c: (0, c[q])),
        ],
        out_specs=[
            pl.BlockSpec((tile, tile), lambda q, p, kb, r, c: (r[q], c[q])),
            pl.BlockSpec((tile, tile), lambda q, p, kb, r, c: (r[q], c[q])),
        ],
        scratch_shapes=[pltpu.VMEM((tile, tile), jnp.int32)],
    )
    s, n = pl.pallas_call(
        functools.partial(
            _sym_kernel_kblocked, nkb=nkb, p_dim=1, approx=approx,
            precise=precise,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((G, G), jnp.float32),
            jax.ShapeDtypeStruct((G, G), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * P * G * G * K * len(rows) // (nt * nt),
            bytes_accessed=2 * P * G * K + 8 * G * G,
            transcendentals=0,
        ),
    )(
        jnp.asarray(rows, jnp.int32),
        jnp.asarray(cols, jnp.int32),
        m,
        m,
        _clamp_t(t),
        _clamp_t(t),
    )
    upper = (jnp.arange(G)[:, None] // tile) <= (jnp.arange(G)[None, :] // tile)
    s = jnp.where(upper, s, s.T)
    n = jnp.where(upper, n, n.T)
    return s, n


@functools.partial(
    jax.jit,
    static_argnames=("tile", "k_block", "approx", "precise", "interpret"),
)
def _pallas_sn_rect_kb(
    ma: jax.Array, mb: jax.Array, ta: jax.Array, tb: jax.Array, tile: int,
    k_block: int = KERNEL_K_BLOCK, approx: bool = False,
    precise: bool = False,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """K-blocked rectangular fused (S, N) — _pallas_sn_rect for K wider than
    one VMEM block."""
    ma = _pad_k(ma.astype(jnp.int8), k_block)
    mb = _pad_k(mb.astype(jnp.int8), k_block)
    P, A, K = ma.shape
    B = mb.shape[1]
    nkb = K // k_block
    grid = (A // tile, B // tile, P, nkb)
    s, n = pl.pallas_call(
        functools.partial(
            _kernel_kblocked, nkb=nkb, p_dim=2, approx=approx, precise=precise
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, k_block), lambda i, j, p, kb: (p, i, kb)),
            pl.BlockSpec((1, tile, k_block), lambda i, j, p, kb: (p, j, kb)),
            pl.BlockSpec((P, tile), lambda i, j, p, kb: (0, i)),
            pl.BlockSpec((P, tile), lambda i, j, p, kb: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((tile, tile), lambda i, j, p, kb: (i, j)),
            pl.BlockSpec((tile, tile), lambda i, j, p, kb: (i, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((A, B), jnp.float32),
            jax.ShapeDtypeStruct((A, B), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((tile, tile), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * P * A * B * K,
            bytes_accessed=P * (A + B) * K + 8 * A * B,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ma, mb, _clamp_t(ta), _clamp_t(tb))
    return s, n


@functools.partial(
    jax.jit, static_argnames=("tile", "approx", "packed", "precise")
)
def _pallas_sn(
    m: jax.Array, t: jax.Array, tile: int, approx: bool = False,
    packed: bool = False, precise: bool = False,
) -> tuple[jax.Array, jax.Array]:
    P, G, K = m.shape
    m = m.astype(jnp.int8)
    if packed:
        m = _pack_nibbles(m)
    kb = m.shape[2]
    grid = (G // tile, G // tile, P)
    s, n = pl.pallas_call(
        functools.partial(
            _kernel, approx=approx, packed=packed, precise=precise
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, kb), lambda i, j, p: (p, i, 0)),
            pl.BlockSpec((1, tile, kb), lambda i, j, p: (p, j, 0)),
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
            bytes_accessed=2 * P * G * kb + 8 * G * G,
            transcendentals=0,
        ),
    )(m, m, _clamp_t(t), _clamp_t(t))
    return s, n


def _sym_kernel(
    rows_ref, cols_ref, ma_ref, mb_ref, ta_ref, tb_ref, s_ref, n_ref, *,
    approx=False, packed=False, precise=False,
):
    """Upper-triangle variant: grid (tile-pair, protein); the tile-pair's
    (row, col) block indices come from the scalar-prefetched maps."""
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _():
        s_ref[:] = jnp.zeros_like(s_ref)
        n_ref[:] = jnp.zeros_like(n_ref)

    _accumulate(p, ma_ref, mb_ref, ta_ref, tb_ref, s_ref, n_ref, approx,
                packed, precise)


@functools.partial(
    jax.jit, static_argnames=("tile", "approx", "packed", "precise")
)
def _pallas_sn_sym(
    m: jax.Array, t: jax.Array, tile: int, approx: bool = False,
    packed: bool = False, precise: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """S/N with only the upper-triangle tile pairs computed (AJI is symmetric,
    interface.hpp:103-111 orders pairs a<b); the lower triangle is
    reconstructed from the transpose.  Skips nt*(nt-1)/2 of the nt^2 tiles —
    the TPU analogue of the reference's a<b pair enumeration
    (ds_impl.hpp:99-114) rather than a literal pair list."""
    P, G, K = m.shape
    m = m.astype(jnp.int8)
    if packed:
        m = _pack_nibbles(m)
    kb = m.shape[2]
    nt = G // tile
    rows, cols = np.triu_indices(nt)
    npairs = len(rows)
    grid = (npairs, P)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, kb), lambda q, p, r, c: (p, r[q], 0)),
            pl.BlockSpec((1, tile, kb), lambda q, p, r, c: (p, c[q], 0)),
            pl.BlockSpec((P, tile), lambda q, p, r, c: (0, r[q])),
            pl.BlockSpec((P, tile), lambda q, p, r, c: (0, c[q])),
        ],
        out_specs=[
            pl.BlockSpec((tile, tile), lambda q, p, r, c: (r[q], c[q])),
            pl.BlockSpec((tile, tile), lambda q, p, r, c: (r[q], c[q])),
        ],
    )
    s, n = pl.pallas_call(
        functools.partial(
            _sym_kernel, approx=approx, packed=packed, precise=precise
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((G, G), jnp.float32),
            jax.ShapeDtypeStruct((G, G), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * P * G * G * K * npairs // (nt * nt),
            bytes_accessed=2 * P * G * kb + 8 * G * G,
            transcendentals=0,
        ),
    )(
        jnp.asarray(rows, jnp.int32),
        jnp.asarray(cols, jnp.int32),
        m,
        m,
        _clamp_t(t),
        _clamp_t(t),
    )
    # Unwritten lower-triangle tiles hold garbage; every (r, c) with
    # tile(r) > tile(c) mirrors its transposed, computed entry.
    upper = (jnp.arange(G)[:, None] // tile) <= (jnp.arange(G)[None, :] // tile)
    s = jnp.where(upper, s, s.T)
    n = jnp.where(upper, n, n.T)
    return s, n


@functools.partial(
    jax.jit, static_argnames=("tile", "approx", "packed", "precise")
)
def _pallas_sn_sym_diag(
    m: jax.Array, t: jax.Array, tile: int, approx: bool = False,
    packed: bool = False, precise: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Symmetric S/N via wrapped-diagonal tile enumeration on a STANDARD grid.

    Measured ALTERNATIVE to _pallas_sn_sym, not the default: grid (d, i, p)
    computes block (i, (i + d) mod nt) for d = 0..nt//2, covering every
    unordered tile pair (the longer-way twin is the transpose) with
    closed-form index maps instead of scalar prefetch.  Salted-chain
    measurement at G=4096 K=1280 tile=512: 2.76 us/grid-step vs the
    prefetch grid's 2.86 — but the wrapped enumeration runs (nt//2 + 1)*nt
    tiles vs triu's nt(nt+1)/2 (40 vs 36 at nt=8), netting 8.82 vs 8.25
    ms/iter.  The `//` in the index maps defeats Mosaic pipelining almost
    as much as scalar prefetch does (the plain affine rect grid steps at
    2.20 us).  Kept as the measurement record; revisit if Mosaic learns
    affine-mod index maps.
    """
    P, G, K = m.shape
    m = m.astype(jnp.int8)
    if packed:
        m = _pack_nibbles(m)
    kb = m.shape[2]
    nt = G // tile
    ndiag = nt // 2 + 1
    grid = (ndiag, nt, P)

    def col(d, i):
        j = i + d
        return j - (j // nt) * nt  # (i + d) mod nt, closed-form

    s, n = pl.pallas_call(
        functools.partial(
            _kernel, approx=approx, packed=packed, precise=precise
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, kb), lambda d, i, p: (p, i, 0)),
            pl.BlockSpec((1, tile, kb), lambda d, i, p: (p, col(d, i), 0)),
            pl.BlockSpec((P, tile), lambda d, i, p: (0, i)),
            pl.BlockSpec((P, tile), lambda d, i, p: (0, col(d, i))),
        ],
        out_specs=[
            pl.BlockSpec((tile, tile), lambda d, i, p: (i, col(d, i))),
            pl.BlockSpec((tile, tile), lambda d, i, p: (i, col(d, i))),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, G), jnp.float32),
            jax.ShapeDtypeStruct((G, G), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * P * G * tile * K * ndiag,
            bytes_accessed=2 * P * G * kb * ndiag // nt + 8 * G * G,
            transcendentals=0,
        ),
    )(m, m, _clamp_t(t), _clamp_t(t))
    # Tiles with forward distance > nt//2 were not computed; they are the
    # transposes of computed ones.
    rt = jnp.arange(G) // tile
    dist = (rt[None, :] - rt[:, None]) % nt
    covered = dist <= nt // 2
    s = jnp.where(covered, s, s.T)
    n = jnp.where(covered, n, n.T)
    return s, n


def _band_kernel(ma_ref, mb_ref, ta_ref, tb_ref, s_ref, n_ref, *,
                 approx=False, packed=False, precise=False):
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _():
        s_ref[:] = jnp.zeros_like(s_ref)
        n_ref[:] = jnp.zeros_like(n_ref)

    _accumulate(p, ma_ref, mb_ref, ta_ref, tb_ref, s_ref, n_ref, approx,
                packed, precise)


@functools.partial(
    jax.jit, static_argnames=("tile", "approx", "packed", "precise")
)
def _pallas_sn_sym_bands(
    m: jax.Array, t: jax.Array, tile: int, approx: bool = False,
    packed: bool = False, precise: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Symmetric S/N as one affine-grid band call per upper-triangle block
    row.

    Band r computes blocks (r, c), c = r..nt-1, with a PLAIN affine grid
    (column offset r is a static constant baked into each call's index
    maps) — exactly triu's nt(nt+1)/2 tiles.  nt compiled kernels (one per
    band width); bands are stitched with dynamic_update_slice, lower
    triangle mirrored from the transpose.

    Measured (G=4096 K=1280 tile=512, salted chain): 8.18 ms/iter — a tie
    with the scalar-prefetch triu grid's 8.25, NOT the 6.3 the affine
    rect-grid step rate (2.20 us) predicted; per-band launch/pipeline-warm
    overhead and the (G, G) stitching eat the difference.  Kept as the
    measurement record; _pallas_sn_sym remains the default.
    """
    P, G, K = m.shape
    m = m.astype(jnp.int8)
    if packed:
        m = _pack_nibbles(m)
    kb = m.shape[2]
    tf = _clamp_t(t)
    nt = G // tile
    s = jnp.zeros((G, G), jnp.float32)
    n = jnp.zeros((G, G), jnp.int32)
    for r in range(nt):
        width = (nt - r) * tile
        sb, nb = pl.pallas_call(
            functools.partial(
                _band_kernel, approx=approx, packed=packed, precise=precise
            ),
            grid=(nt - r, P),
            in_specs=[
                pl.BlockSpec((1, tile, kb), lambda j, p, r=r: (p, r, 0)),
                pl.BlockSpec((1, tile, kb), lambda j, p, r=r: (p, j + r, 0)),
                pl.BlockSpec((P, tile), lambda j, p, r=r: (0, r)),
                pl.BlockSpec((P, tile), lambda j, p, r=r: (0, j + r)),
            ],
            out_specs=[
                pl.BlockSpec((tile, tile), lambda j, p: (0, j)),
                pl.BlockSpec((tile, tile), lambda j, p: (0, j)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((tile, width), jnp.float32),
                jax.ShapeDtypeStruct((tile, width), jnp.int32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * P * tile * width * K,
                bytes_accessed=P * (tile + width) * kb + 8 * tile * width,
                transcendentals=0,
            ),
        )(m, m, tf, tf)
        s = jax.lax.dynamic_update_slice(s, sb, (r * tile, r * tile))
        n = jax.lax.dynamic_update_slice(n, nb, (r * tile, r * tile))
    upper = (jnp.arange(G)[:, None] // tile) <= (jnp.arange(G)[None, :] // tile)
    s = jnp.where(upper, s, s.T)
    n = jnp.where(upper, n, n.T)
    return s, n


def _band_kernel_2p_lean(
    ma_ref, mb_ref, ta_ref, tb_ref, s_prev, n_prev, s_ref, n_ref, *,
    approx=False, precise=False,
):
    """Band-grid 2p lean body: s_prev/n_prev are the ALIASED whole-(G, G)
    carries (memory_space=ANY, never read) — earlier bands' tiles pass
    through physically; this band's tiles initialize at p == 0."""
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _():
        s_ref[:] = jnp.zeros_like(s_ref)
        n_ref[:] = jnp.zeros_like(n_ref)

    cnt0 = _gram(ma_ref[0], mb_ref[0], False)
    cnt1 = _gram(ma_ref[1], mb_ref[1], False)
    _lean_update(2 * p, cnt0, ta_ref, tb_ref, s_ref, n_ref, approx, precise)
    _lean_update(
        2 * p + 1, cnt1, ta_ref, tb_ref, s_ref, n_ref, approx, precise
    )


@functools.partial(jax.jit, static_argnames=("tile", "approx", "precise"))
def _pallas_sn_sym_bands_2p(
    m: jax.Array, t: jax.Array, tile: int, approx: bool = False,
    precise: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """EXPERIMENT (r4, VERDICT r3 item 4 follow-through): the 2p lean body
    over PLAIN AFFINE band grids with IN-PLACE aliased outputs.

    Motivation from the cycle budget (docs/DESIGN.md §6.1): the counts-only
    probe pins 0.55 µs/step of machinery overhead on the scalar-prefetch
    triu grid; the r2 bands experiment showed affine grid steps run ~23%
    faster than prefetch steps (2.20 vs 2.86 µs in the 1p family) but its
    (G, G) dynamic_update_slice stitching ate the win.  Here the stitch is
    deleted: each band call ALIASES the accumulated (G, G) s/n buffers
    (input_output_aliases), writing its band row in place — nt pallas
    calls inside one jit, no copies.

    MEASURED 2026-08-20 (G=4096 K=1280 tile=512, salted chains, unbiased
    estimator, two interleaved passes): bands 6.194/6.263 ms/iter vs
    prefetch 6.225/6.053 — a WASH inside the session's ±3% variance (the
    prefetch kernel itself spanned 6.05-6.23 across passes).  Deleting the
    stitch removed the r2 bands-experiment's known cost, but the per-band
    pipeline warm-up (nt prologues per iteration) absorbs what the affine
    index maps save.  Bit-identical to the prefetch 2p lean kernel
    (asserted on-chip + interpret-mode test).  NOT adopted: no measured
    win, and nt compiled programs per shape vs the prefetch grid's one is
    strictly worse under this environment's compile lottery
    (utils/jitcache.py).  Kept as the measurement record."""
    P, G, K = m.shape
    m = m.astype(jnp.int8)
    if P % 2:
        m = jnp.pad(m, ((0, 1), (0, 0), (0, 0)))
        t = jnp.pad(t, ((0, 1), (0, 0)))
        P += 1
    tf = _clamp_t(t)
    nt = G // tile
    s = jnp.zeros((G, G), jnp.float32)
    n = jnp.zeros((G, G), jnp.int32)
    for r in range(nt):
        width = nt - r
        s, n = pl.pallas_call(
            functools.partial(
                _band_kernel_2p_lean, approx=approx, precise=precise
            ),
            grid=(width, P // 2),
            in_specs=[
                pl.BlockSpec((2, tile, K), lambda j, p, r=r: (p, r, 0)),
                pl.BlockSpec((2, tile, K), lambda j, p, r=r: (p, j + r, 0)),
                pl.BlockSpec((P, tile), lambda j, p, r=r: (0, r)),
                pl.BlockSpec((P, tile), lambda j, p, r=r: (0, j + r)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec((tile, tile), lambda j, p, r=r: (r, j + r)),
                pl.BlockSpec((tile, tile), lambda j, p, r=r: (r, j + r)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((G, G), jnp.float32),
                jax.ShapeDtypeStruct((G, G), jnp.int32),
            ],
            input_output_aliases={4: 0, 5: 1},
            cost_estimate=pl.CostEstimate(
                flops=2 * P * tile * (width * tile) * K,
                bytes_accessed=P * (tile + width * tile) * K
                + 8 * tile * width * tile,
                transcendentals=0,
            ),
        )(m, m, tf, tf, s, n)
    upper = (jnp.arange(G)[:, None] // tile) <= (jnp.arange(G)[None, :] // tile)
    s = jnp.where(upper, s, s.T)
    n = jnp.where(upper, n, n.T)
    return s, n


@functools.partial(
    jax.jit, static_argnames=("tile", "approx", "precise", "interpret")
)
def _pallas_sn_rect(
    ma: jax.Array, mb: jax.Array, ta: jax.Array, tb: jax.Array, tile: int,
    approx: bool = False, precise: bool = False, interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Rectangular fused (S, N): genome band A x genome band B.

    The Pallas building block of the streaming scheduler
    (engine.compute_streamed): unlike the XLA-scan fused_sn_block, whose
    (A, B) f32+i32 accumulators round-trip HBM once per protein (~80x the
    result size in carry traffic), the grid keeps each output tile resident
    in VMEM across the whole protein axis.
    """
    P, A, K = ma.shape
    B = mb.shape[1]
    grid = (A // tile, B // tile, P)
    s, n = pl.pallas_call(
        functools.partial(_kernel, approx=approx, precise=precise),
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
            jax.ShapeDtypeStruct((A, B), jnp.float32),
            jax.ShapeDtypeStruct((A, B), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * P * A * B * K,
            bytes_accessed=P * (A + B) * K + 8 * A * B,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        ma.astype(jnp.int8), mb.astype(jnp.int8),
        _clamp_t(ta), _clamp_t(tb),
    )
    return s, n


def pallas_fused_sn_block(
    ma: jax.Array, mb: jax.Array, ta: jax.Array, tb: jax.Array,
    tile: int | None = None, approx: bool = False, precise: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """fused_sn_block drop-in on the Pallas kernel; pads both bands to the
    tile size (padded all-zero genomes produce cnt == 0 -> s == 0, n == 0,
    and are sliced off).  ``approx``/``precise`` select the kernel divide
    (see _accumulate); default is the Newton-refined reciprocal.

    Works inside ``shard_map`` bodies (parallel/mesh.py) — the callers there
    pass ``check_vma=False`` because Mosaic's output vma is untyped — and in
    interpret mode (_interpret_mode) for the virtual-CPU-mesh tests."""
    P, A, K = ma.shape
    B = mb.shape[1]
    interpret = _interpret_mode()
    blocked = K > MAX_K_SINGLE_BLOCK
    if tile is None:
        tile = auto_tile(max(A, B), KERNEL_K_BLOCK if blocked else K)
    ap = -(-A // tile) * tile
    bp = -(-B // tile) * tile
    if ap != A:
        ma = jnp.pad(ma, ((0, 0), (0, ap - A), (0, 0)))
        ta = jnp.pad(ta, ((0, 0), (0, ap - A)))
    if bp != B:
        mb = jnp.pad(mb, ((0, 0), (0, bp - B), (0, 0)))
        tb = jnp.pad(tb, ((0, 0), (0, bp - B)))
    if blocked:
        s, n = _pallas_sn_rect_kb(
            ma, mb, ta, tb, tile=tile, approx=approx, precise=precise,
            interpret=interpret,
        )
    else:
        s, n = _pallas_sn_rect(
            ma, mb, ta, tb, tile=tile, approx=approx, precise=precise,
            interpret=interpret,
        )
    return s[:A, :B], n[:A, :B]


# Working VMEM budget for auto tile selection (of the ~16 MB per core).
# Calibrated against what Mosaic actually compiles here: a single-tile
# tile=1024 grid (13.6 MB modeled) compiles; tile=1024 multi-tile (22 MB
# modeled) never does.
_VMEM_BUDGET = int(14.5 * 1024 * 1024)


# Measured full-grid kernel rates on the bench chip (G=1024, K=1280),
# normalized to tile=1024: 128 -> 308M, 256 -> ~450M (interp), 512 -> 586M,
# 1024 -> 627M pairs/s.  Bigger tiles cut HBM re-reads (each presence tile is
# fetched G/tile times); smaller tiles let the symmetric grid skip more
# lower-triangle work.  (Absolute rates here and in the per-kernel docstrings
# predate the 2026-08-20 bench-harness fix that removed ~1 ms/step of
# full-tensor perturbation traffic; only the RATIOS feed auto_tile, and those
# were measured under one protocol, so the model stands.)
_REL_RATE = {128: 0.49, 256: 0.72, 512: 0.93, 1024: 1.0}


def auto_tile(g: int, k: int, symmetric: bool = False) -> int:
    """Pick the tile (128..1024) maximizing modeled throughput within VMEM.

    Full grid: throughput ~ _REL_RATE[tile], so largest fitting tile wins.
    Symmetric grid: only nt*(nt+1)/2 of nt^2 tiles run (nt = ceil(g/tile)),
    so score = rate / work_ratio; smaller tiles trade HBM traffic for
    skipped work.

    The VMEM model counts Mosaic's double buffering: on a multi-tile grid
    the f32+i32 output tiles are double-buffered too (measured: tile=1024
    multi-tile grids need 16.8 MB for outputs alone and always fail to
    compile; a single-tile grid at tile=1024 compiles and runs).
    """
    best, best_score = 128, 0.0
    for tile in (128, 256, 512, 1024):
        nt = max(1, -(-g // tile))
        out_bufs = 8 * tile * tile * (2 if nt > 1 else 1)
        in_bufs = 2 * 2 * tile * k  # two sides, double-buffered
        if out_bufs + in_bufs > _VMEM_BUDGET:
            continue
        work_ratio = (nt + 1) / (2 * nt) if symmetric else 1.0
        score = _REL_RATE[tile] / work_ratio
        if score > best_score:
            best, best_score = tile, score
    return best


def fused_aji_plan(
    p: int,
    g: int,
    k: int,
    tile: int | None = None,
    symmetric: bool = True,
    packed: bool = False,
) -> dict:
    """The dispatch plan of pallas_fused_aji as data: which kernel family
    runs, at what tile, over how many tiles, and how many int8 MACs the MXU
    actually executes per call (triu/padding overcoverage included).

    pallas_fused_aji derives its dispatch FROM this plan, so bench.py's
    MFU / int8_mac_per_s figures (VERDICT r2 item 6) are anchored to the
    same arithmetic the kernel really issues — not a pairs-based proxy.
    Keys: mode ('2p'|'sym'|'full'|'kb_sym'|'kb_full'), tile, gp (padded G),
    nt, n_tiles, pp (padded P), kp (padded/contracted K), mxu_macs."""
    if packed and k % 2:
        k += 1
    k_eff = k // 2 if packed else k
    blocked = k_eff > MAX_K_SINGLE_BLOCK
    two_per_step = (
        not blocked
        and symmetric
        and not packed
        and k_eff <= MAX_K_SINGLE_BLOCK // 4
    )
    if tile is None:
        model_k = (
            KERNEL_K_BLOCK if blocked
            else (2 * k_eff if two_per_step else k_eff)
        )
        tile = auto_tile(g, model_k, symmetric=symmetric)
    gp = ((g + tile - 1) // tile) * tile
    nt = gp // tile
    n_tiles = nt * (nt + 1) // 2 if symmetric else nt * nt
    pp = p + (p % 2) if two_per_step else p
    # Packed mode contracts two half-width dots => same MAC count as k.
    # Padded K = what the kernel actually contracts: in-jit _pad_k aligns
    # the GIVEN tensor to KERNEL_K_BLOCK.  (Host-side K_BLOCK bucket
    # padding, where applied, already happened before the tensor got here,
    # so its wider alignment is reflected in ``k`` itself.)
    kp = (
        ((k + KERNEL_K_BLOCK - 1) // KERNEL_K_BLOCK) * KERNEL_K_BLOCK
        if blocked
        else k
    )
    mode = (
        "2p"
        if two_per_step
        else ("kb_sym" if blocked and symmetric else
              "kb_full" if blocked else
              "sym" if symmetric else "full")
    )
    return {
        "mode": mode,
        "tile": tile,
        "gp": gp,
        "nt": nt,
        "n_tiles": n_tiles,
        "pp": pp,
        "kp": kp,
        "mxu_macs": n_tiles * tile * tile * pp * kp,
    }


def pallas_fused_aji(
    m: jax.Array,
    t: jax.Array,
    tile: int | None = None,
    symmetric: bool = True,
    approx: bool = False,
    packed: bool = False,
    precise: bool = False,
    variant: str = "lean",
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fused AJI via the Pallas tile kernel; pads G to the tile size.

    Same contract as ops.fused.fused_aji.  Padded (all-zero) genomes produce
    cnt == 0 everywhere -> masked J, N == 0; padded rows/cols are sliced off
    before returning.  ``symmetric`` (the all-vs-all default) computes only
    upper-triangle tile pairs and mirrors the rest — the result is identical
    because M @ M.T is symmetric.  ``approx`` swaps the exact f32 divide for
    the VPU's approximate reciprocal (~1e-4 relative error on AJI — fine for
    screening ranks, off by default; measured 2026-08-20 under the clean
    bench harness: 1338M vs the default's 1313-1322M pairs/s at G=4096 —
    only +2%, because the default already uses a Newton-refined reciprocal;
    the IEEE divide it replaces runs 1189M).  ``packed`` stores two presence columns per HBM byte and
    unpacks in-kernel (_pack_nibbles) — counts identical, HBM footprint
    halved; off by default because it is slower (the kernel is VPU-bound;
    see _pack_nibbles).
    """
    P, G, K = m.shape
    if packed and K % 2:
        m = jnp.pad(m, ((0, 0), (0, 0), (0, 1)))
        K += 1
    plan = fused_aji_plan(P, G, K, tile=tile, symmetric=symmetric,
                          packed=packed)
    blocked = plan["mode"] in ("kb_sym", "kb_full")
    if blocked and packed:
        raise ValueError(
            "packed presence is not supported with K-blocked execution "
            f"(K={K} > {2 * MAX_K_SINGLE_BLOCK}); unpack or use "
            "ops.fused.fused_aji"
        )
    two_per_step = plan["mode"] == "2p"
    tile = plan["tile"]
    gp = plan["gp"]
    if gp != G:
        m = jnp.pad(m, ((0, 0), (0, gp - G), (0, 0)))
        t = jnp.pad(t, ((0, 0), (0, gp - G)))
    if blocked:
        s, n = (_pallas_sn_sym_kb if symmetric else _pallas_sn_kb)(
            m, t, tile=tile, approx=approx, precise=precise
        )
    elif two_per_step:
        # Two proteins per grid step: measured +7% (docstring of
        # _pallas_sn_sym_2p).  The (2, tile, K) blocks double the input
        # VMEM footprint, so the K window halves and the tile is chosen
        # against the doubled model width.
        s, n = _pallas_sn_sym_2p(
            m, t, tile=tile, approx=approx, precise=precise,
            variant=variant,
        )
    else:
        s, n = (_pallas_sn_sym if symmetric else _pallas_sn)(
            m, t, tile=tile, approx=approx, packed=packed, precise=precise
        )
    s = s[:G, :G]
    n = n[:G, :G]
    aji = s / n.astype(jnp.float32)
    return aji, s, n
