"""Pallas TPU kernels (experimental).

Two fused kernels exploring HBM-round-trip elimination:

- :func:`zprep_gram` — fuses the z preparation (clip to ±zmax, zero-fill
  invalid cells, zero de-selected region columns) INTO the Gram matmul
  tiles, so the prepared matrix never materializes in HBM.
- :func:`masked_column_stats` — one-pass per-column (count, sum, sqdev)
  with row-normalization applied on the fly.

STATUS / honest benchmarking note: with properly synchronized timing
(device readback — ``block_until_ready`` does not round-trip on tunneled
backends), the simple (i, j, r) tiling below is NOT competitive with XLA's
matmul emitter: its HBM traffic is O(N^2 R / TILE_M) because row/col tiles
are re-streamed per output tile, where XLA's blocked GEMM achieves far
higher reuse. The prep fusion it buys is O(N R) — negligible next to the
O(N^2 R) matmul. The production kNN path therefore uses XLA
(grid_tpu.ops.knn.knn_squared); these kernels remain correctness-tested
(interpret mode + real-TPU numerics) as kernel infrastructure for future
work where custom fusion beats the compiler (e.g. fused distance+select
without materializing d^2 row panels).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# Kernel A: fused z-prep + Gram panel
# ---------------------------------------------------------------------------


def _zprep_tile(z, mask, region, zmax):
    """Clip/zero a tile in registers (the fused 'prep' stage)."""
    out = jnp.where(mask, jnp.clip(z, -zmax, zmax), 0.0)
    return out * region


def _gram_kernel(za_ref, ma_ref, zb_ref, mb_ref, region_ref, out_ref, acc_ref,
                 *, zmax, n_r_tiles):
    """Grid (i_row_tile, j_col_tile, r_tile): accumulate prepared-tile
    matmuls into a VMEM accumulator; flush on the last r tile."""
    r_idx = pl.program_id(2)

    @pl.when(r_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    region = region_ref[0, :]  # [TR]
    a = _zprep_tile(za_ref[:], ma_ref[:], region[None, :], zmax)  # rows tile
    b = _zprep_tile(zb_ref[:], mb_ref[:], region[None, :], zmax)  # cols tile
    acc_ref[:] += jnp.dot(a, b.T, preferred_element_type=jnp.float32)

    @pl.when(r_idx == n_r_tiles - 1)
    def _():
        out_ref[:] = acc_ref[:]


def zprep_gram(z, mask, region_mask, zmax: float, tile_m: int = 256, tile_r: int = 512,
               interpret: bool = False):
    """G = P P^T where P = prep(z): one fused pallas_call.

    Args:
        z: [N, R] float32 raw z matrix.
        mask: [N, R] bool validity.
        region_mask: [R] bool selected regions.
        zmax: clip bound.

    Returns [N, N] float32 Gram matrix of the prepared rows. Shapes are
    padded internally to MXU-aligned tiles.
    """
    n, r = z.shape
    n_pad = _round_up(max(n, 8), tile_m)
    r_pad = _round_up(max(r, 128), tile_r)

    zf = jnp.zeros((n_pad, r_pad), jnp.float32).at[:n, :r].set(z.astype(jnp.float32))
    mf = jnp.zeros((n_pad, r_pad), jnp.bool_).at[:n, :r].set(mask)
    rf = jnp.zeros((1, r_pad), jnp.float32).at[0, :r].set(region_mask.astype(jnp.float32))

    grid = (n_pad // tile_m, n_pad // tile_m, r_pad // tile_r)
    n_r_tiles = grid[2]

    out = pl.pallas_call(
        partial(_gram_kernel, zmax=zmax, n_r_tiles=n_r_tiles),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, tile_r), lambda i, j, rt: (i, rt), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, tile_r), lambda i, j, rt: (i, rt), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, tile_r), lambda i, j, rt: (j, rt), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, tile_r), lambda i, j, rt: (j, rt), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_r), lambda i, j, rt: (0, rt), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_m, tile_m), lambda i, j, rt: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, n_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile_m, tile_m), jnp.float32)],
        interpret=interpret,
    )(zf, mf, zf, mf, rf)
    return out[:n, :n]


# ---------------------------------------------------------------------------
# Kernel B: one-pass masked column statistics
# ---------------------------------------------------------------------------


def _colstats_kernel(x_ref, m_ref, rowmean_ref, mu_ref, cnt_ref, sum_ref, sq_ref, *, n_row_tiles):
    """Grid (col_tile, row_tile): accumulate per-column count / sum /
    sum((x/rowmean - mu)^2) with row normalization applied on the fly."""
    row_idx = pl.program_id(1)

    @pl.when(row_idx == 0)
    def _():
        cnt_ref[:] = jnp.zeros_like(cnt_ref)
        sum_ref[:] = jnp.zeros_like(sum_ref)
        sq_ref[:] = jnp.zeros_like(sq_ref)

    m = m_ref[:]
    inv_rm = rowmean_ref[:]  # [TM, 1] precomputed 1/row_mean (0 for bad rows)
    x = x_ref[:] * inv_rm
    x = jnp.where(m, x, 0.0)
    mu = mu_ref[0, :]  # [TC] column means (0 on the first stats pass)
    centered = jnp.where(m, x - mu[None, :], 0.0)

    cnt_ref[0, :] += jnp.sum(m.astype(jnp.float32), axis=0)
    sum_ref[0, :] += jnp.sum(x, axis=0)
    sq_ref[0, :] += jnp.sum(centered * centered, axis=0)


def masked_column_stats(values, mask, inv_row_means, col_means=None,
                        tile_m: int = 512, tile_c: int = 512, interpret: bool = False):
    """Per-column (count, sum, sqdev_sum) of the row-normalized matrix in one
    HBM pass.

    Args:
        values: [N, R] raw depths.
        mask: [N, R] validity.
        inv_row_means: [N] 1/row_mean (0 for invalid rows).
        col_means: optional [R]; when given, sqdev accumulates against it
            (second invocation); when None, zeros are used and the caller
            derives variance via E[x^2] - mu^2 or re-invokes.

    Returns (cnt [R], sum [R], sqdev [R]) float32.
    """
    n, r = values.shape
    n_pad = _round_up(max(n, 8), tile_m)
    r_pad = _round_up(max(r, 128), tile_c)

    vf = jnp.zeros((n_pad, r_pad), jnp.float32).at[:n, :r].set(values.astype(jnp.float32))
    mf = jnp.zeros((n_pad, r_pad), jnp.bool_).at[:n, :r].set(mask)
    irm = jnp.zeros((n_pad, 1), jnp.float32).at[:n, 0].set(inv_row_means.astype(jnp.float32))
    mu = jnp.zeros((1, r_pad), jnp.float32)
    if col_means is not None:
        mu = mu.at[0, :r].set(col_means.astype(jnp.float32))

    grid = (r_pad // tile_c, n_pad // tile_m)
    cnt, s, sq = pl.pallas_call(
        partial(_colstats_kernel, n_row_tiles=grid[1]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, tile_c), lambda c, rt: (rt, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, tile_c), lambda c, rt: (rt, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 1), lambda c, rt: (rt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_c), lambda c, rt: (0, c), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile_c), lambda c, rt: (0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_c), lambda c, rt: (0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_c), lambda c, rt: (0, c), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, r_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, r_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, r_pad), jnp.float32),
        ),
        interpret=interpret,
    )(vf, mf, irm, mu)
    return cnt[0, :r], s[0, :r], sq[0, :r]
