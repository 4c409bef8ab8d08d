"""Cohort statistics over a sharded depth matrix.

The reference's lock-guarded shared-dict accumulation of region sums/counts
(grid/utils/normalize_mosdepth.py:247-295) becomes ``psum`` collectives over
the cohort mesh axis: each device reduces its row shard locally, one
all-reduce merges, and every device applies the identical column transform
to its own rows. Row statistics need no communication (rows are complete on
their shard); the variance-ratio median is computed redundantly on every
device from the replicated [R] ratios — R is tiny next to N*R, so this costs
nothing and avoids a gather.

Semantics are identical to :func:`grid_tpu.ops.normalize.normalize_cohort`
(tested against it on a virtual 8-device mesh).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from grid_tpu.ops.masked import masked_median
from grid_tpu.ops.normalize import NormalizeResult
from grid_tpu.parallel.mesh import COHORT_AXIS


def normalize_cohort_sharded(values, mask, mesh, n_rows=None, ratio_mult: float = 100.0):
    """Sharded-row normalize: values/mask [N, R] sharded over ``cohort``.

    Args:
        values, mask: cohort-sharded [N, R] device arrays (N divisible by
            mesh size; pad with mask=False rows and pass ``n_rows``).
        mesh: 1-D cohort mesh.
        n_rows: real (unpadded) row count for the N-1 denominator.

    Returns a NormalizeResult whose z/mask stay cohort-sharded and whose
    per-column stats are replicated.
    """
    n_total = values.shape[0] if n_rows is None else n_rows

    def kernel(v, m):
        # v, m: [B, R] local row block
        v = jnp.where(m, v, 0)

        # -- row stats: rows are complete locally ------------------------
        row_cnt = jnp.sum(m, axis=1)
        row_sum = jnp.sum(v, axis=1)
        row_means_raw = jnp.where(row_cnt > 0, row_sum / jnp.maximum(row_cnt, 1), jnp.nan)
        row_ok = jnp.isfinite(row_means_raw) & (row_means_raw != 0)
        m = m & row_ok[:, None]
        x = jnp.where(m, v / jnp.where(row_ok, row_means_raw, 1)[:, None], 0)

        # -- column stats: one psum over the cohort axis ------------------
        col_cnt = jax.lax.psum(jnp.sum(m, axis=0), COHORT_AXIS)
        col_sum = jax.lax.psum(jnp.sum(x, axis=0), COHORT_AXIS)
        col_ok = col_cnt > 0
        col_means = jnp.where(col_ok, col_sum / jnp.maximum(col_cnt, 1), jnp.nan)
        safe_mu = jnp.where(col_ok, col_means, 0)
        centered = jnp.where(m, x - safe_mu[None, :], 0)
        # all-invalid columns keep 0.0 (reference nansum semantics)
        sq_sum = jax.lax.psum(jnp.sum(centered * centered, axis=0), COHORT_AXIS)
        col_vars = sq_sum / (n_total - 1)

        mu_pos = col_ok & (safe_mu > 0)
        var_ratio = jnp.where(
            mu_pos, ratio_mult * col_vars / jnp.where(mu_pos, safe_mu, 1), jnp.nan
        )

        sqrt_mu = jnp.sqrt(jnp.where(mu_pos, safe_mu, 1))
        z = jnp.where(mu_pos[None, :], (x - safe_mu[None, :]) / sqrt_mu[None, :], x)
        z = jnp.where(m, z, 0)

        # -- median rescale: replicated [R] stats, computed everywhere ----
        ratio_valid = ~jnp.isnan(var_ratio)
        med = masked_median(var_ratio, ratio_valid)
        scale = jnp.where(
            ratio_valid.any() & (med > 0),
            1.0 / jnp.sqrt(med / ratio_mult),
            jnp.asarray(1.0, dtype=v.dtype),
        )
        z = z * scale
        return z, m, col_means, col_vars, var_ratio, row_means_raw, scale

    sharded = shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P(COHORT_AXIS, None), P(COHORT_AXIS, None)),
        out_specs=(
            P(COHORT_AXIS, None),  # z
            P(COHORT_AXIS, None),  # mask
            P(),  # col_means (replicated — identical on every device)
            P(),  # col_vars
            P(),  # var_ratio
            P(COHORT_AXIS),  # row_means_raw
            P(),  # scale
        ),
    )
    z, m, col_means, col_vars, var_ratio, row_means_raw, scale = jax.jit(sharded)(values, mask)
    return NormalizeResult(
        z=z,
        mask=m,
        col_means=col_means,
        col_vars=col_vars,
        var_ratio=var_ratio,
        row_means_raw=row_means_raw,
        scale=scale,
    )
