"""Neighbor-normalized diploid copy-number estimation (pipeline step 6).

Vectorized re-design of the reference's per-sample loop
(``grid/utils/compute_dipcn.py:62-87``; formula
``docs/source/algorithms/dipcn.rst:49-55``):

    dipCN_i = (reads_i / scale_i) / mean_{j in first n_nbr usable nbrs}(reads_j / scale_j)

"Usable" preserves the reference's skip-and-continue semantics: a neighbor
whose ID has no read count is skipped WITHOUT consuming one of the n_nbr
slots. That ragged prefix-selection becomes a branch-free cumulative-sum
mask on device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("n_nbr",))
def compute_dipcn(
    reads,
    sample_scales,
    sample_valid,
    nbr_idx,
    nbr_scales,
    nbr_usable,
    n_nbr: int,
):
    """Compute dipCN for every sample at once.

    Args:
        reads: [N] read counts (junk where the sample has no count).
        sample_scales: [N] per-sample scale (the %.2f-quantized value read
            from the neighbors file in the file pipeline).
        sample_valid: [N] bool — sample has both a scale and a read count
            (ref skips others, grid/utils/compute_dipcn.py:63-66).
        nbr_idx: [N, K] neighbor row indices, ascending by distance.
        nbr_scales: [N, K] neighbor scales (aligned with nbr_idx).
        nbr_usable: [N, K] bool — the neighbor slot exists AND its ID has a
            read count.
        n_nbr: max neighbors averaged per sample.

    Returns:
        dipcn: [N] estimates (junk where ~out_valid).
        out_valid: [N] bool — sample_valid and at least one usable neighbor.
    """
    reads = jnp.asarray(reads)
    nbr_usable = jnp.asarray(nbr_usable, dtype=bool)

    # First n_nbr usable neighbors per row, skipping unusable without
    # consuming a slot: cumulative count of usable slots <= n_nbr.
    take = nbr_usable & (jnp.cumsum(nbr_usable.astype(jnp.int32), axis=1) <= n_nbr)

    contrib = jnp.where(take, reads[nbr_idx] / nbr_scales, 0)
    cnt = jnp.sum(take, axis=1)
    tot = jnp.sum(contrib, axis=1)

    nbr_mean = tot / jnp.maximum(cnt, 1)
    rnorm = reads / sample_scales
    dipcn = rnorm / nbr_mean
    out_valid = jnp.asarray(sample_valid, dtype=bool) & (cnt > 0)
    return dipcn, out_valid
