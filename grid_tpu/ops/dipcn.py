"""Neighbor-normalized diploid copy-number estimation (pipeline step 6).

Vectorized re-design of the reference's per-sample loop
(``grid/utils/compute_dipcn.py:62-87``; formula
``docs/source/algorithms/dipcn.rst:49-55``):

    dipCN_i = (reads_i / scale_i) / mean_{j in first n_nbr usable nbrs}(reads_j / scale_j)

"Usable" preserves the reference's skip-and-continue semantics: a neighbor
whose ID has no read count is skipped WITHOUT consuming one of the n_nbr
slots. That ragged prefix-selection becomes a branch-free cumulative-sum
mask on device.

The op takes the per-neighbor contributions pre-divided ([N, K] arrays) so
callers stage them however suits: the fused cohort model gathers
``reads[nbr_idx] / scales[nbr_idx]`` on device; the file-based step builds
them from string-keyed dicts on the host.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("n_nbr",))
def compute_dipcn(rnorm, sample_valid, nbr_contrib, nbr_usable, n_nbr: int):
    """Compute dipCN for every sample at once.

    Args:
        rnorm: [N] reads_i / scale_i per sample (junk where ~sample_valid).
        sample_valid: [N] bool — sample has both a scale and a read count
            (ref skips others, grid/utils/compute_dipcn.py:63-66).
        nbr_contrib: [N, K] reads_j / scale_j for each neighbor slot,
            ascending by distance (junk where ~nbr_usable).
        nbr_usable: [N, K] bool — the neighbor slot exists AND its ID has a
            read count.
        n_nbr: max neighbors averaged per sample.

    Returns:
        dipcn: [N] estimates (junk where ~out_valid).
        out_valid: [N] bool — sample_valid and at least one usable neighbor.
    """
    nbr_usable = jnp.asarray(nbr_usable, dtype=bool)

    # First n_nbr usable neighbors per row, skipping unusable without
    # consuming a slot: cumulative count of usable slots <= n_nbr.
    take = nbr_usable & (jnp.cumsum(nbr_usable.astype(jnp.int32), axis=1) <= n_nbr)

    contrib = jnp.where(take, nbr_contrib, 0)
    cnt = jnp.sum(take, axis=1)
    tot = jnp.sum(contrib, axis=1)

    nbr_mean = tot / jnp.maximum(cnt, 1)
    dipcn = jnp.asarray(rnorm) / nbr_mean
    out_valid = jnp.asarray(sample_valid, dtype=bool) & (cnt > 0)
    return dipcn, out_valid
