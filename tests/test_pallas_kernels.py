"""Pallas kernel correctness (interpreter mode on CPU) vs the jnp ops."""

import jax.numpy as jnp
import numpy as np
import pytest

from grid_tpu.ops.knn import prepare_z
from grid_tpu.ops.pallas_kernels import masked_column_stats, zprep_gram


def test_zprep_gram_matches_reference(rng):
    n, r = 20, 70
    z = rng.normal(size=(n, r)).astype(np.float32) * 3
    mask = rng.random((n, r)) > 0.1
    region = rng.random(r) > 0.2

    g = np.asarray(
        zprep_gram(
            jnp.asarray(z), jnp.asarray(mask), jnp.asarray(region), 2.0,
            tile_m=8, tile_r=128, interpret=True,
        )
    )
    p = np.asarray(prepare_z(jnp.asarray(z), jnp.asarray(mask), 2.0, jnp.asarray(region)))
    ref = p @ p.T
    np.testing.assert_allclose(g, ref, rtol=1e-5, atol=1e-5)


def test_zprep_gram_multi_tile(rng):
    n, r = 300, 300  # forces multiple row/col/r tiles
    z = rng.normal(size=(n, r)).astype(np.float32)
    mask = np.ones((n, r), dtype=bool)
    region = np.ones(r, dtype=bool)
    g = np.asarray(
        zprep_gram(
            jnp.asarray(z), jnp.asarray(mask), jnp.asarray(region), 2.0,
            tile_m=128, tile_r=128, interpret=True,
        )
    )
    p = np.clip(z, -2, 2)
    np.testing.assert_allclose(g, p @ p.T, rtol=1e-4, atol=1e-4)


def test_masked_column_stats_matches_reference(rng):
    n, r = 50, 40
    values = rng.uniform(10, 60, size=(n, r)).astype(np.float32)
    mask = rng.random((n, r)) > 0.15
    row_means = np.where(mask, values, np.nan)
    rm = np.nanmean(row_means, axis=1)
    inv_rm = np.where(np.isfinite(rm) & (rm != 0), 1.0 / rm, 0.0)

    x = np.where(mask, values * inv_rm[:, None], 0.0)
    cnt_ref = mask.sum(0).astype(np.float32)
    sum_ref = x.sum(0)
    mu = np.where(cnt_ref > 0, sum_ref / np.maximum(cnt_ref, 1), 0.0)
    sq_ref = (np.where(mask, x - mu[None, :], 0.0) ** 2).sum(0)

    cnt, s, _ = masked_column_stats(
        jnp.asarray(values), jnp.asarray(mask), jnp.asarray(inv_rm),
        tile_m=16, tile_c=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(cnt), cnt_ref, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s), sum_ref, rtol=1e-5)

    # second pass with mu for exact centered sqdev
    _, _, sq = masked_column_stats(
        jnp.asarray(values), jnp.asarray(mask), jnp.asarray(inv_rm),
        col_means=jnp.asarray(mu), tile_m=16, tile_c=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(sq), sq_ref, rtol=1e-4, atol=1e-5)


class TestPallasDipcn:
    """The VMEM-resident threshold-dipCN kernel must be BIT-equal to the
    XLA formulation (interpret mode on CPU; hardware timing in
    scripts/probe_pallas_dipcn.py)."""

    @pytest.mark.parametrize("row_block", [32, 97, 128])
    def test_matches_xla_formulation(self, row_block):
        import numpy as np

        from grid_tpu.ops.knn import d2_matrix
        from grid_tpu.ops.pallas_select import dipcn_from_distances_pallas
        from grid_tpu.ops.select import dipcn_from_distances

        rng = np.random.default_rng(1)
        n, r = 97, 16
        zp = np.round(rng.normal(size=(n, r)).astype(np.float32) * 4) / 4
        rnorm = rng.uniform(0.5, 2.0, n).astype(np.float32)
        usable = rng.random(n) > 0.2
        valid = rng.random(n) > 0.1
        d2 = d2_matrix(jnp.asarray(zp), row_valid=jnp.asarray(valid))
        want, wok = dipcn_from_distances(
            d2, rnorm, rnorm, usable, usable, k=20, n_nbr=7
        )
        got, gok = dipcn_from_distances_pallas(
            d2, rnorm, rnorm, usable, usable, k=20, n_nbr=7,
            row_block=row_block, interpret=True,
        )
        wok = np.asarray(wok)
        np.testing.assert_array_equal(wok, np.asarray(gok))
        np.testing.assert_array_equal(
            np.asarray(want)[wok], np.asarray(got)[wok]
        )
