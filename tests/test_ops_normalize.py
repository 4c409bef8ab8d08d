"""Golden tests: normalize_cohort vs the NaN-numpy oracle at float64."""

import numpy as np
import jax.numpy as jnp

from grid_tpu.ops import (
    normalize_cohort,
    select_high_variance_indices,
    select_high_variance_mask,
)
from tests.reference_impl import normalize_matrix_np, select_high_variance_np


def _random_masked(rng, n, r, missing=0.15):
    mat = rng.uniform(20, 60, size=(n, r))
    nan_mask = rng.random((n, r)) < missing
    mat_nan = mat.copy()
    mat_nan[nan_mask] = np.nan
    return mat_nan, ~nan_mask


def test_normalize_matches_reference_oracle(rng):
    mat_nan, mask = _random_masked(rng, 37, 53)
    ref_z, ref_ratio, ref_mu, ref_var, ref_rowmeans, ref_scale = normalize_matrix_np(mat_nan)

    res = normalize_cohort(jnp.where(mask, mat_nan, 0.0), mask)

    np.testing.assert_allclose(np.asarray(res.col_means), ref_mu, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(res.col_vars), ref_var, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(res.var_ratio), ref_ratio, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(res.row_means_raw), ref_rowmeans, rtol=1e-12)
    np.testing.assert_allclose(float(res.scale), ref_scale, rtol=1e-12)

    z = np.asarray(res.z)
    m = np.asarray(res.mask)
    assert (m == mask).all()
    np.testing.assert_allclose(z[m], ref_z[~np.isnan(ref_z)], rtol=1e-10)


def test_normalize_zero_mean_row_invalidated(rng):
    # A row of all zeros has row_mean 0 -> the reference turns it into NaN;
    # grid_tpu must invalidate it but keep the N-1 variance denominator.
    mat = rng.uniform(20, 60, size=(5, 8))
    mat[2] = 0.0
    mask = np.ones_like(mat, dtype=bool)

    ref_z, ref_ratio, ref_mu, ref_var, _, _ = normalize_matrix_np(mat)
    res = normalize_cohort(mat, mask)

    assert not np.asarray(res.mask)[2].any()
    np.testing.assert_allclose(np.asarray(res.col_means), ref_mu, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(res.col_vars), ref_var, rtol=1e-12)


def test_normalize_all_nan_column(rng):
    mat_nan, mask = _random_masked(rng, 10, 6, missing=0.0)
    mat_nan[:, 3] = np.nan
    mask[:, 3] = False

    ref_z, ref_ratio, ref_mu, ref_var, _, _ = normalize_matrix_np(mat_nan)
    res = normalize_cohort(np.where(mask, mat_nan, 0.0), mask)

    assert np.isnan(np.asarray(res.col_means)[3])
    assert np.isnan(np.asarray(res.var_ratio)[3])
    z = np.asarray(res.z)
    m = np.asarray(res.mask)
    np.testing.assert_allclose(z[m], ref_z[~np.isnan(ref_z)], rtol=1e-10)


def test_select_high_variance_quirk_q2(rng):
    # top_frac=0.1 must keep ~90% of regions (everything above the 10th
    # percentile), NOT the top 10%.
    ratios = rng.uniform(50, 150, size=200)
    ratios[5] = np.nan
    sel = select_high_variance_indices(ratios, top_frac=0.1)
    ref = select_high_variance_np(ratios, top_frac=0.1)
    assert list(sel) == list(ref)
    assert 0.8 < len(sel) / 200 < 0.95

    dev_mask = np.asarray(select_high_variance_mask(ratios, top_frac=0.1))
    assert set(np.where(dev_mask)[0]) == set(ref)


def test_select_high_variance_empty():
    assert len(select_high_variance_indices(np.array([np.nan, np.nan]))) == 0
    assert not np.asarray(select_high_variance_mask(np.array([np.nan, np.nan]))).any()
