"""Property/fuzz sweeps: many random cohorts against the NaN-numpy oracles.

Catches edge-case divergences the single-seed golden tests can miss
(degenerate masks, constant columns, tiny cohorts, extreme missingness).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from grid_tpu.ops import (
    compute_dipcn,
    knn_squared,
    normalize_cohort,
    select_high_variance_indices,
)
from tests.reference_impl import dipcn_np, knn_np, normalize_matrix_np, select_high_variance_np


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_normalize(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(3, 40))
    r = int(rng.integers(2, 60))
    missing = float(rng.uniform(0, 0.6))
    mat = rng.uniform(5, 80, size=(n, r))
    if rng.random() < 0.3:
        mat[:, rng.integers(r)] = mat[0, rng.integers(r)]  # constant-ish column
    nan_mask = rng.random((n, r)) < missing
    mat_nan = np.where(nan_mask, np.nan, mat)
    # occasionally blank a full row / column
    if rng.random() < 0.4 and n > 3:
        mat_nan[rng.integers(n), :] = np.nan
    if rng.random() < 0.4 and r > 3:
        mat_nan[:, rng.integers(r)] = np.nan

    mask = ~np.isnan(mat_nan)
    if not mask.any():
        return
    with np.errstate(invalid="ignore", divide="ignore"):
        ref_z, ref_ratio, ref_mu, ref_var, ref_rm, ref_scale = normalize_matrix_np(mat_nan)
    res = normalize_cohort(np.where(mask, mat_nan, 0.0), mask)

    np.testing.assert_allclose(np.asarray(res.col_means), ref_mu, rtol=1e-10, equal_nan=True)
    np.testing.assert_allclose(np.asarray(res.col_vars), ref_var, rtol=1e-10, equal_nan=True)
    np.testing.assert_allclose(np.asarray(res.var_ratio), ref_ratio, rtol=1e-10, equal_nan=True)
    np.testing.assert_allclose(float(res.scale), ref_scale, rtol=1e-10)
    z, m = np.asarray(res.z), np.asarray(res.mask)
    np.testing.assert_allclose(z[m], ref_z[~np.isnan(ref_z)], rtol=1e-8)

    sel = select_high_variance_indices(np.asarray(res.var_ratio), 0.1)
    assert list(sel) == list(select_high_variance_np(ref_ratio, 0.1))


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_knn(seed):
    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(4, 70))
    r = int(rng.integers(1, 30))
    k = int(rng.integers(1, n))
    z = rng.normal(size=(n, r))
    if rng.random() < 0.3:
        z[rng.integers(n)] = z[0]  # duplicate row -> zero-distance tie
    ref_d, ref_i = knn_np(z, k)
    block = int(rng.choice([8, 16, 64]))
    d, i = knn_squared(jnp.asarray(z), k, row_block=block)
    np.testing.assert_allclose(np.asarray(d), ref_d, rtol=1e-8, atol=1e-8)
    # sets must match except across exact-distance ties at the k boundary
    for row in range(n):
        a, b = set(np.asarray(i)[row].tolist()), set(ref_i[row].tolist())
        if a != b:
            # every disagreement must be an exact tie at the boundary value
            boundary = ref_d[row, -1]
            extra = a ^ b
            full = np.sum((z - z[row]) ** 2, axis=1)
            for j in extra:
                np.testing.assert_allclose(full[j], boundary, rtol=1e-9)


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_dipcn(seed):
    rng = np.random.default_rng(200 + seed)
    n = int(rng.integers(3, 30))
    k = int(rng.integers(1, n))
    n_nbr = int(rng.integers(1, k + 2))
    ids = [f"S{i}" for i in range(n)]
    reads = {ids[i]: float(rng.integers(1, 5000)) for i in range(n)}
    for i in rng.choice(n, size=max(n // 5, 0), replace=False):
        reads.pop(ids[i], None)
    scales = {ids[i]: round(float(rng.uniform(0.5, 2.0)), 2) for i in range(n)}

    nbr_idx = np.zeros((n, k), dtype=np.int32)
    for i in range(n):
        others = [j for j in range(n) if j != i]
        nbr_idx[i] = rng.choice(others, size=k, replace=True)

    neighbors = {ids[i]: [(ids[j], scales[ids[j]]) for j in nbr_idx[i]] for i in range(n)}
    oracle = dipcn_np(reads, scales, neighbors, n_nbr)

    reads_arr = np.array([reads.get(ids[i], np.nan) for i in range(n)])
    scales_arr = np.array([scales[ids[i]] for i in range(n)])
    sample_valid = np.array([ids[i] in reads for i in range(n)])
    usable = np.array([[ids[j] in reads for j in nbr_idx[i]] for i in range(n)])
    contrib = np.where(usable, reads_arr[nbr_idx] / scales_arr[nbr_idx], 0.0)

    dip, valid = compute_dipcn(
        jnp.asarray(reads_arr / scales_arr), jnp.asarray(sample_valid),
        jnp.asarray(contrib), jnp.asarray(usable), n_nbr=n_nbr,
    )
    dip, valid = np.asarray(dip), np.asarray(valid)
    for i in range(n):
        if ids[i] in oracle:
            assert valid[i]
            np.testing.assert_allclose(dip[i], oracle[ids[i]], rtol=1e-10)
        else:
            assert not valid[i]


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_phasing_fixed_point(seed):
    """Jacobi (device) and Gauss-Seidel (reference order) agree at the fixed
    point across random neighbor graphs."""
    from grid_tpu.io.hap_neighbors import pad_hap_neighbors
    from grid_tpu.ops import phase_haplotypes
    from grid_tpu.ops.phasing import phase_gauss_seidel_host

    rng = np.random.default_rng(300 + seed)
    n = int(rng.integers(5, 25))
    max_nbr = int(rng.integers(1, 6))
    irrs = rng.uniform(0.5, 4.0, size=n).tolist()
    hap_nbrs = []
    for h in range(2 * n):
        if rng.random() < 0.25:
            hap_nbrs.append([])
            continue
        k = int(rng.integers(1, max_nbr + 1))
        choices = [j for j in range(2 * n) if j // 2 != h // 2]
        sel = rng.choice(choices, size=min(k, len(choices)), replace=False)
        hap_nbrs.append([(int(j), float(rng.uniform(0.2, 2.0))) for j in sel])

    ref_hap, ref_mean, ref_phased = phase_gauss_seidel_host(irrs, hap_nbrs, 1, 400)
    ni, nw, nv = pad_hap_neighbors(hap_nbrs, max_nbr, dtype=np.float64)
    res = phase_haplotypes(jnp.asarray(irrs), jnp.asarray(ni), jnp.asarray(nw),
                           jnp.asarray(nv), 1, 400)
    hap = np.asarray(res.hap_irrs)
    assert list(np.asarray(res.phased)) == ref_phased
    np.testing.assert_allclose(float(res.mean_irrs), ref_mean, rtol=1e-12)
    for h in range(2 * n):
        if np.isnan(ref_hap[h]):
            assert np.isnan(hap[h])
        else:
            np.testing.assert_allclose(hap[h], ref_hap[h], rtol=2e-4, atol=1e-6)
