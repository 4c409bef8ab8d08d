"""dipCN and phasing op tests: vectorized vs reference-ordered host oracle."""

import numpy as np
import jax.numpy as jnp

from grid_tpu.ops import compute_dipcn, phase_haplotypes, compute_imputed
from grid_tpu.ops.phasing import phase_gauss_seidel_host, compute_imputed_host
from grid_tpu.io.hap_neighbors import pad_hap_neighbors
from tests.reference_impl import dipcn_np


def test_dipcn_matches_oracle(rng):
    n, k = 20, 6
    ids = [f"S{i}" for i in range(n)]
    reads = {ids[i]: float(rng.integers(500, 3000)) for i in range(n)}
    # two samples are missing read counts entirely
    del reads[ids[3]], reads[ids[11]]
    scales = {ids[i]: round(float(rng.uniform(0.8, 1.2)), 2) for i in range(n)}

    nbr_idx = np.zeros((n, k), dtype=np.int32)
    for i in range(n):
        others = [j for j in range(n) if j != i]
        nbr_idx[i] = rng.choice(others, size=k, replace=False)

    neighbors = {
        ids[i]: [(ids[j], scales[ids[j]]) for j in nbr_idx[i]] for i in range(n)
    }
    oracle = dipcn_np(reads, scales, neighbors, n_nbr=3)

    reads_arr = np.array([reads.get(ids[i], np.nan) for i in range(n)])
    scales_arr = np.array([scales[ids[i]] for i in range(n)])
    sample_valid = np.array([ids[i] in reads for i in range(n)])
    nbr_scales = scales_arr[nbr_idx]
    nbr_usable = np.array([[ids[j] in reads for j in nbr_idx[i]] for i in range(n)])

    rnorm = reads_arr / scales_arr
    nbr_contrib = np.where(nbr_usable, reads_arr[nbr_idx] / nbr_scales, 0.0)
    dip, valid = compute_dipcn(
        jnp.asarray(rnorm),
        jnp.asarray(sample_valid),
        jnp.asarray(nbr_contrib),
        jnp.asarray(nbr_usable),
        n_nbr=3,
    )
    dip, valid = np.asarray(dip), np.asarray(valid)
    for i in range(n):
        if ids[i] in oracle:
            assert valid[i]
            np.testing.assert_allclose(dip[i], oracle[ids[i]], rtol=1e-12)
        else:
            assert not valid[i]


def test_dipcn_skips_unusable_without_consuming_slot():
    # sample 0 has neighbors [1(no reads), 2, 3]; n_nbr=2 must average {2, 3}.
    reads = jnp.asarray([10.0, jnp.nan, 20.0, 40.0])
    scales = jnp.asarray([1.0, 1.0, 2.0, 4.0])
    nbr_idx = jnp.asarray([[1, 2, 3], [0, 2, 3], [0, 1, 3], [0, 1, 2]])
    nbr_scales = scales[nbr_idx]
    nbr_usable = jnp.asarray(
        [[False, True, True], [True, True, True], [True, False, True], [True, False, True]]
    )
    sample_valid = jnp.asarray([True, False, True, True])
    rnorm = reads / scales
    nbr_contrib = jnp.where(nbr_usable, reads[nbr_idx] / nbr_scales, 0.0)
    dip, valid = compute_dipcn(rnorm, sample_valid, nbr_contrib, nbr_usable, n_nbr=2)
    # mean of (20/2, 40/4) = 10 -> dip0 = (10/1)/10 = 1.0
    np.testing.assert_allclose(float(dip[0]), 1.0, rtol=1e-12)
    assert not bool(valid[1])


def _random_hap_nbrs(rng, n, max_nbr, p_empty=0.2):
    hap_nbrs = []
    for h in range(2 * n):
        if rng.random() < p_empty:
            hap_nbrs.append([])
            continue
        k = int(rng.integers(1, max_nbr + 1))
        choices = [j for j in range(2 * n) if j // 2 != h // 2]
        sel = rng.choice(choices, size=k, replace=False)
        hap_nbrs.append([(int(j), float(rng.uniform(0.5, 1.5))) for j in sel])
    return hap_nbrs


def test_phasing_fixed_point_matches_gauss_seidel(rng):
    # Jacobi and Gauss-Seidel share fixed points; at n_iters=300 both have
    # converged on this tiny cohort and must agree tightly.
    n, max_nbr = 16, 4
    irrs = rng.uniform(1.0, 5.0, size=n).tolist()
    hap_nbrs = _random_hap_nbrs(rng, n, max_nbr)

    ref_hap, ref_mean, ref_phased = phase_gauss_seidel_host(irrs, hap_nbrs, 1, 300)

    nbr_idx, nbr_w, nbr_valid = pad_hap_neighbors(hap_nbrs, max_nbr, dtype=np.float64)
    res = phase_haplotypes(
        jnp.asarray(irrs), jnp.asarray(nbr_idx), jnp.asarray(nbr_w),
        jnp.asarray(nbr_valid), min_nbr=1, n_iters=300,
    )
    hap = np.asarray(res.hap_irrs)
    np.testing.assert_allclose(float(res.mean_irrs), ref_mean, rtol=1e-12)
    assert list(np.asarray(res.phased)) == ref_phased
    for h in range(2 * n):
        if np.isnan(ref_hap[h]):
            assert np.isnan(hap[h])
        else:
            np.testing.assert_allclose(hap[h], ref_hap[h], rtol=1e-6)


def test_phasing_init_and_conservation(rng):
    # hap1 + hap2 == IRR is invariant under the update whenever denom > 0.
    n, max_nbr = 12, 3
    irrs = rng.uniform(2.0, 4.0, size=n)
    hap_nbrs = _random_hap_nbrs(rng, n, max_nbr, p_empty=0.0)
    nbr_idx, nbr_w, nbr_valid = pad_hap_neighbors(hap_nbrs, max_nbr, dtype=np.float64)
    res = phase_haplotypes(
        jnp.asarray(irrs), jnp.asarray(nbr_idx), jnp.asarray(nbr_w),
        jnp.asarray(nbr_valid), min_nbr=1, n_iters=50,
    )
    hap = np.asarray(res.hap_irrs).reshape(n, 2)
    phased = np.asarray(res.phased)
    np.testing.assert_allclose(hap[phased].sum(axis=1), irrs[phased], rtol=1e-9)


def test_phasing_min_nbr_gate():
    irrs = jnp.asarray([2.0, 4.0])
    hap_nbrs = [[(2, 1.0)], [], [(0, 1.0)], [(1, 1.0)]]  # sample0 hap1 empty
    nbr_idx, nbr_w, nbr_valid = pad_hap_neighbors(hap_nbrs, 2, dtype=np.float64)
    res = phase_haplotypes(
        irrs, jnp.asarray(nbr_idx), jnp.asarray(nbr_w),
        jnp.asarray(nbr_valid), min_nbr=1, n_iters=10,
    )
    hap = np.asarray(res.hap_irrs)
    assert np.isnan(hap[0]) and np.isnan(hap[1])  # unphased
    assert not np.isnan(hap[2]) and not np.isnan(hap[3])
    np.testing.assert_allclose(float(res.mean_irrs), 4.0)


def test_imputation_matches_host(rng):
    n, max_nbr = 10, 3
    irrs = rng.uniform(1.0, 5.0, size=n).tolist()
    hap_nbrs = _random_hap_nbrs(rng, n, max_nbr)
    ref_hap, ref_mean, _ = phase_gauss_seidel_host(irrs, hap_nbrs, 1, 200)

    nbr_idx, nbr_w, nbr_valid = pad_hap_neighbors(hap_nbrs, max_nbr, dtype=np.float64)
    imp = np.asarray(
        compute_imputed(
            jnp.asarray(ref_hap), jnp.asarray(nbr_idx),
            jnp.asarray(nbr_w), jnp.asarray(nbr_valid),
            jnp.asarray(ref_mean),
        )
    )
    for i in range(n):
        ref0, ref1 = compute_imputed_host(i, ref_hap, hap_nbrs, ref_mean)
        np.testing.assert_allclose(imp[2 * i], ref0, rtol=1e-9)
        np.testing.assert_allclose(imp[2 * i + 1], ref1, rtol=1e-9)


def test_phase_bootstrap(rng):
    import jax

    from grid_tpu.ops.phasing import phase_bootstrap

    n, max_nbr = 10, 4
    irrs = rng.uniform(1.5, 3.5, size=n)
    hap_nbrs = _random_hap_nbrs(rng, n, max_nbr, p_empty=0.1)
    nbr_idx, nbr_w, nbr_valid = pad_hap_neighbors(hap_nbrs, max_nbr, dtype=np.float64)

    mean, std, boot = phase_bootstrap(
        jax.random.PRNGKey(0), jnp.asarray(irrs), jnp.asarray(nbr_idx),
        jnp.asarray(nbr_w), jnp.asarray(nbr_valid), min_nbr=1, n_iters=30,
        n_boot=16,
    )
    mean, std, boot = np.asarray(mean), np.asarray(std), np.asarray(boot)
    assert boot.shape == (16, 2 * n)

    # point estimate for comparison
    from grid_tpu.ops import phase_haplotypes

    point = np.asarray(
        phase_haplotypes(
            jnp.asarray(irrs), jnp.asarray(nbr_idx), jnp.asarray(nbr_w),
            jnp.asarray(nbr_valid), 1, 30,
        ).hap_irrs
    )
    phased_mask = ~np.isnan(point)
    # same haps phased in every replicate (the min_nbr gate is degree-based)
    assert (np.isnan(boot) == ~phased_mask[None, :]).all()
    # bootstrap spread is finite and mean is in a plausible range
    assert np.isfinite(std[phased_mask]).all()
    assert np.isfinite(mean[phased_mask]).all()
    # hap pairs still sum to the IRR in every replicate
    hb = boot[:, phased_mask].reshape(16, -1)
    pair_sums = boot.reshape(16, n, 2).sum(axis=2)
    for b in range(16):
        ok = ~np.isnan(pair_sums[b])
        np.testing.assert_allclose(pair_sums[b][ok], irrs[ok], rtol=1e-6)
