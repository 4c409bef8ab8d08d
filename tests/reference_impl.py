"""Independent numpy implementations of the reference formulas, used as the
golden oracle for parity tests (and by bench.py as the CPU baseline).

These are written from the algorithm docs and SURVEY.md math (NOT copied from
the reference); they intentionally use the same NaN-based numpy style so any
divergence in grid_tpu's masked ops is caught at float64.
"""

from __future__ import annotations

import numpy as np


def normalize_matrix_np(mat: np.ndarray):
    """NaN-based normalization oracle (formulas per
    docs/source/algorithms/normalization.rst and
    grid/utils/normalize_mosdepth.py:419-476)."""
    mat = np.array(mat, dtype=float)
    row_means = np.nanmean(mat, axis=1)
    row_means_safe = np.where(row_means == 0, np.nan, row_means)
    mat = (mat.T / row_means_safe).T

    n_inds = mat.shape[0]
    col_means = np.nanmean(mat, axis=0)
    col_vars = np.nansum((mat - col_means) ** 2, axis=0) / (n_inds - 1)

    ratio_mult = 100.0
    with np.errstate(invalid="ignore", divide="ignore"):
        var_ratio = np.where(col_means > 0, ratio_mult * col_vars / col_means, np.nan)

    mu_pos = col_means > 0
    mat[:, mu_pos] = (mat[:, mu_pos] - col_means[mu_pos]) / np.sqrt(col_means[mu_pos])

    valid = var_ratio[~np.isnan(var_ratio)]
    if valid.size > 0:
        med = float(np.median(valid))
        scale = 1.0 / np.sqrt(med / ratio_mult) if med > 0 else 1.0
    else:
        scale = 1.0
    mat *= scale
    return mat, var_ratio, col_means, col_vars, row_means, scale


def select_high_variance_np(var_ratio: np.ndarray, top_frac: float = 0.1):
    """Quirk-Q2 oracle: keep ratios STRICTLY ABOVE the top_frac-rank value."""
    valid_idx = [i for i in range(len(var_ratio)) if not np.isnan(var_ratio[i])]
    if not valid_idx:
        return []
    sorted_vals = sorted(var_ratio[i] for i in valid_idx)
    threshold = sorted_vals[min(int(top_frac * len(sorted_vals)), len(sorted_vals) - 1)]
    return [i for i in valid_idx if var_ratio[i] > threshold]


def knn_np(z: np.ndarray, k: int):
    """Brute-force kNN oracle (squared Euclidean, self excluded, ascending)."""
    n = z.shape[0]
    k = min(k, n - 1)
    d2 = np.sum((z[:, None, :] - z[None, :, :]) ** 2, axis=2)
    np.fill_diagonal(d2, np.inf)
    idx = np.argsort(d2, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(d2, idx, axis=1), idx


def dipcn_np(reads: dict, scales: dict, neighbors: dict, n_nbr: int):
    """dipCN oracle (grid/utils/compute_dipcn.py:62-87 semantics):
    neighbors = {id: [(nbr_id, nbr_scale), ...]}."""
    out = {}
    for sid, nbr_list in neighbors.items():
        scale = scales.get(sid)
        if scale is None or sid not in reads:
            continue
        total, count = 0.0, 0
        for nid, nscale in nbr_list:
            if count >= n_nbr:
                break
            if nid not in reads:
                continue
            total += reads[nid] / nscale
            count += 1
        if count == 0:
            continue
        out[sid] = (reads[sid] / scale) / (total / count)
    return out
