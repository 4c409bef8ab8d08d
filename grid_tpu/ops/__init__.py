from grid_tpu.ops.masked import masked_mean, masked_median, masked_var_numerator
from grid_tpu.ops.normalize import (
    NormalizeResult,
    normalize_cohort,
    select_high_variance_indices,
    select_high_variance_mask,
)
from grid_tpu.ops.knn import (
    filter_regions_by_variance,
    region_filter_mask,
    prepare_z,
    knn_squared,
)
from grid_tpu.ops.dipcn import compute_dipcn
from grid_tpu.ops.select import (
    dipcn_from_distances,
    smallest_k_mask,
    sorted_smallest_k,
)
from grid_tpu.ops.phasing import (
    PhasingResult,
    phase_haplotypes,
    phase_gauss_seidel_host,
    compute_imputed,
)

__all__ = [
    "masked_mean",
    "masked_median",
    "masked_var_numerator",
    "NormalizeResult",
    "normalize_cohort",
    "select_high_variance_indices",
    "select_high_variance_mask",
    "filter_regions_by_variance",
    "region_filter_mask",
    "prepare_z",
    "knn_squared",
    "compute_dipcn",
    "dipcn_from_distances",
    "smallest_k_mask",
    "sorted_smallest_k",
    "PhasingResult",
    "phase_haplotypes",
    "phase_gauss_seidel_host",
    "compute_imputed",
]
