from grid_tpu.models.cohort import CohortParams, CohortOutputs, cohort_step, make_cohort_step
from grid_tpu.models.kiv import estimate_kiv2, get_exon_count, compute_dipcn_for_exon

__all__ = [
    "CohortParams",
    "CohortOutputs",
    "cohort_step",
    "make_cohort_step",
    "estimate_kiv2",
    "get_exon_count",
    "compute_dipcn_for_exon",
]
