from grid_tpu.parallel.mesh import cohort_mesh, cohort_sharding, replicated_sharding
from grid_tpu.parallel.pstats import normalize_cohort_sharded
from grid_tpu.parallel.pknn import ring_knn
from grid_tpu.parallel.pcohort import sharded_cohort_step, auto_sharded_cohort_step

__all__ = [
    "cohort_mesh",
    "cohort_sharding",
    "replicated_sharding",
    "normalize_cohort_sharded",
    "ring_knn",
    "sharded_cohort_step",
    "auto_sharded_cohort_step",
]
