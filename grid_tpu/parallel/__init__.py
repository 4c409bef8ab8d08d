from grid_tpu.parallel.mesh import cohort_mesh, cohort_sharding, replicated_sharding
from grid_tpu.parallel.pstats import normalize_cohort_sharded
from grid_tpu.parallel.pknn import ring_knn
from grid_tpu.parallel.pcohort import sharded_cohort_step, auto_sharded_cohort_step
from grid_tpu.parallel.policy import RING_CROSSOVER_N, choose_cohort_execution

__all__ = [
    "RING_CROSSOVER_N",
    "choose_cohort_execution",
    "cohort_mesh",
    "cohort_sharding",
    "replicated_sharding",
    "normalize_cohort_sharded",
    "ring_knn",
    "sharded_cohort_step",
    "auto_sharded_cohort_step",
]
