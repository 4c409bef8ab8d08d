"""Pipeline steps: config-driven wrappers around ops + io.

Each step has the reference signature ``step(config, console=None)`` and is
exchange-compatible at the file level with the corresponding reference step
(SURVEY §2.1), so cohorts can move between the two frameworks mid-pipeline.
"""

from grid_tpu.steps.index import check_index, create_index
from grid_tpu.steps.count_reads import count_reads
from grid_tpu.steps.coverage import compute_mosdepth
from grid_tpu.steps.normalize import normalize_mosdepth
from grid_tpu.steps.neighbors import find_neighbors
from grid_tpu.steps.dipcn import compute_diploid_genotypes
from grid_tpu.steps.haploid import hi_inference

__all__ = [
    "check_index",
    "create_index",
    "count_reads",
    "compute_mosdepth",
    "normalize_mosdepth",
    "find_neighbors",
    "compute_diploid_genotypes",
    "hi_inference",
]
