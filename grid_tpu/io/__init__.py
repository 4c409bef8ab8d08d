from grid_tpu.io.formats import (
    open_maybe_gz,
    read_samples,
    setup_output_file,
    read_counts_tsv,
    write_counts_row,
    read_normalized_data,
    write_normalized_output,
    read_neighbors,
    write_neighbors,
    read_dipcn,
    write_dipcn,
    write_haploid_output,
)
from grid_tpu.io.bed import norm_chrom, load_repeat_mask, read_regions_bed_gz

__all__ = [
    "open_maybe_gz",
    "read_samples",
    "setup_output_file",
    "read_counts_tsv",
    "write_counts_row",
    "read_normalized_data",
    "write_normalized_output",
    "read_neighbors",
    "write_neighbors",
    "read_dipcn",
    "write_dipcn",
    "write_haploid_output",
    "norm_chrom",
    "load_repeat_mask",
    "read_regions_bed_gz",
]
