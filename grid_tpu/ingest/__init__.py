from grid_tpu.ingest.alignments import (
    count_reads_in_region,
    create_index_for_file,
    find_file,
    find_files,
    has_index,
    available_backends,
)

__all__ = [
    "count_reads_in_region",
    "create_index_for_file",
    "find_file",
    "find_files",
    "has_index",
    "available_backends",
]
