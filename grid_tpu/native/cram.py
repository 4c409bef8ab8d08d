"""ctypes wrappers for the native CRAM reader (C++ twin of io/cramlite)."""

from __future__ import annotations

import ctypes

import numpy as np

from grid_tpu.native import lib


def count_reads_region(path, chrom, start, end, flags, min_mapq=1) -> int:
    """Region read count with the reference filter semantics (CRAI-indexed
    when present; full scan otherwise)."""
    l = lib()
    flag_list = sorted(int(f) for f in flags)
    arr = (ctypes.c_int32 * max(len(flag_list), 1))(*(flag_list or [0]))
    rc = l.grid_cram_count(
        str(path).encode(), str(chrom).encode(), int(start), int(end),
        arr, len(flag_list), int(min_mapq),
    )
    if rc == -4:
        raise ValueError(f"chromosome {chrom!r} not found in {path}")
    if rc < 0:
        raise IOError(f"grid_cram_count({path}) failed with code {rc}")
    return int(rc)


def binned_depth(path, out_bed_gz, bin_size=1000, exclude_flags=1796, min_mapq=0) -> None:
    """mosdepth-fast-mode binned depth -> regions.bed.gz."""
    rc = lib().grid_cram_binned_depth(
        str(path).encode(), str(out_bed_gz).encode(), int(bin_size),
        int(exclude_flags), int(min_mapq),
    )
    if rc != 0:
        raise IOError(f"grid_cram_binned_depth({path}) failed with code {rc}")


def dump_records(path, cap=1_000_000):
    """All records as an int64 array [n, 6]:
    (ref_id, pos, flag, mapq, mate_ref, ref_len) — twin-test surface."""
    out = np.zeros((cap, 6), dtype=np.int64)
    n = lib().grid_cram_dump(
        str(path).encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        int(cap),
    )
    if n < 0:
        raise IOError(f"grid_cram_dump({path}) failed with code {n}")
    return out[: min(n, cap)].copy()
