"""ctypes wrapper for the native regions.bed.gz reader."""

from __future__ import annotations

import ctypes

import numpy as np

from grid_tpu.native import lib


def read_regions_bed_gz(path, chromosome=None, start=None, end=None, excluded=None):
    """Native fast path mirroring grid_tpu.io.bed.read_regions_bed_gz.

    Returns (starts int64, ends int64, depths float64) numpy arrays.
    """
    l = lib()
    c = ctypes

    chrom_filter = None
    if chromosome:
        normed = chromosome if chromosome.startswith("chr") else f"chr{chromosome}"
        chrom_filter = normed.encode()

    has_window = int(start is not None and end is not None)
    win_start = int(start) if has_window else 0
    win_end = int(end) if has_window else 0

    excluded = excluded or {}
    names = b""
    offsets = [0]
    kb_all: list[int] = []
    for chrom_name, kbs in excluded.items():
        names += chrom_name.encode() + b"\0"
        kb_all.extend(sorted(kbs))
        offsets.append(len(kb_all))
    n_mask = len(excluded)
    offsets_arr = (c.c_int64 * len(offsets))(*offsets)
    kb_arr = (c.c_int64 * max(len(kb_all), 1))(*(kb_all or [0]))

    p_starts = c.POINTER(c.c_int64)()
    p_ends = c.POINTER(c.c_int64)()
    p_depths = c.POINTER(c.c_double)()
    out_n = c.c_int64(0)

    rc = l.grid_bed_read(
        str(path).encode(),
        chrom_filter,
        has_window,
        win_start,
        win_end,
        names,
        n_mask,
        offsets_arr,
        kb_arr,
        c.byref(p_starts),
        c.byref(p_ends),
        c.byref(p_depths),
        c.byref(out_n),
    )
    if rc != 0:
        raise IOError(f"grid_bed_read({path}) failed with code {rc}")
    n = out_n.value
    try:
        starts = np.ctypeslib.as_array(p_starts, shape=(n,)).copy() if n else np.empty(0, np.int64)
        ends = np.ctypeslib.as_array(p_ends, shape=(n,)).copy() if n else np.empty(0, np.int64)
        depths = np.ctypeslib.as_array(p_depths, shape=(n,)).copy() if n else np.empty(0, np.float64)
    finally:
        l.grid_bed_free(p_starts, p_ends, p_depths)
    return starts, ends, depths
