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
    fn = l.grid_bed_read
    if not getattr(fn, "_configured", False):
        I64 = c.c_int64
        P64, PD = c.POINTER(I64), c.POINTER(c.c_double)
        fn.restype = c.c_int
        # explicit argtypes: the window coordinates are int64 (ctypes'
        # default int conversion is platform-dependent past 2^31)
        fn.argtypes = [
            c.c_char_p, c.c_char_p, c.c_int, I64, I64,
            c.c_char_p, c.c_int32, P64, P64,
            c.POINTER(P64), c.POINTER(P64), c.POINTER(PD), c.POINTER(I64),
        ]
        fn._configured = True

    chrom_filter = None
    if chromosome:
        normed = chromosome if chromosome.startswith("chr") else f"chr{chromosome}"
        chrom_filter = normed.encode()

    has_window = int(start is not None and end is not None)
    win_start = int(start) if has_window else 0
    win_end = int(end) if has_window else 0

    names, n_mask, offsets_arr, kb_arr = _mask_args(excluded)

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


def _mask_args(excluded):
    c = ctypes
    excluded = excluded or {}
    names = b""
    kb_all: list[int] = []
    offsets = [0]
    for chrom_name, kbs in excluded.items():
        names += chrom_name.encode() + b"\0"
        kb_all.extend(sorted(kbs))
        offsets.append(len(kb_all))
    offsets_arr = (c.c_int64 * len(offsets))(*offsets)
    kb_arr = (c.c_int64 * max(len(kb_all), 1))(*(kb_all or [0]))
    return names, len(excluded), offsets_arr, kb_arr


def read_regions_bed_gz_grouped(path, excluded=None):
    """Native fast path mirroring
    grid_tpu.io.bed.read_regions_bed_gz_grouped: multi-chromosome, no
    window, depth > 0, kb-bin mask on the normalized chrom. Returns a
    list of ``(chrom, starts, ends, depths)`` segments in file order."""
    l = lib()
    c = ctypes
    if not hasattr(l, "grid_bed_read_grouped"):
        raise OSError("stale libgridtpu.so: grid_bed_read_grouped missing")
    fn = l.grid_bed_read_grouped
    if not getattr(fn, "_configured", False):
        I64 = c.c_int64
        P64, PD = c.POINTER(I64), c.POINTER(c.c_double)
        fn.restype = c.c_int
        fn.argtypes = [
            c.c_char_p, c.c_char_p, c.c_int32, P64, P64,
            c.POINTER(P64), c.POINTER(P64), c.POINTER(PD),
            c.POINTER(c.POINTER(c.c_char)), c.POINTER(I64),
            c.POINTER(P64), c.POINTER(I64), c.POINTER(I64),
        ]
        fn._configured = True

    names, n_mask, offsets_arr, kb_arr = _mask_args(excluded)
    p_starts = c.POINTER(c.c_int64)()
    p_ends = c.POINTER(c.c_int64)()
    p_depths = c.POINTER(c.c_double)()
    p_names = c.POINTER(c.c_char)()
    p_bounds = c.POINTER(c.c_int64)()
    names_len = c.c_int64(0)
    n_segs = c.c_int64(0)
    out_n = c.c_int64(0)

    rc = l.grid_bed_read_grouped(
        str(path).encode(), names, n_mask, offsets_arr, kb_arr,
        c.byref(p_starts), c.byref(p_ends), c.byref(p_depths),
        c.byref(p_names), c.byref(names_len), c.byref(p_bounds),
        c.byref(n_segs), c.byref(out_n),
    )
    if rc != 0:
        raise IOError(f"grid_bed_read_grouped({path}) failed with code {rc}")
    n = out_n.value
    k = n_segs.value
    try:
        starts = np.ctypeslib.as_array(p_starts, shape=(n,)).copy() if n else np.empty(0, np.int64)
        ends = np.ctypeslib.as_array(p_ends, shape=(n,)).copy() if n else np.empty(0, np.int64)
        depths = np.ctypeslib.as_array(p_depths, shape=(n,)).copy() if n else np.empty(0, np.float64)
        bounds = (np.ctypeslib.as_array(p_bounds, shape=(k + 1,)).copy()
                  if k else np.zeros(1, np.int64))
        raw_names = c.string_at(p_names, names_len.value) if names_len.value else b""
    finally:
        l.grid_bed_free(p_starts, p_ends, p_depths)
        l.grid_bed_free_grouped(p_names, p_bounds)
    seg_names = raw_names.split(b"\0")[:k]
    return [
        (seg_names[i].decode(),
         starts[bounds[i]:bounds[i + 1]],
         ends[bounds[i]:bounds[i + 1]],
         depths[bounds[i]:bounds[i + 1]])
        for i in range(k)
    ]
