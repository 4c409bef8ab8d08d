"""Shared ctypes plumbing for the fused one-pass ingest wrappers.

grid_bam_ingest_multi and grid_cram_ingest_multi have identical C signatures
and return contracts (see src/bam.cpp for the semantics); this module holds
the one implementation both grid_tpu.native.bam.ingest and
grid_tpu.native.cram.ingest delegate to, so fixes to the buffer sizing /
retry behavior cannot drift.
"""

from __future__ import annotations

import ctypes as _ct

import numpy as np

_ARGTYPES = [
    _ct.c_char_p, _ct.c_char_p, _ct.c_int32, _ct.c_int32, _ct.c_int32,
    _ct.c_int32, _ct.c_char_p, _ct.c_int64, _ct.c_int64,
    _ct.POINTER(_ct.c_int32), _ct.c_int32, _ct.c_int32, _ct.c_char_p,
    _ct.POINTER(_ct.c_int64), _ct.POINTER(_ct.c_int64),
    _ct.POINTER(_ct.c_int32), _ct.POINTER(_ct.c_int64),
    _ct.POINTER(_ct.c_int64), _ct.POINTER(_ct.c_double),
    _ct.c_int64, _ct.POINTER(_ct.c_int64),
    # extra count-only windows (multi-locus sweep)
    _ct.c_char_p, _ct.POINTER(_ct.c_int64), _ct.POINTER(_ct.c_int64),
    _ct.c_int32, _ct.POINTER(_ct.c_int64),
]

_I64P = _ct.POINTER(_ct.c_int64)


def ingest_call(cfn, name, path, out_bed_gz, chrom, start, end, flags,
                count_min_mapq=1, bin_size=1000, exclude_flags=1796,
                bin_min_mapq=0, skip_zero=False, stage_chrom_prefix=None,
                windows=None):
    """Invoke a grid_*_ingest_multi C function; returns
    (count, cov100, starts, ends, depths, refids[, win_counts]).

    ``windows``: optional list of (chrom, start, end) extra count-only
    windows, each counted in the same scan (grid_*_ingest_multi). When
    given, the return tuple gains ``win_counts`` — an int64 array with one
    count per window (-1 marks a window whose chromosome raised in the
    per-format sequential semantics, i.e. CRAM-only; the caller writes an
    Error row for it).
    """
    if not getattr(cfn, "_configured", False):
        cfn.restype = _ct.c_int
        cfn.argtypes = _ARGTYPES
        cfn._configured = True

    flag_list = sorted(int(f) for f in flags)
    arr = (_ct.c_int32 * max(len(flag_list), 1))(*(flag_list or [0]))
    prefix = stage_chrom_prefix
    if prefix is None:
        c = str(chrom)
        prefix = c if c.startswith("chr") else f"chr{c}"

    n_win = len(windows) if windows else 0
    if n_win:
        win_chroms = b"".join(str(w[0]).encode() + b"\0" for w in windows)
        win_starts = np.array([int(w[1]) for w in windows], np.int64)
        win_ends = np.array([int(w[2]) for w in windows], np.int64)
        win_counts = np.zeros(n_win, np.int64)
        wargs = (win_chroms, win_starts.ctypes.data_as(_I64P),
                 win_ends.ctypes.data_as(_I64P), n_win,
                 win_counts.ctypes.data_as(_I64P))
    else:
        win_counts = None
        wargs = (None, None, None, 0, None)

    cap = 4 * ((int(end) - int(start)) // int(bin_size) + 2) + 1024
    for _ in range(3):
        refids = np.empty(cap, np.int32)
        starts = np.empty(cap, np.int64)
        ends = np.empty(cap, np.int64)
        depths = np.empty(cap, np.float64)
        count = _ct.c_int64(0)
        cov100 = _ct.c_int64(0)
        nbins = _ct.c_int64(0)
        rc = cfn(
            str(path).encode(), str(out_bed_gz).encode() if out_bed_gz else b"",
            int(bin_size), int(exclude_flags), int(bin_min_mapq),
            int(bool(skip_zero)), str(chrom).encode(), int(start), int(end),
            arr, len(flag_list), int(count_min_mapq), prefix.encode(),
            _ct.byref(count), _ct.byref(cov100),
            refids.ctypes.data_as(_ct.POINTER(_ct.c_int32)),
            starts.ctypes.data_as(_ct.POINTER(_ct.c_int64)),
            ends.ctypes.data_as(_ct.POINTER(_ct.c_int64)),
            depths.ctypes.data_as(_ct.POINTER(_ct.c_double)),
            cap, _ct.byref(nbins), *wargs,
        )
        if rc == -5:
            cap = int(nbins.value) + 64
            continue
        if rc == -4:
            raise ValueError(f"{name}: chromosome {chrom!r} not found in {path}")
        if rc != 0:
            raise IOError(f"{name}({path}) failed with code {rc}")
        n = int(nbins.value)
        base = (int(count.value), int(cov100.value),
                starts[:n].copy(), ends[:n].copy(), depths[:n].copy(),
                refids[:n].copy())
        return base + (win_counts,) if n_win else base
    raise IOError(f"{name}({path}): staged-bin buffer kept overflowing")
