"""ctypes wrapper for the native PBWT IBS neighbor core."""

from __future__ import annotations

import ctypes

import numpy as np

from grid_tpu.native import lib


def pbwt_ibs_neighbors(H, cm, focal, focal_cm, k, max_scan=None, threads=1):
    """Multithreaded C++ twin of :func:`grid_tpu.ops.pbwt.pbwt_ibs_neighbors`
    — identical contract, tie-breaking, and outputs."""
    H = np.ascontiguousarray(H, dtype=np.uint8)
    cm = np.ascontiguousarray(cm, dtype=np.float64)
    n_hap, m = H.shape
    if cm.shape != (m,):
        raise ValueError(f"cm has shape {cm.shape}, expected ({m},)")
    if max_scan is None:
        max_scan = max(4 * k, k + 64)

    idx = np.full((n_hap, k), -1, dtype=np.int32)
    out_len = np.zeros((n_hap, k), dtype=np.float64)
    out_edge = np.zeros((n_hap, k), dtype=np.float64)
    count = np.zeros(n_hap, dtype=np.int32)

    c = ctypes
    rc = lib().grid_ibs_neighbors(
        H.ctypes.data_as(c.POINTER(c.c_uint8)),
        c.c_int32(n_hap),
        c.c_int32(m),
        cm.ctypes.data_as(c.POINTER(c.c_double)),
        c.c_int32(int(focal)),
        c.c_double(float(focal_cm)),
        c.c_int32(int(k)),
        c.c_int32(int(max_scan)),
        c.c_int32(int(threads)),
        idx.ctypes.data_as(c.POINTER(c.c_int32)),
        out_len.ctypes.data_as(c.POINTER(c.c_double)),
        out_edge.ctypes.data_as(c.POINTER(c.c_double)),
        count.ctypes.data_as(c.POINTER(c.c_int32)),
    )
    if rc != 0:
        raise ValueError(f"grid_ibs_neighbors failed with code {rc}")
    return idx, out_len, out_edge, count
