"""grid_tpu native layer: C++ (zlib-only) ingestion accelerators.

Builds ``libgridtpu.so`` on first import via the bundled Makefile (g++ -O3,
links only zlib) and exposes ctypes wrappers:

- :mod:`grid_tpu.native.bedgz` — fast regions.bed.gz scanning;
- :mod:`grid_tpu.native.bam` — BAM region read counting (BAI-indexed),
  mosdepth-fast-mode binned depth, and BAI index construction.

Import failures (no compiler, build error) are swallowed by callers — every
native path has a pure-Python fallback, so the framework degrades gracefully
rather than hard-failing.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

_HERE = Path(__file__).resolve().parent
_LIB_PATH = _HERE / "libgridtpu.so"
_LOCK = threading.RLock()
_LIB = None


def _needs_build() -> bool:
    if not _LIB_PATH.exists():
        return True
    lib_mtime = _LIB_PATH.stat().st_mtime
    for src in (_HERE / "src").glob("*"):
        if src.stat().st_mtime > lib_mtime:
            return True
    return False


def build(force: bool = False) -> Path:
    """Compile the native library (no-op when up to date)."""
    with _LOCK:
        if force or _needs_build():
            subprocess.run(
                ["make", "-s"] + (["clean"] if force else []),
                cwd=_HERE,
                check=True,
                capture_output=True,
            )
            if force:
                subprocess.run(["make", "-s"], cwd=_HERE, check=True, capture_output=True)
    return _LIB_PATH


def lib() -> ctypes.CDLL:
    """The loaded native library (builds on demand)."""
    global _LIB
    if _LIB is None:
        with _LOCK:
            if _LIB is None:
                path = build()
                _LIB = ctypes.CDLL(str(path))
                _configure(_LIB)
    return _LIB


def _configure(l: ctypes.CDLL) -> None:
    c = ctypes
    l.grid_bed_read.restype = c.c_int
    l.grid_bed_read.argtypes = [
        c.c_char_p, c.c_char_p, c.c_int, c.c_int64, c.c_int64,
        c.c_char_p, c.c_int32, c.POINTER(c.c_int64), c.POINTER(c.c_int64),
        c.POINTER(c.POINTER(c.c_int64)), c.POINTER(c.POINTER(c.c_int64)),
        c.POINTER(c.POINTER(c.c_double)), c.POINTER(c.c_int64),
    ]
    l.grid_bed_free.restype = None
    l.grid_bed_free.argtypes = [
        c.POINTER(c.c_int64), c.POINTER(c.c_int64), c.POINTER(c.c_double)
    ]
    l.grid_bam_count.restype = c.c_int64
    l.grid_bam_count.argtypes = [
        c.c_char_p, c.c_char_p, c.c_int64, c.c_int64,
        c.POINTER(c.c_int32), c.c_int32, c.c_int32,
    ]
    l.grid_bam_binned_depth.restype = c.c_int
    l.grid_bam_binned_depth.argtypes = [
        c.c_char_p, c.c_char_p, c.c_int32, c.c_int32, c.c_int32, c.c_int32
    ]
    l.grid_bam_build_bai.restype = c.c_int
    l.grid_bam_build_bai.argtypes = [c.c_char_p, c.c_char_p]
    l.grid_bam_refs.restype = c.c_int32
    l.grid_bam_refs.argtypes = [
        c.c_char_p, c.c_char_p, c.c_int64, c.POINTER(c.c_int32), c.c_int32
    ]
    l.grid_cram_count.restype = c.c_int64
    l.grid_cram_count.argtypes = [
        c.c_char_p, c.c_char_p, c.c_int64, c.c_int64,
        c.POINTER(c.c_int32), c.c_int32, c.c_int32,
    ]
    l.grid_cram_binned_depth.restype = c.c_int
    l.grid_cram_binned_depth.argtypes = [
        c.c_char_p, c.c_char_p, c.c_int32, c.c_int32, c.c_int32, c.c_int32
    ]
    l.grid_cram_dump.restype = c.c_int64
    l.grid_cram_dump.argtypes = [c.c_char_p, c.POINTER(c.c_int64), c.c_int64]
    l.grid_cram_write.restype = c.c_int
    l.grid_cram_write.argtypes = [
        c.c_char_p, c.POINTER(c.c_uint8), c.c_int64, c.c_int64,
        c.POINTER(c.c_int32), c.POINTER(c.c_int32), c.POINTER(c.c_int64),
        c.POINTER(c.c_int32), c.POINTER(c.c_int32), c.POINTER(c.c_int32),
        c.POINTER(c.c_int64), c.POINTER(c.c_int32),
        c.POINTER(c.c_uint8), c.POINTER(c.c_int64),
        c.POINTER(c.c_uint8), c.POINTER(c.c_int64),
        c.POINTER(c.c_uint8), c.POINTER(c.c_int64),
        c.POINTER(c.c_uint32), c.POINTER(c.c_int64),
        c.c_int32, c.c_char_p,
    ]
    l.grid_ibs_neighbors.restype = c.c_int
    l.grid_ibs_neighbors.argtypes = [
        c.POINTER(c.c_uint8), c.c_int32, c.c_int32, c.POINTER(c.c_double),
        c.c_int32, c.c_double, c.c_int32, c.c_int32, c.c_int32,
        c.POINTER(c.c_int32), c.POINTER(c.c_double), c.POINTER(c.c_double),
        c.POINTER(c.c_int32),
    ]
