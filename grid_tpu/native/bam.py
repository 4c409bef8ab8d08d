"""ctypes wrappers for the native BAM machinery."""

from __future__ import annotations

import ctypes

from grid_tpu.native import lib


def count_reads_region(path, chrom, start, end, flags, min_mapq=1) -> int:
    """Count reads in [start, end) with the reference filter semantics
    (BAI-indexed when an index is present; full scan otherwise)."""
    l = lib()
    flag_list = sorted(int(f) for f in flags)
    arr = (ctypes.c_int32 * max(len(flag_list), 1))(*(flag_list or [0]))
    rc = l.grid_bam_count(
        str(path).encode(), str(chrom).encode(), int(start), int(end),
        arr, len(flag_list), int(min_mapq),
    )
    if rc < 0:
        raise IOError(f"grid_bam_count({path}) failed with code {rc}")
    return int(rc)


def binned_depth(path, out_bed_gz, bin_size=1000, exclude_flags=1796,
                 min_mapq=0, skip_zero=False) -> None:
    """mosdepth-fast-mode binned depth -> regions.bed.gz. ``skip_zero``
    omits zero-depth bins (downstream readers drop them anyway; big IO win
    for locus-subset cohorts)."""
    rc = lib().grid_bam_binned_depth(
        str(path).encode(), str(out_bed_gz).encode(), int(bin_size),
        int(exclude_flags), int(min_mapq), int(bool(skip_zero)),
    )
    if rc != 0:
        raise IOError(f"grid_bam_binned_depth({path}) failed with code {rc}")


def build_bai(path, out_path=None) -> str:
    """Build a BAI index for a coordinate-sorted BAM."""
    out_path = out_path or (str(path) + ".bai")
    rc = lib().grid_bam_build_bai(str(path).encode(), str(out_path).encode())
    if rc != 0:
        raise IOError(f"grid_bam_build_bai({path}) failed with code {rc}")
    return str(out_path)


def references(path, max_refs=1024):
    """[(name, length)] from the BAM header."""
    l = lib()
    cap = 1 << 20
    names_buf = ctypes.create_string_buffer(cap)
    lens = (ctypes.c_int32 * max_refs)()
    n = l.grid_bam_refs(str(path).encode(), names_buf, cap, lens, max_refs)
    if n < 0:
        raise IOError(f"grid_bam_refs({path}) failed with code {n}")
    out = []
    off = 0
    raw = names_buf.raw
    for i in range(n):
        end = raw.index(b"\0", off)
        out.append((raw[off:end].decode(), int(lens[i])))
        off = end + 1
    return out


def subset_region(path, chrom, start, end, out_path) -> int:
    """Write records overlapping [start, end) to a new BAM (native BGZF
    writer). Returns the number of records written."""
    import ctypes as _ct

    l = lib()
    l.grid_bam_subset.restype = _ct.c_int64
    l.grid_bam_subset.argtypes = [_ct.c_char_p, _ct.c_char_p, _ct.c_int64, _ct.c_int64, _ct.c_char_p]
    rc = l.grid_bam_subset(
        str(path).encode(), str(chrom).encode(), int(start), int(end), str(out_path).encode()
    )
    if rc == -4:
        raise ValueError(f"chromosome {chrom!r} not found in {path}")
    if rc < 0:
        raise IOError(f"grid_bam_subset({path}) failed with code {rc}")
    return int(rc)


def fetch_reads(path, chrom, start, end, exclude_flags=1796, min_mapq=0):
    """Fetch reads with pos in [start, end): returns (positions int64,
    flags int32, mapqs int32, seqs list[str])."""
    import ctypes as _ct

    import numpy as np

    l = lib()
    if not hasattr(l.grid_bam_fetch, "_configured"):
        l.grid_bam_fetch.restype = _ct.c_int64
        l.grid_bam_fetch.argtypes = [
            _ct.c_char_p, _ct.c_char_p, _ct.c_int64, _ct.c_int64,
            _ct.c_int32, _ct.c_int32,
            _ct.POINTER(_ct.POINTER(_ct.c_int64)),
            _ct.POINTER(_ct.POINTER(_ct.c_int32)),
            _ct.POINTER(_ct.POINTER(_ct.c_int32)),
            _ct.POINTER(_ct.c_char_p),
            _ct.POINTER(_ct.POINTER(_ct.c_int64)),
        ]
        l.grid_bam_fetch_free.restype = None
        l.grid_bam_fetch_free.argtypes = [
            _ct.POINTER(_ct.c_int64), _ct.POINTER(_ct.c_int32),
            _ct.POINTER(_ct.c_int32), _ct.c_char_p, _ct.POINTER(_ct.c_int64),
        ]
        l.grid_bam_fetch._configured = True

    p_pos = _ct.POINTER(_ct.c_int64)()
    p_flag = _ct.POINTER(_ct.c_int32)()
    p_mapq = _ct.POINTER(_ct.c_int32)()
    p_seq = _ct.c_char_p()
    p_off = _ct.POINTER(_ct.c_int64)()
    n = l.grid_bam_fetch(
        str(path).encode(), str(chrom).encode(), int(start), int(end),
        int(exclude_flags), int(min_mapq),
        _ct.byref(p_pos), _ct.byref(p_flag), _ct.byref(p_mapq),
        _ct.byref(p_seq), _ct.byref(p_off),
    )
    if n < 0:
        raise IOError(f"grid_bam_fetch({path}) failed with code {n}")
    try:
        pos = np.ctypeslib.as_array(p_pos, shape=(n,)).copy() if n else np.empty(0, np.int64)
        flags = np.ctypeslib.as_array(p_flag, shape=(n,)).copy() if n else np.empty(0, np.int32)
        mapqs = np.ctypeslib.as_array(p_mapq, shape=(n,)).copy() if n else np.empty(0, np.int32)
        offs = np.ctypeslib.as_array(p_off, shape=(n + 1,)).copy()
        total = int(offs[-1])
        raw = _ct.string_at(p_seq, total) if total else b""
        seqs = [raw[offs[i]:offs[i + 1]].decode() for i in range(n)]
    finally:
        # p_seq is c_char_p; recover the raw pointer for free via cast
        l.grid_bam_fetch_free(p_pos, p_flag, p_mapq, _ct.cast(p_seq, _ct.c_char_p), p_off)
    return pos, flags, mapqs, seqs


def ingest(path, out_bed_gz, chrom, start, end, flags, count_min_mapq=1,
           bin_size=1000, exclude_flags=1796, bin_min_mapq=0,
           skip_zero=False, stage_chrom_prefix=None, windows=None):
    """Fused one-pass ingest for BAM (C side: grid_bam_ingest_multi;
    semantics and per-output parity contracts documented in src/bam.cpp).
    Returns (count, cov100, starts, ends, depths, refids): the step-2 window
    read count, the step-3 coverage int, and the staged window bins
    (depth > 0, rounded-as-written; refids index into ``references(path)``).
    ``windows`` — optional extra count-only (chrom, start, end) windows (the
    multi-locus sweep), counted in the SAME scan; when given, the tuple
    gains a per-window int64 count array."""
    from grid_tpu.native._ingest import ingest_call

    return ingest_call(
        lib().grid_bam_ingest_multi, "grid_bam_ingest_multi", path,
        out_bed_gz, chrom, start, end,
        flags, count_min_mapq, bin_size, exclude_flags, bin_min_mapq,
        skip_zero, stage_chrom_prefix, windows=windows,
    )
