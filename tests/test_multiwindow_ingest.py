"""Multi-window counting inside the fused one-pass ingest.

The multi-locus sweep's step-2 counts for EVERY catalog locus are byproducts
of the one genome scan (native grid_*_ingest_multi); each window's count must
equal the standalone single-window counter on the same file
(grid/utils/count_reads.py:96-107 filter semantics).
"""

from __future__ import annotations

import pytest

FLAGS = [83, 147, 99, 163]


def _native_or_skip():
    try:
        from grid_tpu import native

        native.lib()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"native build failed: {e}")


def _one_sample(tmp_path, file_type, seed=7):
    from grid_tpu.synth import make_synthetic_cohort_with_alignments

    cohort = make_synthetic_cohort_with_alignments(
        tmp_path, n_samples=2, seed=seed, file_type=file_type
    )
    cfg = cohort["config"]
    import glob

    paths = sorted(glob.glob(f"{cfg['directory_loc']}/*.{file_type}"))
    assert paths
    return paths[0], cfg


@pytest.mark.parametrize("file_type", ["bam", "cram"])
def test_multi_window_counts_match_single(tmp_path, file_type):
    _native_or_skip()
    from grid_tpu.native import bam as nbam, cram as ncram

    backend = nbam if file_type == "bam" else ncram
    path, cfg = _one_sample(tmp_path, file_type)
    chrom, start, end = cfg["chrom"], cfg["start_bp"], cfg["end_bp"]

    windows = [
        (chrom, start, end),                      # the primary window itself
        (chrom, start + 2000, start + 5000),      # interior sub-window
        (chrom.removeprefix("chr"), start, end),  # chr/no-chr alternate
        (chrom, end + 10_000_000, end + 10_001_000),  # empty window
        (chrom, start - 1500, start + 1500),      # straddles the window edge
    ]
    out = backend.ingest(
        path, "", chrom, start, end, FLAGS, windows=windows
    )
    count, win_counts = out[0], out[6]
    assert len(win_counts) == len(windows)
    # window 0 is the primary window: identical to the fused single count
    assert win_counts[0] == count
    for w, (c, s, e) in enumerate(windows):
        # per-format sequential parity: when the standalone counter raises
        # (CRAM exact-name semantics), the window marks -1 (=> Error row)
        try:
            expect = backend.count_reads_region(path, c, s, e, FLAGS, min_mapq=1)
        except ValueError:
            expect = -1
        assert win_counts[w] == expect, f"window {w} ({c}:{s}-{e})"
    assert win_counts[1] > 0  # sub-window is non-trivial on this cohort
    assert win_counts[3] == 0


@pytest.mark.parametrize("file_type", ["bam", "cram"])
def test_multi_window_missing_chrom(tmp_path, file_type):
    """Absent chromosome: BAM counts 0 (grid_bam_count parity), CRAM marks
    -1 so the caller writes an Error row (sequential CRAM count raises)."""
    _native_or_skip()
    from grid_tpu.native import bam as nbam, cram as ncram

    backend = nbam if file_type == "bam" else ncram
    path, cfg = _one_sample(tmp_path, file_type, seed=9)
    chrom, start, end = cfg["chrom"], cfg["start_bp"], cfg["end_bp"]

    out = backend.ingest(
        path, "", chrom, start, end, FLAGS,
        windows=[("chrNOPE", 0, 1000), (chrom, start, end)],
    )
    win_counts = out[6]
    assert win_counts[0] == (0 if file_type == "bam" else -1)
    assert win_counts[1] == out[0]


def test_no_windows_keeps_tuple_shape(tmp_path):
    """windows=None returns the classic 6-tuple (no API break)."""
    _native_or_skip()
    from grid_tpu.native import bam as nbam

    path, cfg = _one_sample(tmp_path, "bam", seed=5)
    out = nbam.ingest(
        path, "", cfg["chrom"], cfg["start_bp"], cfg["end_bp"], FLAGS
    )
    assert len(out) == 6
