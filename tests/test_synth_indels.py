"""Indel-bearing cohorts: BAM-vs-CRAM ingest parity with non-trivial CIGARs.

Round-3 CIGAR preservation (tests/test_cram_cigar.py) pinned the CRAM
feature codecs record-for-record; this suite closes the loop at PIPELINE
level: a cohort where 30% of reads carry S/I/D/N CIGARs must produce
bit-identical counts, coverage beds, and downstream dipCN whether the
alignments are stored as BAM or CRAM, and whether ingest runs fused or
sequential. This is what mosdepth fast-mode semantics demand: depth spans
come from the CIGAR reference span (ref grid/utils/mosdepth.py:209-225
always passes --fast-mode), so an all-M assumption anywhere in either
container path would shift bins and break this test.
"""

import copy
import gzip
import shutil
from pathlib import Path

import pytest

pytestmark = pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")


def _native_or_skip():
    try:
        from grid_tpu import native

        native.lib()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"native build failed: {e}")


def _run(tmp_path, file_type, fused, n_samples=5, seed=29, indel_frac=0.3):
    from grid_tpu.pipeline import run_wgs_pipeline
    from grid_tpu.synth import make_synthetic_cohort_with_alignments

    cohort = make_synthetic_cohort_with_alignments(
        tmp_path / f"{file_type}_{'fused' if fused else 'seq'}",
        n_samples=n_samples, seed=seed, file_type=file_type,
        indel_frac=indel_frac,
    )
    cfg = copy.deepcopy(cohort["config"])
    cfg.setdefault("device", {})["fused_ingest"] = "true" if fused else "false"
    cfg["compute_haploid_genotypes"]["run"] = False
    run_wgs_pipeline(console=None, config=cfg)
    res = cohort["results_dir"]
    work = Path(cfg["mosdepth"]["work_dir"])
    return {
        "counts": sorted((res / "read_counts.tsv").read_bytes().splitlines()),
        "cov": sorted((res / "mosdepth_results.tsv").read_bytes().splitlines()),
        "beds": {
            b.name: gzip.open(b, "rb").read()
            for b in sorted(work.glob("*.regions.bed.gz"))
        },
        "dip": (res / "diploid_genotypes.tsv").read_bytes(),
    }


def test_indel_cohort_bam_cram_parity(tmp_path):
    """Same seed, same rng stream: the BAM and CRAM containers hold the
    same alignments, so every ingest artifact must match bit-for-bit."""
    _native_or_skip()
    bam = _run(tmp_path, "bam", fused=False)
    cram = _run(tmp_path, "cram", fused=False)
    assert bam["counts"] == cram["counts"]
    assert bam["cov"] == cram["cov"]
    assert set(bam["beds"]) == set(cram["beds"])
    for name in bam["beds"]:
        assert bam["beds"][name] == cram["beds"][name], f"bed differs: {name}"
    assert bam["dip"] == cram["dip"]


@pytest.mark.parametrize("file_type", ["bam", "cram"])
def test_indel_cohort_fused_matches_sequential(tmp_path, file_type):
    """The one-pass native ingest must handle indel CIGARs identically to
    the per-step path (counts by position filter, depth by ref span)."""
    _native_or_skip()
    seq = _run(tmp_path / "s", file_type, fused=False)
    fus = _run(tmp_path / "f", file_type, fused=True)
    assert seq["counts"] == fus["counts"]
    assert seq["cov"] == fus["cov"]
    for name in seq["beds"]:
        assert seq["beds"][name] == fus["beds"][name], f"bed differs: {name}"
    assert seq["dip"] == fus["dip"]


def test_indel_reads_actually_shift_spans(tmp_path):
    """Vacuity guard: the indel cohort's beds must DIFFER from an all-M
    cohort built with the same seed — otherwise the parity tests above
    prove nothing about CIGAR handling."""
    _native_or_skip()
    plain = _run(tmp_path / "p", "bam", fused=False, indel_frac=0.0)
    indel = _run(tmp_path / "i", "bam", fused=False, indel_frac=0.3)
    assert plain["beds"] != indel["beds"]
