"""Full seven-step pipeline on a BAM cohort via the native ingestion path:
index creation (BAI), read counting, depth binning, then steps 4-7 —
no pysam, no htslib, no mosdepth binary."""

import shutil

import numpy as np
import pytest

from grid_tpu.io.formats import read_counts_tsv, read_dipcn

pytestmark = pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")


@pytest.fixture(scope="module")
def full_run(tmp_path_factory):
    try:
        from grid_tpu import native

        native.lib()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"native build failed: {e}")

    from grid_tpu.pipeline import run_wgs_pipeline
    from grid_tpu.synth import make_synthetic_cohort_with_alignments

    out = tmp_path_factory.mktemp("bam_cohort")
    cohort = make_synthetic_cohort_with_alignments(out, n_samples=6, seed=5)
    timings = run_wgs_pipeline(console=None, config=str(cohort["config_file"]))
    return cohort, timings


def test_all_steps_ran(full_run):
    cohort, timings = full_run
    assert {
        "create_index",
        "count_reads",
        "mosdepth",
        "normalize",
        "neighbors",
        "compute_diploid_genotypes",
        "compute_haploid_genotypes",
    } <= set(timings)


def test_bai_indexes_created(full_run):
    cohort, _ = full_run
    aln = cohort["config"]["directory_loc"]
    from pathlib import Path

    bams = sorted(Path(aln).glob("*.bam"))
    assert len(bams) == 6
    for bam in bams:
        assert Path(str(bam) + ".bai").exists()


def test_read_counts_scale_with_cn(full_run):
    cohort, _ = full_run
    from pathlib import Path

    counts = read_counts_tsv(Path(cohort["config"]["output_dir"]) / "read_counts.tsv")
    assert set(counts) == set(cohort["ids"])
    # total read count ∝ base_depth * (flank + window*CN/2) — all positive
    assert all(v > 0 for v in counts.values())


def test_coverage_bed_gz_produced(full_run):
    cohort, _ = full_run
    from pathlib import Path

    work = Path(cohort["config"]["mosdepth"]["work_dir"])
    beds = sorted(work.glob("*SYN.regions.bed.gz"))
    assert len(beds) == 6


def test_dipcn_and_haploid_produced(full_run):
    cohort, _ = full_run
    from pathlib import Path

    out_dir = Path(cohort["config"]["output_dir"])
    ids, irrs, _ = read_dipcn(out_dir / "diploid_genotypes.tsv")
    assert len(ids) == 6
    assert np.isfinite(irrs).all()
    hap = (out_dir / "haploid_genotypes.tsv").read_text().splitlines()
    assert len(hap) == 7
