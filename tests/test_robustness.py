"""Fault injection: corrupt/truncated/malformed inputs must degrade the way
the reference does (per-sample skip, per-step log-and-continue) — never
crash the pipeline process."""

import gzip

import numpy as np
import pytest

from grid_tpu.pipeline import run_wgs_pipeline
from grid_tpu.synth import make_synthetic_cohort


def test_truncated_bed_gz_skips_sample(tmp_path):
    cohort = make_synthetic_cohort(tmp_path, n_samples=8, seed=6)
    # truncate one sample's bed.gz mid-stream
    victim = sorted(cohort["work_dir"].glob("*.regions.bed.gz"))[0]
    data = victim.read_bytes()
    victim.write_bytes(data[: len(data) // 2])

    timings = run_wgs_pipeline(console=None, config=str(cohort["config_file"]))
    assert "normalize" in timings
    # pipeline completed; output may carry 7 or 8 rows depending on how much
    # of the truncated stream was readable — both are acceptable degradations
    from grid_tpu.io.formats import read_normalized_data

    ids, _, _, _ = read_normalized_data(
        cohort["results_dir"] / "mosdepth_results_normalized.tsv.gz"
    )
    assert len(ids) >= 7


def test_malformed_rows_are_skipped(tmp_path):
    cohort = make_synthetic_cohort(tmp_path, n_samples=6, seed=8)
    victim = sorted(cohort["work_dir"].glob("*.regions.bed.gz"))[0]
    lines = gzip.open(victim, "rt").read().splitlines()
    lines.insert(3, "chr6\tnot_a_number\t2000\t30.0")
    lines.insert(5, "garbage line with no tabs")
    with gzip.open(victim, "wt") as f:
        f.write("\n".join(lines) + "\n")

    run_wgs_pipeline(console=None, config=str(cohort["config_file"]))
    from grid_tpu.io.formats import read_dipcn

    ids, vals, _ = read_dipcn(cohort["results_dir"] / "diploid_genotypes.tsv")
    assert len(ids) == 6
    assert np.isfinite(vals).all()


def test_empty_samples_file(tmp_path):
    cohort = make_synthetic_cohort(tmp_path, n_samples=5, seed=2)
    cohort["samples_file"].write_text("")
    # staging raises (no files matched) -> step logged, pipeline continues
    timings = run_wgs_pipeline(console=None, config=str(cohort["config_file"]))
    assert isinstance(timings, dict)


def test_missing_ibs_file_continues(tmp_path):
    cohort = make_synthetic_cohort(tmp_path, n_samples=6, seed=3)
    cohort["ibs_file"].unlink()
    timings = run_wgs_pipeline(console=None, config=str(cohort["config_file"]))
    # steps 4-6 ran; step 7 failed per-step
    assert (cohort["results_dir"] / "diploid_genotypes.tsv").exists()
    assert not (cohort["results_dir"] / "haploid_genotypes.tsv").exists()


def test_profiler_hook_smoke(tmp_path, monkeypatch):
    monkeypatch.setenv("GRID_TPU_PROFILE_DIR", str(tmp_path / "traces"))
    cohort = make_synthetic_cohort(tmp_path / "c", n_samples=5, seed=1)
    run_wgs_pipeline(console=None, config=str(cohort["config_file"]))
    # one trace directory per timed step
    assert (tmp_path / "traces").exists()
    assert any((tmp_path / "traces").iterdir())
