"""CLI surface tests via click's CliRunner (mirrors the reference's
test_pipeline.py CLI coverage, extended to the per-step commands)."""

import numpy as np
import pytest
from click.testing import CliRunner

from grid_tpu.cli import cli


@pytest.fixture
def runner():
    return CliRunner()


def test_help_lists_all_commands(runner):
    result = runner.invoke(cli, ["--help"])
    assert result.exit_code == 0
    for cmd in (
        "wgs", "check-index", "crai", "count-reads", "mosdepth", "normalize",
        "find-neighbors", "compute-dipcn", "hi-inference", "estimate-kiv",
        "synth", "subset", "batch-subset", "batch-crai", "add-gen-map", "devices",
    ):
        assert cmd in result.output, cmd


def test_version(runner):
    result = runner.invoke(cli, ["--version"])
    assert result.exit_code == 0


def test_wgs_requires_existing_config(runner):
    result = runner.invoke(cli, ["wgs", "/nonexistent/config.yaml"])
    assert result.exit_code != 0


def test_synth_then_wgs(runner, tmp_path):
    out = tmp_path / "cohort"
    result = runner.invoke(cli, ["synth", "--out", str(out), "-n", "8"])
    assert result.exit_code == 0, result.output
    assert (out / "config.yaml").exists()

    result = runner.invoke(cli, ["wgs", str(out / "config.yaml")])
    assert result.exit_code == 0, result.output
    assert (out / "results" / "haploid_genotypes.tsv").exists()


def test_single_step_command(runner, tmp_path):
    from grid_tpu.synth import make_synthetic_cohort

    cohort = make_synthetic_cohort(tmp_path, n_samples=6, seed=2)
    result = runner.invoke(cli, ["normalize", str(cohort["config_file"])])
    assert result.exit_code == 0, result.output
    assert (cohort["results_dir"] / "mosdepth_results_normalized.tsv.gz").exists()


def test_estimate_kiv_command(runner, tmp_path):
    a = tmp_path / "exon1a.tsv"
    b = tmp_path / "exon1b.tsv"
    a.write_text("ID\tdipCN\nS1\t1.000000\nS2\t1.100000\n")
    b.write_text("ID\tdipCN\nS1\t2.000000\nS2\t1.900000\n")
    out = tmp_path / "kiv.tsv"
    result = runner.invoke(
        cli, ["estimate-kiv", "--exon1a", str(a), "--exon1b", str(b), "-o", str(out)]
    )
    assert result.exit_code == 0, result.output
    lines = out.read_text().splitlines()
    assert lines[0].startswith("ID\texon1A")
    # S1: 34.9*1 + 5.2*2 - 1 = 44.3
    assert lines[1].split("\t")[3] == "44.3000"


def test_estimate_kiv_no_overlap(runner, tmp_path):
    a = tmp_path / "a.tsv"
    b = tmp_path / "b.tsv"
    a.write_text("ID\tdipCN\nS1\t1.0\n")
    b.write_text("ID\tdipCN\nS2\t1.0\n")
    result = runner.invoke(
        cli, ["estimate-kiv", "--exon1a", str(a), "--exon1b", str(b), "-o", str(tmp_path / "o")]
    )
    assert result.exit_code != 0
    assert "No overlapping samples" in result.output


def test_devices_command(runner):
    result = runner.invoke(cli, ["devices"])
    assert result.exit_code == 0
    assert "backend" in result.output


def test_validate_command(runner, tmp_path):
    from grid_tpu.synth import make_synthetic_cohort

    cohort = make_synthetic_cohort(tmp_path, n_samples=4, seed=0)
    result = runner.invoke(cli, ["validate", str(cohort["config_file"])])
    assert result.exit_code == 0, result.output
    assert "Config OK" in result.output

    bad = tmp_path / "bad.yaml"
    bad.write_text("threads: nope\n")
    result = runner.invoke(cli, ["validate", str(bad)])
    assert result.exit_code != 0


def test_shipped_example_config_schema(tmp_path):
    """The shipped example_config.yaml must satisfy the schema once its
    placeholder paths are made real."""
    from pathlib import Path

    import yaml

    from grid_tpu.config import error_check_config

    cfg = yaml.safe_load(
        (Path(__file__).parent.parent / "grid_tpu" / "example_config.yaml").read_text()
    )
    # materialize placeholder files
    samples = tmp_path / "s.txt"
    samples.write_text("S1\n")
    mask = tmp_path / "m.bed"
    mask.write_text("chr6\t0\t1\n")
    cfg["samples_file"] = str(samples)
    cfg["reference_genome"] = str(samples)
    cfg["mosdepth"]["normalize"]["repeat_mask_file"] = str(mask)
    error_check_config(cfg, console=None)  # must not raise


def test_report_command(runner, tmp_path):
    from grid_tpu.synth import make_synthetic_cohort
    from grid_tpu.pipeline import run_wgs_pipeline

    cohort = make_synthetic_cohort(tmp_path, n_samples=8, seed=1)
    run_wgs_pipeline(console=None, config=str(cohort["config_file"]))
    result = runner.invoke(cli, ["report", str(cohort["results_dir"])])
    assert result.exit_code == 0, result.output
    assert "dipCN: n=8" in result.output
    assert "haploid: n=8" in result.output
