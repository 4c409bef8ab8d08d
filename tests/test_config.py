"""Config schema/validation tests (mirrors reference test_config.py shape)."""

import pytest

from grid_tpu.config import apply_defaults, error_check_config, load_config


def _minimal_config(tmp_path):
    samples = tmp_path / "samples.txt"
    samples.write_text("S1\n")
    ref = tmp_path / "ref.fa"
    ref.write_text(">chr6\nACGT\n")
    return {
        "samples_file": str(samples),
        "directory_loc": str(tmp_path),
        "reference_genome": str(ref),
        "output_dir": str(tmp_path / "out"),
        "threads": 2,
        "file_type": "cram",
        "chrom": "chr6",
        "start_bp": 160605062,
        "end_bp": 160647661,
        "output_file_type": "tsv",
        "index": {"run": False},
        "count_reads": {"run": False},
        "mosdepth": {"run": False, "normalize": {"run": False}, "neighbors": {"run": False}},
        "compute_diploid_genotypes": {"run": False},
        "compute_haploid_genotypes": {"run": False},
    }


def test_valid_config_passes(tmp_path):
    error_check_config(_minimal_config(tmp_path), console=None)


def test_missing_top_level_field_raises(tmp_path):
    cfg = _minimal_config(tmp_path)
    del cfg["chrom"]
    with pytest.raises(ValueError, match="config error"):
        error_check_config(cfg, console=None)


def test_wrong_type_raises(tmp_path):
    cfg = _minimal_config(tmp_path)
    cfg["threads"] = "four"
    with pytest.raises(ValueError):
        error_check_config(cfg, console=None)


def test_missing_file_raises(tmp_path):
    cfg = _minimal_config(tmp_path)
    cfg["samples_file"] = str(tmp_path / "nope.txt")
    with pytest.raises(ValueError):
        error_check_config(cfg, console=None)


def test_gated_step_required_field(tmp_path):
    cfg = _minimal_config(tmp_path)
    cfg["count_reads"] = {"run": True}  # missing required 'flags'
    with pytest.raises(ValueError, match="config error"):
        error_check_config(cfg, console=None)


def test_required_repeat_mask_when_normalize_enabled(tmp_path):
    cfg = _minimal_config(tmp_path)
    cfg["mosdepth"]["normalize"] = {"run": True}
    with pytest.raises(ValueError, match="config error"):
        error_check_config(cfg, console=None)


def test_disabled_step_not_validated(tmp_path):
    cfg = _minimal_config(tmp_path)
    cfg["count_reads"] = {"run": False}  # no flags needed when disabled
    error_check_config(cfg, console=None)


def test_apply_defaults(tmp_path):
    cfg = _minimal_config(tmp_path)
    cfg["mosdepth"] = {
        "run": True,
        "normalize": {"run": True, "repeat_mask_file": cfg["samples_file"]},
        "neighbors": {"run": True},
    }
    full = apply_defaults(cfg)
    assert full["mosdepth"]["bin_size"] == 1000
    assert full["mosdepth"]["normalize"]["min_depth"] == 20
    assert full["mosdepth"]["normalize"]["top_frac"] == 0.1
    assert full["mosdepth"]["neighbors"]["zmax"] == 2.0
    assert full["mosdepth"]["neighbors"]["frac_r"] == 1.0
    assert full["mosdepth"]["work_dir"].endswith("mosdepth_workdir")
    assert full["device"]["dtype"] == "auto"
    # original untouched
    assert "bin_size" not in cfg["mosdepth"]


def test_load_config_yaml(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("threads: 3\nchrom: chr6\n")
    cfg = load_config(p)
    assert cfg == {"threads": 3, "chrom": "chr6"}
