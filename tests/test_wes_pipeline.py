"""WES pipeline end-to-end: exon FASTA + alignments + neighbors -> realign
-> per-exon dipCN -> KIV-2 estimates, via the config-driven orchestrator
(the reference ships only a commented-out WES stub; grid/cli.py:94-113)."""

import shutil

import numpy as np
import pytest
import yaml
from click.testing import CliRunner

from grid_tpu.cli import cli

pytestmark = pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")


def _seq(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


@pytest.fixture(scope="module")
def wes_world(tmp_path_factory):
    from grid_tpu.io.bamlite import encode_record, write_bam

    rng = np.random.default_rng(21)
    base = tmp_path_factory.mktemp("wes")
    backbone = _seq(rng, 120)
    exons = {
        "1A": _seq(rng, 120),
        "1B_KIV3": backbone[:60] + _seq(rng, 10) + backbone[70:],
        "1B_KIV2": backbone[:60] + _seq(rng, 10) + backbone[70:],
    }
    fasta = base / "exons.fa"
    with open(fasta, "w") as f:
        for name, s in exons.items():
            f.write(f">{name}\n{s}\n")

    aln = base / "aln"
    aln.mkdir()
    samples = {"WES1": 10, "WES2": 16, "WES3": 22}
    for sid, n_per in samples.items():
        reads = []
        for label in ("1A", "1B_KIV3", "1B_KIV2"):
            s = exons[label]
            for _ in range(n_per):
                start = int(rng.integers(0, len(s) - 50))
                reads.append(s[start : start + 50])
        recs = [
            encode_record(0, int(1000 + i % 900), 99, read_name=f"{sid}r{i}", seq=r)
            for i, r in enumerate(reads)
        ]
        recs.sort(key=lambda r: int.from_bytes(r[8:12], "little"))
        write_bam(aln / f"{sid}.bam", [("chr6", 10_000)], recs)

    samples_file = base / "samples.txt"
    samples_file.write_text("".join(f"{s}\n" for s in samples))
    nbr_file = base / "nbrs.tsv"
    ids = list(samples)
    with open(nbr_file, "w") as f:
        for i, sid in enumerate(ids):
            others = [x for x in ids if x != sid]
            row = [sid, "1.00"]
            for o in others:
                row += [o, "1.00", "0.10"]
            f.write("\t".join(row) + "\n")

    results = base / "results"
    config = {
        "samples_file": str(samples_file),
        "directory_loc": str(aln),
        "reference_genome": str(samples_file),  # placeholder existing file
        "output_dir": str(results),
        "threads": 2,
        "file_type": "bam",
        "chrom": "chr6",
        "start_bp": 0,
        "end_bp": 10_000,
        "output_file_type": "tsv",
        "index": {"run": False},
        "realign": {"run": True, "exon_fasta": str(fasta), "min_score": 60,
                    "output_file_prefix": "exon_counts"},
        "exon_dipcn": {"run": True, "neighbors_file": str(nbr_file),
                       "n_neighbors": 5, "output_file_prefix": "exon_dipcn"},
        "estimate_kiv": {"run": True, "output_file_prefix": "kiv2_estimates"},
    }
    config_file = base / "wes_config.yaml"
    with open(config_file, "w") as f:
        yaml.safe_dump(config, f, sort_keys=False)
    return base, config, config_file, samples


def test_wes_pipeline_end_to_end(wes_world):
    from grid_tpu.pipeline import run_wes_pipeline

    base, config, config_file, samples = wes_world
    timings = run_wes_pipeline(console=None, config=str(config_file))
    assert {"realign", "exon_dipcn", "estimate_kiv"} <= set(timings)

    results = base / "results"
    counts = (results / "exon_counts.tsv").read_text().splitlines()
    assert len(counts) == 3
    for exon in ("1A", "1B"):
        assert (results / f"exon_dipcn.{exon}.tsv").exists()

    kiv = (results / "kiv2_estimates.tsv").read_text().splitlines()
    assert kiv[0].split("\t") == ["ID", "exon1A", "exon1B", "dip_estimate", "estimate"]
    rows = {line.split("\t")[0]: [float(v) for v in line.split("\t")[1:]] for line in kiv[1:]}
    assert set(rows) == set(samples)
    # read counts scale ~ {10,16,22}: the dipCN (vs neighbor mean) must rank
    # samples by their planted depth
    est = {s: rows[s][3] for s in rows}
    assert est["WES1"] < est["WES2"] < est["WES3"]
    assert all(np.isfinite(v) for vals in rows.values() for v in vals)


def test_wes_cli(wes_world):
    base, _, config_file, _ = wes_world
    res = CliRunner().invoke(cli, ["wes", str(config_file)])
    assert res.exit_code == 0, res.output


def test_wes_config_validation(wes_world, tmp_path):
    from grid_tpu.config import WES_SCHEMA, error_check_config

    _, config, _, _ = wes_world
    bad = dict(config)
    bad["realign"] = {"run": True, "exon_fasta": str(tmp_path / "missing.fa")}
    with pytest.raises(ValueError, match="config error"):
        error_check_config(bad, None, schema=WES_SCHEMA)
    # gated off: the missing file must NOT error
    off = dict(config)
    off["realign"] = {"run": False, "exon_fasta": str(tmp_path / "missing.fa")}
    error_check_config(off, None, schema=WES_SCHEMA)


def test_wes_step_failure_continues(wes_world, tmp_path):
    """Reference failure semantics: a failing step logs and the pipeline
    continues (downstream steps fail on missing inputs, never crash)."""
    from grid_tpu.pipeline import run_wes_pipeline

    _, config, _, _ = wes_world
    broken = yaml.safe_load(yaml.safe_dump(config))
    broken["output_dir"] = str(tmp_path / "res")
    broken["directory_loc"] = str(tmp_path / "empty")  # no alignments
    (tmp_path / "empty").mkdir()
    timings = run_wes_pipeline(console=None, config=broken)
    assert isinstance(timings, dict)
    assert not (tmp_path / "res" / "kiv2_estimates.tsv").exists()