"""Locus catalog (bundled data tables) + multi-locus sweep tests.

Covers VERDICT r1 items #21 (ship the 734-region catalog /
hardcoded_positions data) and the multi-locus batch mode built on them.
"""

from pathlib import Path

import pytest

from grid_tpu.data.loci import (
    BUNDLED_CATALOG,
    BUNDLED_HARDCODED_POSITIONS,
    KIV2_REPEAT_STARTS_HG38,
    load_vntr_catalog,
    resolve_locus,
)


def test_bundled_catalog_loads():
    assert BUNDLED_CATALOG.exists()
    loci = load_vntr_catalog()  # default = bundled copy
    assert len(loci) == 734
    genes = {l.gene for l in loci}
    assert "LPA" in genes


def test_resolve_lpa_matches_reference_coordinates():
    # ref examples/1000G_example.sh:87 awk-parses these from the catalog
    lpa = resolve_locus("LPA")
    assert (lpa.chrom, lpa.start, lpa.end) == ("chr6", 160_605_062, 160_647_661)


def test_resolve_comma_separated_gene_lists():
    # catalog rows like "AC005324.4,ZNF286A" must match either member
    hit = resolve_locus("ZNF286A")
    assert "ZNF286A" in hit.gene.split(",")


def test_resolve_unknown_raises_with_hint():
    with pytest.raises(KeyError, match="LPA"):
        resolve_locus("LPa")  # case mismatch -> suggestion includes LPA


def test_hardcoded_positions_bundled_and_consistent():
    assert BUNDLED_HARDCODED_POSITIONS.exists()
    lines = BUNDLED_HARDCODED_POSITIONS.read_text().splitlines()[1:]
    hg38 = tuple(int(l.split()[0]) for l in lines if l.strip())
    assert hg38 == KIV2_REPEAT_STARTS_HG38


@pytest.fixture(scope="module")
def mini_catalog(tmp_path_factory):
    p = tmp_path_factory.mktemp("cat") / "catalog.txt"
    p.write_text(
        "CHR\tBP_START_HG38\tBP_END_HG38\tSAMTOOLS_START_HG38\t"
        "SAMTOOLS_END_HG38\tIBD2R\tGENE\n"
        "6\t160605000\t160610000\t160605000\t160610000\t0.9\tGENEA\n"
        "6\t160610000\t160615000\t160610000\t160615000\t0.8\tGENEB\n"
    )
    return p


def test_multi_locus_sweep(tmp_path, mini_catalog):
    """Shared steps run once; per-locus counts/dipCN/haploid artifacts are
    .GENE-suffixed and all non-empty."""
    from grid_tpu.steps.multilocus import run_multi_locus
    from grid_tpu.synth import make_synthetic_cohort_with_alignments

    cohort = make_synthetic_cohort_with_alignments(tmp_path, n_samples=6, seed=5)
    loci = run_multi_locus(
        cohort["config"], ["GENEA", "GENEB"], console=None, catalog=mini_catalog
    )
    assert set(loci) == {"GENEA", "GENEB"}
    results = Path(cohort["results_dir"])
    # shared artifacts (one copy, unsuffixed)
    assert (results / "mosdepth_results_normalized.tsv.gz").exists()
    assert (results / "neighbor_coverage.zMax2.0.tsv.gz").exists()
    for gene in ("GENEA", "GENEB"):
        counts = results / f"read_counts.{gene}.tsv"
        dip = results / f"diploid_genotypes.{gene}.tsv"
        hap = results / f"haploid_genotypes.{gene}.tsv"
        assert counts.exists() and dip.exists() and hap.exists()
        assert len(dip.read_text().splitlines()) >= 4  # header + samples
        header = counts.read_text().splitlines()[0]
        assert gene == "GENEA" and "160605000-160610000" in header or (
            gene == "GENEB" and "160610000-160615000" in header
        )


def test_wgs_locus_flag_overrides_window(tmp_path):
    """`wgs --locus` resolves coordinates from the catalog into the config."""
    from click.testing import CliRunner

    from grid_tpu.cli import cli
    from grid_tpu.synth import make_synthetic_cohort
    import yaml

    cohort = make_synthetic_cohort(tmp_path, n_samples=8, seed=1)
    cfg_path = cohort["config_file"]
    runner = CliRunner()
    res = runner.invoke(cli, ["wgs", str(cfg_path), "--locus", "NOTAGENE"])
    assert res.exit_code != 0 and "not in the VNTR catalog" in res.output

    # with the real catalog LPA resolves; the synthetic bins cover that
    # window so the pipeline still runs end to end
    res = runner.invoke(cli, ["wgs", str(cfg_path), "--locus", "LPA"])
    assert res.exit_code == 0, res.output
    cfg = yaml.safe_load(Path(cfg_path).read_text())
    out = Path(cfg["output_dir"])
    assert (out / "haploid_genotypes.tsv").exists()


def test_loci_cli_lists_catalog():
    from click.testing import CliRunner

    from grid_tpu.cli import cli

    res = CliRunner().invoke(cli, ["loci", "--gene", "LPA"])
    assert res.exit_code == 0
    assert "chr6:160605062-160647661" in res.output
