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
        "normalize",
        "neighbors",
        "compute_diploid_genotypes",
        "compute_haploid_genotypes",
    } <= set(timings)
    # steps 2+3 run either separately or as the one-pass native ingest
    assert {"count_reads", "mosdepth"} <= set(timings) or "fused_ingest_2_3" in timings


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


def test_sparse_bed_pipeline_equivalence(tmp_path):
    """mosdepth.sparse_bed omits zero-depth bins from the intermediate
    bed.gz; every downstream artifact must be byte-identical (the readers
    filter depth > 0 regardless)."""
    import copy
    import gzip

    from grid_tpu.pipeline import run_wgs_pipeline
    from grid_tpu.synth import make_synthetic_cohort_with_alignments

    outs = {}
    for mode in ("dense", "sparse"):
        cohort = make_synthetic_cohort_with_alignments(
            tmp_path / mode, n_samples=6, seed=21
        )
        cfg = copy.deepcopy(cohort["config"])
        cfg["mosdepth"]["sparse_bed"] = mode == "sparse"
        cfg["compute_haploid_genotypes"]["run"] = False
        run_wgs_pipeline(console=None, config=cfg)
        res = cohort["results_dir"]
        outs[mode] = {
            "norm": gzip.open(res / "mosdepth_results_normalized.tsv.gz", "rb").read(),
            "dip": (res / "diploid_genotypes.tsv").read_bytes(),
            # the step-3 coverage ARTIFACT must match too: sparse mode must
            # not inflate the window mean by dropping zero bins from the
            # denominator (rows are append-ordered by thread completion, so
            # compare as sorted line sets)
            "cov": sorted((res / "mosdepth_results.tsv").read_bytes().splitlines()),
        }
        # the sparse workdir beds must actually be smaller
        beds = sorted((tmp_path / mode / "mosdepth_workdir").glob("*.bed.gz"))
        outs[mode]["bed_bytes"] = sum(b.stat().st_size for b in beds)
    assert outs["dense"]["norm"] == outs["sparse"]["norm"]
    assert outs["dense"]["dip"] == outs["sparse"]["dip"]
    assert outs["dense"]["cov"] == outs["sparse"]["cov"]
    assert outs["sparse"]["bed_bytes"] < outs["dense"]["bed_bytes"] / 5


def test_sparse_coverage_zero_bins_count_in_denominator(tmp_path):
    """A zero-depth bin INSIDE the window must still dilute the window mean
    in sparse mode (ADVICE r2: covered_bp was derived from bins present,
    inflating sparse coverage vs mosdepth/dense output)."""
    import gzip

    from grid_tpu.steps.coverage import compute_region_coverage

    dense = tmp_path / "dense.bed.gz"
    sparse = tmp_path / "sparse.bed.gz"
    # contig of 4 kb bins: depths 10, 0, 30, 0(final, always written sparse)
    rows = [("chr1", 0, 1000, 10.0), ("chr1", 1000, 2000, 0.0),
            ("chr1", 2000, 3000, 30.0), ("chr1", 3000, 4000, 0.0)]
    with gzip.open(dense, "wt") as f:
        for c, s, e, d in rows:
            f.write(f"{c}\t{s}\t{e}\t{d:.2f}\n")
    with gzip.open(sparse, "wt") as f:
        for c, s, e, d in rows:
            if d == 0.0 and e != 4000:  # skip_zero keeps the final bin
                continue
            f.write(f"{c}\t{s}\t{e}\t{d:.2f}\n")

    for win in [(0, 3000), (500, 2500), (0, 4000), (2500, 9999)]:
        want = compute_region_coverage(dense, "chr1", *win)
        got = compute_region_coverage(sparse, "chr1", *win, sparse=True)
        assert got == want, f"window {win}: sparse {got} != dense {want}"


def test_remove_intermediate_files(tmp_path):
    """mosdepth.remove_intermediate deletes side-products but keeps the
    regions.bed.gz step 4 needs (ref: grid/utils/mosdepth.py:300-326)."""
    from grid_tpu.steps.coverage import remove_intermediate_files

    keep = tmp_path / "S1_SYN.regions.bed.gz"
    gone = [
        tmp_path / "S1_SYN.mosdepth.global.dist.txt",
        tmp_path / "S1_SYN.mosdepth.region.dist.txt",
        tmp_path / "S1_SYN.mosdepth.summary.txt",
        tmp_path / "S1_SYN.regions.bed.gz.csi",
    ]
    for f in [keep, *gone]:
        f.write_text("x")
    remove_intermediate_files(tmp_path)
    assert keep.exists()
    assert not any(f.exists() for f in gone)
    # include_region_bed_gz sweeps the beds too
    remove_intermediate_files(tmp_path, include_region_bed_gz=True)
    assert not keep.exists()


def test_pipeline_cleans_workdir_when_configured(tmp_path):
    """With remove_intermediate=True the coverage step leaves only
    *.regions.bed.gz per sample in work_dir (native binner emits nothing
    else, so pre-seed a fake mosdepth side-product)."""
    import copy
    from pathlib import Path

    from grid_tpu.pipeline import run_wgs_pipeline
    from grid_tpu.synth import make_synthetic_cohort_with_alignments

    cohort = make_synthetic_cohort_with_alignments(tmp_path, n_samples=3, seed=7)
    cfg = copy.deepcopy(cohort["config"])
    cfg["mosdepth"]["remove_intermediate"] = True
    work = Path(cfg["mosdepth"]["work_dir"])
    work.mkdir(parents=True, exist_ok=True)
    (work / "stale.mosdepth.summary.txt").write_text("x")
    cfg["compute_haploid_genotypes"]["run"] = False
    run_wgs_pipeline(console=None, config=cfg)
    leftovers = [p.name for p in work.glob("*") if not p.name.endswith("regions.bed.gz")]
    assert leftovers == []
