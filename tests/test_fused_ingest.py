"""One-pass ingest (steps/ingest.py) parity vs the sequential steps 2+3.

The fused native pass must be an invisible substitution: every artifact —
read counts, coverage TSV, each regions.bed.gz, and everything downstream
(normalized matrix, dipCN) — byte-identical to running count_reads +
compute_mosdepth + the bed.gz re-scan separately."""

import copy
import gzip
import shutil
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")


def _native_or_skip():
    try:
        from grid_tpu import native

        native.lib()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"native build failed: {e}")


def _run_both_modes(tmp_path, file_type, n_samples=6, seed=11, extra_cfg=None):
    from grid_tpu.pipeline import run_wgs_pipeline
    from grid_tpu.synth import make_synthetic_cohort_with_alignments

    outs = {}
    for mode in ("sequential", "fused"):
        cohort = make_synthetic_cohort_with_alignments(
            tmp_path / mode, n_samples=n_samples, seed=seed, file_type=file_type
        )
        cfg = copy.deepcopy(cohort["config"])
        cfg.setdefault("device", {})["fused_ingest"] = (
            "true" if mode == "fused" else "false"
        )
        for k, v in (extra_cfg or {}).items():
            cfg[k] = copy.deepcopy(v) if isinstance(v, dict) else v
        cfg["compute_haploid_genotypes"]["run"] = False
        run_wgs_pipeline(console=None, config=cfg)
        res = cohort["results_dir"]
        work = Path(cfg["mosdepth"]["work_dir"])
        outs[mode] = {
            "counts": sorted((res / "read_counts.tsv").read_bytes().splitlines()),
            "cov": sorted((res / "mosdepth_results.tsv").read_bytes().splitlines()),
            "beds": {
                b.name: gzip.open(b, "rb").read()
                for b in sorted(work.glob("*.regions.bed.gz"))
            },
            "norm": gzip.open(res / "mosdepth_results_normalized.tsv.gz", "rb").read(),
            "dip": (res / "diploid_genotypes.tsv").read_bytes(),
        }
    return outs


@pytest.mark.parametrize("file_type", ["bam", "cram"])
def test_fused_ingest_artifact_parity(tmp_path, file_type):
    _native_or_skip()
    outs = _run_both_modes(tmp_path, file_type)
    seq, fus = outs["sequential"], outs["fused"]
    assert seq["counts"] == fus["counts"]
    assert seq["cov"] == fus["cov"]
    assert set(seq["beds"]) == set(fus["beds"])
    for name in seq["beds"]:
        assert seq["beds"][name] == fus["beds"][name], f"bed differs: {name}"
    assert seq["norm"] == fus["norm"]
    assert seq["dip"] == fus["dip"]


def test_fused_ingest_sparse_parity(tmp_path):
    """sparse_bed + fused ingest: downstream artifacts still identical to
    the dense sequential run."""
    _native_or_skip()
    outs = _run_both_modes(
        tmp_path, "bam", seed=13, extra_cfg={}
    )
    # second pair: sparse fused vs dense sequential from the base run
    from grid_tpu.pipeline import run_wgs_pipeline
    from grid_tpu.synth import make_synthetic_cohort_with_alignments

    cohort = make_synthetic_cohort_with_alignments(
        tmp_path / "sparse_fused", n_samples=6, seed=13, file_type="bam"
    )
    cfg = copy.deepcopy(cohort["config"])
    cfg.setdefault("device", {})["fused_ingest"] = "true"
    cfg["mosdepth"]["sparse_bed"] = True
    cfg["compute_haploid_genotypes"]["run"] = False
    run_wgs_pipeline(console=None, config=cfg)
    res = cohort["results_dir"]
    assert sorted((res / "mosdepth_results.tsv").read_bytes().splitlines()) == outs[
        "sequential"
    ]["cov"]
    assert (
        gzip.open(res / "mosdepth_results_normalized.tsv.gz", "rb").read()
        == outs["sequential"]["norm"]
    )


def test_ingest_staged_bins_match_file_reread(tmp_path):
    """The in-process staged bins handed to the normalizer must equal a
    read_regions_bed_gz re-read of the bed.gz the same pass wrote."""
    _native_or_skip()
    from grid_tpu.io.bed import read_regions_bed_gz
    from grid_tpu.native import bam as nb
    from grid_tpu.synth import make_synthetic_cohort_with_alignments

    cohort = make_synthetic_cohort_with_alignments(tmp_path, n_samples=2, seed=3)
    cfg = cohort["config"]
    bam = sorted(Path(cfg["directory_loc"]).glob("*.bam"))[0]
    bed = tmp_path / "t.regions.bed.gz"
    chrom, start, end = cfg["chrom"], cfg["start_bp"], cfg["end_bp"]
    _, _, starts, ends, depths, _ = nb.ingest(
        bam, str(bed), chrom, start, end, [83, 147, 81, 145], 1, bin_size=1000
    )
    s2, e2, d2 = read_regions_bed_gz(bed, chrom, start, end, {})
    np.testing.assert_array_equal(starts, s2)
    np.testing.assert_array_equal(ends, e2)
    np.testing.assert_array_equal(depths, d2)


def test_fused_ingest_error_row_for_bad_sample(tmp_path):
    """A corrupt alignment file yields an Error counts row and the cohort
    continues (reference per-sample failure semantics)."""
    _native_or_skip()
    from grid_tpu.pipeline import run_wgs_pipeline
    from grid_tpu.synth import make_synthetic_cohort_with_alignments

    cohort = make_synthetic_cohort_with_alignments(tmp_path, n_samples=4, seed=5)
    cfg = copy.deepcopy(cohort["config"])
    # corrupt one sample's BAM
    victim = sorted(Path(cfg["directory_loc"]).glob("*.bam"))[1]
    victim.write_bytes(b"not a bam at all")
    cfg.setdefault("device", {})["fused_ingest"] = "true"
    cfg["compute_haploid_genotypes"]["run"] = False
    run_wgs_pipeline(console=None, config=cfg)
    res = cohort["results_dir"]
    lines = (res / "read_counts.tsv").read_text().splitlines()
    errors = [ln for ln in lines if ln.endswith("\tError")]
    assert len(errors) == 1
    # pipeline still produced dipCN for the healthy samples
    dip = (res / "diploid_genotypes.tsv").read_text().splitlines()
    assert len(dip) == 4  # header + 3 healthy samples


def test_fused_ingest_python_fallback_per_sample(tmp_path, monkeypatch):
    """When the native one-pass ingest fails for a sample, that sample must
    flow through the sequential per-step fallbacks and produce the SAME
    artifacts (CLAUDE.md invariant: every native path has a pure-Python
    fallback)."""
    _native_or_skip()
    import grid_tpu.native.bam as nbam
    from grid_tpu.pipeline import run_wgs_pipeline
    from grid_tpu.synth import make_synthetic_cohort_with_alignments

    outs = {}
    for mode in ("native", "fallback"):
        cohort = make_synthetic_cohort_with_alignments(
            tmp_path / mode, n_samples=4, seed=17
        )
        cfg = copy.deepcopy(cohort["config"])
        cfg.setdefault("device", {})["fused_ingest"] = "true"
        cfg["compute_haploid_genotypes"]["run"] = False
        if mode == "fallback":
            def boom(*a, **k):
                raise IOError("simulated native ingest failure")

            monkeypatch.setattr(nbam, "ingest", boom)
        run_wgs_pipeline(console=None, config=cfg)
        res = cohort["results_dir"]
        outs[mode] = {
            "counts": sorted((res / "read_counts.tsv").read_bytes().splitlines()),
            "cov": sorted((res / "mosdepth_results.tsv").read_bytes().splitlines()),
            "dip": (res / "diploid_genotypes.tsv").read_bytes(),
        }
        monkeypatch.undo()
    assert outs["native"]["counts"] == outs["fallback"]["counts"]
    assert outs["native"]["cov"] == outs["fallback"]["cov"]
    assert outs["native"]["dip"] == outs["fallback"]["dip"]


def test_fused_ingest_coverage_only_mode(tmp_path):
    """count_reads.run=False (the multi-locus sweep's shared phase): the
    one-pass ingest still produces the bed.gz + coverage TSV + staged bins,
    writes NO counts file, and downstream normalize matches sequential."""
    _native_or_skip()
    from grid_tpu.pipeline import run_wgs_pipeline
    from grid_tpu.synth import make_synthetic_cohort_with_alignments

    outs = {}
    for mode in ("sequential", "fused"):
        cohort = make_synthetic_cohort_with_alignments(
            tmp_path / mode, n_samples=5, seed=23
        )
        cfg = copy.deepcopy(cohort["config"])
        cfg["count_reads"]["run"] = False
        cfg.setdefault("device", {})["fused_ingest"] = (
            "true" if mode == "fused" else "false"
        )
        for sec in ("compute_diploid_genotypes", "compute_haploid_genotypes"):
            cfg[sec]["run"] = False
        res = cohort["results_dir"]
        counts_before = (res / "read_counts.tsv").read_bytes() \
            if (res / "read_counts.tsv").exists() else None
        timings = run_wgs_pipeline(console=None, config=cfg)
        if mode == "fused":
            # the fused path must actually have RUN (a crash would silently
            # fall back to sequential and this test would be vacuous)
            assert "fused_ingest_2_3" in timings, timings
        else:
            assert "fused_ingest_2_3" not in timings, timings
        # stale counts from fabrication untouched; none created
        counts_after = (res / "read_counts.tsv").read_bytes() \
            if (res / "read_counts.tsv").exists() else None
        assert counts_after == counts_before
        outs[mode] = {
            "cov": sorted((res / "mosdepth_results.tsv").read_bytes().splitlines()),
            "norm": gzip.open(res / "mosdepth_results_normalized.tsv.gz", "rb").read(),
        }
    assert outs["sequential"]["cov"] == outs["fused"]["cov"]
    assert outs["sequential"]["norm"] == outs["fused"]["norm"]


def test_batch_ingest_matches_per_sample(tmp_path):
    """grid_ingest_batch (one native call, internal thread pool) returns the
    same counts / coverage / staged bins / window counts as the per-sample
    ingest wrapper it fans out, and the progress counter lands on n."""
    _native_or_skip()
    from grid_tpu.native import bam as bam_backend
    from grid_tpu.native._ingest import ingest_batch
    from grid_tpu.synth import make_synthetic_cohort_with_alignments

    cohort = make_synthetic_cohort_with_alignments(
        tmp_path, n_samples=5, seed=23, file_type="bam"
    )
    cfg = cohort["config"]
    chrom, start, end = cfg["chrom"], cfg["start_bp"], cfg["end_bp"]
    flags = cfg["count_reads"]["flags"]
    paths = sorted(Path(cfg["directory_loc"]).glob("*.bam"))
    windows = [(chrom, start, (start + end) // 2), ("chrMISSING", 0, 100)]

    entries = [(str(p), str(tmp_path / f"b{i}.bed.gz"))
               for i, p in enumerate(paths)]
    progress = np.zeros(1, np.int64)
    tstats = {}
    status, counts, covs, bins, wc = ingest_batch(
        entries, chrom, start, end, flags, threads=3, windows=windows,
        progress=progress, thread_stats=tstats,
    )
    assert list(status) == [0] * len(paths)
    assert int(progress[0]) == len(paths)
    # per-thread busy instrumentation: one slot per worker actually used,
    # every file's decode time accounted somewhere
    assert tstats["n_threads"] == 3
    assert len(tstats["busy_s"]) == 3 == len(tstats["cpu_s"])
    assert all(b >= 0 for b in tstats["busy_s"])
    assert sum(tstats["busy_s"]) > 0

    for i, p in enumerate(paths):
        out = bam_backend.ingest(
            str(p), str(tmp_path / f"s{i}.bed.gz"), chrom, start, end, flags,
            windows=windows,
        )
        count, cov100, starts, ends, depths, refids, wcounts = out
        assert int(counts[i]) == count
        assert int(covs[i]) == cov100
        bs, be, bd, br = bins[i]
        np.testing.assert_array_equal(bs, starts)
        np.testing.assert_array_equal(be, ends)
        np.testing.assert_array_equal(bd, depths)
        np.testing.assert_array_equal(br, refids)
        np.testing.assert_array_equal(wc[i], wcounts)
        # the bed.gz artifacts byte-match too
        assert Path(entries[i][1]).read_bytes() == (
            tmp_path / f"s{i}.bed.gz").read_bytes()


def test_batch_ingest_isolates_bad_files(tmp_path):
    """A corrupt file gets a nonzero status; healthy files in the same batch
    are unaffected (per-file status isolation, no batch-wide failure)."""
    _native_or_skip()
    from grid_tpu.native._ingest import ingest_batch
    from grid_tpu.synth import make_synthetic_cohort_with_alignments

    cohort = make_synthetic_cohort_with_alignments(
        tmp_path, n_samples=3, seed=5, file_type="bam"
    )
    cfg = cohort["config"]
    paths = sorted(Path(cfg["directory_loc"]).glob("*.bam"))
    paths[1].write_bytes(b"garbage, not a BAM")

    entries = [(str(p), "") for p in paths]
    status, counts, covs, bins, _ = ingest_batch(
        entries, cfg["chrom"], cfg["start_bp"], cfg["end_bp"],
        cfg["count_reads"]["flags"], threads=2,
    )
    assert int(status[1]) != 0
    assert int(status[0]) == 0 and int(status[2]) == 0
    assert int(counts[0]) > 0 and int(counts[2]) > 0


def test_fused_ingest_threaded_loop_parity(tmp_path, monkeypatch):
    """GRID_TPU_BATCH_INGEST=0 forces the per-sample threaded loop; pipeline
    artifacts stay identical to the batched default."""
    _native_or_skip()
    monkeypatch.setenv("GRID_TPU_BATCH_INGEST", "0")
    outs = _run_both_modes(tmp_path, "bam", n_samples=4, seed=31)
    seq, fus = outs["sequential"], outs["fused"]
    assert seq["counts"] == fus["counts"]
    assert seq["cov"] == fus["cov"]
    assert seq["norm"] == fus["norm"]
    assert seq["dip"] == fus["dip"]


def test_batch_ingest_ram_guard_falls_back(tmp_path, monkeypatch, capsys):
    """When the upfront n*cap_per staging allocation would exceed half of
    available RAM, run_batched refuses (avoiding an overcommit OOM-kill)
    and the per-sample loop produces identical artifacts."""
    _native_or_skip()
    import grid_tpu.steps.ingest as ingest_mod

    monkeypatch.setattr(ingest_mod, "_available_ram_bytes", lambda: 1)
    outs = _run_both_modes(tmp_path, "bam", n_samples=4, seed=31)
    assert "using the per-sample loop" in capsys.readouterr().out
    seq, fus = outs["sequential"], outs["fused"]
    assert seq["counts"] == fus["counts"]
    assert seq["cov"] == fus["cov"]
    assert seq["norm"] == fus["norm"]
    assert seq["dip"] == fus["dip"]


def test_available_ram_bytes_readable():
    from grid_tpu.steps.ingest import _available_ram_bytes

    avail = _available_ram_bytes()
    assert avail is None or avail > 0
