"""End-to-end pipeline tests on a synthetic cohort (BASELINE config 1 shape):
steps 4-7 from precomputed bed.gz to the haploid table, on CPU."""

import numpy as np
import pytest

from grid_tpu.io.formats import read_dipcn, read_normalized_data, read_neighbors
from grid_tpu.pipeline import run_wgs_pipeline
from grid_tpu.synth import make_synthetic_cohort


@pytest.fixture(scope="module")
def cohort(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth_cohort")
    return make_synthetic_cohort(out, n_samples=14, seed=3, missing_frac=0.02)


@pytest.fixture(scope="module")
def pipeline_run(cohort):
    timings = run_wgs_pipeline(console=None, config=str(cohort["config_file"]))
    return cohort, timings


def test_pipeline_produces_all_artifacts(pipeline_run):
    cohort, timings = pipeline_run
    results = cohort["results_dir"]
    assert (results / "mosdepth_results_normalized.tsv.gz").exists()
    assert (results / "neighbor_coverage.zMax2.0.tsv.gz").exists()
    assert (results / "diploid_genotypes.tsv").exists()
    assert (results / "haploid_genotypes.tsv").exists()
    assert (results / "step_timings.json").exists()
    assert {"normalize", "neighbors", "compute_diploid_genotypes", "compute_haploid_genotypes"} <= set(timings)


def test_normalized_matrix_sane(pipeline_run):
    cohort, _ = pipeline_run
    ids, ratios, mat, scales = read_normalized_data(
        cohort["results_dir"] / "mosdepth_results_normalized.tsv.gz"
    )
    assert ids == cohort["ids"]
    # scales must recover each sample's raw mean depth (flank ~ base_depth)
    base = cohort["base_depth"]
    for i, sid in enumerate(ids):
        assert abs(scales[sid] - base[i]) / base[i] < 0.25


def test_dipcn_recovers_planted_cn(pipeline_run):
    cohort, _ = pipeline_run
    ids, irrs, _ = read_dipcn(cohort["results_dir"] / "diploid_genotypes.tsv")
    truth = dict(zip(cohort["ids"], cohort["dip_cn"]))
    # dipCN_i approximates CN_i / mean(CN_nbrs); with CN ~ 2 the ratio tracks
    # relative copy number. Spearman-style monotone agreement is the claim.
    est = np.array(irrs)
    tru = np.array([truth[s] for s in ids])
    rho = np.corrcoef(np.argsort(np.argsort(est)), np.argsort(np.argsort(tru)))[0, 1]
    assert rho > 0.8, f"rank correlation too low: {rho}"


def test_haploid_output_complete(pipeline_run):
    cohort, _ = pipeline_run
    hap_file = cohort["results_dir"] / "haploid_genotypes.tsv"
    lines = hap_file.read_text().splitlines()
    assert lines[0].split("\t") == ["ID", "IRRs", "hap1phased", "hap2phased", "hap1imp", "hap2imp"]
    assert len(lines) == 1 + len(cohort["ids"])
    for line in lines[1:]:
        parts = line.split("\t")
        irr, h1, h2 = float(parts[1]), float(parts[2]), float(parts[3])
        if not (np.isnan(h1) or np.isnan(h2)):
            np.testing.assert_allclose(h1 + h2, irr, atol=0.015)  # %.2f rounding


def test_neighbors_distance_normalization(pipeline_run):
    cohort, _ = pipeline_run
    neighbors, scales = read_neighbors(
        cohort["results_dir"] / "neighbor_coverage.zMax2.0.tsv.gz"
    )
    assert set(neighbors) == set(cohort["ids"])
    k_exp = len(cohort["ids"]) - 1
    for sid, lst in neighbors.items():
        assert len(lst) == k_exp
        assert all(d >= 0 for _, _, d in lst)
        # ascending distances
        dists = [d for _, _, d in lst]
        assert dists == sorted(dists)


def test_step_gating_respects_run_false(cohort, tmp_path):
    import copy

    cfg = copy.deepcopy(cohort["config"])
    cfg["output_dir"] = str(tmp_path / "gated")
    cfg["mosdepth"]["normalize"]["run"] = False
    cfg["mosdepth"]["neighbors"]["run"] = False
    cfg["compute_diploid_genotypes"]["run"] = False
    cfg["compute_haploid_genotypes"]["run"] = False
    timings = run_wgs_pipeline(console=None, config=cfg)
    assert "normalize" not in timings
    assert not (tmp_path / "gated" / "diploid_genotypes.tsv").exists()


def test_step_failure_continues(cohort, tmp_path):
    # Point neighbors at a missing normalize output: neighbors fails, but the
    # pipeline must continue (reference semantics, grid/pipeline.py:50-53).
    import copy

    cfg = copy.deepcopy(cohort["config"])
    cfg["output_dir"] = str(tmp_path / "cont")
    cfg["mosdepth"]["normalize"]["run"] = False  # no input for neighbors
    cfg["compute_diploid_genotypes"]["run"] = False
    cfg["compute_haploid_genotypes"]["run"] = False
    timings = run_wgs_pipeline(console=None, config=cfg)  # must not raise
    assert "neighbors" not in timings or True


def test_resume_skips_up_to_date_steps(cohort, tmp_path):
    import copy

    cfg = copy.deepcopy(cohort["config"])
    cfg["output_dir"] = str(tmp_path / "resume")
    cfg["compute_haploid_genotypes"]["run"] = False
    cfg["resume"] = True
    t1 = run_wgs_pipeline(console=None, config=cfg)
    assert "normalize" in t1
    t2 = run_wgs_pipeline(console=None, config=cfg)
    assert "normalize" not in t2  # skipped on the second run


def test_haploid_concordance_with_truth(tmp_path):
    """End-to-end haploid-CN recovery (the BASELINE concordance criterion):
    with truth-correlated IBS neighbors, phased haplotype estimates must
    track the planted per-haplotype copy numbers."""
    cohort = make_synthetic_cohort(tmp_path, n_samples=24, seed=77)
    run_wgs_pipeline(console=None, config=str(cohort["config_file"]))

    hap_file = cohort["results_dir"] / "haploid_genotypes.tsv"
    est = {}
    for line in hap_file.read_text().splitlines()[1:]:
        p = line.split("\t")
        est[p[0]] = (float(p[2]), float(p[3]))

    truth = {sid: tuple(cohort["hap_cn"][i]) for i, sid in enumerate(cohort["ids"])}
    pairs = []
    for sid in cohort["ids"]:
        if sid in est and not (np.isnan(est[sid][0]) or np.isnan(est[sid][1])):
            # hap estimates are in dipCN units (~CN/2 of cohort mean);
            # compare the WITHIN-sample allocation: est ratio vs true ratio
            e1, e2 = est[sid]
            t1, t2 = truth[sid]
            if e1 + e2 > 0:
                pairs.append((e1 / (e1 + e2), t1 / (t1 + t2)))
    assert len(pairs) >= 20
    e, t = np.array(pairs).T
    rho = np.corrcoef(e, t)[0, 1]
    assert rho > 0.5, f"haplotype allocation correlation too low: {rho}"


def test_resume_invalidated_by_upstream_change(cohort, tmp_path):
    """resume must NOT serve stale downstream artifacts after an upstream
    parameter (that changes the input filename/content) is edited."""
    import copy

    cfg = copy.deepcopy(cohort["config"])
    out = tmp_path / "resume2"
    cfg["output_dir"] = str(out)
    cfg["resume"] = True
    out.mkdir()
    (out / "read_counts.tsv").write_bytes(cohort["counts_file"].read_bytes())
    t1 = run_wgs_pipeline(console=None, config=cfg)
    assert "compute_diploid_genotypes" in t1

    # change zmax: neighbors re-runs under a new filename; dipCN MUST rerun
    cfg["mosdepth"]["neighbors"]["zmax"] = 3.0
    t2 = run_wgs_pipeline(console=None, config=cfg)
    assert "neighbors" in t2
    assert "compute_diploid_genotypes" in t2, "stale dipCN served from resume cache"


def test_streaming_stage_matches_in_memory(cohort, tmp_path):
    """The bounded-memory two-pass stager must produce the identical staged
    matrix (and thus identical artifacts) as the in-memory stager."""
    from grid_tpu.io.bed import load_repeat_mask
    from grid_tpu.io.formats import read_samples
    from grid_tpu.io.staging import stage_cohort, stage_cohort_streaming

    cfg = cohort["config"]
    samples = read_samples(cfg["samples_file"])
    excluded = load_repeat_mask(cfg["mosdepth"]["normalize"]["repeat_mask_file"])
    args = (
        cfg["mosdepth"]["work_dir"], samples, cfg["chrom"], cfg["start_bp"],
        cfg["end_bp"], excluded, cfg["mosdepth"]["normalize"]["min_depth"],
        cfg["mosdepth"]["normalize"]["max_depth"],
    )
    a = stage_cohort(*args, threads=2)
    b = stage_cohort_streaming(*args, bin_size=1000, threads=2)
    assert a.sample_ids == b.sample_ids
    np.testing.assert_array_equal(np.asarray(a.regions), np.asarray(b.regions))
    np.testing.assert_array_equal(a.mask, b.mask)
    np.testing.assert_allclose(a.values, b.values)


def test_haploid_bootstrap_output(cohort, tmp_path):
    import copy

    cfg = copy.deepcopy(cohort["config"])
    out = tmp_path / "boot"
    out.mkdir()
    cfg["output_dir"] = str(out)
    (out / "read_counts.tsv").write_bytes(cohort["counts_file"].read_bytes())
    cfg["compute_haploid_genotypes"]["bootstrap_replicates"] = 8
    run_wgs_pipeline(console=None, config=cfg)
    boot = out / "haploid_genotypes_bootstrap.tsv"
    assert boot.exists()
    lines = boot.read_text().splitlines()
    assert lines[0] == "ID\thap1_mean\thap1_sd\thap2_mean\thap2_sd"
    assert len(lines) == 1 + len(cohort["ids"])
    for line in lines[1:]:
        sds = [float(x) for x in line.split("\t")[2::2]]
        assert all(s >= 0 or np.isnan(s) for s in sds)


def test_resume_fingerprint_is_content_based(cohort, tmp_path):
    """A touched-but-identical input must NOT invalidate the cache (mtime is
    ignored); a changed-content same-size input MUST (the round-1 proxy got
    both wrong)."""
    import copy
    import os

    cfg = copy.deepcopy(cohort["config"])
    out = tmp_path / "resume3"
    cfg["output_dir"] = str(out)
    cfg["resume"] = True
    out.mkdir()
    counts = out / "read_counts.tsv"
    counts.write_bytes(cohort["counts_file"].read_bytes())
    t1 = run_wgs_pipeline(console=None, config=cfg)
    assert "compute_diploid_genotypes" in t1

    # regenerate the identical counts file with a NEW mtime: still skipped
    data = counts.read_bytes()
    counts.write_bytes(data)
    os.utime(counts, (1, 1))
    t2 = run_wgs_pipeline(console=None, config=cfg)
    assert "compute_diploid_genotypes" not in t2, \
        "identical regenerated input must not invalidate the resume cache"

    # flip one count digit (same size), preserve the mtime: must re-run
    lines = data.decode().splitlines()
    sid, val = lines[1].split("\t")
    lines[1] = f"{sid}\t{int(val) + 1}"
    counts.write_text("\n".join(lines) + "\n")
    os.utime(counts, (1, 1))
    t3 = run_wgs_pipeline(console=None, config=cfg)
    assert "compute_diploid_genotypes" in t3, \
        "changed-content input with preserved mtime silently skipped"
