"""Tools, exon-path IO, locus data, and concurrency-safety tests."""

import shutil
import threading

import numpy as np
import pytest


def test_kiv_exon_counts():
    from grid_tpu.models.kiv import get_exon_count

    counts = {"1B_KIV3": 5, "1B_KIV2": 3, "1B_tied": 2, "1A": 7}
    assert get_exon_count(counts, "1B_KIV3") == 5
    assert get_exon_count(counts, "1B_notKIV3") == 5
    assert get_exon_count(counts, "1B") == 10
    assert get_exon_count(counts, "1A") == 7
    with pytest.raises(ValueError):
        get_exon_count(counts, "bogus")


def test_kiv2_estimate_formula():
    from grid_tpu.models.kiv import estimate_kiv2

    dip, hap = estimate_kiv2([1.0], [2.0])
    np.testing.assert_allclose(dip, [34.9 * 1.0 + 5.2 * 2.0 - 1.0])
    np.testing.assert_allclose(hap, dip / 2)


def test_normalize_sample_id():
    from grid_tpu.models.kiv import normalize_sample_id

    assert normalize_sample_id("NWD278973.b38.irc.v1_subset") == "NWD278973"
    assert normalize_sample_id("NWD278973.cram") == "NWD278973"
    assert normalize_sample_id(" HG00096.bam ") == "HG00096"
    assert normalize_sample_id("plain") == "plain"


def test_exon_dipcn_and_io_roundtrip(tmp_path):
    from grid_tpu.models.kiv import compute_dipcn_for_exon
    from grid_tpu.models.kiv_io import (
        load_count_results,
        load_neighbor_results,
        validate_sample_overlap,
        write_dipcn_output,
    )

    counts_file = tmp_path / "counts.tsv"
    counts_file.write_text(
        "S1.cram\t10\t4\t2\t20\nS2\t8\t2\t2\t16\nS3\t0\t0\t0\t0\nbad\tline\n"
    )
    counts = load_count_results(counts_file)
    assert set(counts) == {"S1", "S2", "S3"}
    assert counts["S1"]["1A"] == 20

    nbr_file = tmp_path / "nbrs.tsv"
    nbr_file.write_text("S1\t1.00\tS2\t1.00\t0.10\nS2\t1.00\tS1\t1.00\t0.10\n")
    neighbors = load_neighbor_results(nbr_file)
    n_overlap, overlap = validate_sample_overlap(counts, neighbors)
    assert n_overlap == 2

    res = compute_dipcn_for_exon(counts, neighbors, "1A", n_neighbors=5)
    # S1: (20/1) / (16/1) = 1.25 ; S2: 16/20 = 0.8
    np.testing.assert_allclose(res["S1"], 1.25)
    np.testing.assert_allclose(res["S2"], 0.8)

    out = tmp_path / "dip.tsv"
    write_dipcn_output(res, out)
    lines = out.read_text().splitlines()
    assert lines[0] == "ID\tdipCN"
    assert lines[1] == "S1\t1.250000"


def test_locus_catalog(tmp_path):
    from grid_tpu.data import LPA_KIV2_HG38, find_locus, load_vntr_catalog

    assert LPA_KIV2_HG38.start == 160_605_062
    cat = tmp_path / "cat.txt"
    cat.write_text(
        "CHR\tBP_START_HG38\tBP_END_HG38\tSAMTOOLS_START_HG38\tSAMTOOLS_END_HG38\tIBD2R\tGENE\n"
        "6\t160605062\t160647661\t160605137\t160647586\t0.9182\tLPA\n"
        "1\t939399\t939508\t939399\t939508\t0.3018\tSAMD11\n"
    )
    loci = load_vntr_catalog(cat)
    assert len(loci) == 2
    lpa = find_locus(loci, "LPA")
    assert lpa.chrom == "chr6" and lpa.start == 160_605_062


def test_add_genetic_map(tmp_path):
    from grid_tpu.tools import add_genetic_map

    gmap = tmp_path / "gmap.txt"
    gmap.write_text(
        "chr position COMBINED_rate(cM/Mb) Genetic_Map(cM)\n"
        "6 1000 1.0 0.0\n6 2000 1.0 1.0\n6 3000 1.0 2.0\n"
    )
    plink_map = tmp_path / "in.map"
    plink_map.write_text("6\trs1\t0\t1500\n6\trs2\t0\t2500\n")
    out = add_genetic_map(plink_map, gmap, tmp_path / "out")
    lines = out.read_text().splitlines()
    assert lines[0].split("\t") == ["6", "rs1", "0.5", "1500"]
    assert lines[1].split("\t") == ["6", "rs2", "1.5", "2500"]


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")
def test_native_bam_subset(tmp_path):
    from grid_tpu.io.bamlite import encode_record, write_bam
    from grid_tpu.native import bam

    p = tmp_path / "full.bam"
    recs = [encode_record(0, pos, 99, read_name=f"r{pos}", seq_len=100)
            for pos in range(0, 10_000, 100)]
    write_bam(p, [("chr6", 20_000)], recs)

    out = tmp_path / "sub.bam"
    n = bam.subset_region(p, "chr6", 2_000, 3_000, out)
    # reads [p, p+100) overlap [2000, 3000) iff 1900 < p < 3000 -> p in
    # {2000, ..., 2900}: 10 reads
    assert n == 10
    # the subset is itself a valid BAM: recount with the native reader
    cnt = bam.count_reads_region(out, "chr6", 0, 20_000, {99}, 0)
    assert cnt == 10


def test_batch_tools(tmp_path):
    pytest.importorskip("ctypes")
    from grid_tpu.io.bamlite import encode_record, write_bam
    from grid_tpu.tools import batch_ensure_index, batch_subset

    for name in ("A", "B"):
        recs = [encode_record(0, pos, 99, seq_len=50) for pos in range(0, 5000, 100)]
        write_bam(tmp_path / f"{name}.bam", [("chr6", 10_000)], recs)

    idx = batch_ensure_index(tmp_path, threads=2)
    assert all(idx.values()) and len(idx) == 2
    assert (tmp_path / "A.bam.bai").exists()

    out_dir = tmp_path / "subsets"
    res = batch_subset(tmp_path, "chr6", 1000, 2000, out_dir, threads=2)
    assert len(res) == 2 and all(v is not None for v in res.values())
    assert (out_dir / "A_subset.bam").exists()


def test_threaded_append_lock(tmp_path):
    # Mirrors the reference's concurrency stress (test_helpers.py:374-384):
    # 10 threads appending through the shared lock produce 10 intact rows.
    from threading import Lock

    from grid_tpu.io.formats import write_counts_row

    path = tmp_path / "c.tsv"
    path.write_text("Sample\tchr6:1-2\n")
    lock = Lock()

    def worker(i):
        with lock:
            write_counts_row(path, f"S{i}", i)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(10)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    lines = path.read_text().splitlines()
    assert len(lines) == 11
    assert {ln.split("\t")[0] for ln in lines[1:]} == {f"S{i}" for i in range(10)}
