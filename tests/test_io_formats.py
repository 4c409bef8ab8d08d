"""Round-trip tests pinning the on-disk formats (SURVEY §2.3)."""

import gzip

import numpy as np

from grid_tpu.io import (
    read_samples,
    setup_output_file,
    read_counts_tsv,
    write_counts_row,
    write_normalized_output,
    read_normalized_data,
    write_neighbors,
    read_neighbors,
    write_dipcn,
    read_dipcn,
    write_haploid_output,
    load_repeat_mask,
    read_regions_bed_gz,
    norm_chrom,
)
from grid_tpu.io.formats import neighbors_filename, write_samples


def test_samples_roundtrip(tmp_path):
    p = tmp_path / "samples.txt"
    write_samples(p, ["HG1", "HG2", "HG3"])
    p.write_text(p.read_text() + "\n  \n")  # trailing blanks skipped
    assert read_samples(p) == ["HG1", "HG2", "HG3"]


def test_counts_tsv_roundtrip(tmp_path):
    p = setup_output_file(tmp_path / "counts.tsv", "chr6", 160605062, 160647661)
    assert p.read_text() == "Sample\tchr6:160605062-160647661\n"
    write_counts_row(p, "HG1", 1234)
    write_counts_row(p, "HG2", "Error")  # failing sample writes "Error"
    write_counts_row(p, "HG3", 777)
    counts = read_counts_tsv(p)
    assert counts == {"HG1": 1234.0, "HG3": 777.0}  # Error row dropped


def test_normalized_matrix_roundtrip(tmp_path, rng):
    n, r = 4, 6
    z = rng.normal(size=(n, r))
    mask = np.ones((n, r), dtype=bool)
    mask[1, 2] = False
    col_means = rng.uniform(0.9, 1.1, size=r)
    col_vars = rng.uniform(0.005, 0.02, size=r)
    scales = rng.uniform(25, 40, size=n)
    ids = [f"S{i}" for i in range(n)]
    sel = [0, 1, 3, 4, 5]

    p = tmp_path / "norm.tsv.gz"
    write_normalized_output(p, ids, scales, z, mask, col_means, col_vars, sel)

    rids, ratios, mat, rscales = read_normalized_data(p)
    assert rids == ids
    assert mat.shape == (n, len(sel))
    exp_ratio = 100.0 * col_vars[sel] / col_means[sel]
    np.testing.assert_allclose(ratios, np.round(exp_ratio, 3), atol=5e-4)
    for i in range(n):
        np.testing.assert_allclose(rscales[ids[i]], round(scales[i], 2), atol=5e-3)
        for jj, j in enumerate(sel):
            if mask[i, j]:
                np.testing.assert_allclose(mat[i, jj], float(f"{z[i, j]:.2f}"))
            else:
                assert np.isnan(mat[i, jj])


def test_normalized_matrix_header_counts(tmp_path):
    p = tmp_path / "n.tsv.gz"
    write_normalized_output(
        p, ["A"], [30.0], np.zeros((1, 3)), np.ones((1, 3), bool),
        np.array([1.0, np.nan, 2.0]), np.array([0.1, np.nan, 0.2]), [0, 2],
    )
    with gzip.open(p, "rt") as f:
        line0 = f.readline().strip().split("\t")
    assert line0[0] == "1" and line0[1] == "2"


def test_neighbors_roundtrip(tmp_path):
    p = neighbors_filename(tmp_path, "nbrs", 2.0)
    assert p.name == "nbrs.zMax2.0.tsv.gz"
    ids = ["A", "B", "C"]
    scales = {"A": 1.11, "B": 0.95, "C": 1.0}
    nbr_ids = [["B", "C"], ["A"], ["A", "B"]]
    nbr_scales = [[0.95, 1.0], [1.11], [1.11, 0.95]]
    nbr_dists = [[0.05, 0.10], [0.05], [0.10, 0.2]]
    write_neighbors(p, ids, scales, nbr_ids, nbr_scales, nbr_dists)
    neighbors, rscales = read_neighbors(p)
    assert rscales == {"A": 1.11, "B": 0.95, "C": 1.0}
    assert neighbors["A"] == [("B", 0.95, 0.05), ("C", 1.0, 0.10)]
    assert neighbors["B"] == [("A", 1.11, 0.05)]


def test_write_neighbors_dense_byte_identical(tmp_path):
    """The vectorized fused-mode writer must produce the exact bytes the
    list-based writer produces for the same dense [N, k] neighbor data."""
    from grid_tpu.io.formats import write_neighbors_dense

    rng = np.random.default_rng(7)
    n, k = 23, 5
    ids = [f"S{i:03d}" for i in range(n)]
    scales = rng.uniform(0.5, 2.0, n).astype(np.float32)
    nbr_idx = np.stack([rng.permutation(n)[:k] for _ in range(n)])
    sq = rng.uniform(0, 50, (n, k)).astype(np.float32)
    r_use = 17
    norm = sq / (2 * r_use)

    p_list = tmp_path / "a.tsv.gz"
    p_dense = tmp_path / "b.tsv.gz"
    write_neighbors(
        p_list, ids, list(scales),
        [[ids[j] for j in nbr_idx[i]] for i in range(n)],
        [[scales[j] for j in nbr_idx[i]] for i in range(n)],
        [list(sq[i] / (2 * r_use)) for i in range(n)],
    )
    write_neighbors_dense(p_dense, ids, scales, nbr_idx, norm)
    with gzip.open(p_list, "rb") as f:
        a = f.read()
    with gzip.open(p_dense, "rb") as f:
        b = f.read()
    assert a == b

    # k=0 degenerate: one ID + scale per line
    p0 = tmp_path / "c.tsv.gz"
    write_neighbors_dense(p0, ids[:2], scales[:2], np.zeros((2, 0), int), np.zeros((2, 0)))
    with gzip.open(p0, "rt") as f:
        assert f.readline().rstrip("\n") == f"S000\t{float(scales[0]):.2f}"


def test_dipcn_roundtrip(tmp_path):
    p = tmp_path / "dip.tsv"
    write_dipcn(p, ["X", "Y"], [1.9666666666666668, 2.0])
    text = p.read_text().splitlines()
    assert text[0] == "Sample\tNorm_Reads"
    assert text[1] == "X\t1.9666666666666668"
    ids, irrs, id2ind = read_dipcn(p)
    assert ids == ["X", "Y"]
    np.testing.assert_allclose(irrs, [1.9666666666666668, 2.0])
    assert id2ind == {"X": 0, "Y": 1}


def test_haploid_output_format(tmp_path):
    p = tmp_path / "hap.tsv"
    write_haploid_output(p, ["A"], [2.0], [1.0], [1.0], [0.9], [1.1])
    lines = p.read_text().splitlines()
    assert lines[0] == "ID\tIRRs\thap1phased\thap2phased\thap1imp\thap2imp"
    assert lines[1] == "A\t2.00\t1.00\t1.00\t0.90\t1.10"


def test_repeat_mask_kb_bins(tmp_path):
    p = tmp_path / "mask.bed"
    p.write_text("# comment\nchr6\t1500\t3200\n7\t0\t999\nbad line\n")
    excl = load_repeat_mask(p)
    assert excl["chr6"] == {1, 2, 3}
    assert excl["chr7"] == {0}  # chrom normalised from '7'


def test_read_regions_bed_gz_filters(tmp_path):
    p = tmp_path / "s.regions.bed.gz"
    rows = [
        ("chr6", 1000, 2000, 30.0),   # kept
        ("chr6", 2000, 3000, 0.0),    # depth <= 0
        ("chr7", 1000, 2000, 30.0),   # wrong chrom
        ("chr6", 9000, 10000, 25.0),  # outside window
        ("chr6", 4000, 5000, 12.5),   # masked
    ]
    with gzip.open(p, "wt") as f:
        for c, s, e, d in rows:
            f.write(f"{c}\t{s}\t{e}\t{d}\n")
    excl = {"chr6": {4}}
    starts, ends, depths = read_regions_bed_gz(p, "chr6", 500, 6000, excl)
    assert list(starts) == [1000]
    np.testing.assert_allclose(depths, [30.0])

    # window-overlap semantics: reg_end >= start and reg_start <= end
    starts2, _, _ = read_regions_bed_gz(p, "chr6", 2000, 9000, {})
    assert list(starts2) == [1000, 9000, 4000]  # file order preserved


def test_norm_chrom():
    assert norm_chrom("6") == "chr6"
    assert norm_chrom("chrX") == "chrX"


def test_native_neighbors_writer_matches_python(tmp_path, monkeypatch):
    """grid_write_neighbors (native/src/textgz.cpp) produces the same
    decompressed bytes as the Python writer, including %.2f tie
    neighborhoods (x.xx5) and float32 distance inputs."""
    import gzip as _gz
    import shutil

    import numpy as np
    import pytest as _pt

    if shutil.which("g++") is None:
        _pt.skip("no C++ toolchain")
    try:
        from grid_tpu import native

        native.lib()
    except Exception as e:  # pragma: no cover
        _pt.skip(f"native build failed: {e}")

    from grid_tpu.io.formats import write_neighbors_dense

    rng = np.random.default_rng(11)
    n, k = 37, 9
    ids = [f"HG{i:05d}" for i in range(n)]
    scales = np.round(rng.uniform(0.5, 60.0, n), 4)
    scales[3] = 1.005  # printf tie neighborhood
    scales[5] = 2.675
    idx = rng.integers(0, n, (n, k)).astype(np.int64)
    dists = rng.uniform(0, 3, (n, k)).astype(np.float32)
    dists[0, 0] = np.float32(0.005)

    p_native = tmp_path / "nat.tsv.gz"
    p_python = tmp_path / "py.tsv.gz"
    write_neighbors_dense(p_native, ids, scales, idx, dists)
    monkeypatch.setenv("GRID_TPU_NATIVE_WRITERS", "0")
    write_neighbors_dense(p_python, ids, scales, idx, dists)

    a = _gz.open(p_native, "rb").read()
    b = _gz.open(p_python, "rb").read()
    assert a == b


def test_native_normalized_writer_matches_python(tmp_path, monkeypatch):
    """grid_write_normalized: identical decompressed bytes vs the Python
    writer — NA headers, masked cells, NaN-in-valid-cell, negative zeros,
    %.2f/%.3f tie neighborhoods, float32 z input."""
    import gzip as _gz
    import shutil

    import numpy as np
    import pytest as _pt

    if shutil.which("g++") is None:
        _pt.skip("no C++ toolchain")
    try:
        from grid_tpu import native

        native.lib()
    except Exception as e:  # pragma: no cover
        _pt.skip(f"native build failed: {e}")

    from grid_tpu.io.formats import write_normalized_output

    rng = np.random.default_rng(7)
    n, r = 23, 41
    ids = [f"HG{i:05d}" for i in range(n)]
    scales = np.round(rng.uniform(0.5, 60.0, n), 4)
    z = rng.normal(0, 1.5, (n, r)).astype(np.float32)
    z[0, 0] = np.float32(-0.001)   # printf: "-0.00"
    z[0, 1] = np.float32(-0.0)     # printf: "-0.00"
    z[1, 2] = np.float32(0.005)    # tie neighborhood
    z[2, 3] = np.nan               # valid cell, nan value -> "nan"
    mask = rng.random((n, r)) > 0.2
    mask[2, 3] = True
    col_means = rng.uniform(0.1, 5.0, r)
    col_means[5] = np.nan          # header NA
    col_means[6] = 0.0             # ratio -> NA (mean <= 0)
    col_vars = rng.uniform(0.0, 3.0, r)
    sel = np.arange(r)

    p_nat = tmp_path / "nat.tsv.gz"
    p_py = tmp_path / "py.tsv.gz"
    write_normalized_output(p_nat, ids, scales, z, mask, col_means,
                            col_vars, sel)
    monkeypatch.setenv("GRID_TPU_NATIVE_WRITERS", "0")
    write_normalized_output(p_py, ids, scales, z, mask, col_means,
                            col_vars, sel)
    assert _gz.open(p_nat, "rb").read() == _gz.open(p_py, "rb").read()


def test_native_fixed_format_fuzz(tmp_path, monkeypatch):
    """Fuzz the native %.2f/%.3f emitters against printf over 200k values
    spanning magnitudes, rationals with exact .xx5 ties, and negatives
    (one [1, 200k] matrix written by both writers, byte-compared)."""
    import gzip as _gz
    import shutil

    import numpy as np
    import pytest as _pt

    if shutil.which("g++") is None:
        _pt.skip("no C++ toolchain")
    try:
        from grid_tpu import native

        native.lib()
    except Exception as e:  # pragma: no cover
        _pt.skip(f"native build failed: {e}")

    from grid_tpu.io.formats import write_normalized_output

    rng = np.random.default_rng(13)
    m = 200_000
    vals = np.concatenate([
        rng.uniform(-100, 100, m // 4),
        rng.integers(-10_000, 10_000, m // 4) / 1000.0,  # exact milli ties
        rng.integers(-10_000, 10_000, m // 4) / 200.0,   # exact .xx5 ties
        rng.normal(0, 1e-3, m - 3 * (m // 4)),           # near-zero signs
    ])
    z = vals.reshape(1, -1)
    mask = np.ones_like(z, bool)
    means = np.abs(vals[:z.shape[1]]) + 0.001  # header %.3f over same values
    cvars = np.abs(vals[:z.shape[1]])
    sel = np.arange(z.shape[1])

    p_nat = tmp_path / "fz_nat.gz"
    p_py = tmp_path / "fz_py.gz"
    write_normalized_output(p_nat, ["S0"], [1.0], z, mask, means, cvars, sel)
    monkeypatch.setenv("GRID_TPU_NATIVE_WRITERS", "0")
    write_normalized_output(p_py, ["S0"], [1.0], z, mask, means, cvars, sel)
    assert _gz.open(p_nat, "rb").read() == _gz.open(p_py, "rb").read()


def test_native_normalized_writer_empty_selection(tmp_path, monkeypatch):
    """r_want=0: the Python writer keeps the trailing prefix tab on every
    line; the native writer must match byte-for-byte."""
    import gzip as _gz
    import shutil

    import numpy as np
    import pytest as _pt

    if shutil.which("g++") is None:
        _pt.skip("no C++ toolchain")
    try:
        from grid_tpu import native

        native.lib()
    except Exception as e:  # pragma: no cover
        _pt.skip(f"native build failed: {e}")

    from grid_tpu.io.formats import write_normalized_output

    z = np.zeros((3, 5))
    mask = np.ones((3, 5), bool)
    p_nat = tmp_path / "e_nat.gz"
    p_py = tmp_path / "e_py.gz"
    args = (["A", "B", "C"], [1.0, 2.0, 3.0], z, mask,
            np.ones(5), np.ones(5), np.empty(0, dtype=int))
    write_normalized_output(p_nat, *args)
    monkeypatch.setenv("GRID_TPU_NATIVE_WRITERS", "0")
    write_normalized_output(p_py, *args)
    a = _gz.open(p_nat, "rb").read()
    assert a == _gz.open(p_py, "rb").read()
    assert a.splitlines()[0] == b"3\t0\t"  # trailing tab preserved


def test_gz_level_override_honored(tmp_path, monkeypatch):
    """GRID_TPU_GZ_LEVEL routes around the fixed-level native writer and
    changes the Python writer's compression level at call time."""
    import gzip as _gz

    import numpy as np

    from grid_tpu.io.formats import write_neighbors_dense

    rng = np.random.default_rng(2)
    n, k = 200, 50
    ids = [f"S{i:04d}" for i in range(n)]
    scales = rng.uniform(1, 40, n)
    idx = rng.integers(0, n, (n, k)).astype(np.int64)
    dists = rng.uniform(0, 3, (n, k))

    p1 = tmp_path / "l1.tsv.gz"
    p9 = tmp_path / "l9.tsv.gz"
    write_neighbors_dense(p1, ids, scales, idx, dists)
    monkeypatch.setenv("GRID_TPU_GZ_LEVEL", "9")
    write_neighbors_dense(p9, ids, scales, idx, dists)
    assert _gz.open(p1, "rb").read() == _gz.open(p9, "rb").read()
    assert p9.stat().st_size < p1.stat().st_size  # level 9 actually applied


def test_batch_ingest_reversed_window_survives(tmp_path):
    """start > end must produce per-file statuses (or empty results), not
    a std::terminate from a negative buffer estimate."""
    import shutil

    import numpy as np
    import pytest as _pt

    if shutil.which("g++") is None:
        _pt.skip("no C++ toolchain")
    try:
        from grid_tpu import native

        native.lib()
    except Exception as e:  # pragma: no cover
        _pt.skip(f"native build failed: {e}")

    from grid_tpu.native._ingest import ingest_batch
    from grid_tpu.synth import make_synthetic_cohort_with_alignments

    cohort = make_synthetic_cohort_with_alignments(
        tmp_path, n_samples=2, seed=3, file_type="bam"
    )
    cfg = cohort["config"]
    from pathlib import Path

    paths = sorted(Path(cfg["directory_loc"]).glob("*.bam"))
    entries = [(str(p), "") for p in paths]
    # reversed window: end << start
    status, counts, covs, bins, _ = ingest_batch(
        entries, cfg["chrom"], cfg["end_bp"], cfg["start_bp"] - 10_000_000,
        cfg["count_reads"]["flags"], threads=2, collect_bins=False,
    )
    assert len(status) == 2  # process survived; outcomes are per-file
