"""BGZF bed.gz emission (bedwrite.h BedWriter, round 3).

regions.bed.gz is written as BGZF by default — the same block-gzip framing
mosdepth emits (ref: grid/utils/mosdepth.py:209-297 consumes mosdepth output,
which is BGZF + CSI) — with blocks raw-deflated by libdeflate when the
system library exists. The container change must be invisible at the text
level: identical decompressed bytes vs the legacy single-member gzip stream
(GRID_TPU_BED_FORMAT=gzip), readable by both the native bedgz scanner and
Python gzip, valid BGZF framing (BC extra subfield, 28-byte EOF marker).
"""

import gzip
import os
import shutil
import struct

import pytest

pytestmark = pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")


def _native_or_skip():
    try:
        from grid_tpu import native

        native.lib()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"native build failed: {e}")


@pytest.fixture(scope="module")
def bam_cohort(tmp_path_factory):
    from grid_tpu.synth import make_synthetic_cohort_with_alignments

    d = tmp_path_factory.mktemp("bgzfbed")
    make_synthetic_cohort_with_alignments(d, n_samples=1, seed=7, file_type="bam")
    return sorted(d.rglob("*.bam"))[0]


def _emit(bam, out, fmt=None):
    from grid_tpu.native import bam as nb

    old = os.environ.pop("GRID_TPU_BED_FORMAT", None)
    try:
        if fmt:
            os.environ["GRID_TPU_BED_FORMAT"] = fmt
        nb.binned_depth(str(bam), str(out), 1000)
    finally:
        if fmt:
            del os.environ["GRID_TPU_BED_FORMAT"]
        if old is not None:
            os.environ["GRID_TPU_BED_FORMAT"] = old


def _assert_valid_bgzf(raw):
    # every member starts with the gzip magic + FEXTRA and carries the BC
    # subfield whose value is (block size - 1); members tile the file exactly
    off = 0
    n_blocks = 0
    while off < len(raw):
        assert raw[off : off + 4] == b"\x1f\x8b\x08\x04", f"bad magic at {off}"
        xlen = struct.unpack_from("<H", raw, off + 10)[0]
        extra = raw[off + 12 : off + 12 + xlen]
        assert extra[:4] == b"BC\x02\x00", "missing BC subfield"
        bsize = struct.unpack_from("<H", extra, 4)[0] + 1
        # ISIZE of the member == uncompressed payload length
        isize = struct.unpack_from("<I", raw, off + bsize - 4)[0]
        assert isize <= 0xFF00, "payload exceeds BGZF cap"
        off += bsize
        n_blocks += 1
    assert off == len(raw), "blocks do not tile the file"
    # final member is the canonical 28-byte EOF marker
    assert raw[-28:] == bytes(
        [0x1F, 0x8B, 0x08, 0x04, 0, 0, 0, 0, 0, 0xFF, 0x06, 0x00, 0x42, 0x43,
         0x02, 0x00, 0x1B, 0x00, 0x03, 0x00, 0, 0, 0, 0, 0, 0, 0, 0]
    )
    return n_blocks


def test_bgzf_default_text_identical_to_gzip(bam_cohort, tmp_path):
    _native_or_skip()
    a, b = tmp_path / "a.regions.bed.gz", tmp_path / "b.regions.bed.gz"
    _emit(bam_cohort, a)  # default: BGZF
    _emit(bam_cohort, b, fmt="gzip")  # legacy stream
    ta, tb = gzip.open(a, "rb").read(), gzip.open(b, "rb").read()
    assert ta == tb and ta.count(b"\n") > 1000
    n_blocks = _assert_valid_bgzf(a.read_bytes())
    assert n_blocks > 2  # dense genome bed spans many blocks
    # legacy file is NOT BGZF (single gzip member without BC extra)
    assert b.read_bytes()[3] != 0x04


def test_bgzf_readable_by_native_scanner(bam_cohort, tmp_path):
    """The native bedgz reader (gzread) and io.bed must read BGZF identically
    to the legacy stream — same staged regions."""
    _native_or_skip()
    from grid_tpu.io.bed import read_regions_bed_gz

    a, b = tmp_path / "a.regions.bed.gz", tmp_path / "b.regions.bed.gz"
    _emit(bam_cohort, a)
    _emit(bam_cohort, b, fmt="gzip")
    chrom = next(
        line.split(b"\t")[0].decode()
        for line in gzip.open(a, "rb")
        if float(line.rsplit(b"\t", 1)[1]) > 0
    )
    ra = read_regions_bed_gz(a, chrom, 0, 10**9, {})
    rb = read_regions_bed_gz(b, chrom, 0, 10**9, {})
    for xa, xb in zip(ra, rb):
        assert list(xa) == list(xb)
    assert len(ra[0]) > 0


def test_fused_ingest_emits_bgzf(tmp_path):
    """The one-pass ingest writes its bed.gz through the same BedWriter, so
    the artifact must be BGZF-framed too."""
    _native_or_skip()
    import copy

    from grid_tpu.pipeline import run_wgs_pipeline
    from grid_tpu.synth import make_synthetic_cohort_with_alignments
    from pathlib import Path

    cohort = make_synthetic_cohort_with_alignments(
        tmp_path / "c", n_samples=2, seed=5, file_type="bam"
    )
    cfg = copy.deepcopy(cohort["config"])
    cfg.setdefault("device", {})["fused_ingest"] = "true"
    cfg["compute_haploid_genotypes"]["run"] = False
    run_wgs_pipeline(console=None, config=cfg)
    beds = sorted(Path(cfg["mosdepth"]["work_dir"]).glob("*.regions.bed.gz"))
    assert beds
    for bed in beds:
        _assert_valid_bgzf(bed.read_bytes())


def test_zero_run_cache_byte_parity_multi_contig(tmp_path, monkeypatch):
    """The zero-run block cache (round 4) must be invisible at the text
    level: covered contig + all-zero contig + partial final bin (length
    not a bin multiple) produce identical decompressed bytes with the
    cache on (default), off (GRID_TPU_BED_NOCACHE=1), and in the legacy
    gzip container."""
    _native_or_skip()
    import numpy as np

    from grid_tpu.io.bamlite import encode_record, write_bam
    from grid_tpu.native import bam

    rng = np.random.default_rng(5)
    recs = []
    for i, pos in enumerate(np.sort(rng.integers(0, 1_900_000, 300))):
        recs.append(encode_record(0, int(pos), 99, mapq=40,
                                  read_name=f"r{i}", seq_len=100,
                                  next_refid=0, next_pos=int(pos) + 150))
    # chrM: 16571 bp -> final bin [16000, 16571); chr7 stays all-zero
    bam_path = tmp_path / "m.bam"
    write_bam(bam_path, [("chr6", 2_000_000), ("chr7", 1_000_000),
                         ("chrM", 16_571)], recs)

    outs = {}
    for mode, env in [
        ("cached", {}),
        ("nocache", {"GRID_TPU_BED_NOCACHE": "1"}),
        ("gzip", {"GRID_TPU_BED_FORMAT": "gzip"}),
    ]:
        for k in ("GRID_TPU_BED_NOCACHE", "GRID_TPU_BED_FORMAT"):
            monkeypatch.delenv(k, raising=False)
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        out = tmp_path / f"{mode}.bed.gz"
        bam.binned_depth(bam_path, out, bin_size=1000)
        outs[mode] = gzip.open(out, "rb").read()

    assert outs["cached"] == outs["nocache"]
    assert outs["cached"] == outs["gzip"]
    text = outs["cached"].decode()
    assert "chrM\t16000\t16571\t" in text            # partial final bin
    assert text.count("chr7\t") == 1000              # all-zero contig kept


def test_native_depth_parse_bit_exact_vs_python_float(tmp_path):
    """The scanner's fast fixed-point depth parse must be BIT-identical to
    Python float()/strtod across formats — fixed-point, full-precision
    repr (17 digits -> slow path), exponent forms, trailing dot, sign —
    in BOTH containers (plain gzip stream and BGZF blocks)."""
    import gzip
    import random
    import struct

    from grid_tpu.io.bamlite import bgzf_compress
    from grid_tpu.io.bed import read_regions_bed_gz, _native_reader

    if _native_reader() is None:
        pytest.skip("native library unavailable")

    rng = random.Random(11)
    rows, vals = [], []
    for i in range(8000):
        kind = rng.randrange(8)
        if kind == 0:
            t = f"{rng.uniform(0, 1000):.2f}"
        elif kind == 1:
            t = str(rng.randrange(0, 10**6))
        elif kind == 2:
            t = f"{rng.uniform(0, 1):.6f}"
        elif kind == 3:
            t = f"{rng.uniform(0, 1e12):.3f}"
        elif kind == 4:
            t = repr(rng.uniform(0, 1e4))
        elif kind == 5:
            t = f"{rng.uniform(0, 100):e}"
        elif kind == 6:
            t = f"{rng.randrange(1, 99)}."
        else:
            t = f"{rng.uniform(0.01, 50):.2f}"
        v = float(t)
        if v <= 0:
            t, v = "1.5", 1.5
        rows.append((i * 1000, i * 1000 + 1000, t))
        vals.append(v)
    text = "".join(
        f"chr1\t{s}\t{e}\t{t}\n" for (s, e, t) in rows
    ).encode()

    plain = tmp_path / "plain.bed.gz"
    with gzip.open(plain, "wb") as f:
        f.write(text)
    blocked = tmp_path / "blocked.bed.gz"
    blocked.write_bytes(bgzf_compress(text))

    for path in (plain, blocked):
        _, _, d = read_regions_bed_gz(path, "chr1", 0, 10**12, {})
        assert len(d) == len(vals)
        for got, want in zip(d, vals):
            assert struct.pack("<d", got) == struct.pack("<d", want), (
                path.name, got, want)


def test_bgzf_scan_corrupt_inputs_degrade_gracefully(tmp_path):
    """A lying BC size must fall back to the pure reader (the extra field
    is opaque to generic gzip, so the file is still readable); a truncated
    file raises like any truncated gzip (per-sample catch upstream)."""
    from grid_tpu.io.bamlite import bgzf_compress
    from grid_tpu.io.bed import read_regions_bed_gz

    text = b"chr1\t0\t1000\t5.00\nchr1\t1000\t2000\t6.00\n"
    blob = bgzf_compress(text)

    bad = bytearray(blob)
    bad[17] ^= 0xFF  # corrupt BSIZE inside the BC extra subfield
    p = tmp_path / "badsize.bed.gz"
    p.write_bytes(bytes(bad))
    s, e, d = read_regions_bed_gz(p, "chr1", 0, 10**9, {})
    assert list(s) == [0, 1000] and list(d) == [5.0, 6.0]

    p2 = tmp_path / "trunc.bed.gz"
    p2.write_bytes(blob[: len(blob) // 2])
    with pytest.raises(Exception):
        read_regions_bed_gz(p2, "chr1", 0, 10**9, {})


def test_native_grouped_reader_matches_python(tmp_path):
    """grid_bed_read_grouped must match the pure-Python grouped reader
    segment-for-segment: normalized names, file-order runs (a chromosome
    reappearing later opens a NEW segment), depth>0 filter, kb-bin mask,
    junk lines skipped — in both containers."""
    import gzip

    import numpy as np

    import grid_tpu.io.bed as bed
    import grid_tpu.native.bedgz as nb
    from grid_tpu.io.bamlite import bgzf_compress

    _native_or_skip()
    rng = np.random.default_rng(5)
    lines = ["# header junk\n", "short\tline\n", "chr1\tnotint\t5\t1.0\n"]
    for chrom in ("1", "chr2", "X", "chr2"):
        base = 10_000 if chrom != "chr2" else 50_000
        for i in range(500):
            s = base + i * 1000
            lines.append(f"{chrom}\t{s}\t{s + 1000}\t{rng.uniform(-1, 30):.2f}\n")
    text = "".join(lines).encode()
    excluded = {"chr1": {12, 13}, "chrX": {11}}

    plain = tmp_path / "plain.bed.gz"
    with gzip.open(plain, "wb") as f:
        f.write(text)
    blocked = tmp_path / "blocked.bed.gz"
    blocked.write_bytes(bgzf_compress(text))

    for path in (plain, blocked):
        native = nb.read_regions_bed_gz_grouped(path, excluded)
        real = nb.read_regions_bed_gz_grouped
        nb.read_regions_bed_gz_grouped = None  # force the Python fallback
        try:
            py = bed.read_regions_bed_gz_grouped(path, excluded)
        finally:
            nb.read_regions_bed_gz_grouped = real
        assert [s[0] for s in native] == [s[0] for s in py]
        for (_, sn, en, dn), (_, sp, ep, dp) in zip(native, py):
            np.testing.assert_array_equal(sn, sp)
            np.testing.assert_array_equal(en, ep)
            np.testing.assert_array_equal(dn, dp)
