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
