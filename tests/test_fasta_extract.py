"""extract-reference: BED-driven FASTA region extraction
(the reference's commented-out command, grid/cli.py:475-488) and its
chaining into the realignment path."""

import gzip

import numpy as np
import pytest
from click.testing import CliRunner

from grid_tpu.cli import cli
from grid_tpu.io.fasta import (
    extract_reference,
    iter_fasta_contigs,
    read_bed_regions,
)


def _write_genome(path, contigs, width=7):
    """Deliberately awkward line width to exercise .fai arithmetic."""
    with open(path, "w") as f:
        for name, seq in contigs.items():
            f.write(f">{name} description text\n")
            for i in range(0, len(seq), width):
                f.write(seq[i:i + width] + "\n")


def _write_fai(fa_path, contigs, width=7):
    """samtools-faidx layout: name, length, offset, linebases, linewidth."""
    offset = 0
    lines = []
    with open(fa_path, "rb") as f:
        data = f.read()
    pos = 0
    for name, seq in contigs.items():
        header_end = data.index(b"\n", pos) + 1
        offset = header_end
        lines.append(f"{name}\t{len(seq)}\t{offset}\t{width}\t{width + 1}")
        n_lines = -(-len(seq) // width)
        pos = offset + len(seq) + n_lines  # seq bytes + newlines
    with open(str(fa_path) + ".fai", "w") as f:
        f.write("\n".join(lines) + "\n")


@pytest.fixture()
def genome(tmp_path):
    rng = np.random.default_rng(5)
    contigs = {
        "chr1": "".join(rng.choice(list("ACGT"), 101)),
        "chr2": "".join(rng.choice(list("ACGT"), 53)),
    }
    fa = tmp_path / "ref.fa"
    _write_genome(fa, contigs)
    return fa, contigs


def test_streaming_extract_matches_slices(tmp_path, genome):
    fa, contigs = genome
    bed = tmp_path / "r.bed"
    bed.write_text(
        "chr1\t3\t40\texonA\nchr2\t0\t53\n# comment\nchr1\t90\t200\tclamp\n"
    )
    out = extract_reference(fa, bed, tmp_path / "out", "ref_test")
    got = dict(iter_fasta_contigs(out))
    assert got["exonA"] == contigs["chr1"][3:40]
    assert got["chr2:0-53"] == contigs["chr2"]
    assert got["clamp"] == contigs["chr1"][90:]  # end clamped to contig


def test_fai_random_access_matches_streaming(tmp_path, genome):
    fa, contigs = genome
    _write_fai(fa, contigs)
    bed = tmp_path / "r.bed"
    bed.write_text("chr1\t0\t101\tall1\nchr1\t6\t8\ttiny\nchr2\t7\t52\tmid\n")
    out = extract_reference(fa, bed, tmp_path / "out", "via_fai")
    got = dict(iter_fasta_contigs(out))
    assert got["all1"] == contigs["chr1"]
    assert got["tiny"] == contigs["chr1"][6:8]
    assert got["mid"] == contigs["chr2"][7:52]


def test_gzip_fasta_and_bed(tmp_path, genome):
    fa, contigs = genome
    fa_gz = tmp_path / "ref.fa.gz"
    with open(fa) as src, gzip.open(fa_gz, "wt") as dst:
        dst.write(src.read())
    bed_gz = tmp_path / "r.bed.gz"
    with gzip.open(bed_gz, "wt") as f:
        f.write("chr2\t10\t30\tg\n")
    out = extract_reference(fa_gz, bed_gz, tmp_path / "out", "gz")
    assert dict(iter_fasta_contigs(out))["g"] == contigs["chr2"][10:30]


def test_missing_contig_raises(tmp_path, genome):
    fa, _ = genome
    bed = tmp_path / "r.bed"
    bed.write_text("chrMISSING\t0\t10\n")
    with pytest.raises(ValueError, match="absent"):
        extract_reference(fa, bed, tmp_path / "out")


def test_bad_bed_lines_raise(tmp_path, genome):
    fa, _ = genome
    bed = tmp_path / "r.bed"
    bed.write_text("chr1\tnotanint\t10\n")
    with pytest.raises(ValueError, match="non-integer"):
        read_bed_regions(bed)
    bed.write_text("chr1\t20\t10\n")
    with pytest.raises(ValueError, match="invalid interval"):
        read_bed_regions(bed)
    bed.write_text("track name=x\n#only headers\n")
    with pytest.raises(ValueError, match="No regions"):
        read_bed_regions(bed)


def test_cli_and_realign_chain(tmp_path, genome):
    """extract-reference output feeds read_fasta/realign directly: a BED
    naming exon labels yields a realign-ready exon FASTA."""
    from grid_tpu.models.realign import read_fasta

    fa, contigs = genome
    bed = tmp_path / "exons.bed"
    bed.write_text(
        "chr1\t0\t40\t1A\nchr1\t40\t80\t1B_KIV3\nchr2\t0\t40\t1B_KIV2\n"
    )
    runner = CliRunner()
    res = runner.invoke(cli, [
        "extract-reference", "-r", str(fa), "-b", str(bed),
        "-o", str(tmp_path / "out"), "-f", "exons",
    ])
    assert res.exit_code == 0, res.output
    refs = read_fasta(tmp_path / "out" / "exons.fa")
    assert set(refs) == {"1A", "1B_KIV3", "1B_KIV2"}
    assert refs["1A"] == contigs["chr1"][:40]
    assert refs["1B_KIV2"] == contigs["chr2"][:40]
