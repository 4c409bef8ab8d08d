"""Realignment path end-to-end: exon FASTA -> BAM reads -> SW classification
-> counts file -> exon dipCN -> KIV2 estimate (the complete legacy path the
reference left broken)."""

import shutil

import numpy as np
import pytest
from click.testing import CliRunner

from grid_tpu.cli import cli

pytestmark = pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")


def _seq(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


@pytest.fixture(scope="module")
def exon_world(tmp_path_factory):
    rng = np.random.default_rng(13)
    base = tmp_path_factory.mktemp("realign")
    # three distinguishable exon references; the 1B pair share a backbone so
    # some reads genuinely tie
    backbone = _seq(rng, 120)
    exons = {
        "1A": _seq(rng, 120),
        "1B_KIV3": backbone[:60] + _seq(rng, 10) + backbone[70:],
        "1B_KIV2": backbone[:60] + _seq(rng, 10) + backbone[70:],
    }
    fasta = base / "exons.fa"
    with open(fasta, "w") as f:
        for name, seq in exons.items():
            f.write(f">{name}\n{seq}\n")
    return base, exons, fasta, rng


def _reads_for(rng, exons, n_per, read_len=50):
    reads, truth = [], []
    for label in ("1A", "1B_KIV3", "1B_KIV2"):
        seq = exons[label]
        for _ in range(n_per):
            start = int(rng.integers(0, len(seq) - read_len))
            read = list(seq[start : start + read_len])
            read[int(rng.integers(read_len))] = str(rng.choice(list("ACGT")))
            reads.append("".join(read))
            truth.append(label)
    # backbone-only reads: genuinely tied between the 1B variants
    bb = exons["1B_KIV3"][:55]
    for _ in range(n_per):
        start = int(rng.integers(0, 5))
        reads.append(bb[start : start + read_len])
        truth.append("1B_tied")
    return reads, truth


def test_classification_counts(exon_world):
    from grid_tpu.models.realign import classify_window_reads

    _, exons, _, rng = exon_world
    reads, truth = _reads_for(rng, exons, n_per=15)
    counts = classify_window_reads(reads, exons, min_score=60, margin=3)
    assert counts["1A"] >= 13
    # 1B reads whose span misses the 10bp variant window are GENUINELY tied
    # (the variants share the backbone), so distinct counts are a subset
    assert counts["1B_KIV3"] >= 8
    assert counts["1B_KIV2"] >= 8
    assert counts["1B_tied"] >= 13
    # every 1B-origin read lands in one of the three 1B buckets
    assert counts["1B_KIV3"] + counts["1B_KIV2"] + counts["1B_tied"] >= 42


def test_realign_cli_end_to_end(exon_world, tmp_path):
    from grid_tpu.io.bamlite import encode_record, write_bam

    base, exons, fasta, rng = exon_world
    aln = tmp_path / "aln"
    aln.mkdir()
    window = (1000, 2000)
    truth_counts = {}
    for sid, n_per in [("SAMP1", 12), ("SAMP2", 20)]:
        reads, _ = _reads_for(rng, exons, n_per=n_per)
        recs = [
            encode_record(0, int(window[0] + i % 900), 99, read_name=f"{sid}r{i}", seq=s)
            for i, s in enumerate(reads)
        ]
        recs.sort(key=lambda r: int.from_bytes(r[8:12], "little"))
        write_bam(aln / f"{sid}.bam", [("chr6", 10_000)], recs)
        truth_counts[sid] = 4 * n_per

    counts_file = tmp_path / "exon_counts.tsv"
    result = CliRunner().invoke(cli, [
        "realign", "-C", str(aln), "--exon-fasta", str(fasta),
        "-c", "chr6", "-s", "0", "-e", "10000", "-o", str(counts_file),
        "--min-score", "60", "--margin", "3",
    ])
    assert result.exit_code == 0, result.output

    from grid_tpu.models.kiv_io import load_count_results

    counts = load_count_results(counts_file)
    assert set(counts) == {"SAMP1", "SAMP2"}
    for sid, total in truth_counts.items():
        got = sum(counts[sid].values())
        assert got >= int(0.9 * total), (sid, got, total)

    # exon dipCN over a fabricated neighbors file, then the KIV2 estimate
    nbr_file = tmp_path / "nbrs.tsv"
    nbr_file.write_text(
        "SAMP1\t1.00\tSAMP2\t1.00\t0.10\nSAMP2\t1.00\tSAMP1\t1.00\t0.10\n"
    )
    for exon_type, out_name in [("1A", "dip_1a.tsv"), ("1B", "dip_1b.tsv")]:
        result = CliRunner().invoke(cli, [
            "exon-dipcn", "--counts", str(counts_file), "--neighbors", str(nbr_file),
            "--exon-type", exon_type, "-o", str(tmp_path / out_name),
        ])
        assert result.exit_code == 0, result.output

    kiv_out = tmp_path / "kiv.tsv"
    result = CliRunner().invoke(cli, [
        "estimate-kiv", "--exon1a", str(tmp_path / "dip_1a.tsv"),
        "--exon1b", str(tmp_path / "dip_1b.tsv"), "-o", str(kiv_out),
    ])
    assert result.exit_code == 0, result.output
    lines = kiv_out.read_text().splitlines()
    assert len(lines) == 3  # header + 2 samples
    # SAMP1 vs SAMP2 ratio of counts ~ 12/20 -> dipCN ~ 0.6/1.67; estimates finite
    for line in lines[1:]:
        vals = [float(x) for x in line.split("\t")[1:]]
        assert all(np.isfinite(vals))
