"""Locus catalogs and hardcoded coordinates.

The reference's data tables (SURVEY §2.2) are BUNDLED under
``grid_tpu/data/files/``:

- ``files/734_possible_coding_vntr_regions.IBD2R_gt_0.25.uniq.txt`` — the
  Mukamel 2021 VNTR catalog the examples use to look up LPA coordinates
  (ref examples/1000G_example.sh:87: ``awk '$7=="LPA" {...; exit}'``);
  :func:`load_vntr_catalog` parses that exact format (7+ whitespace columns:
  CHR BP_START_HG38 BP_END_HG38 SAMTOOLS_START SAMTOOLS_END IBD2R GENE) and
  defaults to the bundled copy.
- ``files/hardcoded_positions.txt`` — KIV-2 repeat unit starts; the hg38
  values are also inlined below as the realignment anchor positions.

:func:`resolve_locus` is the ``wgs --locus GENE`` lookup: first catalog row
whose GENE matches, mirroring the reference's ``awk ... exit`` semantics
(several genes appear more than once in the table).
"""

from __future__ import annotations

from pathlib import Path
from typing import NamedTuple

BUNDLED_CATALOG = (
    Path(__file__).parent
    / "files"
    / "734_possible_coding_vntr_regions.IBD2R_gt_0.25.uniq.txt"
)
BUNDLED_HARDCODED_POSITIONS = Path(__file__).parent / "files" / "hardcoded_positions.txt"


class Locus(NamedTuple):
    chrom: str
    start: int
    end: int
    gene: str


# The validated flagship locus: LPA KIV-2 (hg38), README.md:12-14 and
# example_config.yaml:9-11 of the reference.
LPA_KIV2_HG38 = Locus(chrom="chr6", start=160_605_062, end=160_647_661, gene="LPA")

# KIV-2 repeat-unit start positions, from the reference's
# files/hardcoded_positions.txt (columns: hg38, hg19) — anchors for the
# per-exon realignment path.
KIV2_REPEAT_STARTS_HG38 = (
    160_611_000,
    160_611_561,
    160_617_116,
    160_622_662,
    160_628_206,
    160_633_752,
    160_639_299,
    160_644_846,
)

KIV2_REPEAT_STARTS_HG19 = (
    161_032_032,
    161_032_593,
    161_038_148,
    161_043_694,
    161_049_238,
    161_054_784,
    161_060_331,
    161_065_878,
)


def load_vntr_catalog(path=None) -> list[Locus]:
    """Parse a VNTR catalog in the Mukamel-2021 table format used by the
    reference examples (whitespace columns, header row, GENE last).
    Defaults to the bundled 734-region catalog."""
    if path is None:
        path = BUNDLED_CATALOG
    loci: list[Locus] = []
    with open(path) as f:
        header = f.readline().split()
        try:
            gene_idx = header.index("GENE")
        except ValueError:
            gene_idx = -1
        for line in f:
            parts = line.split()
            if len(parts) < 3:
                continue
            try:
                chrom = parts[0] if parts[0].startswith("chr") else f"chr{parts[0]}"
                start = int(parts[1])
                end = int(parts[2])
            except ValueError:
                continue
            gene = parts[gene_idx] if gene_idx != -1 and len(parts) > gene_idx else ""
            loci.append(Locus(chrom, start, end, gene))
    return loci


def find_locus(loci: list[Locus], gene: str) -> Locus | None:
    for locus in loci:
        if locus.gene == gene:
            return locus
    return None


def resolve_locus(gene: str, catalog_path=None) -> Locus:
    """Look a gene up in the (bundled by default) VNTR catalog.

    GENE column entries may be comma-separated lists (e.g.
    ``AC005324.4,ZNF286A``); a query matches any list member. Raises
    ``KeyError`` with nearby suggestions when absent.
    """
    loci = load_vntr_catalog(catalog_path)
    hit = find_locus(loci, gene)
    if hit is not None:
        return hit
    for locus in loci:
        if gene in locus.gene.split(","):
            return locus
    close = sorted({l.gene for l in loci if gene.lower() in l.gene.lower()})[:5]
    hint = f"; close matches: {', '.join(close)}" if close else ""
    raise KeyError(f"locus {gene!r} not in the VNTR catalog{hint}")
