"""Multi-locus sweep: one staged cohort, many VNTR windows.

The reference is strictly single-locus — a whole pipeline run per VNTR
(examples/1000G_example.sh resolves ONE gene's coordinates from the
734-region catalog, :58,87). grid_tpu's TPU-first extension: the expensive
cohort-level work (genome-wide binned coverage -> normalize -> kNN) is
LOCUS-INDEPENDENT, so it runs once; only the cheap window-indexed pieces
(read counting in the locus window, dipCN, phasing) repeat per locus.

Per-locus artifacts get a ``.{GENE}`` prefix suffix, so a sweep over the
bundled catalog produces one counts/dipCN/haploid table per gene next to the
shared normalized-matrix and neighbors artifacts.
"""

from __future__ import annotations

import copy
from pathlib import Path

from grid_tpu.data.loci import Locus, resolve_locus
from grid_tpu.utils.logging import log

# steps whose artifacts depend on the locus window and therefore re-run per
# locus with suffixed output prefixes
_PER_LOCUS_PREFIXES = (
    ("count_reads", "output_file_prefix"),
    ("compute_diploid_genotypes", "output_file_prefix"),
    ("compute_haploid_genotypes", "output_file_prefix"),
    ("compute_ibs", "output_file_prefix"),
)


def locus_config(config: dict, locus: Locus) -> dict:
    """A deep-copied config re-targeted at ``locus``: window coordinates
    swapped in, per-locus output prefixes suffixed ``.{gene}``, and the IBS
    focal position re-centered on the window midpoint."""
    cfg = copy.deepcopy(config)
    cfg["chrom"] = locus.chrom
    cfg["start_bp"] = locus.start
    cfg["end_bp"] = locus.end
    tag = locus.gene.split(",")[0] or f"{locus.chrom}_{locus.start}"
    for section, key in _PER_LOCUS_PREFIXES:
        sec = cfg.get(section)
        if isinstance(sec, dict) and sec.get(key):
            sec[key] = f"{sec[key]}.{tag}"
    ibs = cfg.get("compute_ibs")
    if isinstance(ibs, dict) and ibs.get("run") is True:
        ibs["focal_bp"] = (locus.start + locus.end) // 2
        hap = cfg.get("compute_haploid_genotypes")
        if isinstance(hap, dict) and hap.get("ibs_output"):
            # regenerating IBS per locus: a single shared IBS file cannot
            # serve every locus; the per-locus path is derived from the
            # (suffixed) compute_ibs prefix by the orchestrator
            hap["ibs_output"] = None
    return cfg


def run_multi_locus(config, genes, console=None, catalog=None):
    """Run the WGS pipeline across many catalog loci, sharing the
    locus-independent steps.

    Phase 1 (once): index check/create, genome-binned coverage, normalize,
    find_neighbors — exactly the base config's steps 1, 3, 4, 5.
    Phase 2 (per locus): count_reads in the locus window, dipCN against the
    shared neighbors, optional native IBS (focal re-centered) + phasing.

    Args:
        config: dict or YAML path (base config; its chrom/start/end are
            overridden per locus).
        genes: gene names resolved against the VNTR catalog.
        catalog: optional catalog path (default: bundled 734-region table).

    Returns {gene: locus} for the loci that ran.
    """
    from grid_tpu.config import apply_defaults, error_check_config, load_config
    from grid_tpu.pipeline import run_wgs_pipeline

    if isinstance(config, (str, Path)):
        config = load_config(config)
    error_check_config(config, console)
    config = apply_defaults(config)

    loci = {g: resolve_locus(g, catalog) for g in genes}

    # ---- phase 1: locus-independent cohort work (run once) --------------
    shared = copy.deepcopy(config)
    for section in ("count_reads", "compute_ibs", "compute_diploid_genotypes",
                    "compute_haploid_genotypes"):
        shared.setdefault(section, {})["run"] = False
    shared.setdefault("device", {})["fused"] = False  # fused needs all of 4-7
    log(console, f"Multi-locus sweep: shared steps (coverage/normalize/kNN) "
                 f"for {len(loci)} loci", style="info")
    run_wgs_pipeline(console, shared, validate=False)

    # ---- phase 2: per-locus window steps ---------------------------------
    for gene, locus in loci.items():
        log(console, f"[{gene}] {locus.chrom}:{locus.start:,}-{locus.end:,}",
            style="info")
        cfg = locus_config(config, locus)
        # the shared steps are done; disable them in the per-locus pass
        cfg.setdefault("index", {})["run"] = None
        for path in (("mosdepth",), ("mosdepth", "normalize"), ("mosdepth", "neighbors")):
            sec = cfg
            for kkey in path:
                sec = sec.setdefault(kkey, {})
            sec["run"] = False
        cfg.setdefault("device", {})["fused"] = False
        run_wgs_pipeline(console, cfg, validate=False)
    return loci
