"""Host-side staging: per-sample region scans -> dense device-ready arrays.

The reference makes TWO full gzip passes over every sample's genome-wide
bed.gz (population means, then per-sample extraction —
grid/utils/normalize_mosdepth.py:218-301 and :304-357). Since both passes
apply identical line filters, grid_tpu scans each file ONCE, keeps the
filtered (region, depth) pairs, and derives population means from the kept
data — half the ingestion IO with bit-identical semantics.

Parallel scanning uses a thread pool (gzip/zlib release the GIL in the C
layer; the native reader releases it fully).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import NamedTuple

import numpy as np

from grid_tpu.io.bed import map_bed_gz_to_samples, read_regions_bed_gz
from grid_tpu.utils.logging import log


class CohortStage(NamedTuple):
    """Dense staged cohort ready for device transfer.

    Attributes:
        sample_ids: N sample IDs, sorted ascending (reference row order,
            grid/utils/normalize_mosdepth.py:392-393).
        regions: list of (start, end) tuples, sorted ascending (column order).
        values: [N, R] float64 raw depths (0 where ~mask).
        mask: [N, R] bool.
    """

    sample_ids: list
    regions: list
    values: np.ndarray
    mask: np.ndarray


def scan_cohort_regions(
    sample_to_bed: dict[str, Path],
    chromosome: str | None,
    start: int | None,
    end: int | None,
    excluded: dict | None,
    threads: int = 1,
    console=None,
) -> dict[str, dict[tuple[int, int], float]]:
    """Scan every sample's regions.bed.gz once, returning
    {sample: {(start, end): depth}} after window/depth/mask filters.

    A sample whose file is missing or unreadable yields an empty dict
    (reference behavior: per-sample failure leaves the cohort running,
    grid/utils/normalize_mosdepth.py:353-355).
    """

    def _scan(item):
        sid, path = item
        try:
            if not Path(path).exists():
                return sid, {}
            starts, ends, depths = read_regions_bed_gz(path, chromosome, start, end, excluded)
            return sid, {(int(s), int(e)): float(d) for s, e, d in zip(starts, ends, depths)}
        except Exception as e:  # pragma: no cover - defensive
            log(console, f"Error reading {sid}: {e}", style="danger")
            return sid, {}

    out: dict[str, dict[tuple[int, int], float]] = {}
    if threads <= 1:
        for item in sample_to_bed.items():
            sid, regions = _scan(item)
            out[sid] = regions
    else:
        with ThreadPoolExecutor(max_workers=threads) as ex:
            for sid, regions in ex.map(_scan, sample_to_bed.items()):
                out[sid] = regions
    return out


def population_mean_depths(
    per_sample: dict[str, dict[tuple[int, int], float]],
) -> dict[tuple[int, int], float]:
    """Population mean depth per region over samples carrying it
    (ref: grid/utils/normalize_mosdepth.py:289-301)."""
    sums: dict[tuple[int, int], float] = {}
    counts: dict[tuple[int, int], int] = {}
    for regions in per_sample.values():
        for region, d in regions.items():
            sums[region] = sums.get(region, 0.0) + d
            counts[region] = counts.get(region, 0) + 1
    return {r: sums[r] / counts[r] for r in sums if counts[r] > 0}


def stage_cohort(
    mosdepth_dir,
    samples,
    chromosome,
    start,
    end,
    excluded,
    min_depth: float,
    max_depth: float,
    threads: int = 1,
    console=None,
) -> CohortStage:
    """Full staging: map files, single scan, population-mean region filter,
    dense matrix build. Mirrors the reference's region/sample semantics:

    - regions kept iff min_depth <= population mean <= max_depth
      (grid/utils/normalize_mosdepth.py:81-83);
    - samples with zero surviving regions dropped with a warning
      (filter_empty_samples, :576-600);
    - rows sorted by sample ID, columns by (start, end).
    """
    sample_to_bed = map_bed_gz_to_samples(mosdepth_dir, samples)
    if not sample_to_bed:
        raise FileNotFoundError(f"No mosdepth files found in {mosdepth_dir}")

    per_sample = scan_cohort_regions(
        sample_to_bed, chromosome, start, end, excluded, threads, console
    )

    pop_means = population_mean_depths(per_sample)
    valid_regions = {r for r, m in pop_means.items() if min_depth <= m <= max_depth}

    filtered = {
        sid: {r: d for r, d in regions.items() if r in valid_regions}
        for sid, regions in per_sample.items()
    }
    n_before = len(filtered)
    filtered = {sid: regions for sid, regions in filtered.items() if regions}
    n_removed = n_before - len(filtered)
    if n_removed > 0:
        log(console, f"Removed {n_removed} samples with 0 regions", style="warning")
    if not filtered:
        raise ValueError("No valid samples with regions found.")

    sample_ids = sorted(filtered.keys())
    region_set: set[tuple[int, int]] = set()
    for regions in filtered.values():
        region_set.update(regions.keys())
    regions_list = sorted(region_set)
    region_index = {r: j for j, r in enumerate(regions_list)}

    n, r = len(sample_ids), len(regions_list)
    values = np.zeros((n, r), dtype=np.float64)
    mask = np.zeros((n, r), dtype=bool)
    for i, sid in enumerate(sample_ids):
        for region, d in filtered[sid].items():
            j = region_index[region]
            values[i, j] = d
            mask[i, j] = True

    return CohortStage(sample_ids=sample_ids, regions=regions_list, values=values, mask=mask)
