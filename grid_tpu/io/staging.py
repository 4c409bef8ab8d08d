"""Host-side staging: per-sample region scans -> dense device-ready arrays.

The reference makes TWO full gzip passes over every sample's genome-wide
bed.gz (population means, then per-sample extraction —
grid/utils/normalize_mosdepth.py:218-301 and :304-357). Since both passes
apply identical line filters, grid_tpu scans each file ONCE, keeps the
filtered (region, depth) arrays, and derives population means from the kept
data — half the ingestion IO with bit-identical semantics.

Implementation notes for cohort scale:

- per-sample results are kept as compact numpy arrays (starts, ends,
  depths), not dicts — the region universe and the matrix fill use
  vectorized ``np.unique`` / ``np.searchsorted`` instead of hash lookups;
- duplicate regions within one file follow the reference's dict semantics
  (later lines overwrite earlier ones);
- parallel scanning uses a thread pool (zlib releases the GIL; the native
  reader releases it fully).
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
        regions: [R, 2] int64 array of (start, end), sorted ascending.
        values: [N, R] float64 raw depths (0 where ~mask).
        mask: [N, R] bool.
    """

    sample_ids: list
    regions: np.ndarray
    values: np.ndarray
    mask: np.ndarray


def _dedupe_last_wins(starts, ends, depths):
    """Keep the LAST occurrence of each (start, end) pair, preserving the
    reference's dict-overwrite semantics for duplicate lines."""
    if len(starts) == 0:
        return starts, ends, depths
    keys = np.stack([starts, ends], axis=1)
    # np.unique keeps the first occurrence; reverse so the last wins
    _, idx = np.unique(keys[::-1], axis=0, return_index=True)
    keep = len(starts) - 1 - idx
    keep.sort()
    return starts[keep], ends[keep], depths[keep]


def scan_cohort_regions(
    sample_to_bed: dict[str, Path],
    chromosome: str | None,
    start: int | None,
    end: int | None,
    excluded: dict | None,
    threads: int = 1,
    console=None,
) -> dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Scan every sample's regions.bed.gz once, returning
    {sample: (starts, ends, depths)} after window/depth/mask filters.

    A sample whose file is missing or unreadable yields empty arrays
    (reference behavior: per-sample failure leaves the cohort running,
    grid/utils/normalize_mosdepth.py:353-355).
    """

    empty = (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.float64))

    def _scan(item):
        sid, path = item
        try:
            if not Path(path).exists():
                return sid, empty
            s, e, d = read_regions_bed_gz(path, chromosome, start, end, excluded)
            return sid, _dedupe_last_wins(s, e, d)
        except Exception as exc:  # pragma: no cover - defensive
            log(console, f"Error reading {sid}: {exc}", style="danger")
            return sid, empty

    out = {}
    if threads <= 1:
        for item in sample_to_bed.items():
            sid, arrays = _scan(item)
            out[sid] = arrays
    else:
        with ThreadPoolExecutor(max_workers=threads) as ex:
            for sid, arrays in ex.map(_scan, sample_to_bed.items()):
                out[sid] = arrays
    return out


def population_mean_depths(per_sample):
    """Population mean depth per region over samples carrying it
    (ref: grid/utils/normalize_mosdepth.py:289-301).

    Returns (regions [M, 2] sorted, means [M]).
    """
    all_keys = [
        np.stack([s, e], axis=1) for (s, e, _) in per_sample.values() if len(s)
    ]
    if not all_keys:
        return np.empty((0, 2), np.int64), np.empty(0, np.float64)
    keys = np.concatenate(all_keys, axis=0)
    depths = np.concatenate([d for (_, _, d) in per_sample.values() if len(d)])
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    sums = np.zeros(len(uniq))
    counts = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(sums, inv, depths)
    np.add.at(counts, inv, 1)
    return uniq, sums / counts


def _composite(starts, ends):
    """Pack (start, end) into one sortable uint64 (genomic coordinates are
    < 2^32, so the pair fits exactly and lexicographic order is preserved)."""
    return (np.asarray(starts, np.uint64) << np.uint64(32)) | np.asarray(ends, np.uint64)


def _region_search(regions: np.ndarray, starts, ends):
    """Map (start, end) pairs to row indices in the (start, end)-sorted
    [M, 2] regions array via exact binary search; -1 for misses."""
    if len(regions) == 0 or len(starts) == 0:
        return np.full(len(starts), -1, dtype=np.int64)
    reg_keys = _composite(regions[:, 0], regions[:, 1])
    keys = _composite(starts, ends)
    pos = np.searchsorted(reg_keys, keys)
    pos_c = pos.clip(max=len(reg_keys) - 1)
    idx = np.where((pos < len(reg_keys)) & (reg_keys[pos_c] == keys), pos_c, -1)
    return idx.astype(np.int64)


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

    uniq_regions, pop_means = population_mean_depths(per_sample)
    keep = (pop_means >= min_depth) & (pop_means <= max_depth)
    valid_regions = uniq_regions[keep]

    # per-sample projection onto the valid-region universe
    projected: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for sid, (s, e, d) in per_sample.items():
        idx = _region_search(valid_regions, s, e)
        hit = idx >= 0
        projected[sid] = (idx[hit], d[hit])

    n_before = len(projected)
    projected = {sid: v for sid, v in projected.items() if len(v[0])}
    n_removed = n_before - len(projected)
    if n_removed > 0:
        log(console, f"Removed {n_removed} samples with 0 regions", style="warning")
    if not projected:
        raise ValueError("No valid samples with regions found.")

    sample_ids = sorted(projected.keys())

    # column universe: regions carried by >=1 surviving sample
    col_used = np.zeros(len(valid_regions), dtype=bool)
    for idx, _ in projected.values():
        col_used[idx] = True
    col_map = np.full(len(valid_regions), -1, dtype=np.int64)
    col_map[col_used] = np.arange(col_used.sum())
    regions = valid_regions[col_used]

    n, r = len(sample_ids), int(col_used.sum())
    values = np.zeros((n, r), dtype=np.float64)
    mask = np.zeros((n, r), dtype=bool)
    for i, sid in enumerate(sample_ids):
        idx, d = projected[sid]
        cols = col_map[idx]
        values[i, cols] = d
        mask[i, cols] = True

    return CohortStage(sample_ids=sample_ids, regions=regions, values=values, mask=mask)
