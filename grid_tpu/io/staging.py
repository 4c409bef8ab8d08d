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


# ------------------------------------------------------- streaming stager ---


def stage_cohort_streaming(
    mosdepth_dir,
    samples,
    chromosome,
    start,
    end,
    excluded,
    min_depth: float,
    max_depth: float,
    bin_size: int = 1000,
    threads: int = 1,
    console=None,
) -> CohortStage:
    """Bounded-memory staging for very large cohorts (single chromosome,
    regular mosdepth bin grid).

    Two passes over the files (like the reference, but with dense-array
    accumulators instead of locked dicts): pass 1 streams each sample once,
    folding depths into per-bin population sums/counts indexed by
    ``start // bin_size`` and DISCARDING the arrays — O(R) accumulator
    memory regardless of N; pass 2 re-scans each file and writes its matrix
    row directly. Peak memory is the final [N, R_kept] matrix plus O(R),
    instead of every sample's raw region arrays at once (the in-memory
    stager's cost). The extra IO pass mirrors the reference's own two-pass
    design (grid/utils/normalize_mosdepth.py:218-357).

    Falls back to :func:`stage_cohort` when no chromosome filter is given or
    the inputs are not a regular grid.
    """
    sample_to_bed = map_bed_gz_to_samples(mosdepth_dir, samples)
    if not sample_to_bed:
        raise FileNotFoundError(f"No mosdepth files found in {mosdepth_dir}")
    if chromosome is None:
        return stage_cohort(
            mosdepth_dir, samples, chromosome, start, end, excluded,
            min_depth, max_depth, threads, console,
        )

    def _scan(item):
        sid, path = item
        try:
            s_, e_, d_ = read_regions_bed_gz(path, chromosome, start, end, excluded)
            return sid, _dedupe_last_wins(s_, e_, d_)
        except Exception:
            z = np.empty(0, np.int64)
            return sid, (z, z, np.empty(0, np.float64))

    # ---- pass 1: dense per-bin population stats (arrays discarded) -----
    sums = counts = ends_arr = None
    gmin = gmax = None
    irregular = False

    def _fold(sid, arrays):
        nonlocal sums, counts, ends_arr, gmin, gmax, irregular
        s_, e_, d_ = arrays
        if len(s_) == 0 or irregular:
            return
        if np.any(s_ % bin_size != 0):
            irregular = True
            return
        lo, hi = int(s_.min()) // bin_size, int(s_.max()) // bin_size
        if gmin is None:
            gmin, gmax = lo, hi
            size = gmax - gmin + 1
            sums = np.zeros(size)
            counts = np.zeros(size, np.int64)
            ends_arr = np.zeros(size, np.int64)
        else:
            if lo < gmin:
                pad = gmin - lo
                sums = np.concatenate([np.zeros(pad), sums])
                counts = np.concatenate([np.zeros(pad, np.int64), counts])
                ends_arr = np.concatenate([np.zeros(pad, np.int64), ends_arr])
                gmin = lo
            if hi > gmax:
                pad = hi - gmax
                sums = np.concatenate([sums, np.zeros(pad)])
                counts = np.concatenate([counts, np.zeros(pad, np.int64)])
                ends_arr = np.concatenate([ends_arr, np.zeros(pad, np.int64)])
                gmax = hi
        idx = (s_ // bin_size) - gmin
        np.add.at(sums, idx, d_)
        np.add.at(counts, idx, 1)
        ends_arr[idx] = e_

    if threads <= 1:
        for item in sample_to_bed.items():
            sid, arrays = _scan(item)
            _fold(sid, arrays)
    else:
        with ThreadPoolExecutor(max_workers=threads) as ex:
            for sid, arrays in ex.map(_scan, sample_to_bed.items()):
                _fold(sid, arrays)  # folding is serial; scanning overlaps

    if irregular:
        return stage_cohort(
            mosdepth_dir, samples, chromosome, start, end, excluded,
            min_depth, max_depth, threads, console,
        )
    if gmin is None:
        raise ValueError("No valid samples with regions found.")

    with np.errstate(invalid="ignore"):
        means = np.where(counts > 0, sums / np.maximum(counts, 1), np.nan)
    keep = (counts > 0) & (means >= min_depth) & (means <= max_depth)
    col_map = np.full(len(keep), -1, np.int64)
    col_map[keep] = np.arange(int(keep.sum()))
    kept_bins = np.where(keep)[0]
    regions = np.stack(
        [(kept_bins + gmin) * bin_size, ends_arr[kept_bins]], axis=1
    ).astype(np.int64)
    r = len(regions)

    # ---- pass 2: re-scan and write matrix rows directly -----------------
    sample_ids = sorted(sample_to_bed.keys())
    row_of = {sid: i for i, sid in enumerate(sample_ids)}
    values = np.zeros((len(sample_ids), r), dtype=np.float64)
    mask = np.zeros((len(sample_ids), r), dtype=bool)

    def _fill(item):
        sid, arrays = _scan(item)
        s_, e_, d_ = arrays
        if len(s_) == 0:
            return
        cols = col_map[(s_ // bin_size) - gmin]
        hit = cols >= 0
        i = row_of[sid]
        values[i, cols[hit]] = d_[hit]
        mask[i, cols[hit]] = True

    if threads <= 1:
        for item in sample_to_bed.items():
            _fill(item)
    else:
        with ThreadPoolExecutor(max_workers=threads) as ex:
            list(ex.map(_fill, sample_to_bed.items()))

    surviving = mask.any(axis=1)
    n_removed = int((~surviving).sum())
    if n_removed > 0:
        log(console, f"Removed {n_removed} samples with 0 regions", style="warning")
    if not surviving.any():
        raise ValueError("No valid samples with regions found.")

    kept_ids = [sid for i, sid in enumerate(sample_ids) if surviving[i]]
    return CohortStage(
        sample_ids=kept_ids,
        regions=regions,
        values=values[surviving],
        mask=mask[surviving],
    )
