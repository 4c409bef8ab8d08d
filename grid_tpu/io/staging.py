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


_BULK_ALLOC_DONE = False


def _bulk_alloc_mode():
    """Raise glibc's trim/mmap thresholds (128 MB) once per process before
    a cohort scan. The per-file scratch here is ~100 MB of short-lived
    buffers; at default thresholds glibc mmap()s them and returns the
    pages to the kernel on free, so EVERY file re-soft-faults them —
    measured 650 -> ~300 ms per 3M-line file once the fix keeps freed
    blocks heap-reusable. Cost: freed scratch stays in RSS up to the heap
    high-water mark (bounded by one file's scratch). GRID_TPU_NO_MALLOPT=1
    opts out; no-op off glibc."""
    global _BULK_ALLOC_DONE
    if _BULK_ALLOC_DONE:
        return
    _BULK_ALLOC_DONE = True
    import ctypes
    import os

    if os.environ.get("GRID_TPU_NO_MALLOPT") == "1":
        return
    try:
        libc = ctypes.CDLL("libc.so.6")
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        libc.mallopt(M_TRIM_THRESHOLD, 128 << 20)
        libc.mallopt(M_MMAP_THRESHOLD, 128 << 20)
    except Exception:  # pragma: no cover - non-glibc platforms
        pass


def _dedupe_last_wins(starts, ends, depths):
    """Keep the LAST occurrence of each (start, end) pair, preserving the
    reference's dict-overwrite semantics for duplicate lines.

    mosdepth beds are position-sorted, so the staged arrays are almost
    always already non-decreasing in (start, end) — that case is a single
    O(n) boundary scan. The general case uses a STABLE argsort of the
    packed uint64 keys (np.unique(axis=0)'s void-dtype argsort measured
    ~0.4 s per 3M-row sample; this path is ~20x cheaper).

    Output order: already-sorted input keeps its file order; UNSORTED
    input comes back (start, end)-key-sorted, not in original file order
    of the kept occurrences. All current consumers (population means,
    region search, matrix fill) are order-insensitive, but don't assume
    file order downstream."""
    if len(starts) == 0:
        return starts, ends, depths
    keys = _composite(starts, ends)
    if len(keys) > 1 and not (keys[1:] >= keys[:-1]).all():
        order = np.argsort(keys, kind="stable")
        starts, ends, depths, keys = (
            starts[order], ends[order], depths[order], keys[order]
        )
    # last of each equal run (stable order preserves file order within runs)
    keep = np.empty(len(keys), dtype=bool)
    keep[-1] = True
    keep[:-1] = keys[1:] != keys[:-1]
    if keep.all():  # no duplicates (the common case): skip 3 array copies
        return starts, ends, depths
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

    _bulk_alloc_mode()
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

    Returns (regions [M, 2] sorted, means [M]). Incremental union over
    packed uint64 keys, one sample at a time, instead of concatenating
    every sample's keys and running one global ``np.unique`` — at 100 x
    3M rows the global form sorts ~300M keys (~110 s); here the first
    sample seeds the sorted universe and each later sample either

    - matches it exactly (one O(n) compare + two vector adds — the
      regular-mosdepth-grid common case, ~15 ms/sample), or
    - splits into hits (accumulated via ``np.bincount`` on searchsorted
      positions) and misses (buffered, merged into the universe in bulk
      when the buffer grows past half the universe).

    Semantics are identical to the global-unique form, including
    duplicate keys within one sample each contributing a count (upstream
    ``_dedupe_last_wins`` means that case never arises in practice).
    """
    uniq_keys = sums = counts = None
    pend_k: list = []
    pend_d: list = []
    pending = 0

    def _flush():
        nonlocal uniq_keys, sums, counts, pend_k, pend_d, pending
        if not pend_k:
            return
        pk = np.concatenate(pend_k)
        pd = np.concatenate(pend_d)
        upk, inv = np.unique(pk, return_inverse=True)
        psums = np.bincount(inv, weights=pd, minlength=len(upk))
        pcounts = np.bincount(inv, minlength=len(upk))
        # pending keys are disjoint from uniq_keys (a key enters pending
        # only by missing the universe, which is frozen between flushes)
        merged = np.concatenate([uniq_keys, upk])
        order = np.argsort(merged, kind="stable")
        merged = merged[order]
        new_sums = np.concatenate([sums, psums])[order]
        new_counts = np.concatenate([counts, pcounts])[order]
        uniq_keys, sums, counts = merged, new_sums, new_counts
        pend_k, pend_d = [], []
        pending = 0

    for (s, e, d) in per_sample.values():
        if len(s) == 0:
            continue
        keys = _composite(s, e)
        d = np.asarray(d, np.float64)
        if uniq_keys is None:
            upk, inv = np.unique(keys, return_inverse=True)
            uniq_keys = upk
            sums = np.bincount(inv, weights=d, minlength=len(upk))
            counts = np.bincount(inv, minlength=len(upk))
            continue
        if len(keys) == len(uniq_keys) and np.array_equal(keys, uniq_keys):
            sums += d
            counts += 1
            continue
        pos = np.searchsorted(uniq_keys, keys)
        pc = pos.clip(max=len(uniq_keys) - 1)
        hit = (pos < len(uniq_keys)) & (uniq_keys[pc] == keys)
        if hit.any():
            sums += np.bincount(pc[hit], weights=d[hit], minlength=len(uniq_keys))
            counts += np.bincount(pc[hit], minlength=len(uniq_keys))
        miss = ~hit
        if miss.any():
            pend_k.append(keys[miss])
            pend_d.append(d[miss])
            pending += int(miss.sum())
            if pending >= max(len(uniq_keys) // 2, 4096):
                _flush()
    _flush()

    if uniq_keys is None:
        return np.empty((0, 2), np.int64), np.empty(0, np.float64)
    uniq = np.stack(
        [(uniq_keys >> np.uint64(32)).astype(np.int64),
         (uniq_keys & np.uint64(0xFFFFFFFF)).astype(np.int64)], axis=1
    )
    return uniq, sums / counts


def _composite(starts, ends):
    """Pack (start, end) into one sortable uint64 (genomic coordinates are
    < 2^32, so the pair fits exactly and lexicographic order is preserved)."""
    return (np.asarray(starts, np.uint64) << np.uint64(32)) | np.asarray(ends, np.uint64)


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
    per_sample=None,
) -> CohortStage:
    """Full staging: map files, single scan, population-mean region filter,
    dense matrix build. Mirrors the reference's region/sample semantics:

    - regions kept iff min_depth <= population mean <= max_depth
      (grid/utils/normalize_mosdepth.py:81-83);
    - samples with zero surviving regions dropped with a warning
      (filter_empty_samples, :576-600);
    - rows sorted by sample ID, columns by (start, end).

    ``per_sample``: pre-scanned {sample: (starts, ends, depths)} arrays
    (already window/mask/depth-filtered — the fused one-pass ingest hands
    them over in-process, steps/ingest.py), bypassing the bed.gz re-scan.
    """
    if per_sample is not None:
        per_sample = {
            sid: _dedupe_last_wins(*arrays) for sid, arrays in per_sample.items()
        }
    else:
        sample_to_bed = map_bed_gz_to_samples(mosdepth_dir, samples)
        if not sample_to_bed:
            raise FileNotFoundError(f"No mosdepth files found in {mosdepth_dir}")

        per_sample = scan_cohort_regions(
            sample_to_bed, chromosome, start, end, excluded, threads, console
        )

    uniq_regions, pop_means = population_mean_depths(per_sample)
    keep = (pop_means >= min_depth) & (pop_means <= max_depth)
    valid_regions = uniq_regions[keep]

    # per-sample projection onto the valid-region universe; the packed
    # region keys are hoisted out of the loop (repacking 3M regions per
    # sample measured ~12 s of a 47 s staging call at 20 x 3M rows) and a
    # sample whose keys EQUAL the universe maps by identity — the regular
    # mosdepth-grid common case
    reg_keys = _composite(valid_regions[:, 0], valid_regions[:, 1])
    identity_idx = None
    projected: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for sid, (s, e, d) in per_sample.items():
        keys = _composite(s, e)
        if len(keys) == len(reg_keys) and np.array_equal(keys, reg_keys):
            if identity_idx is None:
                identity_idx = np.arange(len(reg_keys), dtype=np.int64)
            projected[sid] = (identity_idx, d)
            continue
        pos = np.searchsorted(reg_keys, keys)
        pc = pos.clip(max=max(len(reg_keys) - 1, 0))
        hit = (
            (pos < len(reg_keys)) & (reg_keys[pc] == keys)
            if len(reg_keys) else np.zeros(len(keys), bool)
        )
        projected[sid] = (pc[hit].astype(np.int64), d[hit])

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
        if len(idx) == len(col_used):  # keys unique per sample => full cover
            col_used[:] = True
            break
        col_used[idx] = True
    col_map = np.full(len(valid_regions), -1, dtype=np.int64)
    col_map[col_used] = np.arange(col_used.sum())
    regions = valid_regions[col_used]

    n, r = len(sample_ids), int(col_used.sum())
    # np.empty, not zeros: fully-covered rows (the regular-grid common
    # case) are written whole, so zero-init would double the memory
    # traffic on a multi-GB matrix; partial rows zero themselves first.
    # Row ranges fill on the scan thread pool (numpy copies release the
    # GIL) — the serial fill was ~12 s of the 2.7 GB config-2 matrix.
    values = np.empty((n, r), dtype=np.float64)
    mask = np.empty((n, r), dtype=bool)

    def _fill_rows(lo, hi):
        for i in range(lo, hi):
            idx, d = projected[sample_ids[i]]
            cols = col_map[idx]
            if len(cols) == r:  # sorted unique full cover == arange: memcpy
                values[i] = d
                mask[i] = True
            else:
                values[i] = 0.0
                mask[i] = False
                values[i, cols] = d
                mask[i, cols] = True

    if threads > 1 and n > 1:
        step = -(-n // threads)
        with ThreadPoolExecutor(max_workers=threads) as ex:
            list(ex.map(
                lambda t: _fill_rows(t * step, min((t + 1) * step, n)),
                range(threads),
            ))
    else:
        _fill_rows(0, n)

    return CohortStage(sample_ids=sample_ids, regions=regions, values=values, mask=mask)


# --------------------------------------------------- shard-direct stager ---


class ShardedCohortStage(NamedTuple):
    """Cohort staged straight onto a device mesh — the biobank path.

    The global [N, R] matrix exists ONLY as a sharded jax.Array: each row
    shard was filled into a host buffer of shape [N_pad/n_shards, R] and
    device_put to its shard's device, so peak HOST memory is
    O(N*R/n_shards + R) instead of the full matrix (the ceiling being
    beaten: grid/utils/normalize_mosdepth.py:379-416 builds the whole
    N x R matrix on one node).

    Attributes:
        sample_ids: N IDs in row order (padding rows excluded).
        chroms: chromosome names, index = chrom id in ``regions``.
        regions: [R, 3] int64 (chrom_id, start, end), sorted by
            (chrom name order, start).
        values / mask / row_valid: device arrays with cohort sharding
            ([N_pad, R] dtype, [N_pad, R] bool, [N_pad] bool).
        n: real (unpadded) row count.
        sample_rows: [N] int64 — the global row index of sample_ids[i].
            THE authoritative sample<->row mapping: do NOT reconstruct it
            from row_valid, which is False both for padding rows AND for
            real samples whose regions all failed the depth filter.
    """

    sample_ids: list
    chroms: list
    regions: np.ndarray
    values: object
    mask: object
    row_valid: object
    n: int
    sample_rows: np.ndarray


class _PopulationAccum:
    """O(R) streaming accumulator of per-region population sums/counts.

    Regions are keyed by ``(chrom_id << 32) | start`` (one region per
    (chrom, start), matching the regular-grid reality of mosdepth output).
    A duplicate start with a DIFFERENT end would silently merge two
    distinct regions — the dense stager and the reference key by
    (start, end) — so ``add`` raises on an end mismatch rather than
    collapsing last-wins; such inputs must go through ``stage_cohort``.
    Misses are buffered and merged in bulk, so per-sample cost is
    O(R_sample log R) searchsorted, not a re-sort of the universe.
    """

    def __init__(self):
        self.keys = np.empty(0, np.uint64)
        self.sums = np.empty(0, np.float64)
        self.counts = np.empty(0, np.int64)
        self.ends = np.empty(0, np.int64)
        self._pk: list = []
        self._pd: list = []
        self._pe: list = []
        self._pending = 0

    def add(self, keys, depths, ends):
        if len(self.keys):
            pos = np.searchsorted(self.keys, keys)
            pc = pos.clip(max=len(self.keys) - 1)
            hit = (pos < len(self.keys)) & (self.keys[pc] == keys)
            if hit.any() and (self.ends[pc[hit]] != ends[hit]).any():
                raise ValueError(
                    "stage_cohort_sharded: two regions share a (chrom, start)"
                    " but differ in end — irregular grids with duplicate"
                    " starts are not representable here; use stage_cohort."
                )
            np.add.at(self.sums, pc[hit], depths[hit])
            np.add.at(self.counts, pc[hit], 1)
            miss = ~hit
        else:
            miss = np.ones(len(keys), bool)
        if miss.any():
            self._pk.append(keys[miss])
            self._pd.append(depths[miss])
            self._pe.append(ends[miss])
            self._pending += int(miss.sum())
            if self._pending >= max(len(self.keys) // 2, 4096):
                self.flush()

    def flush(self):
        if not self._pk:
            return
        pk = np.concatenate(self._pk)
        pd = np.concatenate(self._pd)
        pe = np.concatenate(self._pe)
        # end consistency across the merge: add() only guards hits against
        # the existing universe; duplicate keys INSIDE the pending window
        # (or between pending and existing) must agree on end too, or two
        # distinct regions would silently merge here
        keys_all = np.concatenate([self.keys, pk])
        ends_all = np.concatenate([self.ends, pe])
        order = np.argsort(keys_all, kind="stable")
        same = keys_all[order][1:] == keys_all[order][:-1]
        if (ends_all[order][1:][same] != ends_all[order][:-1][same]).any():
            raise ValueError(
                "stage_cohort_sharded: two regions share a (chrom, start)"
                " but differ in end — irregular grids with duplicate"
                " starts are not representable here; use stage_cohort."
            )
        uk, inv = np.unique(np.concatenate([self.keys, pk]), return_inverse=True)
        sums = np.zeros(len(uk))
        counts = np.zeros(len(uk), np.int64)
        ends = np.zeros(len(uk), np.int64)
        old = inv[: len(self.keys)]
        sums[old] = self.sums
        counts[old] = self.counts
        ends[old] = self.ends
        new = inv[len(self.keys):]
        np.add.at(sums, new, pd)
        np.add.at(counts, new, 1)
        ends[new] = pe
        self.keys, self.sums, self.counts, self.ends = uk, sums, counts, ends
        self._pk, self._pd, self._pe = [], [], []
        self._pending = 0


def _sample_keys(chrom_ids: dict, segments):
    """Composite keys + depths + ends for one sample's grouped segments,
    deduped last-wins within the sample."""
    keys_l, depths_l, ends_l = [], [], []
    for chrom, s, e, d in segments:
        cid = chrom_ids.setdefault(chrom, len(chrom_ids))
        keys_l.append((np.uint64(cid) << np.uint64(32)) | s.astype(np.uint64))
        depths_l.append(d)
        ends_l.append(e)
    if not keys_l:
        z = np.empty(0, np.uint64)
        return z, np.empty(0, np.float64), np.empty(0, np.int64)
    keys = np.concatenate(keys_l)
    depths = np.concatenate(depths_l)
    ends = np.concatenate(ends_l)
    # last occurrence of each key wins (reference dict-overwrite semantics);
    # duplicate keys are legal only when their ends agree (see _PopulationAccum)
    _, idx = np.unique(keys[::-1], return_index=True)
    keep = np.sort(len(keys) - 1 - idx)
    if len(keep) < len(keys):
        order = np.argsort(keys, kind="stable")
        same_key = keys[order][1:] == keys[order][:-1]
        if (ends[order][1:][same_key] != ends[order][:-1][same_key]).any():
            raise ValueError(
                "stage_cohort_sharded: duplicate (chrom, start) with differing"
                " end within one sample; use stage_cohort for irregular grids."
            )
    return keys[keep], depths[keep], ends[keep]


def _allgather_bytes(blob: bytes) -> list[bytes]:
    """All-gather a variable-length byte string across jax processes
    (pad-to-max over a uint8 allgather). Returns one bytes per process, in
    process order."""
    import jax
    from jax.experimental import multihost_utils as mhu

    n_proc = jax.process_count()
    lens = np.asarray(
        mhu.process_allgather(np.array([len(blob)], np.int64))
    ).reshape(n_proc)
    maxlen = max(int(lens.max()), 1)
    buf = np.zeros(maxlen, np.uint8)
    buf[: len(blob)] = np.frombuffer(blob, np.uint8)
    bufs = np.asarray(mhu.process_allgather(buf)).reshape(n_proc, maxlen)
    return [bufs[p, : int(lens[p])].tobytes() for p in range(n_proc)]


def _merge_accums_across_processes(chrom_ids, accum):
    """Multi-host pass-1 merge: union the chromosome-name universe and the
    per-region (sum, count, end) accumulators across all jax processes, so
    every process derives the IDENTICAL region universe even though each
    scanned only its own samples.

    Returns (global_chrom_names_sorted, keys, sums, counts, ends) with keys
    re-encoded against the global chrom ranks."""
    import jax

    n_proc = jax.process_count()

    # 1) union of chromosome names
    local_names = sorted(chrom_ids, key=str)
    blobs = _allgather_bytes("\n".join(local_names).encode())
    all_names: set = set()
    for b in blobs:
        if b:
            all_names.update(b.decode().split("\n"))
    global_names = sorted(all_names, key=str)
    gid = {name: i for i, name in enumerate(global_names)}

    # 2) re-encode local keys onto global chrom ids
    if len(chrom_ids):
        remap = np.zeros(len(chrom_ids), np.uint64)
        for name, local_id in chrom_ids.items():
            remap[local_id] = np.uint64(gid[name])
        cid = (accum.keys >> np.uint64(32)).astype(np.int64)
        keys = (remap[cid] << np.uint64(32)) | (accum.keys & np.uint64(0xFFFFFFFF))
    else:
        keys = accum.keys

    # 3) gather + merge the accumulator arrays
    payload = np.concatenate([
        keys.view(np.float64),  # bit-transport as f64 (same width)
        accum.sums,
        accum.counts.astype(np.float64),
        accum.ends.astype(np.float64),
    ]).tobytes()
    blobs = _allgather_bytes(payload)
    k_l, s_l, c_l, e_l = [], [], [], []
    for b in blobs:
        arr = np.frombuffer(b, np.float64)
        m = len(arr) // 4
        k_l.append(arr[:m].view(np.uint64).copy())
        s_l.append(arr[m : 2 * m].copy())
        c_l.append(arr[2 * m : 3 * m].astype(np.int64))
        e_l.append(arr[3 * m : 4 * m].astype(np.int64))
    ak = np.concatenate(k_l)
    uk, inv = np.unique(ak, return_inverse=True)
    sums = np.zeros(len(uk))
    counts = np.zeros(len(uk), np.int64)
    np.add.at(sums, inv, np.concatenate(s_l))
    np.add.at(counts, inv, np.concatenate(c_l))
    ae = np.concatenate(e_l)
    # vectorized end-consistency across processes (a Python loop here costs
    # minutes at genome-wide region counts)
    emin = np.full(len(uk), np.iinfo(np.int64).max, np.int64)
    emax = np.full(len(uk), -1, np.int64)
    np.minimum.at(emin, inv, ae)
    np.maximum.at(emax, inv, ae)
    if (emin != emax).any():
        raise ValueError(
            "stage_cohort_sharded: processes disagree on a region's end"
            " — irregular grids with duplicate starts are not supported."
        )
    return global_names, uk, sums, counts, emax


def stage_cohort_sharded(
    source,
    mesh,
    min_depth: float,
    max_depth: float,
    threads: int = 1,
    dtype=np.float32,
    console=None,
) -> ShardedCohortStage:
    """Bounded-memory staging straight onto a device mesh: multi-chromosome,
    irregular grids, any N — single-process or multi-host.

    Two passes over the samples, like the reference's own two-pass design
    (grid/utils/normalize_mosdepth.py:218-357) but with O(R) accumulators
    and per-shard row buffers instead of the global matrix:

    - pass 1 streams every sample once into a population accumulator
      (region universe + mean depths), discarding the arrays;
    - regions kept iff ``min_depth <= mean <= max_depth``;
    - pass 2 streams again, filling one [rows_per_shard, R] host buffer at a
      time and ``jax.device_put``-ing it to its shard's device (transfers
      overlap the next shard's scan — device_put is asynchronous).

    MULTI-HOST (jax.process_count() > 1): ``source`` must yield each
    process's OWN (disjoint) samples — typically the shards of the cohort
    that live on that host's filesystem. Pass-1 accumulators and the
    chromosome universe are all-gathered and merged so every process
    derives the identical region universe; pass 2 fills ONLY the shards on
    this process's addressable devices (a process never device_puts to a
    remote device), and the global array is assembled with
    ``jax.make_array_from_single_device_arrays``. Global row order is
    process-segmented: process p's samples occupy its local devices' rows,
    each process padded independently to its shard boundary (``row_valid``
    marks the interleaved padding; ``sample_ids`` is the gathered global
    list in that row order with padding removed). Requires the mesh device
    order to be process-contiguous (the ``jax.devices()`` default).

    Args:
        source: callable returning a FRESH iterator of
            ``(sample_id, segments)`` with segments a list of
            ``(chrom, starts, ends, depths)`` (see
            :func:`grid_tpu.io.bed.read_regions_bed_gz_grouped`); called
            once per pass. Use :func:`bed_source` for mosdepth directories.
        mesh: 1-D cohort mesh; rows are sharded over it.
        threads: pass-2 scan parallelism within a shard.

    Samples whose regions all fail the filter keep their row (mask
    all-False) and are excluded via ``row_valid`` — unlike
    :func:`stage_cohort` they are not dropped from the row universe, which
    would need a third pass at this scale.
    """
    import jax

    from grid_tpu.parallel.mesh import cohort_sharding

    n_proc = jax.process_count()
    my_proc = jax.process_index()

    # ---- pass 1: population accumulation (local samples) -----------------
    chrom_ids: dict[str, int] = {}
    accum = _PopulationAccum()
    sample_ids: list = []
    for sid, segments in source():
        sample_ids.append(sid)
        keys, depths, ends = _sample_keys(chrom_ids, segments)
        if len(keys):
            accum.add(keys, depths, ends)
    accum.flush()

    if n_proc > 1:
        chroms_sorted, all_keys, sums, counts, ends_arr = (
            _merge_accums_across_processes(chrom_ids, accum)
        )
        rank_of = {name: i for i, name in enumerate(chroms_sorted)}
    else:
        chroms_sorted = sorted(chrom_ids, key=str)
        all_keys, sums, counts, ends_arr = (
            accum.keys, accum.sums, accum.counts, accum.ends
        )
        rank_of = {name: i for i, name in enumerate(chroms_sorted)}
        rank_of_cid = np.empty(max(len(chrom_ids), 1), np.int64)
        for name, local_id in chrom_ids.items():
            rank_of_cid[local_id] = rank_of[name]
        # single-process keys are still encoded on local cids; re-encode on
        # chrom ranks so both paths share the layout below
        if len(all_keys):
            cid = (all_keys >> np.uint64(32)).astype(np.int64)
            all_keys = (
                rank_of_cid[cid].astype(np.uint64) << np.uint64(32)
            ) | (all_keys & np.uint64(0xFFFFFFFF))

    if len(all_keys) == 0:
        raise ValueError("No valid samples with regions found.")

    with np.errstate(invalid="ignore"):
        means = sums / np.maximum(counts, 1)
    keep = (counts > 0) & (means >= min_depth) & (means <= max_depth)
    kept_keys = all_keys[keep]
    kept_ends = ends_arr[keep]

    # column order: (chromosome rank, start) ascending — keys are already
    # rank-encoded, so a plain sort is the (chrom, start) lexsort
    order = np.argsort(kept_keys, kind="stable")
    kept_keys = kept_keys[order]
    regions = np.stack(
        [
            (kept_keys >> np.uint64(32)).astype(np.int64),
            (kept_keys & np.uint64(0xFFFFFFFF)).astype(np.int64),
            kept_ends[order],
        ],
        axis=1,
    )
    lookup_sorted = kept_keys  # already sorted ascending
    sort_back = np.arange(len(kept_keys))
    r = len(regions)

    # ---- global row layout ------------------------------------------------
    devices = list(mesh.devices.flat)
    local_dev_idx = [
        d for d, dev in enumerate(devices) if dev.process_index == my_proc
    ]
    if n_proc > 1:
        procs = [dev.process_index for dev in devices]
        if procs != sorted(procs):  # process-contiguity requirement
            raise ValueError(
                "stage_cohort_sharded: mesh devices must be ordered by"
                " process index (jax.devices() order)"
            )
        if sample_ids and not local_dev_idx:
            raise ValueError(
                "stage_cohort_sharded: this process yielded samples but owns"
                " no devices in the mesh — on multi-host, every"
                " sample-holding process must contribute addressable devices"
            )
        from jax.experimental import multihost_utils as mhu

        n_local = len(sample_ids)
        n_locals = np.asarray(
            mhu.process_allgather(np.array([n_local], np.int64))
        ).reshape(n_proc)
        d_locals = np.asarray(
            mhu.process_allgather(np.array([len(local_dev_idx)], np.int64))
        ).reshape(n_proc)
        # every shard must hold the same row count: the max per-device load
        rows_per = int(max(-(-int(n_locals[p]) // max(int(d_locals[p]), 1))
                           for p in range(n_proc)))
        rows_per = max(rows_per, 1)
        n = int(n_locals.sum())
    else:
        rows_per = -(-len(sample_ids) // len(devices))
        n = len(sample_ids)
    n_dev = len(devices)
    n_pad = rows_per * n_dev

    # ---- pass 2: fill ONLY this process's shards -------------------------
    rank_by_name = rank_of
    it = source()

    def _fill_row(vbuf, mbuf, local_i, segments):
        keys, depths, _ = _sample_keys_ranked(rank_by_name, segments)
        if not len(keys):
            return
        pos = np.searchsorted(lookup_sorted, keys)
        pc = pos.clip(max=max(r - 1, 0))
        hit = (pos < r) & (lookup_sorted[pc] == keys) if r else np.zeros(len(keys), bool)
        cols = sort_back[pc[hit]]
        vbuf[local_i, cols] = depths[hit]
        mbuf[local_i, cols] = True

    val_shards, mask_shards, rv_shards = [], [], []
    local_valid: list[bool] = []
    for d in local_dev_idx:
        vbuf = np.zeros((rows_per, r), dtype=dtype)
        mbuf = np.zeros((rows_per, r), dtype=bool)
        rvbuf = np.zeros(rows_per, bool)
        local = 0
        while local < rows_per:
            try:
                sid, segments = next(it)
            except StopIteration:
                break
            _fill_row(vbuf, mbuf, local, segments)
            rvbuf[local] = bool(mbuf[local].any())
            local_valid.append(bool(rvbuf[local]))
            local += 1
        val_shards.append(jax.device_put(vbuf, devices[d]))
        mask_shards.append(jax.device_put(mbuf, devices[d]))
        rv_shards.append(jax.device_put(rvbuf, devices[d]))

    s2 = cohort_sharding(mesh, 2)
    s1 = cohort_sharding(mesh, 1)
    values = jax.make_array_from_single_device_arrays((n_pad, r), s2, val_shards)
    mask_arr = jax.make_array_from_single_device_arrays((n_pad, r), s2, mask_shards)
    row_valid = jax.make_array_from_single_device_arrays((n_pad,), s1, rv_shards)

    if n_proc > 1:
        # global sample-id list in row order (padding removed), and the
        # authoritative sample->row mapping: each process's local samples
        # occupy a CONTIGUOUS global row range starting at its first local
        # device's rows (devices are process-contiguous, asserted above)
        local_offset = local_dev_idx[0] * rows_per if local_dev_idx else 0
        blobs = _allgather_bytes("\n".join(sample_ids).encode())
        offs = np.asarray(
            mhu.process_allgather(np.array([local_offset], np.int64))
        ).reshape(n_proc)
        sample_ids = []
        rows_l = []
        for p, b in enumerate(blobs):
            if b:
                ids_p = b.decode().split("\n")
                sample_ids.extend(ids_p)
                rows_l.append(offs[p] + np.arange(len(ids_p), dtype=np.int64))
        sample_rows = (
            np.concatenate(rows_l) if rows_l else np.empty(0, np.int64)
        )
    else:
        sample_rows = np.arange(n, dtype=np.int64)

    n_empty = sum(1 for v in local_valid if not v)
    if n_empty:
        log(console, f"{n_empty} local samples have 0 surviving regions",
            style="warning")
    return ShardedCohortStage(
        sample_ids=sample_ids,
        chroms=chroms_sorted,
        regions=regions,
        values=values,
        mask=mask_arr,
        row_valid=row_valid,
        n=n,
        sample_rows=sample_rows,
    )


def _sample_keys_ranked(rank_by_name: dict, segments):
    """Like :func:`_sample_keys` but with FIXED chrom->rank ids (pass 2);
    segments on chroms unseen in pass 1 are dropped (cannot be in the
    region universe)."""
    keys_l, depths_l, ends_l = [], [], []
    for chrom, s, e, d in segments:
        rank = rank_by_name.get(chrom)
        if rank is None:
            continue
        keys_l.append((np.uint64(rank) << np.uint64(32)) | s.astype(np.uint64))
        depths_l.append(d)
        ends_l.append(e)
    if not keys_l:
        z = np.empty(0, np.uint64)
        return z, np.empty(0, np.float64), np.empty(0, np.int64)
    keys = np.concatenate(keys_l)
    depths = np.concatenate(depths_l)
    ends = np.concatenate(ends_l)
    _, idx = np.unique(keys[::-1], return_index=True)
    keep = np.sort(len(keys) - 1 - idx)
    return keys[keep], depths[keep], ends[keep]


def bed_source(mosdepth_dir, samples, excluded=None, console=None):
    """A :func:`stage_cohort_sharded` source over a mosdepth directory:
    each call returns a fresh per-sample iterator of grouped segments
    (multi-chromosome, repeat-mask filtered). Sample order is sorted by ID
    (reference row order)."""
    from grid_tpu.io.bed import map_bed_gz_to_samples, read_regions_bed_gz_grouped

    sample_to_bed = map_bed_gz_to_samples(mosdepth_dir, samples)
    if not sample_to_bed:
        raise FileNotFoundError(f"No mosdepth files found in {mosdepth_dir}")
    ordered = sorted(sample_to_bed)

    def _iter():
        for sid in ordered:
            try:
                yield sid, read_regions_bed_gz_grouped(sample_to_bed[sid], excluded)
            except Exception as exc:  # per-sample failure: cohort continues
                log(console, f"Error reading {sid}: {exc}", style="danger")
                yield sid, []

    return _iter


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

    _bulk_alloc_mode()

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
