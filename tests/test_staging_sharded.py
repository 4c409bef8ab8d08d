"""Shard-direct staging tests (VERDICT r1 item #2): multi-chromosome,
irregular grids, bounded host memory, device placement, and end-to-end
agreement with the in-memory stager + explicit-collective step."""

import numpy as np
import pytest

import jax

from grid_tpu.io.staging import (
    ShardedCohortStage,
    bed_source,
    stage_cohort,
    stage_cohort_sharded,
)
from grid_tpu.parallel.mesh import cohort_mesh, cohort_sharding


def _array_source(per_sample):
    """per_sample: list of (sid, segments); returns a fresh-iterator factory."""

    def factory():
        return iter(per_sample)

    return factory


def _seg(chrom, rows):
    s = np.array([r[0] for r in rows], np.int64)
    e = np.array([r[1] for r in rows], np.int64)
    d = np.array([r[2] for r in rows], np.float64)
    return (chrom, s, e, d)


@pytest.fixture
def mesh8():
    return cohort_mesh(8)


def test_sharded_stage_multichrom_irregular(mesh8):
    # chr2 before chr10 lexicographically ("10" < "2" as strings — the
    # contract is sorted NAME order); irregular bin widths
    per_sample = [
        ("S0", [_seg("chr2", [(0, 700, 30.0), (1000, 2000, 31.0)]),
                _seg("chr10", [(500, 1500, 29.0)])]),
        ("S1", [_seg("chr2", [(0, 700, 32.0)]),
                _seg("chr10", [(500, 1500, 28.0), (9999, 10007, 5.0)])]),
        ("S2", [_seg("chr10", [(500, 1500, 30.5)])]),
    ]
    stage = stage_cohort_sharded(_array_source(per_sample), mesh8,
                                 min_depth=20, max_depth=100)
    assert isinstance(stage, ShardedCohortStage)
    assert stage.chroms == ["chr10", "chr2"]
    # region (chr10, 9999) mean=5 < min_depth -> dropped
    regions = [(stage.chroms[c], s, e) for c, s, e in stage.regions.tolist()]
    assert regions == [("chr10", 500, 1500), ("chr2", 0, 700), ("chr2", 1000, 2000)]
    vals = np.asarray(stage.values)[: stage.n]
    mask = np.asarray(stage.mask)[: stage.n]
    np.testing.assert_allclose(vals[0], [29.0, 30.0, 31.0])
    np.testing.assert_allclose(vals[1], [28.0, 32.0, 0.0])
    assert mask[1].tolist() == [True, True, False]
    np.testing.assert_allclose(vals[2], [30.5, 0.0, 0.0])
    # device placement: cohort-sharded across the mesh, padded to 8 rows
    assert stage.values.shape[0] == 8
    assert stage.values.sharding == cohort_sharding(mesh8, 2)
    assert np.asarray(stage.row_valid).tolist() == [True] * 3 + [False] * 5


def test_sharded_stage_duplicate_lines_last_wins(mesh8):
    per_sample = [
        ("A", [_seg("chr1", [(0, 1000, 10.0), (0, 1000, 50.0)])]),
        ("B", [_seg("chr1", [(0, 1000, 30.0)])]),
    ]
    stage = stage_cohort_sharded(_array_source(per_sample), mesh8, 20, 100)
    vals = np.asarray(stage.values)
    # sample A's duplicate start collapses to the LAST depth (dict semantics)
    assert vals[0, 0] == 50.0 and vals[1, 0] == 30.0


def test_sharded_stage_matches_inmemory_on_files(tmp_path, mesh8):
    """Single-chrom regular cohort: the shard-direct stager must agree with
    the in-memory stager column-for-column."""
    from grid_tpu.synth import make_synthetic_cohort

    cohort = make_synthetic_cohort(tmp_path, n_samples=11, seed=7, missing_frac=0.05)
    ref = stage_cohort(cohort["work_dir"], cohort["ids"], "chr6", None, None,
                       {}, 10, 100)
    stage = stage_cohort_sharded(
        bed_source(cohort["work_dir"], cohort["ids"]), mesh8, 10, 100
    )
    assert stage.sample_ids == ref.sample_ids
    np.testing.assert_array_equal(stage.regions[:, 1:], ref.regions)
    np.testing.assert_allclose(
        np.asarray(stage.values)[: stage.n], ref.values, rtol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(stage.mask)[: stage.n], ref.mask)


def test_sharded_step_from_prestaged(tmp_path, mesh8):
    """sharded_cohort_step(row_valid=staged) == sharded_cohort_step(host)."""
    import jax.numpy as jnp

    from grid_tpu.io.hap_neighbors import pad_hap_neighbors
    from grid_tpu.models.cohort import CohortParams
    from grid_tpu.parallel.mesh import shard_cohort_inputs
    from grid_tpu.parallel.pcohort import sharded_cohort_step
    from grid_tpu.synth import make_synthetic_cohort

    cohort = make_synthetic_cohort(tmp_path, n_samples=13, seed=3)
    stage = stage_cohort_sharded(
        bed_source(cohort["work_dir"], cohort["ids"]), mesh8, 10, 100
    )
    n = stage.n
    rng = np.random.default_rng(0)
    reads = rng.integers(500, 900, n).astype(np.float64)
    rv = np.ones(n, bool)
    hi, hw, hv = pad_hap_neighbors([[] for _ in range(2 * n)], 1)
    params = CohortParams(num_neighbors=5, n_nbr=3, n_iters=0)

    # host path (pads + shards internally)
    host_vals = np.asarray(stage.values)[:n]
    host_mask = np.asarray(stage.mask)[:n]
    out_host = sharded_cohort_step(
        mesh8, host_vals, host_mask, reads, rv,
        jnp.asarray(hi), jnp.asarray(hw), jnp.asarray(hv), params,
    )

    # prestaged path: reads padded+sharded by the caller
    n_pad = stage.values.shape[0]
    s1 = cohort_sharding(mesh8, 1)
    reads_p = jax.device_put(np.pad(reads, (0, n_pad - n)), s1)
    rv_p = jax.device_put(np.pad(rv, (0, n_pad - n)), s1)
    out_staged = sharded_cohort_step(
        mesh8, stage.values, stage.mask, reads_p, rv_p,
        jnp.asarray(hi), jnp.asarray(hw), jnp.asarray(hv), params,
        row_valid=stage.row_valid,
    )
    np.testing.assert_allclose(
        np.asarray(out_staged.dipcn)[:n], np.asarray(out_host.dipcn)[:n],
        rtol=1e-6, equal_nan=True,
    )
    np.testing.assert_array_equal(
        np.asarray(out_staged.nbr_idx)[:n], np.asarray(out_host.nbr_idx)[:n]
    )


def test_sharded_stage_bounded_host_buffers(mesh8):
    """The per-shard fill buffer is rows_per_shard x R — the global matrix
    is never a single host allocation. (Proxy assertion: every addressable
    shard holds exactly [n_pad/8, R].)"""
    n, r = 64, 128

    def factory():
        rng = np.random.default_rng(1)  # reseeded: both passes see same data

        def it():
            for i in range(n):
                s = np.arange(r, dtype=np.int64) * 1000
                yield f"S{i:03d}", [("chr1", s, s + 1000,
                                     rng.uniform(25, 35, r))]
        return it()

    stage = stage_cohort_sharded(factory, mesh8, 10, 100)
    assert stage.values.shape == (64, r)
    for shard in stage.values.addressable_shards:
        assert shard.data.shape == (8, r)


def test_sample_rows_mapping_with_empty_sample():
    """sample_rows must map every sample to its row even when a sample has
    ZERO surviving regions (row_valid False there) — reconstructing the
    mapping from row_valid would shift all later samples."""
    import jax
    import numpy as np

    from grid_tpu.io.staging import stage_cohort_sharded
    from grid_tpu.parallel.mesh import cohort_mesh

    mesh = cohort_mesh(8)
    n, r = 19, 16

    def source():
        def it():
            starts = np.arange(r, dtype=np.int64) * 1000
            for i in range(n):
                if i == 4:
                    # sole sample on chr9 with out-of-range depths: every
                    # one of ITS regions fails the population filter
                    yield "S004", [("chr9", starts, starts + 1000,
                                    np.full(r, 5000.0))]
                else:
                    yield f"S{i:03d}", [("chr1", starts, starts + 1000,
                                         np.full(r, 30.0 + i))]
        return it()

    stage = stage_cohort_sharded(source, mesh, min_depth=1, max_depth=1000)
    assert stage.n == n
    rows = np.asarray(stage.sample_rows)
    assert rows.shape == (n,)
    rv = np.asarray(stage.row_valid)
    vals = np.asarray(stage.values)
    # the empty sample keeps its row (marked invalid); others' rows carry
    # their depths
    assert not rv[rows[4]]
    for i in [0, 3, 5, n - 1]:
        assert rv[rows[i]]
        assert np.allclose(vals[rows[i]][np.asarray(stage.mask)[rows[i]]],
                           30.0 + i)


def test_dedupe_last_wins_sorted_and_unsorted():
    """Both _dedupe_last_wins paths (O(n) sorted scan; stable-argsort
    general case) keep the LAST duplicate's depth — the reference's
    dict-overwrite semantics."""
    import numpy as np

    from grid_tpu.io.staging import _dedupe_last_wins

    # sorted input (mosdepth order) with a duplicate run
    s = np.array([100, 200, 200, 300], dtype=np.int64)
    e = s + 100
    d = np.array([1.0, 2.0, 9.0, 4.0])
    rs, re_, rd = _dedupe_last_wins(s, e, d)
    np.testing.assert_array_equal(rs, [100, 200, 300])
    np.testing.assert_array_equal(rd, [1.0, 9.0, 4.0])

    # unsorted input (chr/no-chr alternate lines interleave): same contract
    s = np.array([300, 100, 300, 200], dtype=np.int64)
    e = s + 100
    d = np.array([7.0, 1.0, 8.0, 2.0])
    rs, re_, rd = _dedupe_last_wins(s, e, d)
    np.testing.assert_array_equal(rs, [100, 200, 300])
    np.testing.assert_array_equal(rd, [1.0, 2.0, 8.0])


def test_population_mean_depths_matches_dict_oracle():
    import numpy as np

    from grid_tpu.io.staging import population_mean_depths

    rng = np.random.default_rng(3)
    per_sample = {}
    oracle_sum, oracle_cnt = {}, {}
    for i in range(5):
        starts = np.sort(rng.choice(np.arange(50) * 100, 20, replace=False))
        ends = starts + 100
        depths = rng.uniform(0.5, 30.0, 20)
        per_sample[f"S{i}"] = (starts.astype(np.int64), ends.astype(np.int64), depths)
        for st, en, de in zip(starts, ends, depths):
            oracle_sum[(st, en)] = oracle_sum.get((st, en), 0.0) + de
            oracle_cnt[(st, en)] = oracle_cnt.get((st, en), 0) + 1
    regions, means = population_mean_depths(per_sample)
    assert len(regions) == len(oracle_sum)
    for (st, en), m in zip(map(tuple, regions), means):
        assert abs(m - oracle_sum[(st, en)] / oracle_cnt[(st, en)]) < 1e-12


def test_population_mean_depths_incremental_flush_and_fastpath():
    """The incremental-union rewrite must match the global-unique oracle
    through BOTH special paths: the identical-universe fast path (regular
    grids) and a mid-loop pending flush (>4096 misses from disjoint
    universes)."""
    import numpy as np

    from grid_tpu.io.staging import population_mean_depths

    rng = np.random.default_rng(11)

    # (a) identical universes: 4 samples on the same 1kb grid
    grid = np.arange(500, dtype=np.int64) * 1000
    per_sample = {
        f"G{i}": (grid, grid + 1000, rng.uniform(1, 40, 500)) for i in range(4)
    }
    regions, means = population_mean_depths(per_sample)
    expect = np.mean(
        np.stack([per_sample[f"G{i}"][2] for i in range(4)]), axis=0
    )
    np.testing.assert_array_equal(regions[:, 0], grid)
    np.testing.assert_allclose(means, expect, rtol=0, atol=1e-12)

    # (b) three DISJOINT 6000-region universes: sample 2's and 3's keys all
    # miss, forcing a flush mid-loop (pending 6000 >= max(len//2, 4096))
    per_sample = {}
    oracle = {}
    for i in range(3):
        starts = (np.arange(6000, dtype=np.int64) * 3 + i) * 100
        depths = rng.uniform(1, 40, 6000)
        per_sample[f"D{i}"] = (starts, starts + 100, depths)
        for st, de in zip(starts, depths):
            oracle[(st, st + 100)] = de
    regions, means = population_mean_depths(per_sample)
    assert len(regions) == 18000
    for (st, en), m in zip(map(tuple, regions), means):
        assert abs(m - oracle[(st, en)]) < 1e-12

    # (c) partial overlap: hits accumulate via bincount, misses merge
    a = np.arange(100, dtype=np.int64) * 100
    b = np.arange(50, 150, dtype=np.int64) * 100
    da, db = rng.uniform(1, 9, 100), rng.uniform(1, 9, 100)
    regions, means = population_mean_depths(
        {"A": (a, a + 100, da), "B": (b, b + 100, db)}
    )
    assert len(regions) == 150
    np.testing.assert_allclose(means[:50], da[:50], atol=1e-12)
    np.testing.assert_allclose(means[50:100], (da[50:] + db[:50]) / 2, atol=1e-12)
    np.testing.assert_allclose(means[100:], db[50:], atol=1e-12)
