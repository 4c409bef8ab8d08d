"""Multi-process (simulated multi-host) validation.

Launches two real Python processes that form a jax.distributed cluster over
localhost (Gloo/TCP — the CPU stand-in for ICI/DCN), build a global cohort
mesh spanning both processes, and run the sharded normalize + ring kNN on a
cohort that neither process holds fully. Verifies results against the
single-process ops.

This is the closest a single machine gets to exercising the
``jax.distributed.initialize`` + cross-host collective path (SURVEY §5
"distributed communication backend").
"""

import json
import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = textwrap.dedent(
    """
    import os, sys, json
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    pid = int(sys.argv[1]); port = sys.argv[2]; out_path = sys.argv[3]
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )
    import numpy as np
    import jax.numpy as jnp
    import jax.experimental.multihost_utils as mhu
    from jax.sharding import Mesh, PartitionSpec as P

    sys.path.insert(0, "@REPO@")
    from grid_tpu.parallel.pknn import ring_knn
    from grid_tpu.parallel.pstats import normalize_cohort_sharded

    assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

    mesh = Mesh(np.array(jax.devices()), ("cohort",))
    n, r, k = 64, 24, 7
    rng = np.random.default_rng(5)
    values = rng.uniform(20, 60, size=(n, r))
    mask = rng.random((n, r)) > 0.1

    gv = mhu.host_local_array_to_global_array(
        (values * mask)[pid * (n // 2) : (pid + 1) * (n // 2)], mesh, P("cohort")
    )
    gm = mhu.host_local_array_to_global_array(
        mask[pid * (n // 2) : (pid + 1) * (n // 2)], mesh, P("cohort")
    )

    res = normalize_cohort_sharded(gv, gm, mesh)
    d, i = ring_knn(
        jnp.where(res.mask, jnp.nan_to_num(res.z), 0.0), k, mesh
    )

    z_all = np.asarray(mhu.process_allgather(res.z, tiled=True))
    d_all = np.asarray(mhu.process_allgather(d, tiled=True))
    i_all = np.asarray(mhu.process_allgather(i, tiled=True))
    ratios = np.asarray(res.var_ratio)

    if pid == 0:
        np.savez(out_path, z=z_all, d=d_all, i=i_all, ratios=ratios,
                 values=values, mask=mask)
    """
)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.skipif(os.environ.get("GRID_TPU_SKIP_MULTIHOST") == "1", reason="disabled")
def test_two_process_cluster_matches_single(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER.replace("@REPO@", str(REPO)))
    out_npz = tmp_path / "out.npz"
    port = _free_port()

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(port), str(out_npz)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=180)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-2000:]

    data = np.load(str(out_npz) + ".npz" if not out_npz.exists() else out_npz)

    # single-process reference
    from grid_tpu.ops.knn import knn_squared
    from grid_tpu.ops.normalize import normalize_cohort
    import jax.numpy as jnp

    values, mask = data["values"], data["mask"]
    ref = normalize_cohort(values * mask, mask)
    np.testing.assert_allclose(data["ratios"], np.asarray(ref.var_ratio), rtol=1e-10)
    zp = np.where(np.asarray(ref.mask), np.nan_to_num(np.asarray(ref.z)), 0.0)
    rd, ri = knn_squared(jnp.asarray(zp), 7, row_block=16)
    np.testing.assert_allclose(data["d"], np.asarray(rd), rtol=1e-8, atol=1e-8)
    for row in range(values.shape[0]):
        assert set(data["i"][row].tolist()) == set(np.asarray(ri)[row].tolist())


STAGE_WORKER = textwrap.dedent(
    """
    import os, sys, json
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    pid = int(sys.argv[1]); port = sys.argv[2]; out_path = sys.argv[3]
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )
    import numpy as np
    import jax.numpy as jnp
    import jax.experimental.multihost_utils as mhu
    from jax.sharding import Mesh

    sys.path.insert(0, "@REPO@")
    from grid_tpu.io.staging import stage_cohort_sharded
    from grid_tpu.models.cohort import CohortParams
    from grid_tpu.parallel import sharded_cohort_step
    from grid_tpu.io.hap_neighbors import pad_hap_neighbors

    mesh = Mesh(np.array(jax.devices()), ("cohort",))

    # 18 samples total; process 0 holds 10, process 1 holds 8 — a cohort
    # NEITHER process fully holds (uneven split exercises per-process
    # padding + the allgathered region universe)
    n_total, r = 18, 32
    counts = [10, 8]
    lo = sum(counts[:pid]); hi = lo + counts[pid]

    def source():
        def it():
            rng_all = np.random.default_rng(77)
            starts = np.arange(r, dtype=np.int64) * 1000
            depths_all = rng_all.uniform(20.0, 60.0, size=(n_total, r))
            for i in range(lo, hi):
                yield f"S{i:04d}", [("chr1", starts, starts + 1000, depths_all[i])]
        return it()

    stage = stage_cohort_sharded(source, mesh, min_depth=1, max_depth=1000)
    assert stage.n == n_total, stage.n
    assert len(stage.sample_ids) == n_total

    # run the full sharded step on the staged arrays
    n_pad = stage.values.shape[0]
    params = CohortParams(num_neighbors=6, n_nbr=6, n_iters=0, row_block=8)
    from grid_tpu.parallel.mesh import cohort_sharding
    s1 = cohort_sharding(mesh, 1)
    rng = np.random.default_rng(3)
    reads_all = rng.integers(500, 2000, n_total).astype(np.float64)
    # sample_rows is THE sample<->row mapping (row_valid conflates padding
    # with real-but-empty samples and must not be used for this)
    assert stage.sample_rows.shape == (n_total,)
    reads_p = np.zeros(n_pad)
    reads_p[stage.sample_rows] = reads_all
    rv_host = np.asarray(mhu.process_allgather(stage.row_valid, tiled=True))
    assert rv_host[stage.sample_rows].all()  # this cohort has no empty samples
    rows_per = n_pad // len(jax.devices())
    all_devs = list(jax.devices())

    def shard_vec(vec):
        parts = []
        for g, d in enumerate(all_devs):
            if d.process_index == jax.process_index():
                parts.append(jax.device_put(vec[g * rows_per:(g + 1) * rows_per], d))
        return jax.make_array_from_single_device_arrays((n_pad,), s1, parts)

    reads_sh = shard_vec(reads_p)
    rv_sh = shard_vec(rv_host)
    hap = [[((h + 2) % (2 * n_pad), 1.0)] for h in range(2 * n_pad)]
    hi_, hw_, hv_ = pad_hap_neighbors(hap, 1, dtype=np.float64)
    out = sharded_cohort_step(
        mesh, stage.values, stage.mask, reads_sh, rv_sh,
        jnp.asarray(hi_), jnp.asarray(hw_), jnp.asarray(hv_), params,
        row_valid=stage.row_valid,
    )
    dip = np.asarray(mhu.process_allgather(out.dipcn, tiled=True))
    ok = np.asarray(mhu.process_allgather(out.dipcn_valid, tiled=True))
    vals = np.asarray(mhu.process_allgather(stage.values, tiled=True))
    msk = np.asarray(mhu.process_allgather(stage.mask, tiled=True))

    if pid == 0:
        np.savez(out_path, dip=dip, ok=ok, rv=rv_host, vals=vals, msk=msk,
                 reads=reads_all, regions=stage.regions,
                 ids=np.array(stage.sample_ids))
    """
)


@pytest.mark.skipif(os.environ.get("GRID_TPU_SKIP_MULTIHOST") == "1", reason="disabled")
def test_two_process_sharded_staging(tmp_path):
    """stage_cohort_sharded on 2 processes with DISJOINT per-process sample
    sources: region universe allgathered, each process fills only its
    addressable shards, and the sharded step runs end-to-end. Results match
    a single-process run over the union."""
    worker = tmp_path / "worker.py"
    worker.write_text(STAGE_WORKER.replace("@REPO@", str(REPO)))
    out_npz = tmp_path / "out.npz"
    port = _free_port()

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(port), str(out_npz)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=240)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-3000:]

    data = np.load(str(out_npz) + ".npz" if not out_npz.exists() else out_npz)

    # single-process reference over the union cohort
    import jax.numpy as jnp

    from grid_tpu.models.cohort import CohortParams, cohort_step
    from grid_tpu.io.hap_neighbors import pad_hap_neighbors

    n_total, r = 18, 32
    rng_all = np.random.default_rng(77)
    depths_all = rng_all.uniform(20.0, 60.0, size=(n_total, r))
    rv = data["rv"].astype(bool)

    # the worker's global rows, padding removed, must be the union depths
    vals_real = data["vals"][rv]
    np.testing.assert_allclose(vals_real, depths_all.astype(np.float32), rtol=1e-6)
    assert data["msk"][rv].all()
    assert len(data["ids"]) == n_total

    params = CohortParams(num_neighbors=6, n_nbr=6, n_iters=0, row_block=8)
    hap = [[((h + 2) % (2 * n_total), 1.0)] for h in range(2 * n_total)]
    hi_, hw_, hv_ = pad_hap_neighbors(hap, 1, dtype=np.float64)
    ref = cohort_step(
        depths_all, np.ones((n_total, r), bool), data["reads"],
        np.ones(n_total, bool), hi_, hw_, hv_, params,
    )
    ref_dip = np.asarray(ref.dipcn)
    got_dip = data["dip"][rv]
    assert data["ok"][rv].all()
    np.testing.assert_allclose(got_dip, ref_dip, rtol=5e-5)
