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
