"""Step 6: neighbor-normalized diploid copy number.

File-compatible with the reference step (grid/utils/compute_dipcn.py:10):
reads the counts TSV and neighbors file, integerizes IDs on the host, runs
the vectorized dipCN op, writes ``Sample\\tNorm_Reads``.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import jax.numpy as jnp

from grid_tpu.io.formats import read_counts_tsv, read_neighbors, neighbors_filename, write_dipcn
from grid_tpu.ops.dipcn import compute_dipcn
from grid_tpu.utils.device import step_device
from grid_tpu.utils.logging import log


def compute_diploid_genotypes(config, console=None):
    dcfg = config.get("compute_diploid_genotypes", {})
    output_file_prefix = dcfg.get("output_file_prefix")
    output_file_type = config.get("output_file_type", "tsv")
    output_dir = config.get("output_dir", ".")
    output_file = Path(f"{output_dir}/{output_file_prefix}.{output_file_type}")
    n_nbr = dcfg.get("n_nbr", 300)

    read_counts_file_prefix = config["count_reads"].get("output_file_prefix")
    read_counts_file = Path(f"{output_dir}/{read_counts_file_prefix}.{output_file_type}")

    zmax = config["mosdepth"]["neighbors"].get("zmax", 2.0)
    neighbors_file_prefix = config["mosdepth"]["neighbors"].get("output_file_prefix")
    neighbors_file = neighbors_filename(output_dir, neighbors_file_prefix, zmax, output_file_type)

    reads = read_counts_tsv(read_counts_file)
    neighbors, sample_scales = read_neighbors(neighbors_file)

    # --- stage: rows follow the neighbors file's sample order -------------
    sample_ids = list(neighbors.keys())
    n = len(sample_ids)
    k = max((len(v) for v in neighbors.values()), default=1)

    rnorm = np.array(
        [
            reads[sid] / sample_scales[sid]
            if sid in reads and sample_scales.get(sid) is not None
            else np.nan
            for sid in sample_ids
        ]
    )
    sample_valid = np.array(
        [sid in reads and sample_scales.get(sid) is not None for sid in sample_ids]
    )

    nbr_contrib = np.zeros((n, k))
    nbr_usable = np.zeros((n, k), dtype=bool)
    missing_ids: set[str] = set()
    for i, sid in enumerate(sample_ids):
        for j, (nid, nscale, _dist) in enumerate(neighbors[sid]):
            if nid in reads:
                nbr_contrib[i, j] = reads[nid] / nscale
                nbr_usable[i, j] = True
            else:
                missing_ids.add(nid)

    if n == 0:
        write_dipcn(output_file, [], [])
        log(console, f"Saved 0 samples → {output_file}", style="success")
        return output_file

    with step_device(config, nbr_contrib.size):
        dip, valid = compute_dipcn(
            jnp.asarray(rnorm),
            jnp.asarray(sample_valid),
            jnp.asarray(nbr_contrib),
            jnp.asarray(nbr_usable),
            n_nbr=n_nbr,
        )
    dip, valid = np.asarray(dip), np.asarray(valid)

    if missing_ids:
        log(
            console,
            f"Warning: {len(missing_ids)} neighbor IDs not found in read counts "
            f"(showing up to 5: {list(missing_ids)[:5]})",
            style="warning",
        )

    out_ids = [sid for i, sid in enumerate(sample_ids) if valid[i]]
    out_vals = [float(dip[i]) for i in range(n) if valid[i]]
    write_dipcn(output_file, out_ids, out_vals)
    log(console, f"Saved {len(out_ids)} samples → {output_file}", style="success")
    return output_file
