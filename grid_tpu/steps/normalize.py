"""Step 4: normalize binned coverage across the cohort.

File-compatible with the reference step (grid/utils/normalize_mosdepth.py:23)
but restructured TPU-first: one host scan per sample (not two), then the
whole normalize transform as a single jitted device computation
(grid_tpu.ops.normalize), then the reference output format.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from grid_tpu.io.bed import load_repeat_mask
from grid_tpu.io.formats import read_samples, write_normalized_output
from grid_tpu.ops.normalize import normalize_cohort, select_high_variance_indices
from grid_tpu.utils.device import resolve_dtype, step_device
from grid_tpu.utils.logging import log
from grid_tpu.utils.timing import step_timer


def normalize_mosdepth(config, console=None):
    """Normalize mosdepth coverage for all samples (ref signature parity)."""
    samples = read_samples(config["samples_file"])
    chrom = config.get("chrom")
    start = config.get("start_bp")
    end = config.get("end_bp")
    threads = config.get("threads", 1)
    ncfg = config.get("mosdepth", {}).get("normalize", {})
    output_file_prefix = ncfg.get("output_file_prefix")
    output_file_type = config.get("output_file_type", "tsv")
    output_dir = config.get("output_dir", ".")
    output_path = Path(output_dir) / f"{output_file_prefix}.{output_file_type}.gz"
    min_depth = ncfg.get("min_depth", 20)
    max_depth = ncfg.get("max_depth", 100)
    top_frac = ncfg.get("top_frac", 0.1)
    repeat_mask = ncfg.get("repeat_mask_file")

    excluded = load_repeat_mask(repeat_mask) if repeat_mask else {}

    with step_timer("normalize.stage", console=None):
        stage = _stage(
            config, samples, chrom, start, end, excluded,
            min_depth, max_depth, threads, console,
        )

    with step_timer("normalize.device", console=None):
        dtype = resolve_dtype(config)
        vals = stage.values if dtype is None else stage.values.astype(dtype)
        with step_device(config, stage.values.size):
            res = normalize_cohort(jnp.asarray(vals), jnp.asarray(stage.mask))
            res = jax.tree.map(np.asarray, res)
        selected = select_high_variance_indices(res.var_ratio, top_frac)

    write_normalized_output(
        output_path,
        stage.sample_ids,
        np.asarray(res.row_means_raw),
        np.asarray(res.z),
        np.asarray(res.mask),
        np.asarray(res.col_means),
        np.asarray(res.col_vars),
        selected,
    )
    log(console, f"Mosdepth normalization complete. Results written to {output_path}", style="success")
    return output_path


def stage_would_stream(config) -> bool:
    """True when _stage will use the bounded-memory streaming stager
    (device.streaming_stage = true, or auto with > 5000 samples). The
    one-pass ingest consults this to avoid accumulating per-sample arrays
    the streaming path exists not to hold."""
    from grid_tpu.io.formats import read_samples

    mode = str(config.get("device", {}).get("streaming_stage", "auto")).lower()
    if mode == "true":
        return config.get("chrom") is not None
    if mode == "auto":
        try:
            n = len(read_samples(config["samples_file"]))
        except Exception:
            return False
        return n > 5000 and config.get("chrom") is not None
    return False


def _stage(config, samples, chrom, start, end, excluded, min_depth, max_depth, threads, console):
    """Pick the staging strategy: config device.streaming_stage = auto|true|false.
    'auto' streams for cohorts above 5000 samples (bounded-memory two-pass).

    When the one-pass ingest ran in this pipeline invocation
    (steps/ingest.py), its in-memory window bins are handed over via the
    private ``_ingest_staged`` key and the bed.gz files are never re-read
    (they were written for artifact parity, not as a transport). The
    handoff is absent in streaming mode (the pipeline passes
    collect_staged=False to the ingest), so the streaming stager reads the
    files as before."""
    from grid_tpu.io.staging import stage_cohort, stage_cohort_streaming

    mode = str(config.get("device", {}).get("streaming_stage", "auto")).lower()
    use_stream = mode == "true" or (mode == "auto" and len(samples) > 5000)

    staged = config.get("_ingest_staged")
    if staged is not None and not (use_stream and chrom is not None):
        return stage_cohort(
            config.get("mosdepth", {}).get("work_dir"), samples, chrom, start,
            end, excluded, min_depth, max_depth, threads, console,
            per_sample=staged,
        )

    if use_stream and chrom is not None:
        return stage_cohort_streaming(
            config.get("mosdepth", {}).get("work_dir"), samples, chrom, start, end,
            excluded, min_depth, max_depth,
            bin_size=config.get("mosdepth", {}).get("bin_size", 1000),
            threads=threads, console=console,
        )
    return stage_cohort(
        config.get("mosdepth", {}).get("work_dir"), samples, chrom, start, end,
        excluded, min_depth, max_depth, threads, console,
    )
