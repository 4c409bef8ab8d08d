"""Pallas TPU kernel for the threshold-bisection dipCN core.

The XLA formulation (`ops.select.dipcn_from_distances`) is LATENCY-bound:
~75 small sequential passes (two 31-round value bisections + two column
tie-cut bisections + masked sums), each re-reading the [N, N] d2 matrix
from HBM. This kernel holds one row block in VMEM and runs the ENTIRE
per-row pipeline — both bisections, both tie cuts, the masked sum — in a
single kernel launch, so d2 crosses HBM exactly once (25 MB at N=2504,
~30 us of bandwidth) and the bisection rounds run at VMEM speed.

Semantics are IDENTICAL to dipcn_from_distances (same bitcast key space,
same stable-tie rule); the parity test drives both on forced-tie inputs.

Per the repo's measurement rule (docs/perf.md: the custom Gram kernel lost
10x to XLA and stays shelved), this kernel is NOT wired into the pipeline:
measured on one v5e it TIES the XLA formulation (best case 1.13x at
block 512 — XLA already runs at the bisection bandwidth floor), so callers
who want it invoke :func:`dipcn_from_distances_pallas` directly;
`scripts/probe_pallas_dipcn.py` is the measurement harness.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dipcn_kernel(d2_ref, rnorm_ref, w_ref, usable_ref, valid_ref,
                  dip_ref, ok_ref, *, k: int, n_nbr: int, bits: int):
    """One row block: [B, N] distances -> [B, 1] dipCN.

    Mirrors ops.select.dipcn_from_distances line for line; d2 arrives with
    self/invalid columns already set to a large finite value (the caller's
    contract there too).
    """
    d2 = d2_ref[:]                       # [B, N] f32, VMEM-resident
    u = jax.lax.bitcast_convert_type(d2, jnp.int32)
    b = u.shape[0]
    big = jnp.int32((1 << (bits - 1)) - 1)
    w_row = w_ref[:]                     # [1, N]
    usable = usable_ref[:]               # [1, N] bool

    def kth_smallest(uu, k_arr):
        """Exact k-th smallest key per row (31-round bisection, all in
        VMEM). k_arr: [B, 1] int32."""
        def body(_, lohi):
            lo, hi = lohi
            mid = lo + (hi - lo) // 2
            cnt = jnp.sum((uu <= mid).astype(jnp.int32), axis=1, keepdims=True)
            ge = cnt >= k_arr
            return jnp.where(ge, lo, mid + 1), jnp.where(ge, mid, hi)

        lo = jnp.zeros((b, 1), jnp.int32)
        hi = jnp.full((b, 1), big)
        lo, hi = jax.lax.fori_loop(0, bits - 1, body, (lo, hi))
        return hi

    def tie_cut(tie_mask, need, cols):
        """Smallest column c with count(tie & col <= c) >= need per row;
        -1 where need <= 0."""
        n = tie_mask.shape[1]
        steps = max(int(n - 1).bit_length(), 1)

        def body(_, lohi):
            lo, hi = lohi
            mid = lo + (hi - lo) // 2
            cnt = jnp.sum((tie_mask & (cols <= mid)).astype(jnp.int32),
                          axis=1, keepdims=True)
            ge = cnt >= need
            return jnp.where(ge, lo, mid + 1), jnp.where(ge, mid, hi)

        lo = jnp.zeros((b, 1), jnp.int32)
        hi = jnp.full((b, 1), n - 1, jnp.int32)
        lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
        return jnp.where(need > 0, hi, -1)

    cols = jax.lax.broadcasted_iota(jnp.int32, u.shape, 1)

    # --- k-set membership (smallest_k_mask semantics) --------------------
    k_arr = jnp.full((b, 1), jnp.int32(k))
    t = kth_smallest(u, k_arr)
    below = u < t
    at = u == t
    need = k_arr - jnp.sum(below.astype(jnp.int32), axis=1, keepdims=True)
    cut = tie_cut(at, need, cols)
    in_sk = below | (at & (cols <= cut))

    # --- usable prefix within the k-set ----------------------------------
    uu = jnp.where(in_sk & usable, u, big)
    cnt_usable = jnp.sum((uu < big).astype(jnp.int32), axis=1, keepdims=True)
    m_eff = jnp.minimum(cnt_usable, jnp.int32(n_nbr))

    t2 = kth_smallest(uu, m_eff)
    below2 = uu < t2
    at2 = uu == t2
    need2 = m_eff - jnp.sum(below2.astype(jnp.int32), axis=1, keepdims=True)
    cut2 = tie_cut(at2, need2, cols)
    take = (below2 | (at2 & (cols <= cut2))) & (m_eff > 0)

    tot = jnp.sum(jnp.where(take, w_row, 0.0), axis=1, keepdims=True)
    nbr_mean = tot / jnp.maximum(m_eff, 1).astype(d2.dtype)
    dip_ref[:] = rnorm_ref[:] / nbr_mean
    ok_ref[:] = valid_ref[:] & (m_eff > 0)


@partial(jax.jit, static_argnames=("k", "n_nbr", "row_block", "interpret"))
def dipcn_from_distances_pallas(d2, rnorm, nbr_w, col_usable, sample_valid,
                                k: int, n_nbr: int, row_block: int = 256,
                                interpret: bool = False):
    """Drop-in twin of ops.select.dipcn_from_distances (same argument and
    return contract) running the whole threshold pipeline in one Pallas
    kernel per row block."""
    if d2.dtype != jnp.float32:
        d2 = d2.astype(jnp.float32)
    n, w = d2.shape
    b = min(row_block, n)
    n_pad = ((n + b - 1) // b) * b
    big = jnp.finfo(jnp.float32).max
    d2p = jnp.pad(d2, ((0, n_pad - n), (0, 0)), constant_values=big)
    rn = jnp.pad(jnp.asarray(rnorm, jnp.float32), (0, n_pad - n)).reshape(-1, 1)
    vl = jnp.pad(jnp.asarray(sample_valid, bool), (0, n_pad - n)).reshape(-1, 1)
    wv = jnp.asarray(nbr_w, jnp.float32).reshape(1, -1)
    us = jnp.asarray(col_usable, bool).reshape(1, -1)

    kernel = partial(_dipcn_kernel, k=k, n_nbr=n_nbr, bits=32)
    dip, ok = pl.pallas_call(
        kernel,
        grid=(n_pad // b,),
        in_specs=[
            pl.BlockSpec((b, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.bool_),
        ],
        interpret=interpret,
    )(d2p, rn, wv, us, vl)
    return dip[:n, 0], ok[:n, 0]
