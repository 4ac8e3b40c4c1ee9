"""Pallas row-wise top-k-smallest selection kernel.

``lax.top_k`` on TPU lowers to a generic sort-based routine; selecting the
k=20 nearest out of a ~1.7k-wide candidate row measured 35 ms at 35k rows on
a v5e — half the grid engine's per-iteration budget. For k << W the optimal
TPU shape is k rounds of (row-min, arg-min, mask) over the VMEM-resident
block: pure VPU work, ~5 ops/element/round, no sort network.

Used by the grid search (ops/grid.py) for its final candidate selection;
exact (ties broken by lowest column index, like the XLA engine's stable
top_k on negated distances). Falls back to lax.top_k off-TPU.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import round_up

_BIG = float("inf")


def _select_kernel(d2_ref, out_d_ref, out_i_ref, *, k):
    s, w = d2_ref.shape
    k_pad = out_d_ref.shape[1]
    col = lax.broadcasted_iota(jnp.int32, (s, w), 1)
    slot = lax.broadcasted_iota(jnp.int32, (s, k_pad), 1)

    # k rounds of (row-min, arg-min, mask); a fori_loop keeps the Mosaic
    # program small (a 20x unrolled version compile-timed out remotely), and
    # results land via full-width selects — dynamic lane-dim stores are not
    # Mosaic-friendly.
    def round_body(r, carry):
        dt, od, oi = carry
        row_min = jnp.min(dt, axis=1, keepdims=True)  # (S, 1)
        amin = jnp.min(
            jnp.where(dt == row_min, col, jnp.int32(2**30)), axis=1, keepdims=True
        )
        sel = slot == r
        od = jnp.where(sel, row_min, od)
        oi = jnp.where(sel, amin, oi)
        return jnp.where(col == amin, _BIG, dt), od, oi

    init = (
        d2_ref[:, :],
        jnp.full((s, k_pad), _BIG, jnp.float32),
        jnp.full((s, k_pad), 2**30, jnp.int32),
    )
    _, od, oi = lax.fori_loop(0, k, round_body, init)
    out_d_ref[:, :] = od
    out_i_ref[:, :] = oi


@partial(jax.jit, static_argnames=("k", "block_rows", "interpret"))
def pallas_row_topk(
    d2: jnp.ndarray, *, k: int, block_rows: int | None = None,
    interpret: bool = False
):
    """k smallest entries per row of ``d2`` (masked entries = +inf).

    Returns (values (N, k), indices (N, k)), ascending per row; ties broken
    by lowest column index. Slots beyond a row's finite entries hold value
    +inf but an UNSPECIFIED index (the column-padding clamp can map the
    2**30 in-kernel sentinel to an in-range id) — callers must mask by
    ``isfinite(values)``, exactly as the grid engine does, never by index.
    """
    n, w = d2.shape
    k_pad = round_up(k, 128)
    w_pad = round_up(w, 128)
    if block_rows is None:
        # Working set ~4 row-width copies (d2, masked d2, col iota, compare
        # temps) in f32; keep it well under the 16 MB VMEM.
        block_rows = max(8, min(1024, (1 << 23) // (w_pad * 16)))
        block_rows = (block_rows // 8) * 8
    n_pad = round_up(n, block_rows)
    x = jnp.pad(
        d2.astype(jnp.float32), ((0, n_pad - n), (0, w_pad - w)),
        constant_values=_BIG,
    )

    vals, idxs = pl.pallas_call(
        partial(_select_kernel, k=k),
        grid=(n_pad // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, w_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_rows, k_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, k_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, k_pad), jnp.int32),
        ],
        interpret=interpret,
    )(x)
    return vals[:n, :k].astype(d2.dtype), idxs[:n, :k]
