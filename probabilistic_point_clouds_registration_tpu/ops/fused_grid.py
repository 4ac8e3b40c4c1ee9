"""Fused grouped grid search: cell-shared candidate windows + Pallas k-select.

The XLA grid engine (ops/grid.py) pays two HBM taxes every outer iteration on
a dense scan like the 35k bench pair:

  * the candidate gather moves (N, 27, capacity) whole-bucket rows — ~1 GB of
    768 B-granularity random gathers (~30 ms measured on a v5e), and
  * ``lax.top_k`` over the (N, 27*capacity) distance matrix (~35 ms) — a
    20-round min-extraction at HBM bandwidth.

This engine exploits the fact that all sources in the same grid cell share
the *same* 27-cell candidate neighborhood (the reference's kd-tree pays this
cost per query instead — src/prob_point_cloud_registration.cc:72-81):

  1. ONCE per pair: prepack, for every cell in the dilated occupied set (any
     cell adjacent to an occupied target cell — a source anywhere else
     provably has zero in-radius neighbors), the full 27-neighborhood
     candidate window as contiguous (3, L) coordinate + (L,) index rows.
  2. Per iteration (all device-side, inside jit): bucket the moved sources
     by cell, group same-cell sources into G=8-row blocks (G = the f32
     sublane count, so the in-kernel candidate broadcast is tile-aligned),
     gather one prepacked window per *group* (large contiguous rows, ~4x
     less traffic than per-source gathers), and
  3. run a Pallas kernel that recomputes distances in VMEM and extracts the
     k nearest per source with a min-extraction loop that never touches HBM.

Selection semantics are identical to the XLA engines: k smallest f32
distances within ``radius``, ascending, ties broken by candidate-slot order
(the same (neighbor-offset, bucket-slot) enumeration), so neighbor sets are
bit-compatible and tested for parity (tests/test_fused_grid.py).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import Correspondences, bucket_rows as _bucket_rows, pow2 as _pow2, round_up

# Sources per cell-pure group == f32 sublane count: the in-kernel
# window-to-rows broadcast then maps exactly onto sublane replication.
GROUP = 8
# Groups processed per Pallas grid step (bounds VMEM at ~6 MB/step).
BLOCK_GROUPS = 16
# Dead-candidate coordinate sentinel: squared distances overflow any radius.
_BIG = np.float32(1e30)
# Row-meta encoding for lane 3 of the padded source rows: a FLOAT-exact
# integer (max ~263k << 2^24, so it survives f64 -> f32 casts) packing the
# valid flag and the row's segment lane bounds in 16-lane units:
#   meta = valid | (lo/16) << 1 | (hi/16) << 10      (lo % 16 == 0;
#                                                      hi rounded UP to 16)
# Segment factors are planned so every F > 1 segment width is a multiple of
# 16 (ops/fused_pool._plan_segment_bands); F = 1 rows use lo = 0 and a
# rounded-up hi, where the extra lanes are dead padding anyway.
META_UNIT = 16


def pack_row_meta(valid, lo, hi):
    """Pack (valid, lo, hi) into the float-integer row meta (see META_UNIT).

    ``lo`` must be a multiple of META_UNIT; ``hi`` is rounded up to one.
    Works on numpy or jax int arrays; returns the same backend's array.
    """
    np_mod = jnp if isinstance(valid, jnp.ndarray) else np
    hi16 = -(-np_mod.asarray(hi) // META_UNIT)
    return (
        np_mod.asarray(valid).astype(np_mod.int32)
        + ((np_mod.asarray(lo) // META_UNIT) << 1)
        + (hi16 << 10)
    )


def _unpack_row_meta(v):
    """Kernel-side inverse of :func:`pack_row_meta` (f32 column -> ints)."""
    vi = v.astype(jnp.int32)
    valid = (vi & 1) > 0
    lo = ((vi >> 1) & 511) << 4
    hi = (vi >> 10) << 4
    return valid, lo, hi


class PrepackedGrid(NamedTuple):
    """Per-pair fused-search state (device arrays unless noted).

    Attributes:
      cand_xyz: (UD+1, 3, L) candidate window coordinates per dilated cell;
        row UD is the dead window (all slots empty).
      cand_idx: (UD+1, L) original target index per slot; -1 = empty.
      lut_d: (prod(dims+2),) extended-grid linear cell id -> dilated row,
        -1 where a source has provably no neighbors.
      origin_d: (3,) extended grid origin (origin - cell_size).
      dims_d: (3,) int32 extended grid dims (dims + 2).
      n_lanes: static L.
      n_dilated: static UD.
      cell_size: static float.
    """

    cand_xyz: jnp.ndarray
    cand_idx: jnp.ndarray
    width_lut: jnp.ndarray  # (UD+1,) int32 per-window kernel width (lanes)
    union_lut: jnp.ndarray  # (UD+1,) int32 real candidate union per window
    lut_d: jnp.ndarray
    origin_d: jnp.ndarray
    dims_d: jnp.ndarray
    n_lanes: int
    n_dilated: int
    cell_size: float
    # Expected-rounds hint: True when enough windows have real unions below
    # a typical k that the counted extraction loop beats the static unroll.
    small_unions: bool = False


def dilate_cells_host(
    grid_host: dict,
    counts: np.ndarray | None = None,
    dense_lut: bool = True,
) -> dict | None:
    """Host-side dilation tables for :func:`build_prepack` (numpy only).

    Takes the dict from ops.grid.build_grid_host. Returns None when the
    extended LUT would be too large to materialize densely (sparse scans
    stay on the XLA engines).

    ``counts`` overrides the per-cell candidate counts used for window
    unions/widths: the dense engine packs from the capacity-CAPPED bucket
    tensors (default: live bucket slots), while the capacity-free pool engine
    (ops/fused_pool.py) passes the full ``cell_count`` so hot-cell points
    stay inline in their windows instead of in a separate overflow set.

    ``dense_lut=False`` skips materializing the dense (prod_d,) cell->window
    LUT and returns the sparse pair ("d_cells", "lut_vals", "prod_d")
    instead — at KITTI scale the dense LUT is >100 MB of host write + device
    upload, vs a ~1 MB scatter the device does itself (fused_pool.py).
    """
    dims = grid_host["dims"].astype(np.int64)
    dims_d = dims + 2
    prod_d = int(dims_d.prod())
    if prod_d > (1 << 25):
        return None
    # Only the real occupied cells: the grid pads its arrays to a row
    # bucket (ops/grid.py) with sentinel ids that must not be decoded.
    u = grid_host.get("num_cells", grid_host["cell_ids"].shape[0])
    cell_ids = grid_host["cell_ids"][:u].astype(np.int64)
    # Decode occupied cells, dilate by one in every direction (extended
    # coords = original + 1 so the border ring is always addressable — no
    # bounds mask needed). All index math stays in flat linear space: the
    # 27-neighborhood of extended-linear base b is {b + off_lin} because the
    # extended grid's border ring guarantees no axis wraps.
    x = (cell_ids % dims[0]).astype(np.int32)
    rest = cell_ids // dims[0]
    y = (rest % dims[1]).astype(np.int32)
    z = (rest // dims[1]).astype(np.int32)
    # All neighbor math runs in a DOUBLE-extended (+4) grid: occupied cells
    # sit at coords+2, so dilated cells land in [1, dims+2] and every
    # neighbor-of-a-dilated-cell in [0, dims+3] — always in bounds, which
    # kills the per-axis bounds masks and clips (~12 extra 7M-element passes
    # in the previous formulation; this host dilation is on the per-pair
    # critical path at KITTI scale).
    e0, e1 = int(dims[0] + 4), int(dims[1] + 4)
    prod_e = e0 * e1 * int(dims[2] + 4)
    # Offset enumeration order (x slowest, z fastest) is the tie order shared
    # by every engine — keep it exactly.
    ox, oy, oz = np.meshgrid(*([np.arange(-1, 2, dtype=np.int32)] * 3), indexing="ij")
    off_e = (ox + e0 * (oy + e1 * oz)).reshape(27)
    base_e = (x + 2) + np.int32(e0) * ((y + 2) + np.int32(e1) * (z + 2))

    if counts is None:
        counts = (grid_host["bucket_idx"] >= 0).sum(axis=1)

    # Native C++ dilation when available (the per-pair prepack's host half
    # sits on the cold-pair critical path; the numpy body below is
    # allocation-heavy — measured 0.9-4 s first-call-in-process at KITTI
    # scale vs ~0.1 s native — and is kept as the always-works fallback and
    # parity oracle, tests/test_native.py).
    from .. import native as _native

    nat = _native.dilate_cells(cell_ids, dims, counts[:u])
    if nat is not None:
        d_cells_e, nrows, union = nat
        ud = d_cells_e.shape[0]
        max_union = int(union.max()) if union.size else 0
    else:
        dil_e = (base_e[:, None] + off_e[None, :]).reshape(-1)
        # Dense-flag unique: O(prod_e + 27u) beats sorting 27u linear ids.
        flags = np.zeros((prod_e,), dtype=bool)
        flags[dil_e] = True
        d_cells_e = np.flatnonzero(flags).astype(np.int32)
        ud = d_cells_e.shape[0]

        # Original-grid row of each of the 27 neighbors of each dilated
        # cell: one gather through the extended occupied-cell LUT, no
        # bounds math.
        lut_e = np.full((prod_e,), -1, dtype=np.int32)
        lut_e[base_e] = np.arange(u, dtype=np.int32)
        nrows = lut_e[d_cells_e[:, None] + off_e[None, :]]

        # Largest real candidate-union over all windows: the packed lane
        # width. Typically ~5x smaller than 27*capacity (bunny 35k: 262 vs
        # 1728) — occupancy variance means most bucket slots are padding,
        # and the select kernel's extraction cost is proportional to lane
        # width.
        counts_pad = np.concatenate([counts[:u], [0]]).astype(np.int32)
        union = counts_pad[np.where(nrows >= 0, nrows, u)].sum(
            axis=1, dtype=np.int32
        )
        max_union = int(union.max()) if union.size else 0

        # Renumber dilated rows by DESCENDING union width. Sources are
        # grouped in row order every iteration, so this makes the group
        # sequence width-monotone: each select-kernel block then runs at
        # (roughly) its own real width instead of the global maximum — the
        # per-block width predication in _select_kernel.
        perm = np.argsort(-union, kind="stable").astype(np.int32)
        nrows = nrows[perm]
        union = union[perm]
        # Dilated cell ids in the (+2) extended search grid (row j of the
        # width-sorted numbering lives at extended-linear d_cells[j]).
        d_cells_e = d_cells_e[perm]
    xe = d_cells_e % e0
    re_ = d_cells_e // e0
    ye = re_ % e1
    ze = re_ // e1
    d0, d1 = int(dims_d[0]), int(dims_d[1])
    d_cells = (xe - 1) + np.int32(d0) * ((ye - 1) + np.int32(d1) * (ze - 1))
    # Per-row kernel width (lanes, multiple of 128); dead row (appended by
    # the prepack as row UD) gets width 0 so budget-padding blocks are free.
    width_lut = np.concatenate(
        [
            (np.ceil(np.maximum(union, 1) / 128.0) * 128).astype(np.int32),
            np.zeros((1,), np.int32),
        ]
    )
    out = {
        "nrows": nrows,  # (UD, 27) int32
        "dims_d": dims_d.astype(np.int32),
        "origin_d": grid_host["origin"] - grid_host["cell_size"],
        "n_dilated": ud,
        "max_union": max_union,
        "union": union,  # (UD,) descending real candidate counts
        "width_lut": width_lut,  # (UD+1,) int32
        # Real (unpadded) candidate union per window: bounds the number of
        # k-extraction rounds a block can possibly need (dead row = 0).
        "union_lut": np.concatenate(
            [union.astype(np.int32), np.zeros((1,), np.int32)]
        ),
    }
    if dense_lut:
        lut_d = np.full((prod_d,), -1, dtype=np.int32)
        lut_d[d_cells] = np.arange(ud, dtype=np.int32)
        out["lut_d"] = lut_d
    else:
        out["d_cells"] = d_cells
        out["prod_d"] = prod_d
        # Device-side neighbor-row computation (fused_pool.py): the (UD, 27)
        # nrows table is ~27x the size of these seeds (28 MB vs ~1 MB at
        # KITTI scale), so sparse-path callers upload the width-sorted
        # double-extended cell ids + the occupied-cell scatter seeds and
        # rebuild nrows with one device gather instead of shipping it.
        out["d_cells_e"] = d_cells_e
        out["base_e"] = base_e
        out["prod_e"] = prod_e
        out["e_dims"] = (e0, e1)
        # The 27 linear neighbor offsets in the double-extended grid —
        # the enumeration IS the engines' shared tie-break contract, so
        # consumers must use this array, not rebuild it.
        out["off_e"] = off_e.astype(np.int32)
    return out


@partial(jax.jit, static_argnames=("capacity", "n_lanes"))
def _assemble_prepack(bucket_pts, bucket_idx, nrows, *, capacity: int, n_lanes: int):
    """Device assembly of the candidate windows from the bucket tensors.

    When ``n_lanes`` is below the raw 27*capacity width, each window is
    COMPACTED: live slots sort to the front (stable in (neighbor-offset,
    bucket-slot) order, so engine tie-order parity is preserved) and the
    dead-slot tail beyond the largest real union is sliced away — the select
    kernel's per-row extraction cost is proportional to this width.
    """
    ud = nrows.shape[0]
    u = bucket_pts.shape[0]
    dtype = bucket_pts.dtype
    l_full = 27 * capacity
    if n_lanes < l_full:
        # Closed-form packed gather — no sort: within each bucket the live
        # slots are contiguous from slot 0, so packed position p of window u
        # maps to (neighbor j, slot p - start_j) where start_j is the
        # exclusive cumsum of live counts. Values come from whole-bucket
        # contiguous gathers (768 B rows at cap 64) followed by a within-row
        # take_along_axis shuffle — per-element random gathers over the flat
        # bucket tensors measured ~20% slower (21.4 vs 17.7 ms at 35k), and a
        # per-pair device argsort over (UD, 27*cap) ~170 ms.
        safe = jnp.maximum(nrows, 0)  # (UD, 27)
        cnt_cell = jnp.sum(bucket_idx >= 0, axis=1).astype(jnp.int32)  # (U,)
        cnt = jnp.where(nrows >= 0, cnt_cell[safe], 0)  # (UD, 27)
        starts = jnp.cumsum(cnt, axis=1) - cnt  # exclusive prefix
        total = jnp.sum(cnt, axis=1)  # (UD,)
        p = jnp.arange(n_lanes, dtype=jnp.int32)
        owner = (
            jnp.sum(
                starts[:, None, :] <= p[None, :, None], axis=2, dtype=jnp.int32
            )
            - 1
        )  # (UD, n_lanes): last neighbor whose start <= p
        owner = jnp.clip(owner, 0, 26)
        slot = p[None, :] - jnp.take_along_axis(starts, owner, axis=1)
        rel = owner * capacity + slot  # position within the window's own row
        live = p[None, :] < total[:, None]
        rel = jnp.where(live, rel, 0)
        pts = bucket_pts[safe]  # (UD, 27, cap, 3) contiguous bucket rows
        idx = jnp.where(nrows[..., None] < 0, -1, bucket_idx[safe])
        flat_idx = jnp.where(
            live, jnp.take_along_axis(idx.reshape(ud, l_full), rel, axis=1), -1
        )
        flat_pts = jnp.take_along_axis(
            pts.reshape(ud, l_full, 3), rel[..., None], axis=1
        )
        pad = 0
    else:
        pts = bucket_pts[jnp.maximum(nrows, 0)]  # (UD, 27, cap, 3)
        idx = bucket_idx[jnp.maximum(nrows, 0)]  # (UD, 27, cap)
        idx = jnp.where(nrows[..., None] < 0, -1, idx)
        flat_idx = idx.reshape(ud, l_full)
        flat_pts = pts.reshape(ud, l_full, 3)
        pad = n_lanes - l_full
    flat_pts = jnp.where((flat_idx < 0)[..., None], jnp.asarray(_BIG, dtype), flat_pts)
    flat_xyz = jnp.transpose(flat_pts, (0, 2, 1))
    cand_xyz = jnp.pad(flat_xyz, ((0, 1), (0, 0), (0, pad)),
                       constant_values=_BIG)
    cand_idx = jnp.pad(flat_idx, ((0, 1), (0, pad)), constant_values=-1)
    return cand_xyz, cand_idx


@partial(jax.jit, static_argnames=("capacity", "n_lanes", "prod_d", "prod_e", "ud_pad"))
def _build_prepack_dev(bucket_pts, bucket_idx, base_e, d_cells_e, off_e,
                       d_cells, row_vals, *, capacity, n_lanes, prod_d,
                       prod_e, ud_pad):
    """Device half of the dense prepack as ONE program (same seeds-only
    scheme as fused_pool._build_pools: the host ships ~KB of cell-id seeds
    instead of the (UD, 27) neighbor-row table + dense LUT, and the ctor
    pays one dispatch instead of several). Window rows [UD, ud_pad) are
    dead padding (bucketed row count — stable shapes across a sequence)."""
    from .fused_pool import _neighbor_rows, _scatter_lut

    lut_d = _scatter_lut(d_cells, row_vals, prod_d=prod_d)
    nrows_real = _neighbor_rows(base_e, d_cells_e, off_e, prod_e=prod_e)
    nrows = (
        jnp.full((ud_pad, 27), -1, jnp.int32)
        .at[row_vals]
        .set(nrows_real, mode="drop")
    )
    cand_xyz, cand_idx = _assemble_prepack.__wrapped__(
        bucket_pts, bucket_idx, nrows, capacity=capacity, n_lanes=n_lanes
    )
    return cand_xyz, cand_idx, lut_d


def build_prepack(grid_host: dict, device_grid, k: int = 20) -> PrepackedGrid | None:
    """Build the per-pair fused-search state.

    Args:
      grid_host: dict from ops.grid.build_grid_host (numpy arrays).
      device_grid: the HashGrid already on device (bucket tensors reused).
      k: expected neighbour count — only tunes the extraction-loop hint.
    """
    dil = dilate_cells_host(grid_host, dense_lut=False)
    if dil is None:
        return None
    capacity = grid_host["capacity"]
    # Packed lane width: the largest real candidate union, never more than
    # the raw 27*capacity window — bucketed at ~12.5% granularity (128-lane
    # floor) so scan-to-scan max-union noise doesn't recompile the pair
    # programs; dead lanes past the real union cost nothing in the kernel
    # (width predication) and <=12.5% extra prepack gather.
    n_lanes = min(
        round_up(27 * capacity, 128),
        _bucket_rows(max(dil["max_union"], 128), 128),
    )
    # Bucketed window count: dead rows at the tail (dropped-scatter row ids,
    # zero width) keep every downstream shape stable across similar scans.
    ud = dil["n_dilated"]
    ud_pad = _bucket_rows(ud)

    def pad1(a, length, value):
        out = np.full((length,), value, a.dtype)
        out[: a.shape[0]] = a
        return out

    prod_d_pad = _pow2(dil["prod_d"])
    prod_e_pad = _pow2(dil["prod_e"])
    width_lut = np.zeros((ud_pad + 1,), np.int32)
    width_lut[:ud] = np.minimum(dil["width_lut"][:ud], n_lanes)
    union_lut = np.zeros((ud_pad + 1,), np.int32)
    union_lut[:ud] = dil["union_lut"][:ud]
    dev = jax.device_put(
        {
            "base_e": pad1(
                dil["base_e"].astype(np.int32),
                _bucket_rows(dil["base_e"].shape[0]),
                prod_e_pad,
            ),
            "d_cells_e": pad1(dil["d_cells_e"].astype(np.int32), ud_pad, 0),
            "off_e": dil["off_e"],
            "d_cells": pad1(
                dil["d_cells"].astype(np.int32), ud_pad, prod_d_pad
            ),
            "row_vals": pad1(
                np.arange(ud, dtype=np.int32), ud_pad, ud_pad
            ),
            "dims_d": dil["dims_d"],
            "origin_d": dil["origin_d"].astype(
                np.dtype(device_grid.bucket_pts.dtype)
            ),
            "width_lut": width_lut,
            "union_lut": union_lut,
        }
    )
    cand_xyz, cand_idx, lut_d = _build_prepack_dev(
        device_grid.bucket_pts,
        device_grid.bucket_idx,
        dev["base_e"],
        dev["d_cells_e"],
        dev["off_e"],
        dev["d_cells"],
        dev["row_vals"],
        capacity=capacity,
        n_lanes=n_lanes,
        prod_d=prod_d_pad,
        prod_e=prod_e_pad,
        ud_pad=ud_pad,
    )
    return PrepackedGrid(
        cand_xyz=cand_xyz,
        cand_idx=cand_idx,
        width_lut=dev["width_lut"],
        union_lut=dev["union_lut"],
        lut_d=lut_d,
        origin_d=dev["origin_d"],
        dims_d=dev["dims_d"],
        n_lanes=n_lanes,
        n_dilated=dil["n_dilated"],
        cell_size=grid_host["cell_size"],
        small_unions=_small_unions(dil["union"], k),
    )


def _small_unions(union: np.ndarray, k: int) -> bool:
    """True when the counted extraction loop is expected to beat the
    static unroll: the loop saves (k - min(union, k)) rounds per block but
    costs ~15% per executed round (measured 6.29 -> 7.24 ms/iter on the
    dense 35k pair, 70.3 -> 60.4 on sparse KITTI)."""
    if union.size == 0:
        return False
    return bool(np.mean(np.minimum(union, k)) < 0.75 * k)


def _width_limits(n_lanes: int, max_branches: int = 8) -> list[int]:
    """Ascending lane-width limits for the kernel's predicated branches."""
    if n_lanes <= 128:
        # Sub-128 windows still occupy a full 128-lane VPU row; one branch.
        return [n_lanes]
    nch = n_lanes // 128
    if nch <= max_branches:
        return [128 * c for c in range(1, nch + 1)]
    step = round_up(n_lanes // max_branches, 128)
    limits = list(range(step, n_lanes, step))
    return limits + [n_lanes]


def _select_kernel(wb_ref, ub_ref, xyz_ref, idx_ref, src_ref, outd_ref,
                   outi_ref, *outp_refs, k, kp, r2, n_lanes, dyn_rounds):
    """Distances + k-nearest extraction for BLOCK_GROUPS candidate windows.

    All arrays live in VMEM; the 20-round min-extraction that costs ~35 ms
    at HBM bandwidth in lax.top_k runs at VPU speed here.

    The extraction cost is proportional to the processed lane width, and the
    prepack sorts windows by descending REAL union width, so each block runs
    exactly one predicated branch sized to its own max width (``wb_ref``,
    SMEM) instead of the global maximum. Lanes beyond a window's union are
    dead (d2 = inf) so narrower processing is bit-exact. Width-0 blocks
    (group-budget padding beyond the real source count) write empty results
    without touching the window at all. Loop-timed A/B on the 35k bench pair
    (384 lanes): 6.82 -> 6.20 ms/iter (~9% — the extraction loop is no longer
    the dominant phase at compacted widths; the win grows with lane count).

    ``src_ref`` rows are (bs, 8): xyz + valid flag + the row's SEGMENT lane
    bounds [lo, hi) in lanes 4-5 (+ 2 spare). Segment-packed pool rows
    (ops/fused_pool.py) put F narrow windows side by side in one row of
    lanes; each source row's candidates then live in its own lane segment,
    and the mask below makes that exact. Unsegmented rows carry lo=0,
    hi=inf, so the mask is a no-op for them. Candidate lane order within a
    segment equals the window's candidate enumeration, so the global-lane
    tie-break used by the extraction loop preserves the shared
    (neighbor-offset, slot) tie contract per source.
    """
    bg = xyz_ref.shape[0]
    bs = bg * GROUP
    # Optional outputs 3-5: the selected neighbors' coordinates as THREE
    # (BS, kp) planes (x, y, z). Emitting them here (they are already in
    # VMEM) saves the caller a 12 B-granularity random gather of
    # target[indices] afterwards; separate planes rather than one
    # (BS, 3, kp) block keep every write in the kernel's native 2-D layout
    # (the stacked form paid a per-block relayout).
    # Finite sentinel (not inf: the `m < big` found-test must be able to
    # fail). Dead-slot coordinates are 1e30 so their d2 overflows to inf,
    # which the `live` mask then maps back onto this sentinel.
    big = jnp.float32(3e38)
    # Whole-array 1-D SMEM ref indexed by program id (2-D SMEM arrays get
    # lane-padded to 128 — 2.8 MB > the 1 MB SMEM budget at KITTI-scale
    # block counts; Mosaic's (8,128) rule also forbids a (1,1) block).
    wb = wb_ref[pl.program_id(0)]
    # Dynamic extraction-round bound: a block whose widest window holds ub
    # real candidates can never fill more than ub of the k slots, so the
    # min-extraction loop runs min(k, ub) trips instead of k. Rounds past
    # exhaustion never write (the `m < big` gate), so this is bit-exact.
    # At KITTI scale the dominant narrow class has unions of 1-32 against
    # k=20 — most blocks run a fraction of the static trip count.
    rounds = jnp.minimum(jnp.int32(k), ub_ref[pl.program_id(0)])
    col = lax.broadcasted_iota(jnp.int32, (bs, kp), 1)

    @pl.when(wb == 0)
    def _dead_block():
        outd_ref[:] = jnp.full((bs, kp), big, jnp.float32)
        outi_ref[:] = jnp.full((bs, kp), -1, jnp.int32)
        for ref in outp_refs:
            ref[:] = jnp.zeros((bs, kp), jnp.float32)

    def extract(lim: int):
        def rep(x):  # (BG, lim) -> (BS, lim): window row j serves rows 8j..8j+7
            return jnp.broadcast_to(x[:, None, :], (bg, GROUP, lim)).reshape(
                bs, lim
            )

        cx = rep(xyz_ref[:, 0, :lim])
        cy = rep(xyz_ref[:, 1, :lim])
        cz = rep(xyz_ref[:, 2, :lim])
        ci = rep(idx_ref[:, :lim])
        sx = src_ref[:, 0:1]
        sy = src_ref[:, 1:2]
        sz = src_ref[:, 2:3]
        valid, lo, hi = _unpack_row_meta(src_ref[:, 3:4])
        dx = cx - sx
        dy = cy - sy
        dz = cz - sz
        d2 = dx * dx + dy * dy + dz * dz
        lane = lax.broadcasted_iota(jnp.int32, (bs, lim), 1)
        seg = (lane >= lo) & (lane < hi)
        live = (ci >= 0) & valid & (d2 <= r2) & seg
        d2 = jnp.where(live, d2, big)
        has_p = bool(outp_refs)
        if dyn_rounds:
            # Tighten the SMEM union bound with the block's real in-radius
            # count: a row with c live candidates fills at most c slots, so
            # the loop needs max-over-rows min(k, c) trips. The union bound
            # counts every window candidate regardless of radius (KITTI:
            # unions 20-50 vs ~9 in-radius on average), so this saves the
            # difference at the cost of two VPU passes. Rounds past
            # exhaustion never write (the m < big gate) — bit-exact.
            live_rows = jnp.sum(live.astype(jnp.int32), axis=1)
            rounds_eff = jnp.minimum(rounds, jnp.max(live_rows))
        else:
            rounds_eff = rounds
        outd0 = jnp.full((bs, kp), big, jnp.float32)
        outi0 = jnp.full((bs, kp), -1, jnp.int32)
        if has_p:
            op0 = (
                jnp.zeros((bs, kp), jnp.float32),
                jnp.zeros((bs, kp), jnp.float32),
                jnp.zeros((bs, kp), jnp.float32),
            )
        else:
            op0 = ()

        def round_body(r, carry):
            d2, outd, outi, *ops = carry
            m = jnp.min(d2, axis=1, keepdims=True)
            amin = jnp.min(jnp.where(d2 == m, lane, lim), axis=1, keepdims=True)
            sel = lane == amin
            chosen = jnp.sum(
                jnp.where(sel, ci, 0), axis=1, keepdims=True, dtype=jnp.int32
            )
            d2 = jnp.where(sel, big, d2)
            hit = (col == r) & (m < big)
            outd = jnp.where(hit, m, outd)
            outi = jnp.where(hit, chosen, outi)
            if ops:
                ops = tuple(
                    jnp.where(
                        hit,
                        jnp.sum(jnp.where(sel, c, 0.0), axis=1, keepdims=True),
                        op,
                    )
                    for op, c in zip(ops, (cx, cy, cz))
                )
            return (d2, outd, outi, *ops)

        if dyn_rounds:
            _, outd, outi, *ops = lax.fori_loop(
                0, rounds_eff, round_body, (d2, outd0, outi0, *op0)
            )
        else:
            # Static unroll: ~15% faster than the counted loop when blocks
            # genuinely need all k rounds (dense scans) — Mosaic pipelines
            # the unrolled rounds across VPU issue slots.
            carry = (d2, outd0, outi0, *op0)
            for r in range(k):
                carry = round_body(r, carry)
            _, outd, outi, *ops = carry
        outd_ref[:] = outd
        outi_ref[:] = outi
        for ref, op in zip(outp_refs, ops):
            ref[:] = op

    limits = _width_limits(n_lanes)
    lo = 0
    for i, lim in enumerate(limits):
        cond = (wb > lo) if i == len(limits) - 1 else (wb > lo) & (wb <= lim)
        pl.when(cond)(partial(extract, lim))
        lo = lim


def _group_by_window(source, source_valid, lut_d, origin_d, dims_d, ud,
                     radius, s_pad: int, n_lanes: int = 4096):
    """Phases 1-2 of the fused engines: map each source to its window row and
    sort same-window sources into cell-pure GROUP-row blocks.

    Returns (padded, step_rows, order, dst, overflow):
      padded: (s_pad, 4) sorted sources + the packed row meta in lane 3
        (pack_row_meta: valid flag + segment lane bounds — full-width here:
        the dense engine packs one window per pool row; segment packing
        lives in ops/fused_pool._group_by_row).
      step_rows: (s_pad // GROUP,) window row per group (ud = dead window).
      order / dst: the sort permutation and each source's padded-row slot
        (callers un-sort the kernel outputs with these).
      overflow: count of sources past the ``s_pad`` row budget (caller must
        redo the iteration with an XLA engine when nonzero).
    """
    n = source.shape[0]
    dtype = source.dtype
    ng = s_pad // GROUP
    cell = jnp.asarray(radius, dtype)

    # 1. source cell -> dilated-window row (UD = dead window).
    ijk = jnp.floor((source - origin_d.astype(dtype)) / cell).astype(jnp.int32)
    inb = jnp.all((ijk >= 0) & (ijk < dims_d[None, :]), axis=-1) & source_valid
    safe = jnp.clip(ijk, 0, dims_d[None, :] - 1)
    lin = safe[:, 0] + dims_d[0] * (safe[:, 1] + dims_d[1] * safe[:, 2])
    row = jnp.where(inb, lut_d[lin], -1)
    row = jnp.where(row < 0, ud, row)  # no-neighbor sources -> dead window

    # 2. group same-cell sources into cell-pure GROUP-row blocks.
    # Dead-window sources (provably zero neighbors: outside the dilated
    # occupied set) are DROPPED from the grouping instead of packed into
    # dead-window groups: at KITTI scale ~27% of moved sources land there
    # and used to consume 36k of the 90k budget groups — pure pass
    # overhead. They sort to the tail (ud is the max row), allocate no
    # group, scatter nowhere (dst = s_pad is dropped), and _unsort_results
    # maps them to mask=False — exactly the result the kernel's dead
    # branch produced for them.
    order = jnp.argsort(row, stable=True)
    rs = row[order]
    dead = rs == ud
    pos = jnp.arange(n, dtype=jnp.int32)
    starts = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), rs[1:] != rs[:-1]]
    )
    start_pos = lax.associative_scan(jnp.maximum, jnp.where(starts, pos, -1))
    local = pos - start_pos
    gstart = (starts | (local % GROUP == 0)) & jnp.logical_not(dead)
    gid = jnp.cumsum(gstart.astype(jnp.int32)) - 1
    dst = jnp.where(dead, s_pad, gid * GROUP + local % GROUP)
    overflow = jnp.sum(jnp.where(dst >= s_pad, 1, 0)) - jnp.sum(dead)

    src_sorted = source[order]
    # Segment bound must cover the engine's FULL window width: the dense
    # engine has no 4096-lane cap (capacity-driven widths regularly exceed
    # it on near-sensor LiDAR cores), and the select kernel's segment mask
    # silently drops any candidate past ``hi`` — a hardcoded 4096 here made
    # lanes >= 4096 invisible (wrong neighbors, overflow=0).
    meta = jnp.asarray(pack_row_meta(1, 0, n_lanes), dtype)
    # Inverse-map + gather instead of a direct (N, 4) scatter — 2x on v5e
    # (see ops/fused_pool._group_by_row for the A/B); unfilled slots gather
    # the zero row (invalid meta).
    slot2src = (
        jnp.full((s_pad,), n, jnp.int32)
        .at[dst]
        .set(jnp.arange(n, dtype=jnp.int32), mode="drop")
    )
    src5 = jnp.concatenate(
        [
            jnp.concatenate(
                [src_sorted, jnp.full((n, 1), meta, dtype)], axis=1
            ),
            jnp.zeros((1, 4), dtype),
        ]
    )
    padded = src5[slot2src]
    step_rows = (
        jnp.full((ng,), ud, jnp.int32)
        .at[jnp.where(dead, ng, gid)]
        .set(rs, mode="drop")
    )
    return padded, step_rows, order, dst, overflow


def _run_select(padded, win_xyz, win_idx, w_blk, u_blk, *, k, n_lanes, radius,
                block_groups=BLOCK_GROUPS, interpret=False,
                return_points=False, dyn_rounds=False):
    """Invoke the Pallas select kernel over pre-gathered candidate windows."""
    s_pad = padded.shape[0]
    ng = s_pad // GROUP
    kp = 32 if k <= 32 else round_up(k, 128)
    kernel = partial(
        _select_kernel, k=k, kp=kp, r2=np.float32(radius) ** 2,
        n_lanes=n_lanes, dyn_rounds=dyn_rounds,
    )
    bs = block_groups * GROUP
    out_specs = [
        pl.BlockSpec((bs, kp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bs, kp), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((s_pad, kp), jnp.float32),
        jax.ShapeDtypeStruct((s_pad, kp), jnp.int32),
    ]
    if return_points:
        for _ in range(3):
            out_specs.append(
                pl.BlockSpec((bs, kp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
            )
            out_shape.append(
                jax.ShapeDtypeStruct((s_pad, kp), jnp.float32)
            )
    outs = pl.pallas_call(
        kernel,
        grid=(ng // block_groups,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (block_groups, 3, n_lanes), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((block_groups, n_lanes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(w_blk, u_blk, win_xyz.astype(jnp.float32), win_idx,
      padded.astype(jnp.float32))
    if return_points:
        return outs[0], outs[1], tuple(outs[2:5])
    return outs[0], outs[1], None


def _unsort_results(outd, outi, outp, order, dst, *, k, n, dtype):
    """Map kernel outputs (padded-row order) back to original source order."""
    s_pad = outd.shape[0]
    inv = jnp.full((n,), s_pad, jnp.int32).at[order].set(
        jnp.where(dst < s_pad, dst, s_pad), mode="drop"
    )
    in_range = inv < s_pad
    inv_safe = jnp.minimum(inv, s_pad - 1)
    d_rows = outd[inv_safe][:, :k]
    i_rows = outi[inv_safe][:, :k]
    found = (i_rows >= 0) & in_range[:, None]
    corr = Correspondences(
        indices=jnp.where(found, i_rows, 0),
        sq_dists=jnp.where(found, d_rows.astype(dtype), 0.0),
        mask=found,
    )
    if outp is None:
        return corr, None
    p_rows = jnp.stack(
        [o[inv_safe][:, :k] for o in outp], axis=-1
    )  # (n, k, 3)
    pts = jnp.where(found[..., None], p_rows.astype(dtype), 0.0)
    return corr, pts


@partial(
    jax.jit,
    static_argnames=("k", "radius", "n_lanes", "interpret", "budget_rows", "dyn_rounds",
                     "return_points"),
)
def fused_grid_search(
    source,
    source_valid,
    cand_xyz,
    cand_idx,
    width_lut,
    union_lut,
    lut_d,
    origin_d,
    dims_d,
    *,
    k: int,
    radius: float,
    n_lanes: int,
    interpret: bool = False,
    budget_rows: int | None = None,
    return_points: bool = False,
    dyn_rounds: bool = False,
):
    """Radius-capped KNN via cell-grouped windows + the Pallas select kernel.

    Same contract as ops.grid.grid_radius_search. ``interpret=True`` runs the
    kernel in the Pallas interpreter (CPU tests).

    Returns (Correspondences, overflow[, points]) where overflow > 0 means
    the group-row budget (``budget_rows``, default 2N) overflowed
    (pathologically scattered sources) and the caller must re-run the
    iteration with an XLA engine. ``return_points=True`` appends the selected
    neighbors' coordinates (N, k, 3) — emitted by the kernel from VMEM, which
    replaces the caller's 12 B-granularity ``target[indices]`` gather.
    """
    n = source.shape[0]
    dtype = source.dtype
    ud = cand_idx.shape[0] - 1  # last row is the dead window
    s_pad = round_up(budget_rows or 2 * n, BLOCK_GROUPS * GROUP)
    ng = s_pad // GROUP

    padded, step_rows, order, dst, overflow = _group_by_window(
        source, source_valid, lut_d, origin_d, dims_d, ud, radius, s_pad,
        n_lanes=n_lanes,
    )

    # 3. one window gather per group (contiguous multi-KB rows).
    win_xyz = cand_xyz[step_rows]  # (NG, 3, L)
    win_idx = cand_idx[step_rows]  # (NG, L)
    # Per-block max kernel width (windows are width-sorted, so blocks are
    # near-homogeneous); width 0 = all-padding block, skipped by the kernel.
    w_blk = jnp.max(
        width_lut[step_rows].reshape(ng // BLOCK_GROUPS, BLOCK_GROUPS),
        axis=1,
    )
    u_blk = jnp.max(
        union_lut[step_rows].reshape(ng // BLOCK_GROUPS, BLOCK_GROUPS),
        axis=1,
    )

    outd, outi, outp = _run_select(
        padded, win_xyz, win_idx, w_blk, u_blk, k=k, n_lanes=n_lanes,
        radius=radius, interpret=interpret, return_points=return_points,
        dyn_rounds=dyn_rounds,
    )

    corr, pts = _unsort_results(
        outd, outi, outp, order, dst, k=k, n=n, dtype=dtype
    )
    if return_points:
        return corr, overflow, pts
    return corr, overflow
