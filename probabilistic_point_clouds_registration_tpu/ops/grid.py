"""Spatial-hash-grid radius search: the scalable data-association engine.

The reference rebuilds a FLANN kd-tree on the target every outer iteration
(src/prob_point_cloud_registration.cc:66-67) because its *source* moves while
the search structure indexes the *target*. That rebuild is wasted work — the
target never moves. Here the target is bucketed into a voxel grid of cell
size = search radius ONCE per registration (host numpy, ~O(M)); every outer
iteration then queries the static grid entirely on device:

  1. each (moved) source point maps to its cell; its neighbors-in-radius all
     lie in the 3x3x3 cell neighborhood (cell edge = radius),
  2. the 27 neighbor cells resolve to bucket rows via a binary search over
     the sorted occupied-cell ids (exact — no hash collisions),
  3. candidates (27 * bucket_capacity per source point, a few hundred) are
     distance-tested and reduced with one top_k — versus the brute-force
     engine's streaming scan of all M targets.

Work drops from O(N*M) to O(N * local_density); at 35k-point clouds this is
the difference between ~milliseconds and ~hundreds of milliseconds per outer
iteration on a TPU chip (the brute-force path in ops/neighbors.py remains the
fallback for tiny clouds, huge cell occupancy, or grids whose linear id would
overflow int32).

Exactness: identical neighbor *sets* to brute force (up to distance ties at
the k-th slot). Targets are stored permuted by cell so bucket gathers are
contiguous in HBM.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core.types import Correspondences, round_up

_INT32_MAX = 2**31 - 1
# Dense cell->bucket LUT cap: 32M cells = 128 MB of int32 on device.
_MAX_DENSE_LUT_CELLS = 1 << 25


class HashGrid(NamedTuple):
    """Static-shape target voxel grid (device arrays; built host-side).

    Attributes:
      points: (M, 3) target points permuted so each cell's members are
        contiguous.
      perm: (M,) original target index of each permuted row.
      cell_ids: (U,) sorted linear ids of occupied cells.
      bucket_start: (U,) first permuted row of each occupied cell.
      bucket_count: (U,) member count of each occupied cell.
      capacity: static int — max members in any cell, rounded up (pow2).
      origin: (3,) grid origin (min corner of the target bbox).
      dims: (3,) int32 grid dimensions.
      cell_size: float cell edge length (== search radius).
      num_valid: number of real (non-padding) target points.
      lut: (dims prod,) int32 dense linear-cell-id -> occupied-cell row
        (-1 = empty), or None for grids too large to materialize densely —
        cell resolution then falls back to a binary search over cell_ids.
        The dense lookup is one gather; jnp.searchsorted lowers to a
        log(U)-step sequential scan that measured ~140 ms at 35k x 27
        queries on a v5e — the difference between the grid engine winning
        and losing.
    """

    points: jnp.ndarray
    perm: jnp.ndarray
    cell_ids: jnp.ndarray
    bucket_start: jnp.ndarray
    bucket_count: jnp.ndarray
    capacity: int
    origin: jnp.ndarray
    dims: jnp.ndarray
    cell_size: float
    num_valid: int
    lut: jnp.ndarray | None


def build_grid(target: np.ndarray, cell_size: float, *, num_valid: int | None = None):
    """Build a :class:`HashGrid` over the (optionally padded) target cloud.

    Returns None when a grid would be invalid or useless: degenerate cell
    size, a grid whose linear id overflows int32, or occupancy so high that
    27 * capacity >= M (brute force is cheaper).
    """
    target = np.asarray(target, dtype=np.float64)
    m_total = target.shape[0]
    n = num_valid if num_valid is not None else m_total
    if n == 0 or cell_size <= 0 or not np.isfinite(cell_size):
        return None
    pts = target[:n]

    origin = pts.min(axis=0)
    ijk = np.floor((pts - origin) / cell_size).astype(np.int64)
    dims = ijk.max(axis=0) + 1
    if int(dims[0]) * int(dims[1]) * int(dims[2]) >= _INT32_MAX:
        return None
    lin = ijk[:, 0] + dims[0] * (ijk[:, 1] + dims[1] * ijk[:, 2])

    order = np.argsort(lin, kind="stable")
    lin_sorted = lin[order]
    cell_ids, start, counts = np.unique(
        lin_sorted, return_index=True, return_counts=True
    )
    cap = int(counts.max())
    capacity = max(8, 1 << (cap - 1).bit_length())  # pow2 bucket for compile reuse
    if 27 * capacity >= max(n, 1):
        return None  # occupancy too high for the grid to pay off

    pts_perm = np.zeros((m_total, 3), dtype=target.dtype)
    pts_perm[: order.shape[0]] = pts[order]
    perm = np.full((m_total,), n, dtype=np.int32)
    perm[: order.shape[0]] = order.astype(np.int32)

    dims_prod = int(dims[0]) * int(dims[1]) * int(dims[2])
    lut = None
    if dims_prod <= _MAX_DENSE_LUT_CELLS:
        lut_np = np.full((dims_prod,), -1, dtype=np.int32)
        lut_np[cell_ids] = np.arange(cell_ids.shape[0], dtype=np.int32)
        lut = jnp.asarray(lut_np)

    return HashGrid(
        points=jnp.asarray(pts_perm),
        perm=jnp.asarray(perm),
        cell_ids=jnp.asarray(cell_ids.astype(np.int32)),
        bucket_start=jnp.asarray(start.astype(np.int32)),
        bucket_count=jnp.asarray(counts.astype(np.int32)),
        capacity=capacity,
        origin=jnp.asarray(origin),
        dims=jnp.asarray(dims.astype(np.int32)),
        cell_size=float(cell_size),
        num_valid=n,
        lut=lut,
    )


_NEIGHBOR_OFFSETS = np.stack(
    np.meshgrid(*([np.arange(-1, 2)] * 3), indexing="ij"), axis=-1
).reshape(27, 3)


@partial(
    jax.jit,
    static_argnames=("k", "radius", "capacity", "num_valid", "source_tile"),
)
def grid_radius_search(
    source: jnp.ndarray,
    grid_points: jnp.ndarray,
    grid_perm: jnp.ndarray,
    cell_ids: jnp.ndarray,
    bucket_start: jnp.ndarray,
    bucket_count: jnp.ndarray,
    origin: jnp.ndarray,
    dims: jnp.ndarray,
    lut: jnp.ndarray | None,
    *,
    k: int,
    radius: float,
    capacity: int,
    num_valid: int,
    source_valid: jnp.ndarray,
    source_tile: int = 4096,
) -> Correspondences:
    """Radius-capped KNN against a prebuilt target grid.

    Same contract as ops.neighbors.radius_search: (N, k) original-target
    indices + squared distances + mask, k nearest within ``radius`` per valid
    source row. Cell edge must equal ``radius`` (build_grid enforces by
    construction when called with cell_size=radius).
    """
    n = source.shape[0]
    dtype = source.dtype
    u = cell_ids.shape[0]
    cell = jnp.asarray(radius, dtype)
    r2 = jnp.asarray(radius, dtype) ** 2
    offsets = jnp.asarray(_NEIGHBOR_OFFSETS, jnp.int32)

    n_pad = round_up(n, source_tile)
    src = jnp.pad(source, ((0, n_pad - n), (0, 0)))
    sval = jnp.pad(source_valid.astype(bool), (0, n_pad - n))

    def search_block(args):
        s_blk, v_blk = args  # (S, 3), (S,)
        s = s_blk.shape[0]
        ijk = jnp.floor((s_blk - origin.astype(dtype)) / cell).astype(jnp.int32)
        nijk = ijk[:, None, :] + offsets[None, :, :]  # (S, 27, 3)
        in_bounds = jnp.all((nijk >= 0) & (nijk < dims[None, None, :]), axis=-1)
        safe = jnp.clip(nijk, 0, dims[None, None, :] - 1)
        nlin = safe[..., 0] + dims[0] * (safe[..., 1] + dims[1] * safe[..., 2])

        if lut is not None:
            row = lut[nlin]  # (S, 27); -1 = unoccupied cell
            hit = in_bounds & (row >= 0)
            pos_safe = jnp.maximum(row, 0)
        else:
            pos = jnp.searchsorted(cell_ids, nlin)  # (S, 27)
            pos_safe = jnp.minimum(pos, u - 1)
            hit = in_bounds & (cell_ids[pos_safe] == nlin)

        start = jnp.where(hit, bucket_start[pos_safe], 0)  # (S, 27)
        count = jnp.where(hit, bucket_count[pos_safe], 0)
        slot = jax.lax.broadcasted_iota(jnp.int32, (s, 27, capacity), 2)
        rows = start[..., None] + slot  # permuted-target rows
        live = slot < count[..., None]
        rows = jnp.where(live, rows, num_valid)  # sentinel row (zeros)
        rows = rows.reshape(s, 27 * capacity)
        live = live.reshape(s, 27 * capacity)

        cand_pts = grid_points[jnp.minimum(rows, grid_points.shape[0] - 1)]
        diff = cand_pts - s_blk[:, None, :]
        d2 = jnp.sum(diff * diff, axis=-1)
        d2 = jnp.where(live & v_blk[:, None] & (d2 <= r2), d2, jnp.inf)

        neg_best, args_ = lax.top_k(-d2, k)
        best_d = -neg_best
        best_rows = jnp.take_along_axis(rows, args_, axis=1)
        found = jnp.isfinite(best_d)
        orig = grid_perm[jnp.minimum(best_rows, grid_perm.shape[0] - 1)]
        return jnp.where(found, orig, 0), best_d, found

    blocks = (
        src.reshape(n_pad // source_tile, source_tile, 3),
        sval.reshape(n_pad // source_tile, source_tile),
    )
    idx, d2, found = lax.map(search_block, blocks)
    idx = idx.reshape(n_pad, k)[:n]
    d2 = d2.reshape(n_pad, k)[:n]
    found = found.reshape(n_pad, k)[:n]
    return Correspondences(
        indices=idx, sq_dists=jnp.where(found, d2, 0.0), mask=found
    )


def pick_source_tile(capacity: int, budget_bytes: int = 192 * 1024 * 1024) -> int:
    """Source-block size keeping the (S, 27*capacity) candidate buffers
    (points gather + distances, ~16 B/candidate) within ``budget_bytes``."""
    per_row = 27 * capacity * 16
    tile = budget_bytes // max(per_row, 1)
    tile = max(64, min(4096, tile))
    return (tile // 64) * 64


def grid_search(grid: HashGrid, source, *, k: int, radius: float, source_valid,
                source_tile: int | None = None) -> Correspondences:
    """Convenience wrapper unpacking :class:`HashGrid` into the jitted query."""
    if abs(grid.cell_size - radius) > 1e-12:
        raise ValueError("grid cell_size must equal the search radius")
    if source_tile is None:
        source_tile = pick_source_tile(grid.capacity)
    return grid_radius_search(
        source,
        grid.points,
        grid.perm,
        grid.cell_ids,
        grid.bucket_start,
        grid.bucket_count,
        grid.origin,
        grid.dims,
        grid.lut,
        k=k,
        radius=radius,
        capacity=grid.capacity,
        num_valid=grid.num_valid,
        source_valid=source_valid,
        source_tile=source_tile,
    )
