"""Capacity-free pooled fused search: the sparse-scan (LiDAR) engine.

The dense fused engine (ops/fused_grid.py) prepacks every dilated cell's
27-cell candidate window as one row of a SINGLE (UD, 3, L) tensor, where L is
the global maximum window width. That design collapses on sparse outdoor
scans (KITTI: 131k points, mean cell occupancy ~2.5, but near-sensor cells
with 100+ returns):

  * the global max union is ~10x the p99 union, so a dense prepack would be
    gigabytes of padding (259k dilated cells x 1152 lanes at 131k points),
  * the XLA grid engine it falls back to pays 27*capacity-wide windows that
    are ~98% padding at occupancy 2.5, plus a per-iteration streaming brute
    pass over the hot-cell overflow set — measured ~480 ms/iteration of the
    ~570 ms/iteration KITTI pair step (docs/PERF.md).

This engine keeps the grouped-window + Pallas-select structure but stores
windows in a few WIDTH-CLASS pools sized to each window's real candidate
union (reference search semantics: src/prob_point_cloud_registration.cc:72-81):

  1. windows are already sorted by DESCENDING real union width (the dense
     engine's width-predication order), so each pow2 width band is a
     contiguous row range and becomes its own class: the widest handful at
     their real width, down to the dominant w<=8 tail (~82% of KITTI
     windows);
  2. each class c gets its own (n_c + 1, 3, W_c) pool, packed on device from
     contiguous [start, start+count) ranges of the CELL-SORTED target — no
     bucket capacity, so hot-cell points stay inline and the per-iteration
     overflow merge disappears (exact by construction);
  3. per iteration, sources group into cell-pure 8-row blocks exactly as in
     the dense engine; pass c covers the first B_c groups only. Groups are
     sorted by window row == descending width, so every class-c group
     provably lives in that prefix; a static per-class budget with a runtime
     coverage flag replaces dynamic shapes. Classes wider than the
     backend-resolved narrow-class cutoff (see :func:`_select_max_w` — 0 on
     TPU, so every class runs the kernel there) use the width-predicated
     Pallas select kernel; on CPU, classes at or below XLA_SELECT_MAX_W
     lanes skip the kernel for a stable lax.top_k over their w-wide rows
     (for w <= k that is no selection at all — every in-radius candidate is
     a neighbor).

Neighbor SETS are identical to the XLA engines'; ties at the k-th slot may
resolve differently from the grid+overflow-merge path only within an exact
distance tie class (same caveat as ops/neighbors.py:16).
"""
from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core.types import Correspondences, round_up
from ..core.types import bucket_rows as _bucket_rows, pow2 as _pow2
from .fused_grid import (
    BLOCK_GROUPS,
    GROUP,
    _BIG,
    _group_by_window,
    _run_select,
    _small_unions,
    _unsort_results,
    dilate_cells_host,
    pack_row_meta,
)

# Widest pool class allowed: bounds the select kernel's VMEM block at
# BLOCK_GROUPS x 4 x MAX_CLASS_LANES x 4 B (= 4.2 MB at 4096) and the
# per-pass gather width. A window wider than this (a >4096-point candidate
# union inside one 3x3x3 neighborhood) means the scan is locally dense enough
# that the XLA grid engine's whole-bucket windows are the better fit.
MAX_CLASS_LANES = 4096
# Total pool budget: sparse scans keep pools small (real unions, not
# capacity padding); beyond this the prepack declines and the caller stays
# on the XLA engines.
MAX_POOL_BYTES = 2 << 30
# CPU-only narrow-class cutoff (see _select_max_w: the resolved cutoff is 0
# on TPU, so every class runs the Pallas kernel there). On CPU, width
# classes at or below this lane count skip the kernel: a stable lax.top_k
# over the w-wide candidate rows reproduces the exact (distance, lane) slot
# order of the min-extraction loop, and for w <= k it is a plain stable
# sort (every in-radius candidate is a neighbor — no selection exists to
# do).
XLA_SELECT_MAX_W = 64


def _narrow_block_groups() -> int:
    """Groups per Pallas grid step for NARROW (<=256-lane) dyn-rounds
    classes. 32 halves the per-block fixed cost of the dominant KITTI pass
    vs the wide classes' 16 (VMEM still comfortable at these widths);
    PCR_NARROW_BLOCK_GROUPS overrides for A/B probes (64 measured
    round 5: see docs/PERF.md)."""
    return int(os.environ.get("PCR_NARROW_BLOCK_GROUPS", 2 * BLOCK_GROUPS))


def _select_max_w() -> int:
    """Backend-dependent narrow-class cutoff for the XLA top_k select.

    Every class pass covers the group PREFIX [0, B_c): the Pallas kernel
    skips out-of-class blocks via the width-0 dead-block branch (near
    free), but the XLA top_k path has no skip — it pays gather + distance
    + top_k + result scatter over the FULL budget. Narrow classes sit at
    the END of the width-sorted window order, so their budgets span almost
    every group, and on TPU the top_k passes measured 16.6 vs 2.1 s/pair
    (align, KITTI 131k) against the kernel's dead-block skip. On CPU —
    where Pallas runs interpreted/emulated and top_k is cheap — the XLA
    path remains the faster one, so the cutoff stays there.
    """
    return 0 if jax.default_backend() == "tpu" else XLA_SELECT_MAX_W


class PoolPrepack(NamedTuple):
    """Per-pair pooled fused-search state (device arrays unless noted).

    Attributes:
      pool_xyz / pool_idx: per width class c, (R_c + 1, 3, W_c) candidate
        coordinates and (R_c + 1, W_c) original target indices (-1 = empty);
        row R_c is the dead row. A POOL ROW packs F consecutive windows
        side by side (F from the plan's segment bands; 1 for wide windows),
        each owning a W_c//F-lane segment.
      class_widths: static per-class lane widths, descending.
      class_ends: static exclusive end POOL-ROW id of each class in the
        global width-sorted row numbering (class c = rows
        [ends[c-1], ends[c])).
      class_budgets: static per-class GROUP budgets (groups [0, B_c) are
        covered by pass c; the last class always covers every group).
      width_lut / union_lut: (R + 1,) per-POOL-ROW kernel width (lanes;
        dead row = 0) and max real candidate union over the row's windows.
      lut_d / origin_d / dims_d: extended-grid cell -> packed
        (pool row << 9 | segment meta) grouping key (_group_by_row; the
        dense engine's PrepackedGrid carries plain window ids instead).
      budget_rows: static padded source-row budget for _group_by_row.
      n_dilated: static UD.
      cell_size: static float.
    """

    pool_xyz: tuple
    pool_idx: tuple
    class_widths: tuple
    class_ends: tuple
    class_budgets: tuple
    width_lut: jnp.ndarray
    union_lut: jnp.ndarray
    lut_d: jnp.ndarray
    origin_d: jnp.ndarray
    dims_d: jnp.ndarray
    budget_rows: int
    n_dilated: int
    cell_size: float
    small_unions: bool = False
    # Narrow-class cutoff resolved ONCE at build time (the small_unions
    # filter and the search routing must agree; sampling the backend again
    # at trace time could route classes inconsistently with the frozen
    # hint). None = legacy/direct-call prepacks: resolve at trace time.
    select_max_w: int | None = None


def _plan_classes(union: np.ndarray) -> tuple[list[int], list[int]]:
    """Split width-sorted windows into <=3 width classes.

    ``union`` is the per-window real candidate count, DESCENDING. Returns
    (widths, ends): per-class lane widths and exclusive end rows. Class
    boundaries are chosen so the dominant narrow class stays at 128 lanes
    and the wide tail pays its own width instead of inflating everyone's.
    """
    ud = union.shape[0]
    w = (np.ceil(np.maximum(union, 1) / 128.0) * 128).astype(np.int64)
    # Pow2 top width: a data-exact max (e.g. 1408) would change the static
    # class-width tuple between consecutive scans of a sequence and
    # recompile every per-pair program; the few widest windows pay <=2x
    # gather lanes (extraction stays at real width via the per-block
    # predication).
    l_max = _pow2(w[0]) if ud else 128
    widths = [l_max]
    if l_max > 512:
        widths.append(512)
    if l_max > 128:
        widths.append(128)
    ends = []
    for c, wc in enumerate(widths):
        nxt = widths[c + 1] if c + 1 < len(widths) else 0
        # Last window whose width exceeds the NEXT class's capacity belongs
        # to this class; w is non-increasing so searchsorted on the reversed
        # view gives the boundary.
        ends.append(ud - int(np.searchsorted(w[::-1], nxt + 1, side="left")))
    ends[-1] = ud
    # Drop empty classes (e.g. nothing wider than 512).
    widths_out, ends_out, prev = [], [], 0
    for wc, e in zip(widths, ends):
        if e > prev:
            widths_out.append(int(wc))
            ends_out.append(int(e))
            prev = e
    return widths_out, ends_out


def _scatter_lut(d_cells, row_vals, *, prod_d: int):
    """Dense extended-grid cell -> PADDED window row; pad entries carry
    out-of-range cell ids and are dropped."""
    return (
        jnp.full((prod_d,), -1, jnp.int32)
        .at[d_cells]
        .set(row_vals, mode="drop")
    )


def _neighbor_rows(base_e, d_cells_e, off_e, *, prod_e: int):
    """Device rebuild of the (UD, 27) neighbor-row table.

    ``base_e`` are the occupied cells' double-extended linear ids,
    ``d_cells_e`` the width-sorted dilated cells' ids in the same space, and
    ``off_e`` the 27 linear neighbor offsets (x slowest, z fastest — the
    shared engine tie order). The double-extended border ring makes every
    ``d_cells_e + off_e`` in bounds by construction, so one scatter + one
    gather replace the 28 MB host-materialized table the prepack used to
    upload (~0.3 s at the tunnel's ~90 MB/s; the seeds are ~1 MB).
    ``prod_e`` is pow2-padded by the caller so per-pair grid-extent changes
    don't recompile this.
    """
    u = base_e.shape[0]
    occ = (
        jnp.full((prod_e,), -1, jnp.int32)
        .at[base_e]
        .set(jnp.arange(u, dtype=jnp.int32), mode="drop")
    )
    return occ[d_cells_e[:, None] + off_e[None, :]]


@partial(jax.jit, static_argnames=("plan_key",))
def _build_pools(packed, cell_start, cell_count, base_e, d_cells_e, off_e,
                 row_vals, dims_d, *, plan_key):
    """The whole device half of the pool prepack as ONE program.

    ``plan_key`` is the static pool geometry from :func:`plan_pool_host`:
    (pow2 class widths, bucket-padded class ends, pow2-padded prod_d /
    prod_e, dtype name, per-class segment bands (w_assemble, F, n_pad)) —
    every element bucketed so consecutive scans of similar geometry reuse
    this compile. Windows live in the PADDED numbering (``row_vals``);
    band/class tails are dead rows. A band with F > 1 assembles its windows
    at ``w_assemble`` lanes, pads each to its W//F-lane segment, and packs
    F side by side per pool row (segment-major — window i of a row owns
    lanes [i*W//F, (i+1)*W//F), matching seg_lut's (f, gseg, ws) metadata).

    Everything the host plan can cheaply express is RE-DERIVED here instead
    of uploaded (round-5 seed shrink — the ~9.6 MB KITTI seed upload was
    the warm pool build's bottleneck on the tunneled link): the search-grid
    cell ids ``d_cells`` from the double-extended ids, the packed
    (pool row << 9 | seg meta) grouping values from ``row_vals`` + the
    static band layout, and the per-pool-row width/union bounds from the
    neighbor-row table + per-cell counts. The host keeps its own copies in
    the plan dict (the demand replay reads them), but they never cross the
    link. Returns (pool_xyz tuple, pool_idx tuple, lut_d, width_lut,
    union_lut).
    """
    widths, ends, prod_d, prod_e, dtype_name, build_bands = plan_key
    dtype = jnp.dtype(dtype_name)
    ud_pad = ends[-1] if ends else 0

    # d_cells (the (+2)-extended SEARCH grid's linear ids) from the
    # double-extended ids: xe-1 etc. Dilated ids are >= 1 by construction
    # (occupied cells sit at coords+2), so the 0-padded tail is detectable
    # and maps to the dropped sentinel exactly like the host pad1 did.
    e0 = dims_d[0] + 2
    e1 = dims_d[1] + 2
    xe = d_cells_e % e0
    re_ = d_cells_e // e0
    ye = re_ % e1
    ze = re_ // e1
    d_cells = jnp.where(
        d_cells_e > 0,
        (xe - 1) + dims_d[0] * ((ye - 1) + dims_d[1] * (ze - 1)),
        prod_d,
    )

    # Static per-pad-position q_lut / seg_lut (pure functions of the band
    # layout — XLA folds the iota arithmetic to constants), gathered with
    # the data-dependent row_vals permutation into the packed grouping
    # values (see plan_pool_host for the host-side original).
    q_parts, s_parts = [], []
    row_cursor = 0
    for w_cls, layout in zip(widths, build_bands):
        for _wa, f, npad in layout:
            gseg = GROUP // f
            ws = w_cls // f
            p_local = jnp.arange(npad, dtype=jnp.int32)
            q_parts.append(row_cursor + p_local // f)
            s_parts.append(
                (p_local % f)
                | (int(np.log2(gseg)) << 3)
                | (int(np.log2(ws)) << 5)
            )
            row_cursor += npad // f
    zero1 = jnp.zeros((1,), jnp.int32)
    q_lut = jnp.concatenate(q_parts + [zero1]) if q_parts else zero1
    seg_lut = jnp.concatenate(s_parts + [zero1]) if s_parts else zero1
    qmeta_vals = (q_lut[row_vals] << 9) | seg_lut[row_vals]

    # lut_d values are the PACKED (pool row << 9 | seg meta) grouping keys,
    # not window ids — _group_by_row's single-gather contract.
    lut_d = _scatter_lut(d_cells, qmeta_vals, prod_d=prod_d)
    nrows_real = _neighbor_rows(
        base_e, d_cells_e, off_e, prod_e=prod_e
    )
    nrows_dev = (
        jnp.full((ud_pad, 27), -1, jnp.int32)
        .at[row_vals]
        .set(nrows_real, mode="drop")
    )

    # Per-pool-row kernel width / union bounds from the real candidate
    # unions (sum of the 27 neighbor cells' counts; band tails are dead
    # rows with zero counts — same values the host derived).
    u_padded = jnp.sum(
        jnp.where(
            nrows_dev >= 0, cell_count[jnp.maximum(nrows_dev, 0)], 0
        ),
        axis=1,
        dtype=jnp.int32,
    )
    w_parts, u_parts = [], []
    pad_cursor = 0
    for w_cls, layout in zip(widths, build_bands):
        for _wa, f, npad in layout:
            ws = w_cls // f
            u_mat = u_padded[pad_cursor : pad_cursor + npad].reshape(
                npad // f, f
            )
            u_parts.append(jnp.max(u_mat, axis=1))
            lane_off = (jnp.arange(f, dtype=jnp.int32) * ws)[None, :]
            top = jnp.where(
                u_mat > 0, lane_off + jnp.minimum(u_mat, ws), 0
            )
            w_parts.append(
                jnp.minimum(
                    (jnp.max(top, axis=1) + 127) // 128 * 128, w_cls
                )
            )
            pad_cursor += npad
    width_lut = jnp.concatenate(w_parts + [zero1]) if w_parts else zero1
    union_lut = jnp.concatenate(u_parts + [zero1]) if u_parts else zero1
    pool_xyz, pool_idx = [], []
    prev = 0
    for c, w_c in enumerate(widths):
        parts_xyz, parts_idx = [], []
        off = 0
        for w_b, f, nb in build_bands[c]:
            block = _pool_block(nb, w_b)
            xyz, idx = _assemble_pool_class(
                packed,
                cell_start,
                cell_count,
                nrows_dev[prev + off : prev + off + nb],
                w_c=w_b,
                n_rows=round_up(nb, block),
            )
            # Pad lanes up to the segment width (the band assembles at its
            # windows' real pow2 width — the per-element pool gather then
            # touches only ~live lanes), then pack F windows per pool row.
            ws = w_c // f
            xyz = jnp.pad(
                xyz.astype(dtype),
                ((0, 0), (0, 0), (0, ws - w_b)),
                constant_values=jnp.asarray(_BIG, dtype),
            )
            idx = jnp.pad(idx, ((0, 0), (0, ws - w_b)), constant_values=-1)
            if f > 1:
                nr = nb // f
                xyz = (
                    xyz.reshape(nr, f, 3, ws)
                    .transpose(0, 2, 1, 3)
                    .reshape(nr, 3, w_c)
                )
                idx = idx.reshape(nr, w_c)
            parts_xyz.append(xyz)
            parts_idx.append(idx)
            off += nb
        # Dead pool row: constructed directly, nothing to gather.
        pool_xyz.append(
            jnp.concatenate(
                parts_xyz + [jnp.full((1, 3, w_c), _BIG, dtype)], axis=0
            )
        )
        pool_idx.append(
            jnp.concatenate(
                parts_idx + [jnp.full((1, w_c), -1, jnp.int32)], axis=0
            )
        )
        prev = ends[c]
    return tuple(pool_xyz), tuple(pool_idx), lut_d, width_lut, union_lut


def _pool_block(n_rows: int, w_c: int) -> int:
    """Rows per lax.map chunk in pool assembly (bounds the (B, W, 27) owner
    transient to ~0.5 GB of int32)."""
    return max(1, min(n_rows, (1 << 22) // max(w_c, 1)))


def _assemble_pool_class(packed_sorted, cell_start, cell_count, nrows_c,
                         *, w_c: int, n_rows: int):
    """Pack one width class's candidate windows from the cell-sorted target.

    ``packed_sorted`` is (Np + 1, 4) f32: cell-sorted target xyz with the
    original index BITCAST into lane 3 (one 16 B-aligned gather builds both
    coordinate and index pools), row Np = dead sentinel. Window slots follow
    (neighbor-offset, within-cell) order — the same tie order as every other
    engine, because within-cell order in the sort equals bucket slot order.

    Returns exactly ``nrows_c.shape[0]`` window rows at lane width ``w_c``;
    the caller pads lanes up to the class width and appends the dead row.
    The element gather dominates (measured ~30 ns/row on a v5e), so callers
    should invoke this at the windows' real pow2-padded width — the
    sub-width splitting in build_pool_prepack — rather than one class-wide
    width (33M mostly-dead gathered rows -> ~4M live ones at KITTI scale).
    """
    npts = packed_sorted.shape[0] - 1
    n_c = nrows_c.shape[0]
    block = _pool_block(n_rows, w_c)
    p = jnp.arange(w_c, dtype=jnp.int32)[None, :]

    def block_fn(nrows_blk):
        b = nrows_blk.shape[0]
        cnt = jnp.where(
            nrows_blk >= 0, cell_count[jnp.maximum(nrows_blk, 0)], 0
        )  # (B, 27)
        starts = jnp.cumsum(cnt, axis=1) - cnt
        total = jnp.sum(cnt, axis=1)
        base = cell_start[jnp.maximum(nrows_blk, 0)]  # (B, 27)
        # Packed slot p belongs to the LAST neighbor j with start_j <= p
        # (starts are nondecreasing; empty cells never own a slot because
        # the next nonempty neighbor shares their start). An unrolled
        # 27-step select over (B, W) lane-major arrays replaces the naive
        # (B, W, 27) reduction, whose 27-lane minor dimension wastes ~4/5
        # of the VPU (measured 1.04 s -> the loop form is bandwidth-bound).
        ssel = jnp.zeros((b, w_c), jnp.int32)
        bsel = jnp.zeros((b, w_c), jnp.int32)
        for j in range(27):
            upd = starts[:, j : j + 1] <= p
            ssel = jnp.where(upd, starts[:, j : j + 1], ssel)
            bsel = jnp.where(upd, base[:, j : j + 1], bsel)
        srcpos = bsel + (p - ssel)
        live = p < total[:, None]
        pos = jnp.where(live, srcpos, npts)
        raw = packed_sorted[pos]  # (B, W, 4)
        xyz = jnp.transpose(raw[..., :3], (0, 2, 1))  # (B, 3, W)
        idx = lax.bitcast_convert_type(raw[..., 3], jnp.int32)
        return xyz, idx

    # Chunk the work; n_rows is the static padded row count (a multiple of
    # the block by construction in the caller).
    pad = n_rows - n_c
    nrows_pad = jnp.concatenate(
        [nrows_c, jnp.full((pad, 27), -1, jnp.int32)], axis=0
    )
    xyz, idx = lax.map(
        block_fn, nrows_pad.reshape(n_rows // block, block, 27)
    )
    xyz = xyz.reshape(n_rows, 3, w_c)[:n_c]
    idx = idx.reshape(n_rows, w_c)[:n_c]
    return xyz, idx


def _rows_for(cnt: np.ndarray, f: int) -> int:
    """Predicted padded SOURCE rows for packing windows with per-window
    source-count proxy ``cnt`` at segment factor ``f``: each pool row packs
    ``f`` consecutive windows and every window gets GROUP//f row slots per
    group, so a pool row with per-segment counts n_0..n_{f-1} costs
    GROUP * max_i ceil(n_i / (GROUP//f)) source rows."""
    gseg = GROUP // f
    pad = (-len(cnt)) % f
    c = np.concatenate([cnt, np.zeros(pad, cnt.dtype)]).reshape(-1, f)
    return int(GROUP * (-(-c // gseg)).max(axis=1).sum())


def _plan_segment_bands(
    union: np.ndarray, center: np.ndarray, widths: list[int], ends: list[int]
) -> list[list[tuple[int, int, int]]]:
    """Partition each width class's (width-sorted) windows into SEGMENT bands.

    A band with segment factor F packs F consecutive windows side by side in
    each pool row of the class's lane width W: window i owns lanes
    [i%F * W//F, (i%F + 1) * W//F), and the per-iteration grouping gives each
    window GROUP//F source-row slots per group (ops/fused_pool._group_by_row).
    VPU op cost is proportional to SOURCE ROWS x 128-lane registers, so on
    sparse scans — where 8-row cell-pure groups are mostly padding (KITTI
    occupancy ~2.6: 400k padded rows for 131k sources) — packing trades
    free lane slack (a union-8 window wastes 120 of its 128 lanes either
    way) for real row density.

    F is chosen per run of equal F_max (F_max = W // pow2ceil(union), capped
    at GROUP — the fit constraint) by minimizing predicted source rows from
    the windows' center-cell target counts (``center`` — the same source
    density proxy the group budgets use): OCCUPANCY, not union, decides
    whether packing pays. Ties prefer larger F (fewer pool rows, smaller
    pools, fewer window gathers).

    Returns, per class, a list of (w_assemble, F, n_real_windows) bands;
    w_assemble <= W//F is the real pow2 width the pool build gathers at
    (lanes beyond it in the segment are dead padding).
    """
    out = []
    prev = 0
    for w_cls, e in zip(widths, ends):
        u = union[prev:e]
        cnt = center[prev:e]
        n = e - prev
        w_need = np.maximum(
            1, 1 << np.ceil(np.log2(np.maximum(u, 1))).astype(np.int64)
        )
        # Segment widths must stay multiples of META_UNIT lanes (the packed
        # row-meta encoding) — F is additionally capped at w_cls / 16.
        f_max = np.minimum(
            min(GROUP, max(w_cls // 16, 1)),
            w_cls // np.minimum(w_need, w_cls),
        )
        bands: list[tuple[int, int, int]] = []
        s0 = 0
        while s0 < n:
            fm = int(f_max[s0])
            # union descending -> w_need non-increasing -> f_max ascending.
            s1 = int(np.searchsorted(f_max, fm, side="right"))
            # Windows inside a band are RE-SORTED by descending count proxy
            # before packing (plan_pool_host), so F-tuples hold similar
            # occupancies and the per-row max tracks the mean (union-sorted
            # adjacency does NOT correlate occupancy: KITTI p50 occupancy
            # is 1 with 284-point hot cells). Evaluate candidates on the
            # sorted counts the packing will actually see.
            cnt_run = -np.sort(-cnt[s0:s1])
            best_f, best_rows = 1, None
            f = 1
            while f <= fm:
                r = _rows_for(cnt_run, f)
                if best_rows is None or r <= best_rows:
                    best_f, best_rows = f, r
                f *= 2
            wa = int(min(w_cls // best_f, _pow2(max(int(u[s0]), 1))))
            if bands and bands[-1][1] == best_f:
                pw, pf, pn = bands[-1]
                bands[-1] = (max(pw, wa), pf, pn + (s1 - s0))
            else:
                bands.append((wa, best_f, s1 - s0))
            s0 = s1
        if not bands:
            bands.append((w_cls, 1, 0))
        out.append(bands)
        prev = e
    return out


def _ladder_ends(union: np.ndarray, widths: list[int]) -> list[int] | None:
    """Bin width-sorted windows into a GIVEN descending pow2 width ladder.

    Window width = pow2(union) clipped up to the ladder's narrowest class.
    Returns the exclusive end rows (one per ladder class, empty classes
    keep a zero-size band — SPMD consumers need every shard to share the
    ladder), or None when some window is wider than the ladder's top class.
    """
    ud = union.shape[0]
    w = np.maximum(
        widths[-1],
        1 << np.ceil(np.log2(np.maximum(union, 1))).astype(np.int64),
    )
    if ud and int(w[0]) > widths[0]:
        return None
    ends = []
    for c in range(len(widths)):
        nxt = widths[c + 1] if c + 1 < len(widths) else 0
        ends.append(ud - int(np.searchsorted(w[::-1], nxt + 1, side="left")))
    ends[-1] = ud
    return ends


def plan_pool_host(
    grid_host: dict,
    target: np.ndarray,
    *,
    force: dict | None = None,
    select_max_w: int | None = None,
) -> dict | None:
    """Host-only half of the pool prepack (pure numpy — sequence pipelines
    run it on the target-prep thread, models/odometry.py).

    ``target`` is the (padded) target cloud the grid was built over (only its
    first ``num_valid`` rows are read). Returns None when the scan doesn't
    fit the engine: extended LUT too large (dilate_cells_host), a window
    union beyond MAX_CLASS_LANES, or pools past MAX_POOL_BYTES — callers
    then stay on the XLA grid engine.

    ``select_max_w`` overrides the backend-resolved narrow-class cutoff the
    class-split floor derives from (tests force 0 to plan in the TPU style
    on a CPU host; production callers leave it None).

    ``force`` harmonizes every STATIC dimension of the plan to caller-given
    values so several plans share one compiled program and identical array
    shapes — the contract SPMD consumers need (parallel/pool_sharded.py
    builds one plan per target shard; every shard must agree on the static
    key). Keys: ``widths`` (the class ladder — windows are then binned
    purely by pow2(union) clipped into the ladder, see :func:`_ladder_ends`),
    ``pad_sizes`` (padded per-class row counts), ``prod_d_pad``,
    ``prod_e_pad``, ``u_pad``, ``n_pad``, ``ud_b``. All forced values must
    dominate this scan's real sizes (returns None otherwise — the caller
    derived them from a superset of scans).
    """
    counts_full = grid_host["cell_count"].astype(np.int64)
    dil = dilate_cells_host(grid_host, counts=counts_full, dense_lut=False)
    if dil is None:
        return None
    nrows = dil["nrows"]  # (UD, 27), width-sorted
    union = dil["union"]
    if force is None:
        widths, ends = _plan_classes(union)
        if widths and widths[0] > MAX_CLASS_LANES:
            return None
    else:
        widths = list(force["widths"])
        if union.size and int(union.max()) > MAX_CLASS_LANES:
            return None

    n = grid_host["num_valid"]
    order = grid_host["sort_order"]
    packed = np.empty((n + 1, 4), np.float32)
    packed[:n, :3] = np.asarray(target[:n])[order].astype(np.float32)
    packed[:n, 3] = order.astype(np.int32).view(np.float32)
    packed[n, :3] = _BIG
    packed[n, 3] = np.int32(-1).view(np.float32)

    # Pow2 sub-width classes: windows are width-sorted globally, so each
    # pow2 width band is a contiguous row range and becomes its OWN class.
    # The SPLIT FLOOR is backend-resolved (same decision as the
    # narrow-class select cutoff, _select_max_w):
    #   * CPU (cutoff 64): floor 8 — narrow classes skip the kernel for a
    #     stable lax.top_k over their w-wide rows (for w <= k that is a
    #     plain stable sort), so 8/16/32/64-lane classes each pay only
    #     their real width in pool memory and top_k work.
    #   * TPU (cutoff 0): floor 128 — every class runs the Pallas kernel,
    #     where any window <= 128 lanes occupies exactly one 128-lane VPU
    #     row; splitting below 128 saves NO kernel work but multiplies
    #     kernel passes, and the narrow tail classes each cover nearly the
    #     whole group budget (their budgets hit ng). Measured on the KITTI
    #     131k pair: floor 8 = 9 classes, 103.9 ms/iter steady align; floor
    #     128 = 5 classes, 73.7 ms/iter, pool build time ~equal (0.61 vs
    #     0.67 s — build is dispatch-dominated, not gather-bound). See
    #     docs/PERF.md round-3 log.
    smw_plan = _select_max_w() if select_max_w is None else select_max_w
    if force is None:
        w_floor = 128 if smw_plan == 0 else 8
        w_pow2 = np.maximum(
            w_floor,
            1 << np.ceil(np.log2(np.maximum(union, 1))).astype(np.int64),
        )
        widths2, ends2 = [], []
        prev = 0
        for w_c, e_c in zip(widths, ends):
            cls_w = np.minimum(w_pow2[prev:e_c], w_c)
            s0 = 0
            while s0 < e_c - prev:
                sw = int(cls_w[s0])
                s1 = int(np.searchsorted(-cls_w, -sw, side="right"))
                widths2.append(sw)
                ends2.append(prev + s1)
                s0 = s1
            prev = e_c
        widths, ends = widths2, ends2
    else:
        # Forced ladder: pure pow2 binning (equivalent to the self-derived
        # split whenever the ladder covers this scan; empty classes keep a
        # zero-size band so every shard shares the class structure).
        ends = _ladder_ends(union, widths)
        if ends is None:
            return None

    # ---- Segment bands + sequence compile stability ----
    # Each class is partitioned into SEGMENT bands (w_assemble, F, n): a
    # band packs F consecutive windows per pool row, each owning a
    # W_c//F-lane segment and GROUP//F source-row slots per group
    # (_plan_segment_bands — the sparse-tail density lever). Band sizes are
    # bucketed geometrically (~12.5% granularity, pow2 floors that keep
    # every band a multiple of its F), so data-exact shape noise between
    # consecutive scans disappears into dead-window padding and the static
    # keys repeat across a sequence (remote compiles cost seconds each).
    # Force-mode (harmonized SPMD) plans use one F=1 band per class at the
    # forced pad size: their static key must be identical across group
    # members, and the band structure is scan-dependent.
    ud = int(union.shape[0])
    sizes = np.diff([0] + ends).tolist()
    # Center-cell target count per window: the source-density proxy for the
    # band chooser and the group budgets (offset 13 of the (x slowest,
    # z fastest) 27-enumeration is (0,0,0); sources land like targets).
    counts_pad = np.concatenate([counts_full, [0]])
    center = np.where(
        nrows[:, 13] >= 0, counts_pad[np.maximum(nrows[:, 13], 0)], 0
    )
    if force is None:
        bands_real = _plan_segment_bands(union, center, widths, ends)
        band_layout = []  # per class: [(w_assemble, F, n_real, n_pad)]
        for bands_c in bands_real:
            layout = []
            for wa, f, nb in bands_c:
                floor = max(64, (1 << 20) // (16 * max(wa, 1)))
                # step_bits=3 (~25% buckets): band sizes jitter across a
                # sequence's scans and a boundary flip recompiles the
                # whole scan program (see core.types.bucket_rows).
                layout.append((wa, f, nb, _bucket_rows(nb, floor, 3)))
            band_layout.append(layout)
        pad_sizes = [sum(b[3] for b in layout) for layout in band_layout]
    else:
        pad_sizes = list(force["pad_sizes"])
        if any(p < s for p, s in zip(pad_sizes, sizes)):
            return None
        band_layout = [
            [(w, 1, s, p)] for w, s, p in zip(widths, sizes, pad_sizes)
        ]
    ends_pad = np.cumsum(pad_sizes).tolist()
    ud_pad = int(ends_pad[-1]) if ends_pad else 0
    pool_bytes = sum(
        (sum(b[3] // b[1] for b in layout) + 1) * w * 16
        for layout, w in zip(band_layout, widths)
    )
    if pool_bytes > MAX_POOL_BYTES:
        return None

    # Padded window numbering + pool-row numbering + per-window segment
    # metadata. seg_lut packs (f, log2(GROUP//F), log2(W//F)) into one int32
    # so the per-iteration grouping unpacks a window's slot base, group-slot
    # count and lane segment with shifts (ops/fused_pool._group_by_row).
    row_vals = np.empty((ud,), np.int32)
    q_lut = np.zeros((ud_pad + 1,), np.int32)
    seg_lut = np.zeros((ud_pad + 1,), np.int32)
    # (q_lut/seg_lut are internal here: the search consumes them PACKED
    # into the lut_d values — one gather per source instead of three.)
    row_width_parts, row_union_parts = [], []
    est_groups_total = 0
    cls_groups = []  # per class: estimated groups (floored counts)
    class_row_ends = []
    prev_real = 0
    pad_cursor = 0
    row_cursor = 0
    for w_cls, layout in zip(widths, band_layout):
        cls_g = 0
        for wa, f, nb, npad in layout:
            gseg = GROUP // f
            ws = w_cls // f
            # Packing order within the band: descending count proxy for
            # F > 1 (balanced F-tuples — see _plan_segment_bands), original
            # width order otherwise. Permuting windows WITHIN a band keeps
            # class/row prefix ordering and every per-window contract
            # (lut_d maps cells to padded ids via row_vals).
            band_idx = np.arange(prev_real, prev_real + nb)
            if f > 1 and nb:
                band_idx = band_idx[
                    np.argsort(-center[band_idx], kind="stable")
                ]
            row_vals[band_idx] = pad_cursor + np.arange(nb, dtype=np.int32)
            p_local = np.arange(npad, dtype=np.int32)
            q_lut[pad_cursor : pad_cursor + npad] = row_cursor + p_local // f
            seg_lut[pad_cursor : pad_cursor + npad] = (
                (p_local % f)
                | (int(np.log2(gseg)) << 3)
                | (int(np.log2(ws)) << 5)
            )
            nr = npad // f
            u_band = np.zeros((npad,), np.int64)
            u_band[:nb] = union[band_idx]
            u_mat = u_band.reshape(nr, f)
            row_union_parts.append(u_mat.max(axis=1).astype(np.int32))
            # Per-row kernel width: lanes up to the highest live candidate
            # over the row's segments, rounded to the 128-lane branch
            # granularity (dead rows -> 0 -> the kernel's free skip).
            lane_off = (np.arange(f, dtype=np.int64) * ws)[None, :]
            top = np.where(u_mat > 0, lane_off + np.minimum(u_mat, ws), 0)
            row_width_parts.append(
                np.minimum(
                    (np.ceil(top.max(axis=1) / 128.0) * 128).astype(np.int32),
                    w_cls,
                )
            )
            # Group estimates from the center-count proxy: budgets floor
            # real windows at 1 (stray sources), the row budget does not.
            c_raw = np.zeros((npad,), np.int64)
            c_raw[:nb] = center[band_idx]
            est_groups_total += int(
                (-(-c_raw.reshape(nr, f) // gseg)).max(axis=1).sum()
            )
            c_fl = np.zeros((npad,), np.int64)
            c_fl[:nb] = np.maximum(center[band_idx], 1)
            cls_g += int((-(-c_fl.reshape(nr, f) // gseg)).max(axis=1).sum())
            prev_real += nb
            pad_cursor += npad
            row_cursor += nr
        cls_groups.append(cls_g)
        class_row_ends.append(row_cursor)
    n_rows_pad = row_cursor
    if n_rows_pad >= (1 << 22):
        return None  # packed (row << 9 | meta) keys need row ids < 2^22
    row_width_lut = np.concatenate(
        row_width_parts + [np.zeros((1,), np.int32)]
    )
    row_union_lut = np.concatenate(
        row_union_parts + [np.zeros((1,), np.int32)]
    )
    # Per real window: packed (pool row << 9) | segment meta — the lut_d
    # scatter value (_group_by_row's single-gather contract).
    qmeta_vals = (q_lut[row_vals] << 9) | seg_lut[row_vals]

    # Row budget: 1.3x margin over the occupancy-predicted row count + the
    # runtime overflow flag for drift (the estimate tracks live rows only:
    # dead-window sources are dropped by the grouping).
    est_rows = GROUP * est_groups_total
    budget_rows = round_up(
        _bucket_rows(max(int(1.3 * est_rows), n), step_bits=3),
        2 * BLOCK_GROUPS * GROUP,
    )
    ng = budget_rows // GROUP

    # Per-class group budgets (pool-row groups), 2x margin + floor; the
    # last class always spans every group. Floor at 1024 groups: prefix
    # blocks beyond the real groups are width-0 and skipped by the kernel,
    # so the floor swallows scan-to-scan budget noise at ~zero cost.
    budgets = []
    cum_groups = 0
    for c in range(len(widths)):
        cum_groups += cls_groups[c]
        if c == len(widths) - 1:
            budgets.append(ng)
        else:
            b = round_up(
                _bucket_rows(2 * cum_groups + 4 * BLOCK_GROUPS, 1024, 3),
                BLOCK_GROUPS,
            )
            budgets.append(min(ng, b))

    off_e = dil["off_e"]

    # Bucket-padded upload arrays. Sentinels: indices one past the pow2
    # scatter-table sizes (dropped by mode="drop"), dead packed rows, and
    # row_vals = ud_pad (dropped when scattering the padded numbering).
    u = int(dil["base_e"].shape[0])
    if force is None:
        prod_e_pad = _pow2(dil["prod_e"])
        prod_d_pad = _pow2(dil["prod_d"])
        # ~25% buckets: these counts jitter scan-to-scan in a sequence and
        # any flip re-specializes the build/search programs (bucket_rows).
        u_pad = _bucket_rows(u, step_bits=3)
        n_pad = _bucket_rows(n + 1, step_bits=3)
        ud_b = _bucket_rows(ud, step_bits=3)
    else:
        prod_e_pad = force["prod_e_pad"]
        prod_d_pad = force["prod_d_pad"]
        u_pad = force["u_pad"]
        n_pad = force["n_pad"]
        ud_b = force["ud_b"]
        if (
            prod_e_pad < dil["prod_e"]
            or prod_d_pad < dil["prod_d"]
            or u_pad < u
            or n_pad < n + 1
            or ud_b < ud
        ):
            return None
    packed_pad = np.empty((n_pad + 1, 4), np.float32)
    packed_pad[: n + 1] = packed
    packed_pad[n + 1 :, :3] = _BIG
    packed_pad[n + 1 :, 3] = np.int32(-1).view(np.float32)

    def pad1(a, length, value):
        out = np.full((length,), value, a.dtype)
        out[: a.shape[0]] = a
        return out

    return {
        "dil": dil,
        "widths": widths,
        "ends": ends_pad,
        # Static per-class band tuples (w_assemble, F, n_pad) — part of the
        # _build_pools plan key and the source of the pool-row layout.
        "bands": tuple(
            tuple((wa, f, npad) for wa, f, _, npad in layout)
            for layout in band_layout
        ),
        "row_ends": class_row_ends,  # global pool-row ends per class
        "sizes_real": sizes,
        "packed": packed_pad,
        "row_vals": pad1(row_vals, ud_b, ud_pad),
        "d_cells": pad1(dil["d_cells"].astype(np.int32), ud_b, prod_d_pad),
        "d_cells_e": pad1(dil["d_cells_e"].astype(np.int32), ud_b, 0),
        "base_e": pad1(dil["base_e"].astype(np.int32), u_pad, prod_e_pad),
        "cell_start": pad1(
            grid_host["cell_start"].astype(np.int32), u_pad, n
        ),
        "cell_count": pad1(
            grid_host["cell_count"].astype(np.int32), u_pad, 0
        ),
        # ROW-indexed (pool-row numbering) kernel width / union bounds.
        "width_lut": row_width_lut,
        "union_lut": row_union_lut,
        # Per real window: packed (pool row << 9 | seg meta) lut_d values.
        "qmeta_vals": pad1(qmeta_vals.astype(np.int32), ud_b, -1),
        "ud_pad": ud_pad,
        "n_rows_pad": n_rows_pad,
        "prod_d_pad": prod_d_pad,
        "prod_e_pad": prod_e_pad,
        "budgets": budgets,
        "budget_rows": budget_rows,
        "off_e": off_e,
        "cell_size": grid_host["cell_size"],
    }


def plan_pool_host_group(grids: list, targets: list) -> list | None:
    """Plan several scans with ONE shared static geometry.

    SPMD and vmap consumers (parallel/pool_sharded.py target shards,
    parallel/batch.py pair batches) need every member to share the class
    ladder, padded class sizes, scatter-table sizes, and upload shapes so
    a single compiled program serves all of them. Two passes: self-keyed
    plans, then re-planning with ``force`` statics taken as maxima over
    the group. Returns the aligned plans, or None when any member declines
    the pooled engine (callers fall back to the XLA grid engine).
    """
    plans = []
    for g, t in zip(grids, targets):
        p = plan_pool_host(g, t)
        if p is None:
            return None
        plans.append(p)
    ladder = sorted({w for p in plans for w in p["widths"]}, reverse=True)
    real = np.zeros((len(plans), len(ladder)), np.int64)
    for i, p in enumerate(plans):
        ends = _ladder_ends(p["dil"]["union"], ladder)
        if ends is None:
            return None
        real[i] = np.diff([0] + ends)
    force = {
        "widths": tuple(ladder),
        "pad_sizes": tuple(
            int(
                _bucket_rows(
                    int(real[:, c].max()), max(64, (1 << 20) // (16 * w))
                )
            )
            for c, w in enumerate(ladder)
        ),
        "prod_d_pad": max(_pow2(p["dil"]["prod_d"]) for p in plans),
        "prod_e_pad": max(_pow2(p["dil"]["prod_e"]) for p in plans),
        "u_pad": max(
            _bucket_rows(int(p["dil"]["base_e"].shape[0])) for p in plans
        ),
        "n_pad": max(p["packed"].shape[0] - 1 for p in plans),
        "ud_b": max(p["row_vals"].shape[0] for p in plans),
    }
    out = []
    for g, t in zip(grids, targets):
        p2 = plan_pool_host(g, t, force=force)
        if p2 is None:  # cannot happen by construction; belt and braces
            return None
        out.append(p2)
    return out


def estimate_pool_demand_rows(plan: dict, source: np.ndarray,
                              num_valid: int | None = None,
                              class_row_ends: tuple | None = None):
    """EXACT padded-row demand of ``_group_by_row`` for a real source cloud.

    The plan's row budget is estimated from target occupancy (sources are
    assumed to land like targets). Real pairs drift: moved sources fall in
    dilated shell cells whose center-count proxy is 0, and each such window
    still costs a full group of rows — measured 330k real rows vs a 213k
    budget on a KITTI-like sequence pair (1.55x), which tripped the runtime
    overflow flag and forced a discarded chunk + a SECOND ~minutes scan
    compile on the remote TPU compiler every first pair.

    This replays the grouping arithmetic in vectorized numpy (~20 ms at
    131k): per (pool row, segment) source counts -> per row
    ``GROUP * max_i ceil(c_i / gseg)`` using the same packed seg meta the
    device consumes. Callers size the search budget as
    ``max(plan_budget, margin * demand)`` so the first dispatched program
    already covers the real pair (the overflow flag stays as the guard for
    intra-pair drift).

    ``class_row_ends`` (the prepack's global pool-row ends per class)
    switches the return to ``(rows, cum_groups)``, where ``cum_groups[c]``
    is the measured group count of classes <= c — the same replay then
    demand-sizes the per-class PREFIX budgets too (every class pass pays
    streaming + dead-block dispatch over its whole prefix, so the plan's
    2x-estimate mid-class budgets cost real kernel time: 8.09 -> 7.63
    ms/iter loop-timed at 35k when sized from this replay; docs/PERF.md
    round 5).
    """
    dil = plan["dil"]
    n = num_valid if num_valid is not None else source.shape[0]
    pts = np.asarray(source[:n], dtype=np.float64)
    dims_d = np.asarray(dil["dims_d"], dtype=np.int64)
    cell = float(plan["cell_size"])
    ijk = np.floor((pts - np.asarray(dil["origin_d"])) / cell).astype(
        np.int64
    )
    inb = np.all((ijk >= 0) & (ijk < dims_d), axis=1)
    lin = ijk[inb, 0] + dims_d[0] * (ijk[inb, 1] + dims_d[1] * ijk[inb, 2])
    size = int(plan["prod_d_pad"]) + 1
    lut = np.full(size, -1, np.int64)
    d_cells = plan["d_cells"]
    lut[d_cells] = plan["qmeta_vals"]
    q = lut[lin]
    q = q[q >= 0]
    if q.size == 0:
        if class_row_ends is not None:
            return 0, [0] * len(class_row_ends)
        return 0
    # One unique over (row << 9 | seg-meta) keys: rows are the high bits so
    # unique's sorted output is row-contiguous for the reduceat below.
    keys, counts = np.unique(q, return_counts=True)
    gseg = 1 << ((keys >> 3) & 3)
    contrib = -(-counts // gseg)
    rows = keys >> 9
    starts = np.flatnonzero(np.diff(rows, prepend=rows[0] - 1))
    per_row_max = np.maximum.reduceat(contrib, starts)
    total = int(GROUP * per_row_max.sum())
    if class_row_ends is not None:
        row_ids = rows[starts]
        cum = [
            int(per_row_max[row_ids < int(e)].sum()) for e in class_row_ends
        ]
        return total, cum
    return total


def demand_class_budgets(
    cum_groups, last_budget: int, *, boost: int = 0, cap: int | None = None
) -> tuple:
    """Class-PREFIX budgets from a grouping replay's per-class cumulative
    group counts (the single source for the three dispatch sites:
    models/registration.py, parallel/align.py, parallel/pool_sharded.py).

    1.25x margin over the measured counts, ~25% buckets + 1024-group floor
    (compile stability across a sequence's scans), rounded to the kernel
    block multiple, ``boost``-shifted so the overflow-escalation ladder
    raises class budgets too. NOT clamped to the plan's 2x target-proxy
    estimates: the replay may legitimately EXCEED the proxy (the same
    shell-cell undercount that motivated the row-budget demand lift), and
    clamping would reinstate the first-pair coverage overflow the replay
    exists to avoid. ``cap`` (e.g. the dispatch's total group count)
    bounds each entry when given; the last class always gets
    ``last_budget`` (the search forces it to span every group anyway).
    """
    out = []
    for c in cum_groups[:-1]:
        b = round_up(
            _bucket_rows((int(1.25 * c) << boost) + 4 * BLOCK_GROUPS, 1024, 3),
            BLOCK_GROUPS,
        )
        out.append(min(cap, b) if cap is not None else b)
    return tuple(out) + (last_budget,)


def pool_seed_host(plan: dict, dtype=np.float32) -> dict:
    """The pool prepack's upload dict (host numpy), shared by
    :func:`build_pool_prepack` and callers that merge these seeds into a
    larger single ``jax.device_put`` (models/registration.py ctor — on a
    tunneled chip every separate put pays RPC latency, so the ctor ships
    source rows + seeds in ONE transfer).

    Deliberately NOT shipped (derived on device in :func:`_build_pools`):
    d_cells, qmeta_vals, width_lut, union_lut — together ~45% of the KITTI
    seed bytes, and the warm pool build is upload-bound on the tunnel
    (docs/PERF.md round-5 seed shrink)."""
    dil = plan["dil"]
    return {
        "packed": plan["packed"],
        "cell_start": plan["cell_start"],
        "cell_count": plan["cell_count"],
        "base_e": plan["base_e"],
        "d_cells_e": plan["d_cells_e"],
        "off_e": plan["off_e"],
        "row_vals": plan["row_vals"],
        "dims_d": dil["dims_d"],
        "origin_d": dil["origin_d"].astype(dtype),
    }


def build_pool_prepack(
    grid_host: dict,
    target: np.ndarray,
    dtype=np.float32,
    plan: dict | None = None,
    k: int = 20,
    select_max_w: int | None = None,
    dev_seeds: dict | None = None,
) -> PoolPrepack | None:
    """Build the pooled fused-search state (host plan + device packing).

    Pass a precomputed ``plan`` (from :func:`plan_pool_host`, e.g. built on
    the sequence pipeline's target-prep thread) to skip the host half here.
    ``dev_seeds`` takes the already-device-put :func:`pool_seed_host` dict
    (callers batching the upload); None uploads here.
    """
    if plan is None:
        plan = plan_pool_host(grid_host, target, select_max_w=select_max_w)
    if plan is None:
        return None
    dil = plan["dil"]
    widths, ends = plan["widths"], plan["ends"]
    # Resolve the narrow-class cutoff once; the prepack carries it so the
    # search routes classes with the SAME decision the small_unions hint
    # below was filtered with (a process whose default backend changed
    # between build and search would otherwise route inconsistently).
    smw = _select_max_w() if select_max_w is None else select_max_w

    dev = (
        dev_seeds
        if dev_seeds is not None
        else jax.device_put(pool_seed_host(plan, dtype))
    )
    # One fused device program builds everything: the dense extended-grid
    # LUT (a >100 MB host write + tunnel upload at KITTI scale if
    # materialized host-side), the (UD, 27) neighbor-row table (28 MB
    # shipped vs ~1 MB of seeds), and every width-class pool. Fusing the
    # ~30 constituent ops into one jit matters on the tunnel: each dispatch
    # costs ~25 ms of RPC latency, which dominated the warm ctor (~0.8 s of
    # pure dispatch). Every static in the plan key AND every upload shape
    # is bucketed (plan_pool_host), so scans of similar geometry reuse this
    # compile across a whole sequence.
    plan_key = (
        tuple(widths),
        tuple(ends),
        plan["prod_d_pad"],
        plan["prod_e_pad"],
        np.dtype(dtype).name,
        plan["bands"],
    )
    pool_xyz, pool_idx, lut_d, width_lut, union_lut = _build_pools(
        dev["packed"],
        dev["cell_start"],
        dev["cell_count"],
        dev["base_e"],
        dev["d_cells_e"],
        dev["off_e"],
        dev["row_vals"],
        dev["dims_d"],
        plan_key=plan_key,
    )

    return PoolPrepack(
        pool_xyz=tuple(pool_xyz),
        pool_idx=tuple(pool_idx),
        class_widths=tuple(widths),
        class_ends=tuple(plan["row_ends"]),
        class_budgets=tuple(plan["budgets"]),
        width_lut=width_lut,
        union_lut=union_lut,
        # NOTE: lut_d values are packed (pool row << 9 | segment meta)
        # grouping keys (_group_by_row), not window ids.
        lut_d=lut_d,
        origin_d=dev["origin_d"],
        dims_d=dev["dims_d"],
        budget_rows=plan["budget_rows"],
        n_dilated=dil["n_dilated"],
        cell_size=plan["cell_size"],
        # Only windows in kernel classes (w > the resolved cutoff) ever run
        # the extraction loop; the counted-loop hint must ignore the
        # narrow unions the XLA top_k classes absorbed, else it enables
        # the ~15%/round loop overhead exactly where no round can be
        # saved (all kernel-class unions exceed k for k <= 64).
        small_unions=_small_unions(dil["union"][dil["union"] > smw], k),
        select_max_w=smw,
    )


# Dead-window sort sentinel for the packed (pool row << 9 | seg meta) keys.
_QMETA_DEAD = np.int32(0x7FFFFFFF)


def _group_by_row(source, source_valid, lut_d, origin_d, dims_d,
                  n_rows, radius, s_pad: int):
    """Segment-aware grouping: map each source to its window's POOL ROW and
    sort same-row sources into GROUP-row blocks with per-window slot ranges.

    The segment-packed generalization of fused_grid._group_by_window: a pool
    row packs F windows, window f of a row owns GROUP//F row slots per
    group, and a row's groups are shared by all its windows — group count
    per pool row = max over its windows of ceil(n_sources / (GROUP//F)).
    F = 1 rows reduce exactly to the dense engine's behavior.

    ``lut_d`` values are PACKED (pool row << 9) | segment meta
    (f | log2(GROUP//F) << 3 | log2(W//F) << 5): one 12 B-granularity
    gather per source delivers everything the grouping needs — element
    gathers measured ~2.9 ms per 131k on a v5e, so the previous separate
    window-id + q_lut + seg_lut lookups were ~6 ms/iteration of pure
    gather dispatch. The packed keys sort pool-row-major (q in the high
    bits), which the class-prefix budgets rely on, and distinct windows of
    one row stay distinct sort runs (f differs in the meta bits).

    Returns (padded, step_rows, order, dst, overflow):
      padded: (s_pad, 4) sorted sources: xyz + packed row meta in lane 3
        (valid flag + segment lane bounds — the select kernel's row
        format, fused_grid.pack_row_meta).
      step_rows: (s_pad // GROUP,) POOL ROW per group (n_rows = dead).
      order / dst: sort permutation and padded-row slots (for un-sorting).
      overflow: sources past the ``s_pad`` budget (caller redoes the
        iteration on an XLA engine when nonzero).
    """
    n = source.shape[0]
    dtype = source.dtype
    ng = s_pad // GROUP
    cell = jnp.asarray(radius, dtype)

    # 1. source cell -> packed (pool row, segment meta).
    ijk = jnp.floor((source - origin_d.astype(dtype)) / cell).astype(jnp.int32)
    inb = jnp.all((ijk >= 0) & (ijk < dims_d[None, :]), axis=-1) & source_valid
    safe = jnp.clip(ijk, 0, dims_d[None, :] - 1)
    lin = safe[:, 0] + dims_d[0] * (safe[:, 1] + dims_d[1] * safe[:, 2])
    qmeta = jnp.where(inb, lut_d[lin], -1)
    qmeta = jnp.where(qmeta < 0, _QMETA_DEAD, qmeta)

    # 2. one sort delivers both the permutation and the sorted keys
    # (sort_key_val — a separate rs = row[order] gather costs ~3 ms);
    # dead-window sources sort to the tail, allocate nothing, and unsort
    # to mask=False.
    rs, order = lax.sort_key_val(qmeta, jnp.arange(n, dtype=jnp.int32))
    dead = rs == _QMETA_DEAD
    qs = jnp.where(dead, n_rows, rs >> 9)
    meta = rs & 511
    f = meta & 7
    lgseg = (meta >> 3) & 3
    lws = meta >> 5
    pos = jnp.arange(n, dtype=jnp.int32)
    starts = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), rs[1:] != rs[:-1]]
    )
    start_pos = lax.associative_scan(jnp.maximum, jnp.where(starts, pos, -1))
    local = pos - start_pos  # position within the window's run
    gw = local >> lgseg  # group index within the pool row

    # 3. groups per pool row = max over its windows; each row's group base =
    # groups of all rows before it — group ids stay ordered by pool row,
    # which the class-prefix budgets rely on. Computed WITHOUT the
    # per-row scatter-max (a serialized 131k-update scatter, 1.15 ms/iter
    # in the KITTI trace) or the base gather: a row's windows are adjacent
    # sort runs, so a SEGMENTED running max of (gw+1) over the sorted
    # sources (segment = pool row) reaches the row's group count at its
    # last element; an exclusive cumsum of those row-end values is exactly
    # the old cumsum(mq) base, already aligned per source.
    row_starts = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), qs[1:] != qs[:-1]]
    )
    flag = jnp.int32(1) << 30  # gw + 1 <= n < 2^30
    packed = jnp.where(row_starts, flag, 0) | (gw + 1)

    def _seg_max(a, b):
        vb = b & (flag - 1)
        va = a & (flag - 1)
        keep_a_flag = a & flag
        merged = keep_a_flag | jnp.maximum(va, vb)
        return jnp.where((b & flag) != 0, b, merged)

    row_run_max = lax.associative_scan(_seg_max, packed) & (flag - 1)
    row_ends = jnp.concatenate(
        [qs[1:] != qs[:-1], jnp.ones((1,), jnp.bool_)]
    )
    contrib = jnp.where(row_ends, row_run_max, 0)
    gid = (jnp.cumsum(contrib) - contrib) + gw
    slot = (f << lgseg) + (local & ((jnp.int32(1) << lgseg) - 1))
    dst = jnp.where(dead, s_pad, gid * GROUP + slot)
    overflow = jnp.sum(jnp.where(dst >= s_pad, 1, 0)) - jnp.sum(dead)

    src_sorted = source[order]
    lo = f << lws
    rmeta = pack_row_meta(
        jnp.ones_like(lo), lo, lo + (jnp.int32(1) << lws)
    ).astype(dtype)
    # Inverse-map + gather instead of a direct (N, 4) scatter: TPU scatter
    # serializes per row (~6.7 ms at this shape) while the s32 slot->source
    # scatter + one 16 B-row gather runs 2x faster (3.3 ms A/B on v5e,
    # docs/PERF.md round-4); unfilled slots gather row N = zeros =
    # invalid meta, bit-identical to the scattered zeros.
    slot2src = (
        jnp.full((s_pad,), n, jnp.int32)
        .at[dst]
        .set(jnp.arange(n, dtype=jnp.int32), mode="drop")
    )
    src5 = jnp.concatenate(
        [
            jnp.concatenate([src_sorted, rmeta[:, None]], axis=1),
            jnp.zeros((1, 4), dtype),
        ]
    )
    padded = src5[slot2src]
    step_rows = (
        jnp.full((ng,), n_rows, jnp.int32)
        .at[jnp.where(dead, ng, gid)]
        .set(qs, mode="drop")
    )
    return padded, step_rows, order, dst, overflow


def _xla_class_select(rows4, win_xyz, win_idx, *, k, kp, radius,
                      return_points):
    """Narrow-class select in plain XLA: distances + stable ``lax.top_k``.

    ``rows4``: (B*GROUP, 4) padded sources (xyz + packed row meta in lane
    3 — the same row format as the Pallas kernel's src block,
    fused_grid.pack_row_meta), ``win_xyz``: (B, 3, w) per-group candidate
    windows,
    ``win_idx``: (B, w). Returns the same (outd, outi, outp) contract as
    :func:`_run_select` at ``kp`` columns. ``lax.top_k`` on the negated
    distances breaks ties toward the lower lane — exactly the
    (distance, lane) order of the kernel's min-extraction — so results are
    bit-compatible; for w <= k it is a full stable sort and no selection
    happens at all.
    """
    from .fused_grid import _unpack_row_meta

    b, _, w = win_xyz.shape
    big = jnp.float32(3e38)
    src = rows4.reshape(b, GROUP, 4).astype(jnp.float32)
    wx = win_xyz.astype(jnp.float32)
    d = src[:, :, :3, None] - wx[:, None, :, :]  # (B, G, 3, w)
    d2 = jnp.sum(d * d, axis=2)  # (B, G, w)
    valid, lo, hi = _unpack_row_meta(src[:, :, 3:4])
    lane = jnp.arange(w, dtype=jnp.int32)
    seg = (lane >= lo) & (lane < hi)
    live = (
        (win_idx[:, None, :] >= 0)
        & valid
        & (d2 <= jnp.float32(radius) ** 2)
        & seg
    )
    d2 = jnp.where(live, d2, big)
    kk = min(k, w)
    negd, args = lax.top_k(-d2.reshape(b * GROUP, w), kk)
    outd = -negd
    found = outd < big
    gargs = args.reshape(b, GROUP, kk)
    outi = jnp.take_along_axis(
        jnp.broadcast_to(win_idx[:, None, :], (b, GROUP, w)), gargs, axis=2
    ).reshape(b * GROUP, kk)
    outi = jnp.where(found, outi, -1)
    pad = kp - kk
    outd = jnp.pad(outd, ((0, 0), (0, pad)), constant_values=big)
    outi = jnp.pad(outi, ((0, 0), (0, pad)), constant_values=-1)
    if not return_points:
        return outd, outi, None
    pts = jnp.take_along_axis(
        jnp.broadcast_to(wx[:, None, :, :], (b, GROUP, 3, w)),
        gargs[:, :, None, :],
        axis=3,
    ).reshape(b * GROUP, 3, kk)
    pts = jnp.where(found[:, None, :], pts, 0.0)
    pts = jnp.pad(pts, ((0, 0), (0, 0), (0, pad)))
    return outd, outi, tuple(pts[:, i, :] for i in range(3))


@partial(
    jax.jit,
    static_argnames=(
        "k", "radius", "class_widths", "class_ends", "class_budgets",
        "budget_rows", "interpret", "return_points", "dyn_rounds",
        "select_max_w", "select_impl",
    ),
)
def fused_pool_search(
    source,
    source_valid,
    pool_xyz,
    pool_idx,
    width_lut,
    union_lut,
    lut_d,
    origin_d,
    dims_d,
    *,
    k: int,
    radius: float,
    class_widths: tuple,
    class_ends: tuple,
    class_budgets: tuple,
    budget_rows: int,
    interpret: bool = False,
    return_points: bool = False,
    dyn_rounds: bool = False,
    select_max_w: int | None = None,
    select_impl: str = "loop",
):
    """Radius-capped KNN via width-class pools + the Pallas select kernel.

    Same contract as fused_grid_search: returns (Correspondences, overflow
    [, points]); overflow > 0 when either the row budget or a class-prefix
    budget was exceeded — the caller redoes the iteration on an XLA engine.
    ``class_ends`` / ``width_lut`` / ``union_lut`` live in the POOL-ROW
    numbering (segment-packed rows hold several windows — PoolPrepack);
    ``lut_d`` carries the packed (pool row, segment meta) grouping keys.
    ``select_max_w`` is the narrow-class cutoff frozen at prepack-build time
    (PoolPrepack.select_max_w); None resolves it from the current default
    backend (direct/legacy calls only).

    ``select_impl`` routes the kernel classes: "loop" (default — the
    min-extraction kernel) or "bitonic" (ops/select_bitonic.py — the
    partial-sort A/B candidate; only valid for k <= 32 and pow2 class
    widths, which every TPU plan satisfies). Results are bit-identical
    between the two (tests/test_select_bitonic.py).
    """
    smw = _select_max_w() if select_max_w is None else select_max_w
    n = source.shape[0]
    dtype = source.dtype
    n_rows = width_lut.shape[0] - 1
    # Rows padded to the LARGEST per-class block (narrow kernel classes run
    # 32-group blocks — half the per-block fixed cost of the dominant pass;
    # wide classes keep 16 to stay inside the VMEM stack budget).
    s_pad = round_up(budget_rows, 2 * BLOCK_GROUPS * GROUP)
    ng = s_pad // GROUP

    padded, step_rows, order, dst, overflow = _group_by_row(
        source, source_valid, lut_d, origin_d, dims_d, n_rows, radius, s_pad
    )

    kp = 32 if k <= 32 else round_up(k, 128)
    class_results = []
    prev_end = 0
    for c, (w_c, e_c, b_c) in enumerate(
        zip(class_widths, class_ends, class_budgets)
    ):
        # Narrow kernel classes (<= 256 lanes) run 32-group blocks: the
        # dominant KITTI pass is per-block-overhead-heavy (trace: 18.6
        # ms/iter over 5632 16-group blocks) and its VMEM footprint at
        # these widths is small. The counted extraction loop keeps the
        # live set bounded; the static unroll (dyn_rounds=False) keeps
        # more rounds live on the Mosaic stack and OOMs at 32 groups, so
        # it stays at 16.
        bg = (
            _narrow_block_groups()
            if dyn_rounds and smw < w_c <= 256
            else BLOCK_GROUPS
        )
        if ng % bg:
            # s_pad only guarantees ng is a multiple of 2*BLOCK_GROUPS; an
            # env-overridden block size that doesn't divide ng would break
            # the per-block reshape when b_c clamps to ng.
            bg = 2 * BLOCK_GROUPS
        # The LAST class always covers every group, including when the
        # caller raised budget_rows above the plan's estimate (the plan's
        # last budget is its own ng; trusting it here would silently skip
        # the extra groups and the coverage flag below would fire).
        if c == len(class_widths) - 1:
            b_c = ng
        b_c = min(round_up(b_c, bg), ng)
        n_c = e_c - prev_end
        rows_c = step_rows[:b_c]
        in_class = (rows_c >= prev_end) & (rows_c < e_c)
        local = jnp.where(in_class, rows_c - prev_end, n_c)
        win_xyz = pool_xyz[c][local]
        win_idx = pool_idx[c][local]
        if w_c <= smw:
            res = _xla_class_select(
                padded[: b_c * GROUP], win_xyz, win_idx,
                k=k, kp=kp, radius=radius, return_points=return_points,
            )
        else:
            w_blk = jnp.max(
                jnp.where(in_class, width_lut[rows_c], 0).reshape(
                    b_c // bg, bg
                ),
                axis=1,
            )
            u_blk = jnp.max(
                jnp.where(in_class, union_lut[rows_c], 0).reshape(
                    b_c // bg, bg
                ),
                axis=1,
            )
            if (
                select_impl == "bitonic"
                and k <= 32
                and w_c & (w_c - 1) == 0
            ):
                from .select_bitonic import run_select_bitonic

                res = run_select_bitonic(
                    padded[: b_c * GROUP], win_xyz, win_idx, w_blk, u_blk,
                    k=k, n_lanes=w_c, radius=radius,
                    block_groups=bg, interpret=interpret,
                    return_points=return_points,
                )
            else:
                res = _run_select(
                    padded[: b_c * GROUP], win_xyz, win_idx, w_blk, u_blk,
                    k=k, n_lanes=w_c, radius=radius, interpret=interpret,
                    return_points=return_points, dyn_rounds=dyn_rounds,
                    block_groups=bg,
                )
        class_results.append((b_c, in_class, res))
        # Coverage: groups are sorted by row (descending width), so any
        # class-<=c window past this class's budget means a missed group.
        if b_c < ng:
            overflow += jnp.where(step_rows[b_c] < e_c, 1, 0)
        prev_end = e_c

    # Combine the per-class results. The LAST class always spans the full
    # row budget (b_c forced to ng above) and its kernel emits exactly the
    # empty-slot values (d2=big, idx=-1, zero points) at rows outside its
    # own in_class mask (dummy windows find nothing) — so it IS the
    # initialized output buffer, for free. Only the earlier classes (with
    # strictly smaller row prefixes) overlay their disjoint rows; the
    # previous accumulator formulation paid a full (s_pad, kp) select +
    # dynamic-update-slice per PLANE for the biggest class every iteration
    # (~the single largest glue fusion in the KITTI trace).
    b_last, _, res_last = class_results[-1]
    assert b_last * GROUP == s_pad
    outd, outi = res_last[0], res_last[1]
    outp = res_last[2] if return_points else None
    # Classes are row-disjoint and every kernel emits exactly (big, -1, 0)
    # at rows outside its own class, so the overlay needs no mask at all:
    # at each row exactly one operand is real and the other is the empty
    # value — elementwise min / max / add combine them (slots beyond a
    # row's found count are empty in BOTH operands and stay empty).
    for b_c, _in_class, res in class_results[:-1]:
        n_r = b_c * GROUP
        outd = outd.at[:n_r].set(jnp.minimum(outd[:n_r], res[0]))
        outi = outi.at[:n_r].set(jnp.maximum(outi[:n_r], res[1]))
        if return_points:
            outp = tuple(
                o.at[:n_r].set(o[:n_r] + r) for o, r in zip(outp, res[2])
            )

    corr, pts = _unsort_results(
        outd, outi, outp, order, dst, k=k, n=n, dtype=dtype
    )
    if return_points:
        return corr, overflow, pts
    return corr, overflow
