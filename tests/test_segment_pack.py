"""Segment-packed pool rows: planning + grouping + kernel-path parity.

The pooled engine packs F narrow windows per pool row (segment bands,
ops/fused_pool._plan_segment_bands) so sparse scans don't pay 8 padded
source rows per low-occupancy cell. These tests pin:
  * the band chooser's row-count math,
  * slot-for-slot parity of the SEGMENTED select-kernel path (select_max_w
    forced to 0 so every class runs the Pallas kernel, interpret mode on
    CPU — the exact TPU configuration) against the XLA grid engine,
  * exact-distance tie ordering across a segment boundary.
"""
import jax.numpy as jnp
import numpy as np

from probabilistic_point_clouds_registration_tpu.core.types import (
    pad_cloud,
    round_up,
    valid_mask,
)
from probabilistic_point_clouds_registration_tpu.ops import fused_pool as fp
from probabilistic_point_clouds_registration_tpu.ops.grid import (
    build_grid,
    build_grid_host,
    grid_search,
)


def test_rows_for_math():
    # Packing at F=4 (2 slots per window per group): counts (3, 1, 2, 0)
    # -> max ceil(c/2) = 2 groups -> 16 rows; F=1 -> ceil(c/8)*8 each = 24.
    cnt = np.array([3, 1, 2, 0])
    assert fp._rows_for(cnt, 4) == 16
    assert fp._rows_for(cnt, 1) == 24
    # Unbalanced counts favor small F: one hot window dominates the row.
    hot = np.array([16, 0, 0, 0])
    assert fp._rows_for(hot, 4) == 8 * 8  # ceil(16/2) = 8 groups
    assert fp._rows_for(hot, 1) == 16  # ceil(16/8)*8


def test_plan_segment_bands_chooser():
    # 8 windows, all unions <= 16 (F_max = 8 at class width 128), balanced
    # occupancy ~4 -> F=2 (gseg 4: 1 group/pair) beats F=8 (gseg 1: 4-5
    # groups of 8 rows per octet).
    union = np.full(8, 12)
    center = np.full(8, 4)
    bands = fp._plan_segment_bands(union, center, [128], [8])
    assert len(bands) == 1 and len(bands[0]) == 1
    wa, f, nb = bands[0][0]
    assert nb == 8 and f >= 2 and wa <= 128 // f
    # Very sparse occupancy (1 source/cell): F=8 packs perfectly.
    bands = fp._plan_segment_bands(union, np.ones(8), [128], [8])
    assert bands[0][0][1] == 8
    # Wide windows can't pack: F_max = 1.
    bands = fp._plan_segment_bands(
        np.array([120, 100]), np.array([60, 50]), [128], [2]
    )
    assert all(b[1] == 1 for b in bands[0])


def _sparse_pair(n=2500, seed=2):
    rng = np.random.default_rng(seed)
    tgt = rng.uniform(0, 25, size=(n, 3))
    tgt[:, 2] = rng.normal(scale=0.3, size=n)
    src = tgt + np.array([0.2, 0.05, 0.01])
    return src.astype(np.float32), tgt.astype(np.float32)


def test_segmented_kernel_path_matches_grid_engine():
    """Force every class through the Pallas kernel (select_max_w=0 — the
    TPU configuration) on a plan with segment bands; slot-for-slot parity
    vs the XLA grid engine."""
    k, radius = 8, 0.5
    src, tgt = _sparse_pair()
    src_p, n_src = pad_cloud(src, 128, pad_value=0.0)
    tgt_p, n_tgt = pad_cloud(tgt, 128, pad_value=0.0)
    gh = build_grid_host(tgt_p, radius, num_valid=n_tgt, max_overflow=64)
    plan = fp.plan_pool_host(gh, tgt_p, select_max_w=0)  # TPU-style plan
    assert plan is not None
    assert any(
        f > 1 for bands in plan["bands"] for _, f, _ in bands
    ), "fixture must produce segment bands"
    pre = fp.build_pool_prepack(gh, tgt_p, plan=plan, k=k, select_max_w=0)
    sv = valid_mask(src_p.shape[0], n_src)
    # 8x source rows: the drifted fixture scatters sources away from the
    # aligned packing the plan predicted (production escalates on overflow).
    budget = round_up(max(pre.budget_rows, 8 * src_p.shape[0]), 512)
    got, overflow, pts = fp.fused_pool_search(
        jnp.asarray(src_p, jnp.float32), sv,
        pre.pool_xyz, pre.pool_idx, pre.width_lut, pre.union_lut,
        pre.lut_d, pre.origin_d, pre.dims_d,
        k=k, radius=radius, class_widths=pre.class_widths,
        class_ends=pre.class_ends, class_budgets=pre.class_budgets,
        budget_rows=budget, interpret=True, return_points=True,
        dyn_rounds=True, select_max_w=0,
    )
    assert int(overflow) == 0

    grid = build_grid(tgt_p, radius, num_valid=n_tgt, max_overflow=64)
    grid = grid._replace(
        bucket_pts=jnp.asarray(grid.bucket_pts, jnp.float32),
        origin=jnp.asarray(grid.origin, jnp.float32),
        overflow_pts=None if grid.overflow_pts is None
        else jnp.asarray(grid.overflow_pts, jnp.float32),
    )
    ref = grid_search(
        grid, jnp.asarray(src_p, jnp.float32), k=k, radius=radius,
        source_valid=sv,
    )
    m = np.asarray(ref.mask)[:n_src]
    np.testing.assert_array_equal(np.asarray(got.mask)[:n_src], m)
    np.testing.assert_array_equal(
        np.asarray(got.indices)[:n_src][m], np.asarray(ref.indices)[:n_src][m]
    )
    gathered = np.asarray(tgt_p)[np.asarray(got.indices)[:n_src]]
    np.testing.assert_array_equal(
        np.asarray(pts)[:n_src][m], gathered.astype(np.float32)[m]
    )


def test_segment_tie_order_within_window():
    """Exact-distance ties inside one segment must resolve by candidate
    (lane) order, and candidates of OTHER segments in the same pool row
    must never leak in. Built by hand: two windows packed at F=2, the
    second window containing candidates equidistant to the first window's
    source."""
    from probabilistic_point_clouds_registration_tpu.ops.fused_grid import (
        GROUP,
        _run_select,
        pack_row_meta,
    )

    w_c = 256  # pool-row lane width, two 128-lane segments
    bg = 16
    win_xyz = np.full((bg, 3, w_c), 1e30, np.float32)
    win_idx = np.full((bg, w_c), -1, np.int32)
    # Segment 0 (lanes 0..127): candidates at distance 1 and an exact tie
    # pair at distance 2 (lanes 3 and 5 -> lane order decides).
    win_xyz[0, :, 0] = [1.0, 0.0, 0.0]
    win_xyz[0, :, 3] = [0.0, 2.0, 0.0]
    win_xyz[0, :, 5] = [2.0, 0.0, 0.0]  # same |.|^2 = 4 as lane 3
    win_idx[0, [0, 3, 5]] = [10, 11, 12]
    # Segment 1 (lanes 128..255): a CLOSER candidate (distance 0) that
    # belongs to the other window and must not be selected by rows of
    # segment 0.
    win_xyz[0, :, 128] = [0.0, 0.0, 0.0]
    win_idx[0, 128] = 99

    rows4 = np.zeros((bg * GROUP, 4), np.float32)
    # Row 0: source at origin, segment 0 (lo=0, hi=128).
    rows4[0, :3] = 0.0
    rows4[0, 3] = float(pack_row_meta(1, 0, 128))
    # Row 4 (slot 4 = segment 1 at gseg=4): same source, lanes 128..256.
    rows4[4, :3] = 0.0
    rows4[4, 3] = float(pack_row_meta(1, 128, 256))

    w_blk = np.full((1,), w_c, np.int32)
    u_blk = np.full((1,), 4, np.int32)
    outd, outi, _ = _run_select(
        jnp.asarray(rows4), jnp.asarray(win_xyz), jnp.asarray(win_idx),
        jnp.asarray(w_blk), jnp.asarray(u_blk),
        k=4, n_lanes=w_c, radius=3.0, interpret=True, return_points=False,
        dyn_rounds=True,
    )
    outi = np.asarray(outi)
    outd = np.asarray(outd)
    # Segment-0 row: ascending distance, tie (lanes 3 vs 5) -> lower lane
    # first; the segment-1 candidate (dist 0, idx 99) never appears.
    assert outi[0, :3].tolist() == [10, 11, 12]
    np.testing.assert_allclose(outd[0, :3], [1.0, 4.0, 4.0])
    assert 99 not in outi[0].tolist()
    # Segment-1 row: only its own candidate.
    assert outi[4, 0] == 99 and outd[4, 0] == 0.0
    assert (outi[4, 1:] == -1).all()
