"""Bitonic partial-sort select kernel: bit-parity with the extraction loop.

The bitonic kernel (ops/select_bitonic.py) must reproduce the min-extraction
kernel's outputs EXACTLY — same (d2, lane)-lex slot order, same empty-slot
values, same segment-mask semantics — so routing between them is purely a
performance decision (docs/PERF.md round-5 A/B).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from probabilistic_point_clouds_registration_tpu.ops.fused_grid import (
    GROUP,
    _BIG,
    _run_select,
    pack_row_meta,
)
from probabilistic_point_clouds_registration_tpu.ops.select_bitonic import (
    run_select_bitonic,
)


def _block_fixture(seed, *, n_lanes, ng, bg, radius, with_segments,
                   with_ties):
    """Synthesize per-group candidate windows + padded source rows in the
    exact layout _run_select consumes (width-sorted, dead lanes at _BIG)."""
    rng = np.random.default_rng(seed)
    bs = ng * GROUP
    win_xyz = np.full((ng, 3, n_lanes), _BIG, np.float32)
    win_idx = np.full((ng, n_lanes), -1, np.int32)
    unions = np.zeros(ng, np.int64)
    for g in range(ng):
        u = int(rng.integers(0, n_lanes + 1))
        unions[g] = u
        pts = rng.uniform(-1, 1, size=(u, 3)).astype(np.float32)
        if with_ties and u > 4:
            # Exact duplicate coordinates: equal d2 for every source, so
            # the (d2, lane) tie order is exercised for real.
            pts[1::3] = pts[0]
        win_xyz[g, :, :u] = pts.T
        win_idx[g, :u] = rng.permutation(np.arange(10_000, 10_000 + u))[:u]

    src = rng.uniform(-1, 1, size=(bs, 3)).astype(np.float32)
    valid = (rng.random(bs) > 0.1).astype(np.int32)
    lo = np.zeros(bs, np.int64)
    hi = np.full(bs, n_lanes, np.int64)
    if with_segments:
        # A third of the rows get a 64-lane segment at a random offset
        # (multiple of META_UNIT=16 via 64-alignment).
        segrows = rng.random(bs) < 0.33
        offs = rng.integers(0, max(n_lanes // 64, 1), size=bs) * 64
        lo = np.where(segrows, offs, lo)
        hi = np.where(segrows, offs + 64, hi)
    meta = np.asarray(pack_row_meta(valid, lo, hi), np.float32)
    padded = np.concatenate([src, meta[:, None]], axis=1)

    # Per-block width/union bounds exactly as the pool search computes them
    # (max over the block, width in 128-lane granularity, 0 = dead block).
    w_rows = np.minimum(
        (np.ceil(np.maximum(unions, 1) / 128.0) * 128), n_lanes
    ).astype(np.int32)
    w_rows[unions == 0] = 0
    w_blk = w_rows.reshape(ng // bg, bg).max(axis=1)
    u_blk = unions.astype(np.int32).reshape(ng // bg, bg).max(axis=1)
    if ng // bg > 1:
        w_blk[-1] = 0  # one all-dead block exercises the dead branch
        u_blk[-1] = 0
    return (
        jnp.asarray(padded), jnp.asarray(win_xyz), jnp.asarray(win_idx),
        jnp.asarray(w_blk), jnp.asarray(u_blk),
    )


@pytest.mark.parametrize("n_lanes", [128, 512])
@pytest.mark.parametrize("with_segments", [False, True])
@pytest.mark.parametrize("k", [20, 32])
def test_bitonic_matches_extraction_loop(n_lanes, with_segments, k):
    bg = 2
    ng = 8
    radius = 0.9
    padded, win_xyz, win_idx, w_blk, u_blk = _block_fixture(
        seed=n_lanes + k, n_lanes=n_lanes, ng=ng, bg=bg, radius=radius,
        with_segments=with_segments, with_ties=True,
    )
    kw = dict(k=k, n_lanes=n_lanes, radius=radius, block_groups=bg,
              interpret=True, return_points=True)
    d_ref, i_ref, p_ref = _run_select(
        padded, win_xyz, win_idx, w_blk, u_blk, **kw
    )
    d_bit, i_bit, p_bit = run_select_bitonic(
        padded, win_xyz, win_idx, w_blk, u_blk, **kw
    )
    np.testing.assert_array_equal(np.asarray(d_ref), np.asarray(d_bit))
    np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_bit))
    for a, b in zip(p_ref, p_bit):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bitonic_routes_through_pool_search():
    """select_impl="bitonic" through the full pooled engine must reproduce
    the default engine's correspondences bit-for-bit."""
    from probabilistic_point_clouds_registration_tpu.core.types import (
        pad_cloud,
    )
    from probabilistic_point_clouds_registration_tpu.ops import (
        fused_pool as fp,
    )
    from probabilistic_point_clouds_registration_tpu.ops.grid import (
        build_grid_host,
    )

    rng = np.random.default_rng(3)
    tgt = rng.uniform(0, 4, size=(3000, 3))
    src = tgt + np.array([0.05, -0.03, 0.01])
    k, radius = 10, 0.25
    tg, n_tgt = pad_cloud(tgt.astype(np.float32), 256, pad_value=0.0)
    fs, n_src = pad_cloud(src.astype(np.float32), 256, pad_value=0.0)
    gh = build_grid_host(tg, radius, num_valid=n_tgt)
    # select_max_w=0 plans in the TPU style (every class runs the kernel).
    pre = fp.build_pool_prepack(gh, tg, k=k, select_max_w=0)
    assert pre is not None
    # Budget lifted well past the plan's target-occupancy estimate: the
    # uniform random fixture moves sources into shell cells the estimate
    # prices at zero (the product lifts to measured demand the same way).
    from probabilistic_point_clouds_registration_tpu.core.types import (
        round_up,
    )
    from probabilistic_point_clouds_registration_tpu.ops.fused_grid import (
        BLOCK_GROUPS,
        GROUP,
    )

    budget = round_up(
        max(pre.budget_rows, 8 * fs.shape[0]), 2 * BLOCK_GROUPS * GROUP
    )
    sv = jnp.asarray(np.arange(fs.shape[0]) < n_src)
    outs = {}
    for impl in ("loop", "bitonic"):
        corr, overflow, pts = fp.fused_pool_search(
            jnp.asarray(fs), sv, pre.pool_xyz, pre.pool_idx, pre.width_lut,
            pre.union_lut, pre.lut_d, pre.origin_d, pre.dims_d,
            k=k, radius=radius, class_widths=pre.class_widths,
            class_ends=pre.class_ends, class_budgets=pre.class_budgets,
            budget_rows=budget, interpret=True,
            return_points=True, select_max_w=0, select_impl=impl,
        )
        assert int(overflow) == 0
        outs[impl] = (corr, pts)
    a, b = outs["loop"], outs["bitonic"]
    np.testing.assert_array_equal(np.asarray(a[0].indices),
                                  np.asarray(b[0].indices))
    np.testing.assert_array_equal(np.asarray(a[0].mask),
                                  np.asarray(b[0].mask))
    np.testing.assert_array_equal(np.asarray(a[0].sq_dists),
                                  np.asarray(b[0].sq_dists))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
