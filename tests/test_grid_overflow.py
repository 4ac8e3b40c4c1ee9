"""Quantile-capacity + hot-cell-overflow grid: exact parity with brute force.

A single near-sensor LiDAR cell with hundreds of returns would force the
bucket capacity (and with it every source's candidate-window width) to the
hottest cell's occupancy; with ``max_overflow`` the capacity caps at a
quantile and the clipped points merge back through a streaming brute pass
(ops.grid.merge_overflow) — neighbor sets must stay identical."""
import jax.numpy as jnp
import numpy as np

from probabilistic_point_clouds_registration_tpu.core.types import pad_cloud, valid_mask
from probabilistic_point_clouds_registration_tpu.ops.grid import (
    build_grid,
    build_grid_host,
    grid_search,
)
from probabilistic_point_clouds_registration_tpu.ops.neighbors import radius_search

RADIUS, K = 0.1, 10


def _hotspot_pair(seed=0):
    """Cloud with one ~300-point hot cell plus a diffuse background."""
    rng = np.random.default_rng(seed)
    hot = rng.normal(scale=0.02, size=(300, 3)) + 0.55  # one dense blob
    bg = rng.uniform(0, 1.2, size=(3000, 3))
    tgt = np.concatenate([hot, bg]).astype(np.float32)
    src = (tgt + rng.normal(scale=0.01, size=tgt.shape)).astype(np.float32)
    return src, tgt


def _sets(idx, mask):
    return [set(r[m].tolist()) for r, m in zip(idx, mask)]


def test_overflow_capacity_shrinks_and_sets_match_brute():
    src, tgt = _hotspot_pair()
    src_p, n_src = pad_cloud(src, 128, 0.0)
    tgt_p, n_tgt = pad_cloud(tgt, 128, 0.0)
    sv = valid_mask(src_p.shape[0], n_src)
    tv = valid_mask(tgt_p.shape[0], n_tgt)
    fs32 = jnp.asarray(src_p, jnp.float32)
    tg32 = jnp.asarray(tgt_p, jnp.float32)

    g_full = build_grid_host(tgt_p, RADIUS, num_valid=n_tgt, max_overflow=0)
    g_ov = build_grid_host(tgt_p, RADIUS, num_valid=n_tgt, max_overflow=512)
    # Without the cap, the hot cell forces capacity 512 and the grid fails
    # its own 27*capacity < M profitability check; the overflow cap is what
    # makes a grid viable here at all.
    assert g_full is None
    assert g_ov is not None
    assert "overflow_pts" in g_ov
    n_over = int((g_ov["overflow_idx"] >= 0).sum())
    assert 0 < n_over <= 512
    # Partition: bucket slots + overflow together hold every target point.
    in_buckets = int((g_ov["bucket_idx"] >= 0).sum())
    assert in_buckets + n_over == n_tgt

    grid = build_grid(tgt_p, RADIUS, num_valid=n_tgt, max_overflow=512)
    grid = grid._replace(
        bucket_pts=jnp.asarray(grid.bucket_pts, jnp.float32),
        origin=jnp.asarray(grid.origin, jnp.float32),
        overflow_pts=jnp.asarray(grid.overflow_pts, jnp.float32),
    )
    got = grid_search(grid, fs32, k=K, radius=RADIUS, source_valid=sv)
    ref = radius_search(fs32, tg32, k=K, radius=RADIUS,
                        source_valid=sv, target_valid=tv)
    np.testing.assert_array_equal(
        np.asarray(got.mask)[:n_src], np.asarray(ref.mask)[:n_src]
    )
    # Set equality per row, modulo near-ties at the k-th slot: the brute
    # engine's matmul-expansion f32 arithmetic can swap candidates whose true
    # distances differ by ~1 ULP (the documented cross-engine tie class).
    got_sets = _sets(np.asarray(got.indices)[:n_src], np.asarray(got.mask)[:n_src])
    ref_sets = _sets(np.asarray(ref.indices)[:n_src], np.asarray(ref.mask)[:n_src])
    s32, t32 = np.asarray(fs32), np.asarray(tg32)
    for i, (a, b) in enumerate(zip(got_sets, ref_sets)):
        diff = a ^ b
        if not diff:
            continue
        d2 = np.array([((s32[i] - t32[j]) ** 2).sum() for j in diff])
        # Expansion-form error is absolute at the scale of ||x||^2 * eps_f32
        # (~1e-7 here), not relative to the (tiny) distance itself.
        assert d2.max() - d2.min() <= 1e-6, (i, sorted(diff), d2)


def test_overflow_through_full_registration():
    """End-to-end: a hotspot pair registers identically with and without the
    overflow capacity cap (engine-internal change only)."""
    from probabilistic_point_clouds_registration_tpu.core.params import (
        RegistrationParams,
    )
    from probabilistic_point_clouds_registration_tpu.models.registration import (
        register_pair,
    )

    src, tgt = _hotspot_pair()
    src = src + np.array([0.02, -0.01, 0.015], np.float32)
    finals = {}
    for mo in (0, 512):
        p = RegistrationParams(
            max_neighbours=8, radius=RADIUS, n_iter=5, cost_drop_thresh=-1.0,
            search_impl="grid", grid_max_overflow=mo, outer_chunk=2,
        )
        T, reg = register_pair(src, tgt, p)
        finals[mo] = T
        if mo:
            assert reg._grid.overflow_pts is not None
    np.testing.assert_allclose(finals[0], finals[512], atol=1e-5)
