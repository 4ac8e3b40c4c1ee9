"""Selection correctness at LiDAR coordinate magnitudes.

The matmul-expansion distance (||s||^2 + ||t||^2 - 2 s.t) loses ~eps*|coord|^2
to f32 cancellation: at +-75 m scene scale that's ~1e-3 m^2 — larger than
millimeter-scale distance gaps — so an uncentered expansion SELECTS wrong
neighbors (not just reports noisy values). Regression for the fix that
centers both clouds on the target bbox midpoint and re-sorts by exact
distances (ops/neighbors.py), and for the exact-distance overflow merge
(ops/grid.py merge_overflow).
"""
import jax.numpy as jnp
import numpy as np

from probabilistic_point_clouds_registration_tpu.core.types import pad_cloud, valid_mask
from probabilistic_point_clouds_registration_tpu.ops.grid import (
    build_grid,
    grid_search,
)
from probabilistic_point_clouds_registration_tpu.ops.neighbors import (
    nearest_neighbor,
    radius_search,
)

K = 8
RADIUS = 0.5


def _far_cluster_pair(n=1024, seed=0, offset=120.0):
    """Tight clusters (mm-scale gaps) far from the origin."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-5.0, 5.0, size=(24, 3)) + offset
    tgt = (
        centers[rng.integers(0, 24, n)]
        + rng.normal(scale=0.05, size=(n, 3))
    ).astype(np.float32)
    src = (tgt + rng.normal(scale=0.02, size=(n, 3))).astype(np.float32)
    return src, tgt


def _oracle(src, tgt, k, radius):
    d2 = ((src[:, None, :].astype(np.float64) - tgt[None].astype(np.float64)) ** 2).sum(-1)
    # f32-exact distances, matching the engines' gathered-diff arithmetic
    d2f = ((src[:, None, :] - tgt[None]) ** 2).sum(-1).astype(np.float32)
    order = np.argsort(d2, axis=1)[:, :k]
    dd = np.take_along_axis(d2f, order, axis=1)
    mask = dd <= np.float32(radius) ** 2
    return order, dd, mask


def test_brute_engine_large_coords_selection():
    src, tgt = _far_cluster_pair()
    src_p, n_src = pad_cloud(src, 128, pad_value=0.0)
    tgt_p, n_tgt = pad_cloud(tgt, 128, pad_value=0.0)
    corr = radius_search(
        jnp.asarray(src_p), jnp.asarray(tgt_p), k=K, radius=RADIUS,
        source_valid=valid_mask(src_p.shape[0], n_src),
        target_valid=valid_mask(tgt_p.shape[0], n_tgt),
    )
    oi, od, om = _oracle(src, tgt, K, RADIUS)
    got_i = np.asarray(corr.indices)[:n_src]
    got_m = np.asarray(corr.mask)[:n_src]
    np.testing.assert_array_equal(got_m, om)
    # Allow k-th-boundary swaps within the residual conditioning band
    # (eps * centered-extent^2 ~ 2e-5 here — the documented bound after
    # centering; WITHOUT centering the error is ~1e-2 and thousands of rows
    # select wrong neighbors).
    d_sel = np.take_along_axis(
        ((src[:, None] - tgt[None]) ** 2).sum(-1).astype(np.float32),
        got_i, axis=1,
    )
    np.testing.assert_allclose(d_sel[om], od[om], rtol=0, atol=5e-5)
    exact_rows = (d_sel == od) | ~om
    assert exact_rows.all(axis=1).mean() > 0.995


def test_overflow_merge_large_coords():
    """A hot cell (forcing overflow capacity) far from the origin: the merge
    must still produce the true k nearest."""
    rng = np.random.default_rng(3)
    base = np.array([110.0, -95.0, 40.0], np.float32)
    hot = base + rng.normal(scale=0.1, size=(600, 3)).astype(np.float32)
    sheet = (
        np.stack(
            [rng.uniform(100, 130, 2000), rng.uniform(-110, -80, 2000),
             rng.normal(40, 0.3, 2000)], axis=1
        )
    ).astype(np.float32)
    tgt = np.concatenate([hot, sheet]).astype(np.float32)
    src = (tgt[rng.permutation(len(tgt))[:1200]]
           + rng.normal(scale=0.03, size=(1200, 3)).astype(np.float32))
    src = src.astype(np.float32)

    src_p, n_src = pad_cloud(src, 128, pad_value=0.0)
    tgt_p, n_tgt = pad_cloud(tgt, 128, pad_value=0.0)
    grid = build_grid(tgt_p, RADIUS, num_valid=n_tgt, max_overflow=256)
    assert grid is not None and grid.overflow_pts is not None
    corr = grid_search(
        grid, jnp.asarray(src_p, jnp.float32), k=K, radius=RADIUS,
        source_valid=valid_mask(src_p.shape[0], n_src),
    )
    oi, od, om = _oracle(src, tgt, K, RADIUS)
    got_i = np.asarray(corr.indices)[:n_src]
    got_d = np.asarray(corr.sq_dists)[:n_src]
    got_m = np.asarray(corr.mask)[:n_src]
    np.testing.assert_array_equal(got_m, om)
    np.testing.assert_allclose(got_d[om], od[om], rtol=3e-7, atol=1e-9)


def test_nearest_neighbor_large_coords():
    src, tgt = _far_cluster_pair(seed=5)
    idx, sq, found = nearest_neighbor(jnp.asarray(src), jnp.asarray(tgt))
    d2 = ((src[:, None, :].astype(np.float64) - tgt[None].astype(np.float64)) ** 2).sum(-1)
    want = d2.min(axis=1)
    assert bool(np.asarray(found).all())
    # Same residual conditioning band as above: selection can pick a
    # neighbor within eps*extent^2 of the true nearest.
    np.testing.assert_allclose(np.asarray(sq), want, rtol=0, atol=5e-5)
