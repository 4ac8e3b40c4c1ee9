"""Tests for the tiled radius-bounded top-K correspondence search."""
import jax.numpy as jnp
import numpy as np

from probabilistic_point_clouds_registration_tpu.core.types import pad_cloud, valid_mask
from probabilistic_point_clouds_registration_tpu.ops.neighbors import (
    nearest_neighbor,
    radius_search,
    topk_neighbors,
)


def _brute_force_reference(source, target, k, radius):
    """Plain numpy radius-capped KNN, nearest-first — FLANN radiusSearch
    semantics (src/prob_point_cloud_registration.cc:72-81)."""
    out = []
    for s in source:
        d2 = np.sum((target - s) ** 2, axis=1)
        order = np.argsort(d2, kind="stable")
        sel = [j for j in order if d2[j] <= radius**2][:k]
        out.append([(j, d2[j]) for j in sel])
    return out


def test_matches_numpy_brute_force():
    rng = np.random.default_rng(0)
    source = rng.random((37, 3)) * 4
    target = rng.random((53, 3)) * 4
    k, radius = 5, 1.2

    corr = radius_search(
        jnp.asarray(source),
        jnp.asarray(target),
        k=k,
        radius=radius,
        source_valid=jnp.ones(37, bool),
        target_valid=jnp.ones(53, bool),
        source_tile=16,
        target_tile=16,
    )
    expected = _brute_force_reference(source, target, k, radius)
    idx, sq, mask = np.asarray(corr.indices), np.asarray(corr.sq_dists), np.asarray(corr.mask)
    for i, exp in enumerate(expected):
        assert mask[i].sum() == len(exp)
        for slot, (j, d2) in enumerate(exp):
            assert idx[i, slot] == j
            np.testing.assert_allclose(sq[i, slot], d2, rtol=1e-10)


def test_results_sorted_ascending():
    rng = np.random.default_rng(1)
    source = jnp.asarray(rng.random((20, 3)))
    target = jnp.asarray(rng.random((100, 3)))
    idx, sq, found = topk_neighbors(
        source,
        target,
        k=8,
        source_valid=jnp.ones(20, bool),
        target_valid=jnp.ones(100, bool),
        source_tile=8,
        target_tile=32,
    )
    sq = np.asarray(sq)
    found = np.asarray(found)
    for row_sq, row_found in zip(sq, found):
        vals = row_sq[row_found]
        assert np.all(np.diff(vals) >= 0)


def test_padding_and_masks_exclude_invalid_points():
    rng = np.random.default_rng(2)
    src_raw = rng.random((10, 3))
    tgt_raw = rng.random((13, 3))
    src, n_src = pad_cloud(src_raw, 16, pad_value=1e9)
    tgt, n_tgt = pad_cloud(tgt_raw, 16, pad_value=1e9)
    corr = radius_search(
        jnp.asarray(src),
        jnp.asarray(tgt),
        k=4,
        radius=10.0,
        source_valid=valid_mask(16, n_src),
        target_valid=valid_mask(16, n_tgt),
        source_tile=16,
        target_tile=16,
    )
    idx, mask = np.asarray(corr.indices), np.asarray(corr.mask)
    # Padded source rows produce no associations; indices never point at padding.
    assert not mask[n_src:].any()
    assert np.all(idx[mask] < n_tgt)


def test_more_neighbors_than_targets():
    source = jnp.zeros((3, 3))
    target = jnp.asarray(np.array([[0.0, 0, 0], [1, 0, 0]]))
    idx, sq, found = topk_neighbors(
        source,
        target,
        k=5,
        source_valid=jnp.ones(3, bool),
        target_valid=jnp.ones(2, bool),
        source_tile=8,
        target_tile=8,
    )
    found = np.asarray(found)
    assert found.sum(axis=1).tolist() == [2, 2, 2]


def test_nearest_neighbor_eval_primitive():
    rng = np.random.default_rng(3)
    a = rng.random((25, 3))
    b = rng.random((40, 3))
    idx, sq, found = nearest_neighbor(jnp.asarray(a), jnp.asarray(b))
    d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(idx), d2.argmin(axis=1))
    np.testing.assert_allclose(np.asarray(sq), d2.min(axis=1), rtol=1e-10)
    assert np.asarray(found).all()


def test_large_tiled_path_consistent_with_flat():
    rng = np.random.default_rng(4)
    source = jnp.asarray(rng.random((300, 3)) * 10)
    target = jnp.asarray(rng.random((500, 3)) * 10)
    kwargs = dict(
        k=10,
        source_valid=jnp.ones(300, bool),
        target_valid=jnp.ones(500, bool),
    )
    a = topk_neighbors(source, target, source_tile=300, target_tile=512, **kwargs)
    b = topk_neighbors(source, target, source_tile=64, target_tile=128, **kwargs)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]), rtol=1e-12)
