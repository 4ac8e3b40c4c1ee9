"""Standalone Pallas row-top-k kernel edge cases (interpret mode)."""
import numpy as np
import jax.numpy as jnp

from probabilistic_point_clouds_registration_tpu.ops.select_pallas import (
    pallas_row_topk,
)


def _ref(x, k):
    neg, idx = np.sort(x, axis=1)[:, :k], np.argsort(x, axis=1, kind="stable")[:, :k]
    return neg, idx


def test_matches_sort_random():
    rng = np.random.default_rng(0)
    x = rng.random((37, 300)).astype(np.float32)
    v, i = pallas_row_topk(jnp.asarray(x), k=7, interpret=True)
    rv, ri = _ref(x, 7)
    np.testing.assert_allclose(np.asarray(v), rv, atol=0)
    np.testing.assert_array_equal(np.asarray(i), ri)


def test_rows_with_fewer_than_k_finite():
    x = np.full((5, 64), np.inf, np.float32)
    x[0, :3] = [3.0, 1.0, 2.0]
    x[2, 10] = 0.5
    v, i = pallas_row_topk(jnp.asarray(x), k=4, interpret=True)
    v = np.asarray(v); i = np.asarray(i)
    np.testing.assert_allclose(v[0, :3], [1.0, 2.0, 3.0])
    assert np.all(np.isinf(v[0, 3:]))
    np.testing.assert_array_equal(i[0, :3], [1, 2, 0])
    assert np.isinf(v[1]).all()
    np.testing.assert_allclose(v[2, 0], 0.5)
    assert i[2, 0] == 10


def test_ties_pick_lowest_index():
    x = np.ones((3, 50), np.float32)
    v, i = pallas_row_topk(jnp.asarray(x), k=3, interpret=True)
    np.testing.assert_array_equal(np.asarray(i), [[0, 1, 2]] * 3)
