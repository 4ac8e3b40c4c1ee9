"""Golden-value tests for the EM E-step weight kernel.

The expected weights are the reference's golden vectors from
test/ProbabilisticWeightsTest.cc:35-66 (2x4 association, squared errors
{1,_,1,1; 1,4,9,16}, d=1, K=4) — row 0 uniform over its 3 neighbors, row 1
precomputed to 1e-6 for both the t-distribution (dof=5) and Gaussian models.
"""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from probabilistic_point_clouds_registration_tpu.ops.weights import update_weights


def _fixture():
    # Row 0 has 3 associations (cols 0, 2, 3), row 1 has 4 — slot-padded (N=2, K=4).
    sq_errors = jnp.array([[1.0, 1.0, 1.0, 0.0], [1.0, 4.0, 9.0, 16.0]])
    mask = jnp.array([[True, True, True, False], [True, True, True, True]])
    return sq_errors, mask


def test_t_distribution_golden():
    sq_errors, mask = _fixture()
    w = np.asarray(update_weights(sq_errors, mask, dof=5.0, dimension=1))
    expected = np.array(
        [
            [1 / 3, 1 / 3, 1 / 3, 0.0],
            [0.7151351, 0.1412613, 0.0241258, 0.0047656],
        ]
    )
    np.testing.assert_allclose(w, expected, atol=1e-6)


def test_gaussian_golden():
    sq_errors, mask = _fixture()
    w = np.asarray(update_weights(sq_errors, mask, dof=math.inf, dimension=1))
    expected = np.array(
        [
            [1 / 3, 1 / 3, 1 / 3, 0.0],
            [0.805153702921689, 0.179654074677018, 0.0147469044726408, 0.000445317928652638],
        ]
    )
    np.testing.assert_allclose(w, expected, atol=1e-6)


def test_empty_row_is_all_zero():
    sq_errors = jnp.array([[1.0, 2.0], [3.0, 4.0]])
    mask = jnp.array([[False, False], [True, False]])
    w = np.asarray(update_weights(sq_errors, mask, dof=5.0, dimension=3))
    assert np.all(w[0] == 0.0)
    assert w[1, 1] == 0.0
    # A lone association gets posterior 1 times the expected t-precision.
    assert w[1, 0] == pytest.approx((5 + 3) / (5 + 3.0))


def test_gaussian_row_sums_to_one():
    rng = np.random.default_rng(0)
    sq_errors = jnp.asarray(rng.random((16, 20)) * 10)
    mask = jnp.asarray(rng.random((16, 20)) > 0.3)
    w = np.asarray(update_weights(sq_errors, mask, dof=math.inf, dimension=3))
    sums = w.sum(axis=1)
    valid = np.asarray(mask).any(axis=1)
    np.testing.assert_allclose(sums[valid], 1.0, atol=1e-12)
    assert np.all(w[~np.asarray(mask)] == 0.0)


def test_dimension_3_production_path():
    # d=3 is the production dimension (DIMENSIONS macro,
    # prob_point_cloud_registration_iteration.hpp:17).
    sq_errors = jnp.array([[0.5, 1.5, 2.5, 0.0]])
    mask = jnp.array([[True, True, True, False]])
    w = np.asarray(update_weights(sq_errors, mask, dof=5.0, dimension=3))
    # Manual recomputation of the reference math.
    v, d = 5.0, 3
    e2 = np.array([0.5, 1.5, 2.5])
    log_norm = math.lgamma(v / 2) - math.lgamma((v + d) / 2) + (v / 2) * math.log(math.pi * v)
    lp = -(v + d) / 2 * np.log1p(e2 / v) - log_norm
    post = np.exp(lp - lp.max()) / np.exp(lp - lp.max()).sum()
    expected = post * (v + d) / (v + e2)
    np.testing.assert_allclose(w[0, :3], expected, rtol=1e-12)


def test_float32_matches_float64_within_tolerance():
    sq_errors64, mask = _fixture()
    w64 = np.asarray(update_weights(sq_errors64, mask, dof=5.0, dimension=1))
    w32 = np.asarray(
        update_weights(sq_errors64.astype(jnp.float32), mask, dof=5.0, dimension=1)
    )
    # XLA's f32 log1p/exp are ~1e-4-relative accurate; weights are soft EM
    # assignments so this is immaterial downstream. Exact 1e-6 parity with the
    # reference goldens is asserted in f64 above.
    np.testing.assert_allclose(w32, w64, atol=2e-4)
