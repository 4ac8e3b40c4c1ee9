"""Tests for the evaluation-metric toolkit (utilities.hpp parity)."""
import numpy as np

from probabilistic_point_clouds_registration_tpu.utils import eval as ev


def test_calculate_mse_is_mean_euclidean_distance():
    a = np.zeros((4, 3))
    b = np.tile([3.0, 4.0, 0.0], (4, 1))  # distance 5 each
    assert ev.calculate_mse(a, b) == 5.0  # NOT squared (utilities.hpp:16-26)


def test_average_closest_distance_uses_squared_dists():
    a = np.array([[0.0, 0, 0], [10.0, 0, 0]])
    b = np.array([[1.0, 0, 0], [10.0, 2, 0]])
    # NN squared distances: 1 and 4 -> mean 2.5 (FLANN returns squared L2).
    assert ev.average_closest_distance(a, b) == 2.5
    assert ev.sum_squared_error(a, b) == 5.0


def test_reference_median_quirk():
    # Odd n: element (n+1)//2 (one past the true median), utilities.hpp:83-84.
    vals = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    assert ev._reference_median(vals) == 4.0
    # Even n: mean of elements n//2 and n//2+1, utilities.hpp:85-88.
    vals = np.array([1.0, 2.0, 3.0, 4.0])
    assert ev._reference_median(vals) == 3.5


def test_robust_sum_squared_error_sentinel():
    # Fewer than 10 surviving points returns DBL_MAX (utilities.hpp:96-98).
    a = np.random.default_rng(0).random((5, 3))
    out = ev.robust_sum_squared_error(a, a)
    assert out == np.finfo(np.float64).max


def test_robust_filters_keep_band():
    rng = np.random.default_rng(1)
    base = rng.random((50, 3))
    near = base + 0.01  # uniform small offsets
    val = ev.robust_sum_squared_error(near, base)
    assert 0 < val < np.finfo(np.float64).max
    avg = ev.robust_averaged_sum_squared_error(near, base)
    assert 0 < avg <= val


def test_median_distance_over_association_values():
    sq = np.array([[1.0, 9.0], [4.0, 16.0], [25.0, 0.0]])
    mask = np.array([[True, True], [True, True], [True, False]])
    # values {1,4,9,16,25}: reference-median -> element 3 (0-based) = 16.
    assert ev.median_distance(sq, mask) == 16.0


def test_ate_rmse():
    t1 = [np.eye(4) for _ in range(3)]
    t2 = []
    for d in (0.0, 3.0, 4.0):
        m = np.eye(4)
        m[0, 3] = d
        t2.append(m)
    assert np.isclose(ev.ate_rmse(t1, t2), np.sqrt((0 + 9 + 16) / 3))


def test_reference_median_small_inputs():
    """Reference's median is UB for n<=2 in C++; here it's clamped, not a crash."""
    from probabilistic_point_clouds_registration_tpu.utils.eval import (
        _reference_median,
    )
    import numpy as np

    assert _reference_median([5.0]) == 5.0
    assert _reference_median([1.0, 3.0]) == 3.0  # clamped upper index
    assert np.isnan(_reference_median([]))
    # n >= 3 keeps the reference's off-by-one behaviour.
    assert _reference_median([1.0, 2.0, 3.0]) == 3.0
    assert _reference_median([1.0, 2.0, 3.0, 4.0]) == 3.5
