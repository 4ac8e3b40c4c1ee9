"""Voxel-grid downsampling tests (PCL VoxelGrid semantics)."""
import numpy as np

from probabilistic_point_clouds_registration_tpu.ops.voxel import voxel_downsample


def test_centroid_per_voxel():
    pts = np.array(
        [
            [0.1, 0.1, 0.1],
            [0.3, 0.2, 0.4],  # same 1.0-leaf voxel as above
            [1.5, 0.0, 0.0],  # different voxel
        ]
    )
    out = voxel_downsample(pts, 1.0)
    assert out.shape == (2, 3)
    # Output ordered by ascending voxel index (x fastest): voxel (0,0,0) first.
    np.testing.assert_allclose(out[0], pts[:2].mean(axis=0))
    np.testing.assert_allclose(out[1], pts[2])


def test_nonpositive_leaf_is_identity():
    pts = np.random.default_rng(0).random((10, 3))
    out = voxel_downsample(pts, 0.0)
    np.testing.assert_array_equal(out, pts)
    out_neg = voxel_downsample(pts, -1.0)
    np.testing.assert_array_equal(out_neg, pts)


def test_negative_coordinates():
    pts = np.array([[-0.5, -0.5, -0.5], [-0.6, -0.4, -0.3], [0.5, 0.5, 0.5]])
    out = voxel_downsample(pts, 1.0)
    # floor(-0.5) = -1: both negative points share voxel (-1,-1,-1).
    assert out.shape == (2, 3)
    np.testing.assert_allclose(out[0], pts[:2].mean(axis=0))


def test_reduces_dense_cloud():
    rng = np.random.default_rng(1)
    pts = rng.random((5000, 3))  # unit cube
    out = voxel_downsample(pts, 0.25)
    assert out.shape[0] <= 4**3
    assert out.shape[0] > 0.9 * 4**3  # nearly all voxels occupied
    # All centroids inside the cube.
    assert out.min() >= 0 and out.max() <= 1


def test_empty_cloud():
    out = voxel_downsample(np.zeros((0, 3)), 1.0)
    assert out.shape == (0, 3)
