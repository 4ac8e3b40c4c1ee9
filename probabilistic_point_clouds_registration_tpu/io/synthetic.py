"""Synthetic point-cloud generators for tests and benchmarks."""
from __future__ import annotations

import numpy as np


def wave_grid(width: int = 30, height: int = 50, spacing: float = 0.5, dtype=np.float64):
    """The smooth z = sin(x) + cos(y) surface grid.

    Same fixture as the reference's solver integration tests
    (test/PointCloudRegistrationTest.cc:12-28): ``width`` x ``height`` points
    with the given spacing.
    """
    xs = np.arange(width, dtype=dtype) * spacing
    ys = np.arange(height, dtype=dtype) * spacing
    x, y = np.meshgrid(xs, ys, indexing="ij")
    pts = np.stack([x, y, np.sin(x) + np.cos(y)], axis=-1).reshape(-1, 3)
    return np.ascontiguousarray(pts, dtype=dtype)


def random_cloud(n: int, *, scale: float = 10.0, seed: int = 0, dtype=np.float64):
    """Uniform random cloud in a cube of side ``scale``."""
    rng = np.random.default_rng(seed)
    return (rng.random((n, 3)) * scale).astype(dtype)


def bunny_like(n: int = 35_000, *, seed: int = 0, dtype=np.float64):
    """A bunny-scale benchmark stand-in: noisy multi-lobe surface, ~n points.

    The repo ships no datasets (reference likewise ships none); this produces
    a surface-like cloud with the Stanford-Bunny point count used by
    BASELINE.json config #1.
    """
    rng = np.random.default_rng(seed)
    theta = rng.random(n) * 2 * np.pi
    phi = np.arccos(2 * rng.random(n) - 1)
    r = 1.0 + 0.25 * np.sin(4 * theta) * np.sin(3 * phi) + 0.02 * rng.standard_normal(n)
    pts = np.stack(
        [r * np.sin(phi) * np.cos(theta), r * np.sin(phi) * np.sin(theta), r * np.cos(phi)],
        axis=-1,
    )
    return pts.astype(dtype)


def transform_cloud(points: np.ndarray, matrix: np.ndarray) -> np.ndarray:
    """Apply a 4x4 homogeneous transform to an (n, 3) numpy cloud."""
    r = matrix[:3, :3]
    t = matrix[:3, 3]
    return points @ r.T + t
