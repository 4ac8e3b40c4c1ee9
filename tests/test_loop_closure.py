"""Loop-closure detection + pose-graph trajectory refinement end-to-end."""
import numpy as np

from probabilistic_point_clouds_registration_tpu.core.params import RegistrationParams
from probabilistic_point_clouds_registration_tpu.io.synthetic import wave_grid
from probabilistic_point_clouds_registration_tpu.models.loop_closure import (
    detect_loop_closures,
    refine_trajectory,
)
from probabilistic_point_clouds_registration_tpu.models.odometry import (
    OdometryResult,
)


def _square_loop(n_side=3, step=0.4):
    """Sensor walks a square and returns to the start (8 poses + closure)."""
    world = wave_grid()
    gt = [np.eye(4)]
    moves = []
    # right, right, up, up, left, left, down, down -> back at origin
    for d in ([step,0,0],[step,0,0],[0,step,0],[0,step,0],
              [-step,0,0],[-step,0,0],[0,-step,0],[0,-step,0]):
        m = np.eye(4); m[:3,3] = d
        moves.append(m)
        gt.append(gt[-1] @ m)
    scans = []
    for pose in gt:
        inv = np.linalg.inv(pose)
        scans.append(world @ inv[:3,:3].T + inv[:3,3])
    return scans, gt, moves


def test_detect_and_refine_reduces_drift():
    rng = np.random.default_rng(0)
    scans, gt, moves = _square_loop()
    # Noisy odometry estimate (drifted).
    noisy = []
    for m in moves:
        d = np.eye(4)
        d[:3, 3] = m[:3, 3] + rng.normal(scale=0.02, size=3)
        noisy.append(d)
    poses = [np.eye(4)]
    for m in noisy:
        poses.append(poses[-1] @ m)
    result = OdometryResult(poses=poses, relative_transforms=noisy)

    params = RegistrationParams(max_neighbours=10, radius=1.0, n_iter=8,
                                cost_drop_thresh=0.003)
    closures = detect_loop_closures(
        scans, result, params, max_distance=0.5, min_index_gap=4,
    )
    assert closures, "the square loop must produce at least one closure"
    assert any(c.j - c.i >= 4 for c in closures)

    refined, cost = refine_trajectory(result, closures)
    drift_before = np.linalg.norm(poses[-1][:3, 3] - gt[-1][:3, 3])
    drift_after = np.linalg.norm(refined[-1][:3, 3] - gt[-1][:3, 3])
    assert np.isfinite(cost)
    assert drift_after < 0.6 * drift_before, (drift_before, drift_after)


def test_non_overlapping_candidate_rejected():
    """A candidate pair with no overlap (the drift failure mode) must NOT be
    accepted: zero correspondences means zero cost — the strongest false
    acceptance signal if cost were the only gate."""
    world = wave_grid()
    far = world + np.array([100.0, 0.0, 0.0])  # disjoint scene
    scans = [world, world + 0.0, far]
    # Estimated poses (wrongly) claim scan 2 is back at the origin, making
    # (0, 2) a closure candidate despite zero actual overlap.
    poses = [np.eye(4), np.eye(4), np.eye(4)]
    rels = [np.eye(4), np.eye(4)]
    result = OdometryResult(poses=poses, relative_transforms=rels)
    params = RegistrationParams(max_neighbours=10, radius=1.0, n_iter=4)
    closures = detect_loop_closures(
        scans, result, params, max_distance=0.5, min_index_gap=2,
    )
    assert all(not (c.i == 0 and c.j == 2) for c in closures)
