"""Sequence odometry: trajectory composition, checkpoint/resume, CLI.

No reference counterpart to mirror (the reference registers one pair per
process); these validate the sequence pipeline added per SURVEY.md §5's
checkpoint/failure-recovery gap and BASELINE.json configs #3/#4.
"""
import json
from pathlib import Path

import numpy as np
import pytest

from probabilistic_point_clouds_registration_tpu.core.params import RegistrationParams
from probabilistic_point_clouds_registration_tpu.io.pcd import save_pcd
from probabilistic_point_clouds_registration_tpu.io.synthetic import wave_grid
from probabilistic_point_clouds_registration_tpu.models.odometry import (
    load_checkpoint,
    run_odometry,
    save_checkpoint,
)


def _rot_z(theta):
    m = np.eye(4)
    m[:3, :3] = [
        [np.cos(theta), -np.sin(theta), 0.0],
        [np.sin(theta), np.cos(theta), 0.0],
        [0.0, 0.0, 1.0],
    ]
    return m


def _sequence(n_scans=4, step_theta=0.05, step_t=(0.15, -0.05, 0.02)):
    """Scans of the wave surface observed from incrementally-moved frames.

    World cloud W fixed; scan_i = T_i^{-1} W where T_i is the sensor pose.
    Scan-to-scan odometry should recover T_i^{-1} T_{i+1} relative motions.
    """
    world = wave_grid()
    scans, poses = [], []
    pose = np.eye(4)
    for i in range(n_scans):
        inv = np.linalg.inv(pose)
        scans.append(world @ inv[:3, :3].T + inv[:3, 3])
        poses.append(pose.copy())
        delta = _rot_z(step_theta)
        delta[:3, 3] = step_t
        pose = pose @ delta
    return scans, poses


PARAMS = RegistrationParams(
    max_neighbours=10, radius=1.0, n_iter=12, cost_drop_thresh=0.003
)


def test_odometry_recovers_trajectory():
    scans, gt_poses = _sequence()
    result = run_odometry(scans, PARAMS)
    assert len(result.poses) == len(scans)
    assert len(result.relative_transforms) == len(scans) - 1
    # Pose i maps scan i into scan 0's (world) frame.
    rmse = result.ate_rmse(gt_poses)
    assert rmse < 0.05, rmse


def test_checkpoint_roundtrip(tmp_path):
    scans, _ = _sequence(3)
    ckpt = tmp_path / "traj.json"
    result = run_odometry(scans, PARAMS, checkpoint_path=ckpt)
    loaded = load_checkpoint(ckpt)
    assert loaded is not None
    assert len(loaded.poses) == len(result.poses)
    np.testing.assert_allclose(loaded.poses[-1], result.poses[-1], atol=1e-12)


def test_odometry_resume(tmp_path):
    scans, gt_poses = _sequence(4)
    ckpt = tmp_path / "traj.json"

    # Register only the first pair, checkpointing.
    partial = run_odometry(scans[:2], PARAMS, checkpoint_path=ckpt)
    assert len(partial.relative_transforms) == 1

    # Resume over the full sequence: the first pair must come from the
    # checkpoint (count of newly registered pairs is 2).
    counted = []
    full = run_odometry(
        scans, PARAMS, checkpoint_path=ckpt, on_pair=lambda i, p: counted.append(i)
    )
    assert counted == [1, 2]
    assert len(full.poses) == 4
    np.testing.assert_allclose(full.poses[1], partial.poses[1], atol=1e-12)
    assert full.ate_rmse(gt_poses) < 0.05


def test_odometry_cli(tmp_path, capsys):
    from probabilistic_point_clouds_registration_tpu.cli_odometry import main

    scans, gt_poses = _sequence(3)
    for i, s in enumerate(scans):
        save_pcd(str(tmp_path / f"scan_{i:03d}.pcd"), s)
    gt_file = tmp_path / "gt.json"
    gt_file.write_text(json.dumps([p.tolist() for p in gt_poses]))
    out = tmp_path / "traj.json"

    rc = main(
        [
            str(tmp_path),
            "-o", str(out),
            "-r", "1.0",
            "-m", "10",
            "-i", "12",
            "--ground_truth", str(gt_file),
        ]
    )
    assert rc == 0
    assert out.exists()
    captured = capsys.readouterr().out
    assert "ATE RMSE" in captured
    rmse = float(captured.rsplit(":", 1)[1])
    assert rmse < 0.05


def test_prefetcher_loads_in_order(tmp_path):
    from probabilistic_point_clouds_registration_tpu.io.prefetch import ScanPrefetcher
    from probabilistic_point_clouds_registration_tpu.io.pcd import save_pcd

    arrays = [np.random.default_rng(i).random((50, 3)) for i in range(5)]
    paths = []
    for i, a in enumerate(arrays):
        p = tmp_path / f"s{i}.pcd"
        save_pcd(str(p), a)
        paths.append(p)
    with ScanPrefetcher(paths, depth=2) as pf:
        for i in range(5):
            np.testing.assert_allclose(pf.get(i), arrays[i], atol=1e-6)


def test_resume_preserves_report_alignment(tmp_path):
    """reports[i] must stay aligned with relative_transforms[i] across resume."""
    scans, _ = _sequence(4)
    ckpt = tmp_path / "traj.json"
    partial = run_odometry(scans[:3], PARAMS, checkpoint_path=ckpt)
    assert len(partial.reports) == 2
    full = run_odometry(scans, PARAMS, checkpoint_path=ckpt)
    assert len(full.reports) == len(full.relative_transforms) == 3
    # The first two reports came through the checkpoint.
    assert full.reports[0] == partial.reports[0]
