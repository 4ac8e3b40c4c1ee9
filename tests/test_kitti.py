"""KITTI I/O: Velodyne .bin scans, pose-file roundtrip, odometry CLI on .bin."""
import numpy as np

from probabilistic_point_clouds_registration_tpu.io.kitti import (
    list_velodyne_scans,
    load_poses,
    load_velodyne_bin,
    save_poses,
)


def test_velodyne_bin_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((1000, 4)).astype(np.float32)
    p = tmp_path / "000000.bin"
    pts.tofile(p)
    out = load_velodyne_bin(p)
    np.testing.assert_array_equal(out, pts[:, :3])


def test_pose_file_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    poses = []
    for _ in range(5):
        m = np.eye(4)
        m[:3, :4] = rng.standard_normal((3, 4))
        poses.append(m)
    p = tmp_path / "poses.txt"
    save_poses(p, poses)
    out = load_poses(p)
    assert len(out) == 5
    for a, b in zip(out, poses):
        np.testing.assert_allclose(a, b, atol=1e-8)


def test_odometry_cli_on_bin_scans(tmp_path):
    from probabilistic_point_clouds_registration_tpu.cli_odometry import main
    from probabilistic_point_clouds_registration_tpu.io.synthetic import wave_grid

    world = wave_grid()
    th = 0.05
    rot = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1.0]]
    )
    delta = np.eye(4)
    delta[:3, :3] = rot
    delta[:3, 3] = [0.1, -0.02, 0.01]
    pose = np.eye(4)
    poses = []
    for i in range(3):
        inv = np.linalg.inv(pose)
        scan = (world @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)
        rec = np.concatenate([scan, np.zeros((scan.shape[0], 1), np.float32)], 1)
        rec.tofile(tmp_path / f"{i:06d}.bin")
        poses.append(pose.copy())
        pose = pose @ delta
    assert len(list_velodyne_scans(tmp_path)) == 3
    save_poses(tmp_path / "gt.txt", poses)

    out = tmp_path / "traj.json"
    rc = main(
        [
            str(tmp_path), "-o", str(out), "-r", "1.0", "-m", "10", "-i", "10",
            "--ground_truth", str(tmp_path / "gt.txt"),
        ]
    )
    assert rc == 0
    assert out.exists()
