"""KITTI odometry dataset I/O.

BASELINE.json config #4 runs scan-to-scan odometry on KITTI Velodyne
sequences. The reference has no dataset loaders (PCD only, via PCL); these
cover the two KITTI file formats needed to drive the pipeline end-to-end:

  * Velodyne scans: raw little-endian float32 records (x, y, z, reflectance),
    file per scan (``000000.bin`` ...).
  * Ground-truth poses: one line per scan, 12 floats = row-major 3x4 [R | t]
    of the left-camera frame; converted to 4x4.
"""
from __future__ import annotations

from pathlib import Path
from typing import List, Sequence

import numpy as np


def load_velodyne_bin(path) -> np.ndarray:
    """(n, 3) xyz float32 from a KITTI Velodyne .bin scan (drops intensity)."""
    raw = np.fromfile(str(path), dtype=np.float32)
    if raw.size % 4:
        raise ValueError(f"{path}: size {raw.size} not a multiple of 4 floats")
    return raw.reshape(-1, 4)[:, :3].copy()


def list_velodyne_scans(directory) -> List[Path]:
    """Sorted .bin scan paths of a KITTI sequence directory."""
    return sorted(Path(directory).glob("*.bin"))


def load_poses(path) -> List[np.ndarray]:
    """KITTI ground-truth poses file -> list of 4x4 numpy matrices."""
    poses = []
    for line in Path(path).read_text().splitlines():
        vals = [float(v) for v in line.split()]
        if not vals:
            continue
        if len(vals) != 12:
            raise ValueError(f"pose line has {len(vals)} values, expected 12")
        m = np.eye(4)
        m[:3, :4] = np.asarray(vals).reshape(3, 4)
        poses.append(m)
    return poses


def save_poses(path, poses: Sequence[np.ndarray]) -> None:
    """Write 4x4 poses in the KITTI 12-float row-major [R | t] format."""
    with open(path, "w") as f:
        for m in poses:
            f.write(" ".join(f"{v:.9e}" for v in np.asarray(m)[:3, :4].ravel()))
            f.write("\n")
