"""Loop-closure detection + trajectory refinement over an odometry run.

Closes the loop (literally) on the sequence pipeline: odometry drift is
corrected by re-registering scan pairs whose estimated poses come back near
each other after a long excursion, then solving the pose graph
(models/pose_graph.py) over odometry + closure edges. No reference
counterpart — the reference stops at per-pair alignment
(src/prob_point_cloud_registration_ex.cc) and lets drift accumulate.

Detection is deliberately simple and fully deterministic: candidate pairs
(i, j) with |i - j| >= min_index_gap whose estimated positions lie within
``max_distance``; each candidate is verified by running the probabilistic
registration seeded at the odometry-predicted relative transform and
accepted when the solver's mean point-to-neighbor cost stays under
``max_mean_cost`` (rejects spurious matches in aliased geometry).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..core.params import RegistrationParams
from ..utils.ostream import OutputStream
from .odometry import OdometryResult, _load_scan
from .pose_graph import PoseGraphConfig, odometry_edges, optimize_pose_graph
from .registration import ProbabilisticRegistration


@dataclass
class LoopClosure:
    i: int
    j: int
    relative_transform: np.ndarray  # maps scan j into scan i's frame
    mean_cost: float


def detect_loop_closures(
    scans: Sequence,
    result: OdometryResult,
    params: Optional[RegistrationParams] = None,
    *,
    max_distance: float = 1.0,
    min_index_gap: int = 5,
    max_candidates: int = 10,
    max_mean_cost: float = float("inf"),
    verbose: bool = False,
) -> List[LoopClosure]:
    """Find and verify loop closures against an estimated trajectory.

    Candidates are greedily limited to ``max_candidates`` pairs with the
    largest index gaps (the most drift-informative closures).
    """
    params = params or RegistrationParams()
    out = OutputStream(verbose)
    positions = np.stack([p[:3, 3] for p in result.poses])
    n = positions.shape[0]

    candidates: List[Tuple[int, int, float]] = []
    for i in range(n):
        delta = positions[i + min_index_gap :] - positions[i]
        if delta.size == 0:
            continue
        dist = np.linalg.norm(delta, axis=1)
        for off in np.nonzero(dist <= max_distance)[0]:
            j = i + min_index_gap + int(off)
            candidates.append((i, j, j - i))
    # Largest index gap first; deduplicate endpoints greedily.
    candidates.sort(key=lambda c: -c[2])
    used: set = set()
    picked = []
    for i, j, _ in candidates:
        if i in used or j in used:
            continue
        picked.append((i, j))
        used.update((i, j))
        if len(picked) >= max_candidates:
            break

    closures: List[LoopClosure] = []
    for i, j in picked:
        # Register scan j onto scan i, seeded by the odometry prediction.
        predicted = np.linalg.inv(result.poses[i]) @ result.poses[j]
        src = _load_scan(scans[j])
        tgt = _load_scan(scans[i])
        moved = src @ predicted[:3, :3].T + predicted[:3, 3]
        reg = ProbabilisticRegistration(moved, tgt, params)
        t_refine = reg.align()
        rel = t_refine @ predicted
        mean_cost = (
            reg.records[-1].final_cost / max(reg.records[-1].num_correspondences, 1)
            if reg.records
            else float("inf")
        )
        if mean_cost <= max_mean_cost:
            out << f"loop closure {i} <- {j}: mean cost {mean_cost:.3g}\n"
            closures.append(
                LoopClosure(i=i, j=j, relative_transform=rel, mean_cost=mean_cost)
            )
        else:
            out << f"rejected closure {i} <- {j}: mean cost {mean_cost:.3g}\n"
    return closures


def refine_trajectory(
    result: OdometryResult,
    closures: Sequence[LoopClosure],
    *,
    odometry_weight: float = 1.0,
    closure_weight: float = 10.0,
    config: PoseGraphConfig = PoseGraphConfig(),
):
    """Pose-graph solve over odometry + closure edges; returns refined poses.

    Closure (i, j, T_rel maps scan j into scan i) becomes the constraint
    P_i^{-1} P_j = T_rel.
    """
    edges = odometry_edges(result.relative_transforms)
    weights = [odometry_weight] * len(edges)
    for c in closures:
        edges.append((c.i, c.j, c.relative_transform))
        weights.append(closure_weight)
    refined, cost = optimize_pose_graph(
        result.poses, edges, weights=weights, config=config
    )
    return refined, cost
