"""Pose-graph optimization: drift correction, gauge fixing, sharded parity."""
import numpy as np
import jax.numpy as jnp
import pytest

from probabilistic_point_clouds_registration_tpu.models.pose_graph import (
    PoseGraphConfig,
    make_sharded_pose_graph_solver,
    odometry_edges,
    optimize_pose_graph,
)


def _rot_z(a):
    m = np.eye(4)
    m[:3, :3] = [
        [np.cos(a), -np.sin(a), 0.0],
        [np.sin(a), np.cos(a), 0.0],
        [0.0, 0.0, 1.0],
    ]
    return m


def _circle_trajectory(n=16, radius=5.0):
    """Ground-truth poses around a circle, returning to the start."""
    poses = []
    for k in range(n):
        a = 2 * np.pi * k / n
        m = _rot_z(a)
        m[:3, 3] = [radius * np.cos(a), radius * np.sin(a), 0.0]
        poses.append(m)
    return poses


def _noisy_odometry(gt_poses, seed=0, rot_noise=0.01, t_noise=0.02):
    rng = np.random.default_rng(seed)
    rels = []
    for k in range(len(gt_poses) - 1):
        rel = np.linalg.inv(gt_poses[k]) @ gt_poses[k + 1]
        noise = _rot_z(rng.normal(scale=rot_noise))
        noise[:3, 3] = rng.normal(scale=t_noise, size=3)
        rels.append(rel @ noise)
    return rels


def _integrate(rels):
    poses = [np.eye(4)]
    for r in rels:
        poses.append(poses[-1] @ r)
    return poses


def _ate(poses_a, poses_b):
    ta = np.stack([p[:3, 3] for p in poses_a])
    tb = np.stack([p[:3, 3] for p in poses_b])
    return float(np.sqrt(np.mean(np.sum((ta - tb) ** 2, axis=1))))


def test_loop_closure_reduces_drift():
    gt = _circle_trajectory(16)
    # World frame anchored at the first pose.
    gt0 = [np.linalg.inv(gt[0]) @ p for p in gt]
    rels = _noisy_odometry(gt0)
    odo = _integrate(rels)
    drift_before = _ate(odo, gt0)

    edges = odometry_edges(rels)
    # One loop closure: last pose back to the first, exact measurement.
    rel_loop = np.linalg.inv(gt0[-1]) @ gt0[0]
    edges.append((len(gt0) - 1, 0, rel_loop))
    weights = [1.0] * (len(edges) - 1) + [50.0]

    refined, cost = optimize_pose_graph(
        odo, edges, weights=weights,
        config=PoseGraphConfig(max_iterations=25, cg_iterations=80),
    )
    drift_after = _ate(refined, gt0)
    assert np.isfinite(cost)
    assert drift_after < 0.6 * drift_before, (drift_before, drift_after)
    # Gauge: pose 0 untouched.
    np.testing.assert_allclose(refined[0], odo[0], atol=1e-12)


def test_perfect_odometry_is_fixed_point():
    gt = _circle_trajectory(8)
    gt0 = [np.linalg.inv(gt[0]) @ p for p in gt]
    rels = [np.linalg.inv(gt0[k]) @ gt0[k + 1] for k in range(len(gt0) - 1)]
    edges = odometry_edges(rels)
    refined, cost = optimize_pose_graph(gt0, edges)
    assert cost < 1e-12
    for a, b in zip(refined, gt0):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_sharded_solver_matches_single_device():
    from probabilistic_point_clouds_registration_tpu.core.se3 import matrix_to_quat
    from probabilistic_point_clouds_registration_tpu.parallel import make_mesh

    gt = _circle_trajectory(16)
    gt0 = [np.linalg.inv(gt[0]) @ p for p in gt]
    rels = _noisy_odometry(gt0, seed=3)
    odo = _integrate(rels)
    edges = odometry_edges(rels)
    rel_loop = np.linalg.inv(gt0[-1]) @ gt0[0]
    edges.append((len(gt0) - 1, 0, rel_loop))
    # Pad edges to a multiple of 8 with zero-weight self-edges.
    while len(edges) % 8:
        edges.append((0, 0, np.eye(4)))
    weights = [1.0] * 15 + [50.0] + [0.0] * (len(edges) - 16)

    cfg = PoseGraphConfig(max_iterations=15, cg_iterations=60)
    ref_poses, ref_cost = optimize_pose_graph(odo, edges, weights=weights, config=cfg)

    mesh = make_mesh(n_points_shards=8, n_target_shards=1)
    solver = make_sharded_pose_graph_solver(mesh, cfg)
    base_q = jnp.stack([jnp.asarray(matrix_to_quat(p[:3, :3])) for p in odo])
    base_t = jnp.asarray(np.stack([p[:3, 3] for p in odo]))
    ei = jnp.asarray(np.array([e[0] for e in edges], np.int32))
    ej = jnp.asarray(np.array([e[1] for e in edges], np.int32))
    rq = jnp.stack([jnp.asarray(matrix_to_quat(e[2][:3, :3])) for e in edges])
    rt = jnp.asarray(np.stack([e[2][:3, 3] for e in edges]))
    w = jnp.asarray(np.array(weights))

    q, t, cost = solver(base_q, base_t, ei, ej, rq, rt, w)
    assert np.isfinite(float(cost))
    # psum reduction order differs from the single-device sum inside CG, so
    # agreement is to numerical (not bitwise) precision.
    np.testing.assert_allclose(float(cost), ref_cost, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(t), np.stack([p[:3, 3] for p in ref_poses]), atol=5e-4
    )


def test_block_jacobi_pcg_accelerates():
    """With a starved CG budget, block-Jacobi PCG must reach a (much) lower
    cost than plain CG — and with a generous budget both reach the same
    solution (preconditioning changes the path, never the answer)."""
    gt = _circle_trajectory(40)
    gt0 = [np.linalg.inv(gt[0]) @ p for p in gt]
    rels = _noisy_odometry(gt0, seed=3)
    odo = _integrate(rels)
    edges = odometry_edges(rels)
    rel_loop = np.linalg.inv(gt0[-1]) @ gt0[0]
    edges.append((len(gt0) - 1, 0, rel_loop))
    weights = [1.0] * (len(edges) - 1) + [50.0]

    def run(cg_iters, precondition):
        cfg = PoseGraphConfig(
            max_iterations=6, cg_iterations=cg_iters,
            precondition=precondition,
        )
        _, cost = optimize_pose_graph(odo, edges, weights=weights, config=cfg)
        return float(cost)

    starved_plain = run(4, False)
    starved_pcg = run(4, True)
    assert starved_pcg < starved_plain, (starved_pcg, starved_plain)

    # With a generous budget both should essentially converge; PCG must be
    # at least as good (observed: plain CG at 150 iters still lags slightly).
    full_plain = run(150, False)
    full_pcg = run(150, True)
    assert full_pcg <= full_plain * 1.05, (full_pcg, full_plain)
