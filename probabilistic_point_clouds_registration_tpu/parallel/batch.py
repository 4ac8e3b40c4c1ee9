"""Scan-pair batch parallelism: many registrations in one device program.

Sequential odometry registers consecutive pairs (scan_k -> scan_{k+1});
every pair is INDEPENDENT, so a sequence of S scans is S-1 embarrassingly
parallel registrations. The reference processes one pair per process
(src/prob_point_cloud_registration_ex.cc); here the pairs are stacked on a
batch axis, the full outer loop (fixed iteration count) runs under ``vmap``
+ ``lax.scan`` entirely on device, and the batch axis is sharded across the
mesh — the pair/scan-parallel axis of SURVEY.md §2's TPU mapping (analogue
of data-parallel training batches, riding ICI/DCN).

Semantics vs. the host outer loop (models/registration.py): the convergence
rule runs on the host per pair there; here every pair runs a fixed
``n_outer`` iterations (per-iteration costs stream out, so callers can still
inspect/cut trajectories). Post-convergence iterations are no-op refinements
(the solver is at a fixed point), so relative transforms match the
sequential pipeline to solver precision — asserted in tests/test_batch.py.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core.se3 import quat_multiply, quat_normalize, quat_rotate, unit_quat_rotate
from ..models.em_lm import LMConfig, em_lm_solve
from ..ops.neighbors import radius_search


class BatchedPairResult(NamedTuple):
    q: jnp.ndarray  # (B, 4) cumulative rotation per pair
    t: jnp.ndarray  # (B, 3) cumulative translation per pair
    initial_costs: jnp.ndarray  # (B, n_outer)
    final_costs: jnp.ndarray  # (B, n_outer)
    num_correspondences: jnp.ndarray  # (B, n_outer)


@partial(
    jax.jit,
    static_argnames=(
        "k", "radius", "lm_config", "n_outer", "source_tile", "target_tile"
    ),
)
def batched_pair_register(
    sources: jnp.ndarray,  # (B, N, 3)
    targets: jnp.ndarray,  # (B, M, 3)
    source_valid: jnp.ndarray,  # (B, N)
    target_valid: jnp.ndarray,  # (B, M)
    *,
    k: int,
    radius: float,
    lm_config: LMConfig,
    n_outer: int,
    source_tile: int = 4096,
    target_tile: int = 2048,
) -> BatchedPairResult:
    """Register every (source, target) pair with ``n_outer`` fused outer
    iterations. Shard the leading batch axis across the mesh for multi-device
    throughput (every pair is independent — no collectives needed)."""
    dtype = sources.dtype
    q0 = jnp.array([1.0, 0.0, 0.0, 0.0], dtype)
    t0 = jnp.zeros((3,), dtype)

    def one_pair(src, tgt, sv, tv):
        def outer(carry, _):
            qc, tc = carry
            moved = quat_rotate(qc, src) + tc
            corr = radius_search(
                moved,
                tgt,
                k=k,
                radius=radius,
                source_valid=sv,
                target_valid=tv,
                source_tile=source_tile,
                target_tile=target_tile,
            )
            res = em_lm_solve(moved, tgt[corr.indices], corr.mask, q0, t0, lm_config)
            qn = quat_normalize(res.q)
            q_new = quat_multiply(qn, qc)
            t_new = unit_quat_rotate(qn, tc) + res.t
            out = (res.initial_cost, res.final_cost, jnp.sum(corr.mask))
            return (q_new, t_new), out

        (qf, tf), (ic, fc, nc) = lax.scan(outer, (q0, t0), None, length=n_outer)
        return qf, tf, ic, fc, nc

    q, t, ic, fc, nc = jax.vmap(one_pair)(
        sources, targets, source_valid, target_valid
    )
    return BatchedPairResult(
        q=q, t=t, initial_costs=ic, final_costs=fc, num_correspondences=nc
    )


def shard_batch(arrays, mesh: jax.sharding.Mesh, axis_name: str = "points"):
    """Place each array with its leading (batch) axis sharded over ``axis_name``."""
    sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(axis_name)
    )
    return tuple(jax.device_put(a, sharding) for a in arrays)


def run_odometry_batched(
    scans,
    *,
    k: int = 20,
    radius: float = 1.0,
    lm_config: LMConfig = LMConfig(),
    n_outer: int = 10,
    pad_multiple: int = 1024,
    mesh: jax.sharding.Mesh | None = None,
    dtype=jnp.float32,
):
    """Whole-sequence odometry in one (optionally sharded) device program.

    Args:
      scans: list of (n_i, 3) numpy arrays.
      mesh: when given, the pair axis is sharded over its "points" axis
        (pairs padded up to a multiple of the axis size with dummy entries).

    Returns (poses [len(scans) x 4x4 numpy], BatchedPairResult).
    """
    from ..core.se3 import quat_to_matrix
    from ..core.types import pad_cloud

    n_scans = len(scans)
    if n_scans < 2:
        return [np.eye(4) for _ in range(n_scans)], None
    n_max = max(s.shape[0] for s in scans)
    padded, valids = [], []
    for s in scans:
        p, n = pad_cloud(np.asarray(s, np.float64), pad_multiple, pad_value=0.0)
        if p.shape[0] < ((n_max + pad_multiple - 1) // pad_multiple) * pad_multiple:
            full = np.zeros(
                (((n_max + pad_multiple - 1) // pad_multiple) * pad_multiple, 3)
            )
            full[: p.shape[0]] = p
            p = full
        padded.append(p)
        valids.append(n)
    stack = np.stack(padded)
    counts = np.asarray(valids)

    b = n_scans - 1
    b_pad = b
    if mesh is not None:
        d = mesh.shape["points"]
        b_pad = ((b + d - 1) // d) * d
    idx_src = np.minimum(np.arange(b_pad) + 1, n_scans - 1)
    idx_tgt = np.minimum(np.arange(b_pad), n_scans - 1)

    row = np.arange(stack.shape[1])
    sources = jnp.asarray(stack[idx_src], dtype)
    targets = jnp.asarray(stack[idx_tgt], dtype)
    sv = jnp.asarray(row[None, :] < counts[idx_src, None])
    tv = jnp.asarray(row[None, :] < counts[idx_tgt, None])

    if mesh is not None:
        sources, targets, sv, tv = shard_batch((sources, targets, sv, tv), mesh)

    result = batched_pair_register(
        sources, targets, sv, tv,
        k=k, radius=radius, lm_config=lm_config, n_outer=n_outer,
    )

    qs = np.asarray(result.q, np.float64)
    ts = np.asarray(result.t, np.float64)
    poses = [np.eye(4)]
    for pair in range(b):
        rel = np.eye(4)
        rel[:3, :3] = np.asarray(quat_to_matrix(jnp.asarray(qs[pair])))
        rel[:3, 3] = ts[pair]
        poses.append(poses[-1] @ rel)
    return poses, result
