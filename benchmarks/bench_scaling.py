"""BASELINE config #5 scaffold: pair-throughput scaling across devices.

Registers a batch of independent scan pairs with the batched engine
(parallel/batch.py) on 1, 2, ... N devices of the available platform and
reports pairs/s and scaling efficiency. On a CPU host set
``--backend cpu --host_devices 8`` to validate the sharding (env vars alone
are overridden by this image's sitecustomize jax preload); on a real pod slice the same script measures ICI/DCN
scaling (the single-tunneled-chip dev environment cannot).

Usage: python benchmarks/bench_scaling.py [--pairs 8] [--points 8192]
"""
from __future__ import annotations

import argparse
import time

import numpy as np

from common import emit, synthetic_sequence


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=8)
    ap.add_argument("--points", type=int, default=8192)
    ap.add_argument("--n_outer", type=int, default=8)
    ap.add_argument("--backend", default=None,
                    help="JAX platform override (e.g. cpu); the ambient "
                         "environment may pin a tunneled TPU via sitecustomize")
    ap.add_argument("--host_devices", type=int, default=None,
                    help="with --backend cpu: number of virtual host devices")
    ap.add_argument("--search_impl", default="brute",
                    choices=["brute", "grid", "auto"],
                    help="batched engine; brute keeps per-mesh-size compiles "
                         "fast (scaling efficiency is engine-orthogonal; the "
                         "grid path is parity-tested in tests/test_batch.py)")
    ap.add_argument("--mode", default="pair", choices=["pair", "step"],
                    help="pair: batch of independent pairs over the points "
                         "axis; step: ONE pair's sharded outer step (grid + "
                         "pooled engines) over 1/2/4/8 target shards — the "
                         "measurable proxy for collective/merge overhead "
                         "until real multi-chip hardware exists")
    ap.add_argument("--steps", type=int, default=5,
                    help="step mode: timed step repetitions per mesh size")
    args = ap.parse_args()

    import os

    if args.host_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.host_devices}"
        ).strip()
    import jax

    if args.backend:
        jax.config.update("jax_platforms", args.backend)

    from probabilistic_point_clouds_registration_tpu.models.em_lm import LMConfig
    from probabilistic_point_clouds_registration_tpu.parallel import make_mesh
    from probabilistic_point_clouds_registration_tpu.parallel.batch import (
        run_odometry_batched,
    )

    if args.mode == "step":
        return step_scaling(args)

    scans, _ = synthetic_sequence(args.pairs + 1, args.points)
    cfg = LMConfig(dof=5.0, max_iterations=30)

    base_rate = None
    n_dev = jax.device_count()
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_dev]
    for d in sizes:
        mesh = make_mesh(n_points_shards=d, n_target_shards=1,
                         devices=jax.devices()[:d])
        # Warm-up (compile), then timed run.
        for timed in (False, True):
            t0 = time.perf_counter()
            run_odometry_batched(
                scans, k=10, radius=0.1, lm_config=cfg, n_outer=args.n_outer,
                pad_multiple=1024, mesh=mesh, search_impl=args.search_impl,
            )
            seconds = time.perf_counter() - t0
        # The batched engine pads the pair batch to a multiple of the device
        # count with dummy self-pairs that do full work — rate over the
        # *padded* count is the machine's real throughput (the requested
        # count would understate it whenever pairs % devices != 0).
        padded_pairs = -(-args.pairs // d) * d
        rate = padded_pairs / seconds
        if base_rate is None:
            base_rate = rate
        emit(
            {
                "config": "pair_scaling",
                "devices": d,
                "metric": "scan_pairs_per_s",
                "value": round(rate, 4),
                "unit": "pairs/s",
                "efficiency_vs_1dev": round(rate / (base_rate * d), 3),
            }
        )


def step_scaling(args):
    """One pair's full sharded outer step (search + merge + EM-LM) over
    1/2/4/8 target shards, for both production engines.

    On virtual CPU devices the absolute times are a weak proxy (shards
    share host cores and the pooled kernel runs interpreted), but the
    RELATIVE per-shard work decomposition and the merge/collective payload
    are the real thing: each row also reports the all-gather merge payload
    in MB (what rides ICI on hardware) so the overhead fraction can be
    bounded analytically against a known link bandwidth.
    """
    import time

    import jax
    import jax.numpy as jnp

    from probabilistic_point_clouds_registration_tpu.core.types import pad_cloud
    from probabilistic_point_clouds_registration_tpu.io.synthetic import bunny_like
    from probabilistic_point_clouds_registration_tpu.models.em_lm import LMConfig
    from probabilistic_point_clouds_registration_tpu.parallel import (
        build_sharded_grid_host,
        build_sharded_pool_host,
        build_sharded_pools_device,
        make_mesh,
        make_sharded_grid_registration_step,
        make_sharded_pool_registration_step,
    )

    on_tpu = jax.default_backend() == "tpu"
    k, radius = 20, 0.075
    n = args.points if args.points != 8192 else (35_000 if on_tpu else 12_000)
    tgt = bunny_like(n, seed=0)
    theta = 0.02
    rot = np.array(
        [
            [np.cos(theta), -np.sin(theta), 0.0],
            [np.sin(theta), np.cos(theta), 0.0],
            [0.0, 0.0, 1.0],
        ]
    )
    src = tgt @ rot.T + np.array([0.02, -0.015, 0.01])
    fs, n_src = pad_cloud(src.astype(np.float32), 1024, pad_value=0.0)
    tg, n_tgt = pad_cloud(tgt.astype(np.float32), 1024, pad_value=0.0)
    sv = np.arange(fs.shape[0]) < n_src
    cfg = LMConfig(dof=5.0, dimension=3, max_iterations=10)
    q0 = jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32)
    t0v = jnp.zeros(3, jnp.float32)

    n_dev = jax.device_count()
    sizes = [d for d in (1, 2, 4, 8) if d <= n_dev]
    base = {}
    for d in sizes:
        mesh = make_mesh(n_points_shards=1, n_target_shards=d,
                         devices=jax.devices()[:d])
        # All-gather volume per merge round: every device contributes
        # N x k x 20 B (distances + indices + coordinates); the gathered
        # result each device holds is d x that. Both are emitted — the
        # per-device contribution is what a ring all-gather sends per hop,
        # the total is the conservative ICI bound used in docs/PERF.md.
        contrib_mb = fs.shape[0] * k * (4 + 4 + 12) / 1e6
        payload_mb = contrib_mb * d

        for engine in ("grid", "pool"):
            if engine == "grid":
                sg = build_sharded_grid_host(tg, radius, d, num_valid=n_tgt)
                if sg is None:
                    continue
                step = make_sharded_grid_registration_step(
                    mesh, k=k, radius=radius, lm_config=cfg,
                    capacity=sg.capacity,
                )
                call = lambda: step(
                    jnp.asarray(fs), jnp.asarray(sv),
                    jnp.asarray(sg.bucket_pts, jnp.float32),
                    jnp.asarray(sg.bucket_idx), jnp.asarray(sg.lut),
                    jnp.asarray(sg.origin, jnp.float32), jnp.asarray(sg.dims),
                    q0, t0v, q0, t0v,
                )
            else:
                sp = build_sharded_pool_host(tg, radius, d, num_valid=n_tgt, k=k)
                if sp is None:
                    continue
                pools = build_sharded_pools_device(mesh, sp)
                pstep = make_sharded_pool_registration_step(
                    mesh, sp, k=k, radius=radius, lm_config=cfg,
                    source_rows_per_shard=fs.shape[0],
                    interpret=not on_tpu,
                )
                call = lambda: pstep(
                    jnp.asarray(fs), jnp.asarray(sv), pools, q0, t0v, q0, t0v
                )

            out = call()  # compile
            _ = float(out.result.final_cost)
            times = []
            for _i in range(args.steps):
                t0 = time.perf_counter()
                out = call()
                _ = float(out.result.final_cost)  # force fetch
                times.append(time.perf_counter() - t0)
            best = min(times)
            key = engine
            if key not in base:
                base[key] = best
            emit(
                {
                    "config": "step_scaling",
                    "engine": engine,
                    "target_shards": d,
                    "metric": "step_seconds",
                    "value": round(best, 4),
                    "unit": "s",
                    "points": n,
                    "speedup_vs_1shard": round(base[key] / best, 3),
                    "merge_contrib_mb_per_device": round(contrib_mb, 2),
                    "merge_allgather_total_mb": round(payload_mb, 2),
                    "backend": jax.default_backend(),
                }
            )


if __name__ == "__main__":
    main()
