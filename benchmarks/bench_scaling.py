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


if __name__ == "__main__":
    main()
