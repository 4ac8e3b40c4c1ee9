"""BASELINE config #2: indoor-scale pair, voxel filter sweep, Gaussian vs t.

Sweeps source/target voxel leaf sizes over a Kinect-scale cloud (~300k raw
points downsampled by the filter under test) for both weight models, timing
the full registration and reporting the final ground-truth MSE (the
reference's calculateMSE metric).

Usage: python benchmarks/bench_filter_sweep.py [--points 120000] [--backend cpu]
"""
from __future__ import annotations

import argparse

import numpy as np

from common import emit, time_align, transformed_pair


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=120_000)
    ap.add_argument("--backend", default=None)
    ap.add_argument("--leaf_sizes", type=float, nargs="+", default=[0.0, 0.02, 0.05])
    args = ap.parse_args()
    if args.backend:
        import jax

        jax.config.update("jax_platforms", args.backend)

    from probabilistic_point_clouds_registration_tpu import (
        ProbabilisticRegistration,
        RegistrationParams,
    )
    from probabilistic_point_clouds_registration_tpu.io.synthetic import bunny_like
    from probabilistic_point_clouds_registration_tpu.utils.eval import calculate_mse

    # Kinect-scale indoor stand-in: dense surface cloud, ~3 m extent.
    tgt = bunny_like(args.points, seed=1) * 1.5
    src = transformed_pair(tgt, 0.015, [0.02, -0.015, 0.01])

    for dof_label, dof in (("t_dof5", 5.0), ("gaussian", float("inf"))):
        for leaf in args.leaf_sizes:
            params = RegistrationParams(
                max_neighbours=20,
                dof=dof,
                radius=0.1,
                n_iter=12,
                cost_drop_thresh=-1.0,
                source_filter_size=leaf,
                target_filter_size=leaf,
                dtype="float32",
            )
            reg = ProbabilisticRegistration(src, tgt, params, ground_truth_cloud=tgt)
            seconds = time_align(reg)
            emit(
                {
                    "config": "kinect_pair_filter_sweep",
                    "model": dof_label,
                    "leaf_size": leaf,
                    "filtered_points": int(reg.filtered_source.shape[0]),
                    "metric": "pair_seconds",
                    "value": round(seconds, 3),
                    "unit": "s",
                    "mse_ground_truth": reg.mse_ground_truth,
                }
            )


if __name__ == "__main__":
    main()
