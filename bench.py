"""Benchmark: bunny-scale scan-pair registration throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload (BASELINE.json config #1 stand-in — the repo and reference ship no
datasets): a 35k-point bunny-scale surface pair, t-distribution weights
(dof=5), max_neighbours=20, a fixed 15 outer iterations (convergence check
disabled so every run does identical work), full pipeline including host-side
transform composition — i.e. end-to-end scan pairs per second.

``vs_baseline`` compares against the single-machine CPU throughput recorded
in baseline_cpu.json (measured with JAX_PLATFORMS=cpu on this image via
``python bench.py --record-cpu-baseline``; the reference C++ binary cannot be
built here — no PCL/Ceres — so the CPU run of this same algorithm is the
measured stand-in, per BASELINE.md).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
BASELINE_FILE = REPO / "baseline_cpu.json"


def build_pair(n: int, seed: int = 0):
    from probabilistic_point_clouds_registration_tpu.io.synthetic import bunny_like

    tgt = bunny_like(n, seed=seed)
    # Misalignment sized to the search radius (real LiDAR operating point:
    # radius a few x point spacing; initial offset within the search radius).
    theta = 0.02
    rot = np.array(
        [
            [np.cos(theta), -np.sin(theta), 0.0],
            [np.sin(theta), np.cos(theta), 0.0],
            [0.0, 0.0, 1.0],
        ]
    )
    src = tgt @ rot.T + np.array([0.02, -0.015, 0.01])
    return src, tgt


def run_once(src, tgt, n_iter: int):
    from probabilistic_point_clouds_registration_tpu.core.params import RegistrationParams
    from probabilistic_point_clouds_registration_tpu.models.registration import (
        ProbabilisticRegistration,
    )

    params = RegistrationParams(
        max_neighbours=20,
        dof=5.0,
        # ~4x the mean point spacing of the 35k-point cloud (the reference's
        # radius-3-on-meters-scale-clouds CLI default scaled to this fixture),
        # giving ~50 in-radius candidates per point with the k=20 cap active.
        radius=0.075,
        n_iter=n_iter,
        cost_drop_thresh=-1.0,  # fixed work: only the n_iter stop fires
        dtype="float32",
        pad_multiple=1024,
        max_inner_iterations=50,
        # One device program for the whole fixed-iteration pair: a tunneled
        # chip pays ~60-90 ms of host sync per chunk boundary.
        outer_chunk=n_iter,
    )
    # End-to-end pair time includes construction: voxel/grid build and the
    # host->device upload are real per-pair costs in sequence odometry.
    t0 = time.perf_counter()
    reg = ProbabilisticRegistration(src, tgt, params)
    reg.align()
    return time.perf_counter() - t0, reg


def measure(n_points: int, n_iter: int, repeats: int, blocks: int):
    """Median-of-block-minima protocol against service-window noise.

    The tunneled-TPU service shows multi-minute windows of degraded latency
    (docs/PERF.md: 2.1-3.2 pairs/s for identical code across one session).
    ``blocks`` blocks of ``repeats`` pairs each run back to back; each
    block's best pair defends against per-pair jitter, the median across
    blocks defends against a single bad window. Returns
    (median_best_seconds, per-block best seconds).
    """
    src, tgt = build_pair(n_points)
    run_once(src, tgt, n_iter)  # warm-up: compile
    block_best = []
    cap_hits = 0  # inner solves that ran into max_inner_iterations
    for _ in range(blocks):
        times = []
        for _ in range(repeats):
            t, reg = run_once(src, tgt, n_iter)
            times.append(t)
            cap_hits += reg.inner_cap_hits
        block_best.append(min(times))
    med = sorted(block_best)[len(block_best) // 2]
    return med, block_best, cap_hits


def roundtrip_latency_ms(samples: int = 5) -> float:
    """Host<->device roundtrip of a trivial fetch — recorded alongside the
    headline so a degraded service window is visible in the artifact."""
    import jax
    import jax.numpy as jnp

    x = jax.device_put(jnp.zeros(()))
    jax.device_get(x + 1)
    best = float("inf")
    for _ in range(samples):
        t0 = time.perf_counter()
        jax.device_get(x + 1)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=35_000)
    ap.add_argument("--iters", type=int, default=15)
    # Median-of-block-minima: blocks x repeats pairs (see measure()); the
    # tunneled-TPU service shows multi-minute windows of degraded latency
    # (measured 2.1-3.2 pairs/s for identical code across one session).
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--blocks", type=int, default=3)
    ap.add_argument(
        "--record-cpu-baseline",
        action="store_true",
        help="measure on CPU and write baseline_cpu.json",
    )
    args = ap.parse_args()

    if args.record_cpu_baseline:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.record_cpu_baseline:
        jax.config.update("jax_platforms", "cpu")
    from probabilistic_point_clouds_registration_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()

    if args.record_cpu_baseline:
        pair_seconds, _, _ = measure(args.points, args.iters, args.repeats, 1)
    else:
        pair_seconds, block_best, cap_hits = measure(
            args.points, args.iters, args.repeats, args.blocks
        )
    pairs_per_s = 1.0 / pair_seconds

    if args.record_cpu_baseline:
        BASELINE_FILE.write_text(
            json.dumps(
                {
                    "metric": "bunny35k pair registration throughput (CPU)",
                    "pairs_per_s": pairs_per_s,
                    "pair_seconds": pair_seconds,
                    "points": args.points,
                    "outer_iterations": args.iters,
                    "backend": jax.default_backend(),
                },
                indent=2,
            )
            + "\n"
        )
        print(f"recorded CPU baseline: {pairs_per_s:.4f} pairs/s", file=sys.stderr)
        return

    vs_baseline = 1.0
    if BASELINE_FILE.exists():
        base = json.loads(BASELINE_FILE.read_text())
        if (
            base.get("points") not in (None, args.points)
            or base.get("outer_iterations") not in (None, args.iters)
        ):
            print(
                f"warning: baseline_cpu.json was recorded for "
                f"{base.get('points')} pts / {base.get('outer_iterations')} "
                f"iters, not {args.points}/{args.iters} — re-record with "
                f"--record-cpu-baseline for a meaningful vs_baseline",
                file=sys.stderr,
            )
        if base.get("pairs_per_s"):
            vs_baseline = pairs_per_s / base["pairs_per_s"]

    block_rates = sorted(1.0 / t for t in block_best)
    print(
        json.dumps(
            {
                "metric": "bunny35k_pair_registration_throughput",
                "value": round(pairs_per_s, 4),
                "unit": "pairs/s",
                "vs_baseline": round(vs_baseline, 3),
                # Service-window spread: best pair of each of the
                # --blocks blocks (median is the headline value).
                "spread": [round(r, 4) for r in block_rates],
                "roundtrip_ms": round(roundtrip_latency_ms(), 2),
                # Inner LM solves that hit max_inner_iterations across every
                # measured pair (the reference runs Ceres unbounded,
                # src/prob_point_cloud_registration.cc:96 — nonzero here
                # would mean the bench operating point diverges from
                # reference behavior by construction; see docs/PERF.md).
                "inner_cap_hits": cap_hits,
            }
        )
    )


if __name__ == "__main__":
    main()
