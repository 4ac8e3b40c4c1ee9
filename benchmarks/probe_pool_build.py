"""A/B the sharded device pool build: once-per-shard vs every-device.

Round-4 weak #4: build_sharded_pools_device replicated the pool packing
along the "points" axis — every dp row re-packed the same target shard.
The round-5 build packs once per mesh column and psum-broadcasts along
"points". This probe measures both variants' wall time on the virtual
8-device mesh at KITTI-like scale (the HBM footprint is unchanged by
design: the search consumes the pool on every device row).

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python benchmarks/probe_pool_build.py [--points 131072] [--dp 2]
"""
from __future__ import annotations

import argparse
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=131_072)
    ap.add_argument("--dp", type=int, default=2)
    ap.add_argument("--tp", type=int, default=4)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from common import emit
    from probabilistic_point_clouds_registration_tpu.io.synthetic import (
        kitti_like,
    )
    from probabilistic_point_clouds_registration_tpu.parallel import (
        build_sharded_pool_host,
        build_sharded_pools_device,
        make_mesh,
    )

    tgt = kitti_like(args.points)
    mesh = make_mesh(args.dp, args.tp)
    sp = build_sharded_pool_host(tgt, 0.5, args.tp, num_valid=tgt.shape[0])
    assert sp is not None

    for label, rep in (("once_per_shard", False), ("every_device", True)):
        # Warm (compile), then time.
        pools = build_sharded_pools_device(mesh, sp, _replicate_build=rep)
        jax.block_until_ready(pools.pool_idx)
        times = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            pools = build_sharded_pools_device(
                mesh, sp, _replicate_build=rep
            )
            jax.block_until_ready(pools.pool_idx)
            times.append(time.perf_counter() - t0)
        emit(
            {
                "config": f"pool_build_{args.dp}x{args.tp}",
                "variant": label,
                "metric": "build_seconds",
                "value": round(min(times), 3),
                "unit": "s",
                "points": args.points,
                "all_times": [round(t, 3) for t in times],
            }
        )


if __name__ == "__main__":
    main()
