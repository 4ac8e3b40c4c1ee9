"""Distributed (multi-device / multi-host) execution over JAX device meshes."""
from .mesh import (
    POINTS_AXIS,
    TARGETS_AXIS,
    make_mesh,
    points_spec,
    replicated_spec,
    targets_spec,
)
from .distributed import (
    ShardedStepResult,
    make_sharded_registration_step,
    pad_for_mesh,
)
from .grid_sharded import (
    ShardedGrid,
    ShardedGridStepResult,
    build_sharded_grid_host,
    make_sharded_grid_registration_step,
    merge_topk,
    merge_topk_scatter,
    merge_topk_tree,
    sharded_merge_topk,
)
from .pool_sharded import (
    ShardedPoolPlan,
    choose_pool_shard_layout,
    ShardedPools,
    ShardedPoolStepResult,
    build_sharded_pool_host,
    build_sharded_pools_device,
    make_sharded_pool_align_scan,
    make_sharded_pool_registration_step,
)
from .align import DistributedRegistration
from .grid_sharded import make_sharded_grid_align_scan
from .search import local_topk_merge, make_target_sharded_search

__all__ = [
    "POINTS_AXIS",
    "TARGETS_AXIS",
    "make_mesh",
    "points_spec",
    "replicated_spec",
    "targets_spec",
    "ShardedStepResult",
    "make_sharded_registration_step",
    "pad_for_mesh",
    "local_topk_merge",
    "make_target_sharded_search",
    "ShardedGrid",
    "ShardedGridStepResult",
    "build_sharded_grid_host",
    "make_sharded_grid_registration_step",
    "merge_topk",
    "merge_topk_scatter",
    "merge_topk_tree",
    "sharded_merge_topk",
    "ShardedPoolPlan",
    "choose_pool_shard_layout",
    "ShardedPools",
    "ShardedPoolStepResult",
    "build_sharded_pool_host",
    "build_sharded_pools_device",
    "make_sharded_pool_align_scan",
    "make_sharded_pool_registration_step",
    "make_sharded_grid_align_scan",
    "DistributedRegistration",
]
