"""Butterfly (ppermute) top-k combine vs the all-gather merge.

The tree merge must produce the identical global top-k (indices,
distances, coordinates, found mask) whenever the k-th distance is unique,
with O(k log T) payload instead of O(k T) (parallel/grid_sharded.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probabilistic_point_clouds_registration_tpu.parallel import (
    make_mesh,
    merge_topk,
    merge_topk_tree,
    sharded_merge_topk,
)
from probabilistic_point_clouds_registration_tpu.parallel.mesh import (
    TARGETS_AXIS,
    all_gather_replicated,
)

P = jax.sharding.PartitionSpec


def _local_lists(t, n, k, seed=0, with_p=True):
    """Per-shard sorted top-k candidate lists with some unfound slots."""
    rng = np.random.default_rng(seed)
    d = np.sort(rng.uniform(0, 1, size=(t, n, k)).astype(np.float32), axis=2)
    # Unfound tails: +inf distances past a random per-row count.
    cnt = rng.integers(0, k + 1, size=(t, n))
    mask = np.arange(k)[None, None, :] < cnt[..., None]
    d = np.where(mask, d, np.inf).astype(np.float32)
    i = rng.integers(0, 10_000, size=(t, n, k)).astype(np.int32)
    p = rng.normal(size=(t, n, k, 3)).astype(np.float32) if with_p else None
    return d, i, p


@pytest.mark.parametrize("t", [2, 4, 8])
def test_tree_merge_matches_all_gather(t):
    n, k = 64, 5
    d, i, p = _local_lists(t, n, k, seed=t)
    mesh = make_mesh(1, t, devices=jax.devices()[:t])

    def body(ld, li, lp):
        sq = lambda a: a.reshape(a.shape[1:])
        bi, bd, f, bp = merge_topk_tree(
            sq(ld), sq(li), sq(lp), k=k, axis_name=TARGETS_AXIS
        )
        return bi, bd, f, bp

    run = jax.jit(
        jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(TARGETS_AXIS),) * 3,
            out_specs=(P(),) * 4,
            check_vma=False,
        )
    )
    gi, gd, gf, gp = run(
        jnp.asarray(d), jnp.asarray(i), jnp.asarray(p)
    )

    # Flat all-gather reference.
    ri, rd, rf, rp = merge_topk(
        jnp.asarray(d), jnp.asarray(i), jnp.asarray(p), k=k
    )
    np.testing.assert_array_equal(np.asarray(gf), np.asarray(rf))
    m = np.asarray(rf)
    np.testing.assert_array_equal(np.asarray(gi)[m], np.asarray(ri)[m])
    np.testing.assert_array_equal(np.asarray(gd)[m], np.asarray(rd)[m])
    np.testing.assert_array_equal(np.asarray(gp)[m], np.asarray(rp)[m])


def test_tree_merge_outputs_replicated():
    """Every device must end with the identical merged list (the butterfly
    is a full all-reduce, which the sharded steps rely on)."""
    t, n, k = 4, 32, 4
    d, i, p = _local_lists(t, n, k, seed=5)
    mesh = make_mesh(1, t, devices=jax.devices()[:t])

    def body(ld, li, lp):
        sq = lambda a: a.reshape(a.shape[1:])
        bi, bd, f, bp = merge_topk_tree(
            sq(ld), sq(li), sq(lp), k=k, axis_name=TARGETS_AXIS
        )
        # Re-gather what each device holds; equality across the axis is the
        # replication property.
        return all_gather_replicated(bd, TARGETS_AXIS)[None]

    run = jax.jit(
        jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(TARGETS_AXIS),) * 3,
            out_specs=P(TARGETS_AXIS),
            check_vma=False,
        )
    )
    per_dev = np.asarray(
        run(jnp.asarray(d), jnp.asarray(i), jnp.asarray(p))
    )  # (T, T, n, k)
    for s in range(1, t):
        np.testing.assert_array_equal(per_dev[0, 0], per_dev[s, 0])


@pytest.mark.parametrize("t", [2, 4, 8])
def test_scatter_merge_matches_all_gather_blocks(t):
    """Reduce-scatter combine: device r must end with block r of the flat
    all-gather merge (same candidates, same distances, same found mask)."""
    from probabilistic_point_clouds_registration_tpu.parallel import (
        merge_topk_scatter,
    )

    n, k = 64, 5
    assert n % t == 0
    d, i, p = _local_lists(t, n, k, seed=20 + t)
    mesh = make_mesh(1, t, devices=jax.devices()[:t])

    def body(ld, li, lp):
        sq = lambda a: a.reshape(a.shape[1:])
        bi, bd, f, bp, off = merge_topk_scatter(
            sq(ld), sq(li), sq(lp), k=k, axis_name=TARGETS_AXIS
        )
        # Re-gather the per-device blocks so the host can compare them
        # against the flat merge blockwise; also emit the offsets.
        return (
            bi[None], bd[None], f[None], bp[None],
            jnp.asarray(off)[None],
        )

    run = jax.jit(
        jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(TARGETS_AXIS),) * 3,
            out_specs=(P(TARGETS_AXIS),) * 5,
            check_vma=False,
        )
    )
    gi, gd, gf, gp, offs = run(
        jnp.asarray(d), jnp.asarray(i), jnp.asarray(p)
    )
    ri, rd, rf, rp = merge_topk(
        jnp.asarray(d), jnp.asarray(i), jnp.asarray(p), k=k
    )
    blk = n // t
    np.testing.assert_array_equal(
        np.asarray(offs), np.arange(t) * blk
    )
    for r in range(t):
        sl = slice(r * blk, (r + 1) * blk)
        np.testing.assert_array_equal(np.asarray(gf)[r], np.asarray(rf)[sl])
        m = np.asarray(rf)[sl]
        np.testing.assert_array_equal(
            np.asarray(gi)[r][m], np.asarray(ri)[sl][m]
        )
        np.testing.assert_array_equal(
            np.asarray(gd)[r][m], np.asarray(rd)[sl][m]
        )
        np.testing.assert_array_equal(
            np.asarray(gp)[r][m], np.asarray(rp)[sl][m]
        )


def test_sharded_merge_dispatch_non_pow2():
    """Non-pow2 axis sizes fall back to the all-gather merge."""
    t, n, k = 3, 16, 3
    d, i, _ = _local_lists(t, n, k, seed=9, with_p=False)
    mesh = make_mesh(1, t, devices=jax.devices()[:t])

    def body(ld, li):
        sq = lambda a: a.reshape(a.shape[1:])
        bi, bd, f = sharded_merge_topk(
            sq(ld), sq(li), k=k, axis_name=TARGETS_AXIS
        )
        return bi, bd, f

    run = jax.jit(
        jax.shard_map(
            body, mesh=mesh, in_specs=(P(TARGETS_AXIS),) * 2,
            out_specs=(P(),) * 3, check_vma=False,
        )
    )
    gi, gd, gf = run(jnp.asarray(d), jnp.asarray(i))
    ri, rd, rf = merge_topk(jnp.asarray(d), jnp.asarray(i), k=k)
    np.testing.assert_array_equal(np.asarray(gf), np.asarray(rf))
    m = np.asarray(rf)
    np.testing.assert_array_equal(np.asarray(gi)[m], np.asarray(ri)[m])
