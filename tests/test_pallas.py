"""Pallas top-K kernel: parity with the XLA search engine (interpret mode).

On CPU the kernel runs under the Pallas interpreter; the driver's TPU bench
exercises the compiled path. Oracle: ops.neighbors.radius_search.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from probabilistic_point_clouds_registration_tpu.core.types import pad_cloud, valid_mask
from probabilistic_point_clouds_registration_tpu.io.synthetic import bunny_like, wave_grid
from probabilistic_point_clouds_registration_tpu.ops.neighbors import radius_search
from probabilistic_point_clouds_registration_tpu.ops.neighbors_pallas import (
    pallas_radius_search,
)


def _parity(src_np, tgt_np, k, radius):
    src_p, n_src = pad_cloud(src_np.astype(np.float32), 64, pad_value=0.0)
    tgt_p, n_tgt = pad_cloud(tgt_np.astype(np.float32), 64, pad_value=0.0)
    sv = valid_mask(src_p.shape[0], n_src)
    tv = valid_mask(tgt_p.shape[0], n_tgt)
    source = jnp.asarray(src_p, jnp.float32)
    target = jnp.asarray(tgt_p, jnp.float32)

    ref = radius_search(
        source, target, k=k, radius=radius, source_valid=sv, target_valid=tv,
        source_tile=256, target_tile=256,
    )
    got = pallas_radius_search(
        source, target, k=k, radius=radius, source_valid=sv, target_valid=tv,
        source_tile=256, target_tile=256, interpret=True,
    )

    np.testing.assert_array_equal(
        np.asarray(got.mask).sum(1), np.asarray(ref.mask).sum(1)
    )
    for gi, gd, ri, rd, m in zip(
        np.asarray(got.indices), np.asarray(got.sq_dists),
        np.asarray(ref.indices), np.asarray(ref.sq_dists), np.asarray(ref.mask),
    ):
        nm = m.sum()
        assert set(gi[:nm]) == set(ri[:nm])
        # Distances agree to f32 matmul-expansion tolerance (the XLA engine
        # recomputes gathered distances exactly; the kernel keeps the
        # expansion value).
        np.testing.assert_allclose(np.sort(gd[:nm]), np.sort(rd[:nm]), atol=1e-5)


def test_pallas_matches_xla_wave():
    src = wave_grid()
    rng = np.random.default_rng(0)
    tgt = src + rng.normal(scale=0.05, size=src.shape)
    _parity(src, tgt, k=8, radius=0.7)


def test_pallas_matches_xla_bunny():
    tgt = bunny_like(2000)
    src = bunny_like(1500, seed=3)
    _parity(src, tgt, k=10, radius=0.15)


def test_pallas_no_neighbors():
    rng = np.random.default_rng(1)
    src = rng.random((200, 3)).astype(np.float32)
    tgt = (rng.random((300, 3)) + 50.0).astype(np.float32)
    _parity(src, tgt, k=5, radius=0.5)
