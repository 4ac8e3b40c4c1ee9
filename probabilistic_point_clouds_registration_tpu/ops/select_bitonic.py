"""Bitonic partial-sort k-selection: the measured alternative to the
min-extraction loop of ops/fused_grid._select_kernel.

The extraction loop costs ~14 full-width VPU passes per output slot
(docs/PERF.md "pass-count analysis"); every reshuffle of that work was
break-even except a bitonic top-k, whose Mosaic throughput was unknown.
This module exists to settle that question with a kernel, not a model
(round-4 verdict item #1).

Selection contract (identical to the extraction loop): per source row, the
k smallest squared distances within ``radius``, ascending, ties broken by
candidate LANE order — i.e. ascending lexicographic (d2, lane) — emitted to
output slots [0, k); slots [k, kp) empty (d2=big, idx=-1, points 0).

Algorithm per block (lane width a power of two >= 128):

  1. d2 as in the loop kernel; keys = int32 bitcast of the masked d2
     (non-negative f32 bitcasts are order-isomorphic to int32), carried
     with an int32 lane plane for exact (d2, lane) tie order.
  2. Phase A: the standard bitonic network truncated at block size 32
     sorts every 32-lane block, directions alternating by bit 5 — exactly
     the asc/desc layout the first merge level needs.
  3. Phase B: log2(W/32) merge levels. Level at distance d: one
     compare-exchange keeping the min side at lanes with (lane & d) == 0
     (its partner block is descending, so the min side is the bitonic
     top-32 of the pair), then a 5-stage bitonic clean-up whose direction
     (lane & 2d) == 0 re-establishes asc/desc pairing for the next level.
     After the last level lanes [0, 32) hold the top-32 ascending.
  4. Recovery: the winner LANES (plane 2) one-hot-gather the candidate
     index and coordinates: per output slot one full-width equality pass +
     a masked sum per payload plane.

Every compare-exchange is 2 pltpu.roll + 10 elementwise passes over the
two (rows, W) planes; stage counts are 15 + 6 * log2(W/32). The pass-count
model puts this BEHIND the extraction loop at k = 20 (e.g. W = 512:
~39 stages + 9k recovery vs ~14k loop passes) unless Mosaic executes
roll+select stages several times cheaper than independent VPU passes —
benchmarks/probe_bitonic.py measures exactly that on hardware, and
docs/PERF.md records the verdict.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_grid import GROUP, _unpack_row_meta


def _pow2_limits(n_lanes: int) -> list[int]:
    """Ascending power-of-two branch widths for the predicated sort."""
    assert n_lanes & (n_lanes - 1) == 0, "bitonic select needs pow2 widths"
    lims, w = [], 128
    while w < n_lanes:
        lims.append(w)
        w *= 2
    lims.append(n_lanes)
    return lims


def _bitonic_select_kernel(wb_ref, ub_ref, xyz_ref, idx_ref, src_ref,
                           outd_ref, outi_ref, *outp_refs, k, kp, r2,
                           n_lanes, recover):
    """Drop-in alternative body for fused_grid._select_kernel (same refs).

    ``recover=False`` skips the payload one-hot gathers and writes the
    winner LANE ids to ``outi_ref`` instead — the microbenchmark mode that
    isolates the sort network's throughput.
    """
    bg = xyz_ref.shape[0]
    bs = bg * GROUP
    big = jnp.float32(3e38)
    wb = wb_ref[pl.program_id(0)]
    col = lax.broadcasted_iota(jnp.int32, (bs, kp), 1)

    @pl.when(wb == 0)
    def _dead_block():
        outd_ref[:] = jnp.full((bs, kp), big, jnp.float32)
        outi_ref[:] = jnp.full((bs, kp), -1, jnp.int32)
        for ref in outp_refs:
            ref[:] = jnp.zeros((bs, kp), jnp.float32)

    def extract(lim: int):
        def rep(x):
            return jnp.broadcast_to(x[:, None, :], (bg, GROUP, lim)).reshape(
                bs, lim
            )

        cx = rep(xyz_ref[:, 0, :lim])
        cy = rep(xyz_ref[:, 1, :lim])
        cz = rep(xyz_ref[:, 2, :lim])
        ci = rep(idx_ref[:, :lim])
        sx = src_ref[:, 0:1]
        sy = src_ref[:, 1:2]
        sz = src_ref[:, 2:3]
        valid, lo, hi = _unpack_row_meta(src_ref[:, 3:4])
        dx = cx - sx
        dy = cy - sy
        dz = cz - sz
        d2 = dx * dx + dy * dy + dz * dz
        lane = lax.broadcasted_iota(jnp.int32, (bs, lim), 1)
        seg = (lane >= lo) & (lane < hi)
        live = (ci >= 0) & valid & (d2 <= r2) & seg
        d2 = jnp.where(live, d2, big)

        # Masked d2 is finite and >= 0 (dead lanes are exactly `big`), so
        # the int32 bitcast is order-isomorphic and compares integer-cheap.
        ki = pltpu.bitcast(d2, jnp.int32)
        li = lane

        def stage(ki, li, d: int, dir_up):
            """One compare-exchange at XOR distance ``d``.

            ``dir_up`` is a (bs/1, lim) bool (or True): lanes in an
            ascending run keep the (d2, lane)-lex min at the lower partner.
            Partner fetch: (lane & d) == 0 pairs with +d, else -d — two
            cyclic rolls + a select (pairs never straddle a 2d-aligned
            block, so the wrap never leaks between pairs).
            """
            maskd = (lane & d) == 0
            pk = jnp.where(
                maskd,
                pltpu.roll(ki, lim - d, 1),  # value from lane + d
                pltpu.roll(ki, d, 1),  # value from lane - d
            )
            pli = jnp.where(
                maskd, pltpu.roll(li, lim - d, 1), pltpu.roll(li, d, 1)
            )
            gt = (ki > pk) | ((ki == pk) & (li > pli))
            keep_small = (
                maskd if dir_up is True else jnp.logical_not(maskd ^ dir_up)
            )
            take = gt == keep_small
            return jnp.where(take, pk, ki), jnp.where(take, pli, li)

        # Phase A: 32-blocks sorted, direction alternating by bit 5 (the
        # standard network truncated at block size 32).
        for kb in (2, 4, 8, 16, 32):
            dir_up = (lane & kb) == 0
            d = kb // 2
            while d:
                ki, li = stage(ki, li, d, dir_up)
                d //= 2
        # Phase B: top-32 merge tree (see module docstring).
        d = 32
        while d < lim:
            ki, li = stage(ki, li, d, True)
            dir_up = (lane & (2 * d)) == 0
            for j in (16, 8, 4, 2, 1):
                ki, li = stage(ki, li, j, dir_up)
            d *= 2

        # Lanes [0, 32) now hold the top-32 (d2, lane) ascending.
        top_d = pltpu.bitcast(ki, jnp.float32)[:, :32]
        top_l = li[:, :32]
        if kp != 32:
            pad = kp - 32
            top_d = jnp.pad(top_d, ((0, 0), (0, pad)), constant_values=big)
            top_l = jnp.pad(top_l, ((0, 0), (0, pad)), constant_values=0)
        emit = col < k  # slots [k, kp) stay empty, like the loop kernel
        found = (top_d < big) & emit
        outd_ref[:] = jnp.where(found, top_d, big)
        if not recover:
            outi_ref[:] = jnp.where(found, top_l, -1)
            for ref in outp_refs:
                ref[:] = jnp.zeros((bs, kp), jnp.float32)
            return
        # Payload recovery: per output slot, one-hot the winner lane over
        # the full width and masked-sum each payload plane (lanes are
        # unique per row, so the sum selects exactly one value).
        outi = jnp.full((bs, kp), -1, jnp.int32)
        has_p = bool(outp_refs)
        ops = [jnp.zeros((bs, kp), jnp.float32) for _ in outp_refs]
        for j in range(k):
            sel = lane == top_l[:, j : j + 1]
            hit = (col == j) & found[:, j : j + 1]
            cij = jnp.sum(
                jnp.where(sel, ci, 0), axis=1, keepdims=True,
                dtype=jnp.int32,
            )
            outi = jnp.where(hit, cij, outi)
            if has_p:
                ops = [
                    jnp.where(
                        hit,
                        jnp.sum(
                            jnp.where(sel, c, 0.0), axis=1, keepdims=True
                        ),
                        op,
                    )
                    for op, c in zip(ops, (cx, cy, cz))
                ]
        outi_ref[:] = outi
        for ref, op in zip(outp_refs, ops):
            ref[:] = op

    lo = 0
    limits = _pow2_limits(n_lanes)
    for i, lim in enumerate(limits):
        cond = (wb > lo) if i == len(limits) - 1 else (wb > lo) & (wb <= lim)
        pl.when(cond)(partial(extract, lim))
        lo = lim


def run_select_bitonic(padded, win_xyz, win_idx, w_blk, u_blk, *, k, n_lanes,
                       radius, block_groups=16, interpret=False,
                       return_points=False, recover=True):
    """Invoke the bitonic select kernel (mirror of fused_grid._run_select).

    Only k <= 32 is supported (kp = 32 — one 32-block holds the result);
    wider k stays on the extraction loop, which has no such bound.
    """
    from .fused_grid import BLOCK_GROUPS  # default parity with _run_select

    assert k <= 32, "bitonic select packs the result in one 32-lane block"
    block_groups = block_groups or BLOCK_GROUPS
    s_pad = padded.shape[0]
    ng = s_pad // GROUP
    kp = 32
    kernel = partial(
        _bitonic_select_kernel, k=k, kp=kp, r2=np.float32(radius) ** 2,
        n_lanes=n_lanes, recover=recover,
    )
    bs = block_groups * GROUP
    out_specs = [
        pl.BlockSpec((bs, kp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bs, kp), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((s_pad, kp), jnp.float32),
        jax.ShapeDtypeStruct((s_pad, kp), jnp.int32),
    ]
    if return_points:
        for _ in range(3):
            out_specs.append(
                pl.BlockSpec((bs, kp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
            )
            out_shape.append(jax.ShapeDtypeStruct((s_pad, kp), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=(ng // block_groups,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (block_groups, 3, n_lanes), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((block_groups, n_lanes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(w_blk, u_blk, win_xyz.astype(jnp.float32), win_idx,
      padded.astype(jnp.float32))
    if return_points:
        return outs[0], outs[1], tuple(outs[2:5])
    return outs[0], outs[1], None
