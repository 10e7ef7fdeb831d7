"""Pallas TPU kernel for the intersection hot loop.

TPU-native replacement for the `raytrace` kernel's inner scalar triangle
loops (gpu/hit.cu:8-114: one CUDA thread per ray, serial Möller–Trumbore per
triangle). Here a (ray-tile x triangle-tile) grid keeps both operands
resident in VMEM and evaluates all pairs as 2D vector ops on the 8x128 VPU:

  grid = (T/TILE_T, R/TILE_R), i (rays) innermost — triangle blocks pad
  their 3-wide minor dim to 128 VMEM lanes, so they are loaded ONCE each
  (outer axis) while the compact ray planes stream per cell
  per step: a (TILE_T, TILE_R) Möller–Trumbore pair tile — triangles on the
  sublane axis, rays on the lane axis — reduced over sublanes into the
  revisited (1, TILE_R) running (min-dist, argmin) row of the full
  (nr, TILE_R) accumulator block.

The strictly-less `<` accumulation preserves the reference's linear-scan
tie-break (cpu/hit.c:60: first triangle with a strictly smaller distance
wins), because tiles sweep triangles in ascending index order and the
within-tile argmin takes the smallest row.

Layouts: triangles as (T,3) v0/e1/e2 so a component slice is a (TILE_T,1)
column; rays as (3,R) planes so a component slice is a (1,TILE_R) lane row.
Every intermediate is a well-tiled (TILE_T, TILE_R) f32 array; reductions
run over sublanes. `lax.select` is used instead of `jnp.where` in-kernel
(jnp.where lowers through a nested jit that Mosaic rejects).

The winner's hit point/normal are reconstructed outside the kernel by
re-running single-triangle Möller–Trumbore on the fetched winner (R x 1
work) — keeping the sweep kernel to two small outputs; the fetch itself is
another Pallas kernel (in-VMEM one-hot matmuls over a tight winner-tile
worklist, custom-VJP scatter adjoint).

Tile-level culling (the runtime PARTITIONING_{NONE,AABB,OCTREE} matrix,
gpu/CMakeLists.txt:12-15): tile_cull_mask_hierarchical builds a (nT, nR)
pair-tile mask (brute force / flat exact slab tests / coarse-to-fine
morton-tile hierarchy) which tile_worklist turns into scalar-prefetched
per-triangle-tile worklists — the kernels execute ONLY surviving pairs, so
collide cost tracks visible geometry instead of total triangle count (the
gpu/hit.cu:120-169 octree-DFS scaling story, recast data-parallel).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_R = 256
# Triangle-tile (leaf) granularity of the sweep kernels AND the culling
# hierarchy: smaller tiles cull tighter (fewer executed pairs at scale) but
# add per-grid-cell scalar/DMA overhead. 256 is the tuned default;
# RGT_TILE_T is the experiment knob (read at import).
TILE_T = int(os.environ.get("RGT_TILE_T", "256"))

# MXU matmul precision for the mxu backend (experiment knob, read at trace
# time). "highest" = 6-pass bf16 decomposition, f32-accurate (~1.6e-7 max
# rel err measured on-chip) — the default and the only setting whose
# renders pass the oracle suite. "default" = single-pass bf16: ~3x the raw
# matmul throughput, but determinant error ~1e-3 flips accept/reject tests
# well beyond geometry edges — measured and documented in BASELINE.md
# rather than offered as a config field.
_MXU_PRECISION = {
    "highest": lax.Precision.HIGHEST,
    "default": lax.Precision.DEFAULT,
}[os.environ.get("RGT_MXU_PRECISION", "highest").lower()]
_INF = float("inf")  # plain float: jnp scalars would be captured consts in-kernel


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _sel(pred, a, b):
    """Shape-matched select (Mosaic-safe jnp.where substitute)."""
    return lax.select(pred, jnp.broadcast_to(a, pred.shape).astype(b.dtype), b)


def _mt_tile(o_ref, d_ref, v0_ref, e1_ref, e2_ref, mt_eps, self_hit_eps,
             ref_dist: bool = False):
    """Möller–Trumbore pair tile -> dist (TILE_T, TILE_R), inf on reject.

    Arithmetic order matches cpu/hit.c:4-70.

    ref_dist=True computes the distance exactly as the reference does for
    winner selection: |fl(o + nd*(t*|d|)) - o| (cpu/hit.c:36-38,57) instead
    of t*|d|. The two differ by ~1 ulp, which decides real winners on
    tessellation seams (mirrored triangle pairs 0-1 ulp apart — the
    center-column stripe, see ops/intersect.py _mt_core). The nearest-hit
    kernels use it; the dist-only shadow kernels keep the cheap t*|d|
    (their result is consumed as a boolean any-hit, cpu/light.c:24-31).
    """
    ox, oy, oz = (o_ref[k:k + 1, :] for k in range(3))  # (1,R)
    dx, dy, dz = (d_ref[k:k + 1, :] for k in range(3))
    v0x, v0y, v0z = (v0_ref[:, k:k + 1] for k in range(3))  # (T,1)
    e1x, e1y, e1z = (e1_ref[:, k:k + 1] for k in range(3))
    e2x, e2y, e2z = (e2_ref[:, k:k + 1] for k in range(3))

    # h = cross(d, e2)
    hx = dy * e2z - dz * e2y  # (T,R)
    hy = dz * e2x - dx * e2z
    hz = dx * e2y - dy * e2x
    a = e1x * hx + e1y * hy + e1z * hz
    ok = jnp.abs(a) >= mt_eps
    f = 1.0 / _sel(ok, a, jnp.ones_like(a))
    sx = ox - v0x
    sy = oy - v0y
    sz = oz - v0z
    u = f * (sx * hx + sy * hy + sz * hz)
    ok &= (u >= 0.0) & (u <= 1.0)
    # q = cross(s, e1)
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = f * (dx * qx + dy * qy + dz * qz)
    ok &= (v >= 0.0) & (u + v <= 1.0)
    t = f * (e2x * qx + e2y * qy + e2z * qz)
    ok &= t > mt_eps

    dlen2 = dx * dx + dy * dy + dz * dz  # (1,R)
    dlen = jnp.sqrt(_sel(dlen2 > 0.0, dlen2, jnp.ones_like(dlen2)))
    if ref_dist:
        ndx, ndy, ndz = dx / dlen, dy / dlen, dz / dlen  # (1,R) per ray
        td = t * dlen  # (T,R)
        ddx = (ox + ndx * td) - ox
        ddy = (oy + ndy * td) - oy
        ddz = (oz + ndz * td) - oz
        dist = jnp.sqrt((ddx * ddx + ddy * ddy) + ddz * ddz)
    else:
        dist = t * dlen
    ok &= dist > self_hit_eps
    return _sel(ok, dist, jnp.full_like(dist, _INF))


def _accum_nearest(i, j, dist, dist_ref, idx_ref):
    """Fold a (TILE_T, TILE_R) pair-tile distance block into the running
    (min-dist, argmin) accumulator rows for ray tile i."""
    tmin = jnp.min(dist, axis=0, keepdims=True)  # (1, TR)
    rows = lax.broadcasted_iota(jnp.int32, dist.shape, 0)
    # first-occurrence argmin: smallest row among minima
    is_min = dist == jnp.broadcast_to(tmin, dist.shape)
    targ = jnp.min(_sel(is_min, rows, jnp.full_like(rows, TILE_T)),
                   axis=0, keepdims=True)  # (1, TR)
    acc = dist_ref[pl.ds(i, 1), :]
    better = tmin < acc  # strict: earlier tile wins ties
    dist_ref[pl.ds(i, 1), :] = lax.select(better, tmin, acc)
    idx_ref[pl.ds(i, 1), :] = lax.select(
        better, j * TILE_T + targ, idx_ref[pl.ds(i, 1), :]
    )


def _nearest_kernel(order_ref, count_ref, o_ref, d_ref, v0_ref, e1_ref,
                    e2_ref, dist_ref, idx_ref, *, mt_eps, self_hit_eps):
    """dist_ref/idx_ref hold the FULL (nr, TILE_R) result in VMEM (a few
    hundred KB); row i is the running accumulator for ray tile i, updated
    with a dynamic sublane slice. Mosaic requires block dims divisible by
    (8,128) or whole — (1, TILE_R) per-i blocks are neither.

    Grid order: TRIANGLE tile outer, ray tile inner. Each (TILE_T, 3)
    triangle block pads its 3-wide minor dim to 128 lanes in VMEM, so
    re-fetching triangles per cell (rays inner would be per-cell tri DMA)
    costs nr*Tp*512B — gigabytes per call on a megapixel render. Rays inner
    makes the small (3, TILE_R) ray planes the streamed operand and loads
    every triangle block exactly once. Per-ray-tile tie-break order over j
    is unchanged (ascending), preserving the reference's first-strictly-
    smaller winner."""
    j = pl.program_id(0)
    k = pl.program_id(1)
    i = order_ref[j, k]  # ray tile this cell serves (worklist order)

    @pl.when((k == 0) & (j == 0))
    def _():
        dist_ref[:, :] = jnp.full(dist_ref.shape, _INF, jnp.float32)
        idx_ref[:, :] = jnp.zeros(idx_ref.shape, jnp.int32)

    @pl.when(k < count_ref[j])
    def _():
        dist = _mt_tile(o_ref, d_ref, v0_ref, e1_ref, e2_ref,
                        mt_eps, self_hit_eps, ref_dist=True)  # (TT, TR)
        _accum_nearest(i, j, dist, dist_ref, idx_ref)


@functools.partial(jax.jit, static_argnames=("mt_eps", "self_hit_eps"))
def nearest_hit_pallas(origins_p, dirs_p, v0, e1, e2, tile_mask,
                       mt_eps: float, self_hit_eps: float):
    """Min-distance + winner index over all (ray, triangle) pairs.

    origins_p/dirs_p: (3, R) with R % TILE_R == 0.
    v0/e1/e2: (T, 3) with T % TILE_T == 0 (invalid triangles must be
      degenerate: e1 = e2 = 0 -> |a| < eps rejects them).
    tile_mask: (nT, nR) int32 — 0 skips the pair tile entirely (AABB
      culling); pass ones for brute force. Stored triangle-tile-major
      because scalar-prefetch SMEM operands pad the minor dimension to the
      128-lane width: with rays minor the padded footprint stays ~4*nT*nR
      bytes instead of 512*nR.
    Returns (dist (R,), idx (R,)) with dist == +inf on miss.
    """
    R = origins_p.shape[1]
    T = v0.shape[0]
    nr, nt = R // TILE_R, T // TILE_T
    kernel = functools.partial(
        _nearest_kernel, mt_eps=mt_eps, self_hit_eps=self_hit_eps
    )
    ray_ix = lambda j, k, order, count: (0, order[j, k])
    tri_ix = lambda j, k, order, count: (j, 0)

    def one_chunk(v0c, e1c, e2c, maskc):
        ntc = maskc.shape[0]
        order, count = tile_worklist(maskc)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # worklist (order, count) lives in SMEM
            grid=(ntc, nr),
            in_specs=[
                pl.BlockSpec((3, TILE_R), ray_ix, memory_space=pltpu.VMEM),
                pl.BlockSpec((3, TILE_R), ray_ix, memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_T, 3), tri_ix, memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_T, 3), tri_ix, memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_T, 3), tri_ix, memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((nr, TILE_R), lambda j, k, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((nr, TILE_R), lambda j, k, *_: (0, 0), memory_space=pltpu.VMEM),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((nr, TILE_R), jnp.float32),
                jax.ShapeDtypeStruct((nr, TILE_R), jnp.int32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=int(nr) * int(ntc) * TILE_R * TILE_T * 60,
                bytes_accessed=(nr * 6 * TILE_R + ntc * 9 * TILE_T) * 4,
                transcendentals=nr * ntc * TILE_R,
            ),
            interpret=_interpret(),
        )(order, count, origins_p, dirs_p, v0c, e1c, e2c)

    dist = idx = None
    for s, n in _tri_tile_chunks(nt, nr):
        lo, hi = s * TILE_T, (s + n) * TILE_T
        d_c, i_c = one_chunk(v0[lo:hi], e1[lo:hi], e2[lo:hi],
                             tile_mask[s:s + n])
        i_c = i_c + lo  # chunk-local slot -> global slot
        if dist is None:
            dist, idx = d_c, i_c
        else:
            dist, idx = _combine_nearest(dist, idx, d_c, i_c)
    return dist.reshape(R), idx.reshape(R)


def _accum_min(i, dist, dist_ref):
    """Fold a pair-tile distance block into the running min row for ray tile
    i — the dist-only epilogue (no argmin bookkeeping). Shadow rays consume
    only `dist != 0` (the has_direct_hit quirk, cpu/light.c:24-31) and
    collide_dist returns just the distance (cpu/hit.c:93-109), so the winner
    index is never needed on that path."""
    tmin = jnp.min(dist, axis=0, keepdims=True)
    dist_ref[pl.ds(i, 1), :] = jnp.minimum(tmin, dist_ref[pl.ds(i, 1), :])


def _dist_kernel(order_ref, count_ref, o_ref, d_ref, v0_ref, e1_ref,
                 e2_ref, dist_ref, *, mt_eps, self_hit_eps):
    """`_nearest_kernel` without the argmin/idx output — see _accum_min."""
    j = pl.program_id(0)
    k = pl.program_id(1)
    i = order_ref[j, k]

    @pl.when((k == 0) & (j == 0))
    def _():
        dist_ref[:, :] = jnp.full(dist_ref.shape, _INF, jnp.float32)

    @pl.when(k < count_ref[j])
    def _():
        dist = _mt_tile(o_ref, d_ref, v0_ref, e1_ref, e2_ref,
                        mt_eps, self_hit_eps)
        _accum_min(i, dist, dist_ref)


@functools.partial(jax.jit, static_argnames=("mt_eps", "self_hit_eps"))
def nearest_dist_pallas(origins_p, dirs_p, v0, e1, e2, tile_mask,
                        mt_eps: float, self_hit_eps: float):
    """Min distance only (no winner index) — the collide_dist hot path."""
    R = origins_p.shape[1]
    T = v0.shape[0]
    nr, nt = R // TILE_R, T // TILE_T
    kernel = functools.partial(
        _dist_kernel, mt_eps=mt_eps, self_hit_eps=self_hit_eps
    )
    ray_ix = lambda j, k, order, count: (0, order[j, k])
    tri_ix = lambda j, k, order, count: (j, 0)

    dist = None
    for s, n in _tri_tile_chunks(nt, nr):
        lo, hi = s * TILE_T, (s + n) * TILE_T
        order, count = tile_worklist(tile_mask[s:s + n])
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n, nr),
            in_specs=[
                pl.BlockSpec((3, TILE_R), ray_ix, memory_space=pltpu.VMEM),
                pl.BlockSpec((3, TILE_R), ray_ix, memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_T, 3), tri_ix, memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_T, 3), tri_ix, memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_T, 3), tri_ix, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((nr, TILE_R), lambda j, k, *_: (0, 0),
                                   memory_space=pltpu.VMEM),
        )
        d_c = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nr, TILE_R), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=int(nr) * int(n) * TILE_R * TILE_T * 60,
                bytes_accessed=(nr * 6 * TILE_R + n * 9 * TILE_T) * 4,
                transcendentals=nr * n * TILE_R,
            ),
            interpret=_interpret(),
        )(order, count, origins_p, dirs_p, v0[lo:hi], e1[lo:hi], e2[lo:hi])
        dist = d_c if dist is None else jnp.minimum(dist, d_c)
    return dist.reshape(R)


def _any_kernel(order_ref, count_ref, dead_ref, o_ref, d_ref, v0_ref, e1_ref,
                e2_ref, occ_ref, *, mt_eps, self_hit_eps):
    """Boolean ANY-hit sweep with a per-ray-tile all-occluded early-out.

    The shadow consumer's actual semantics: `has_direct_hit`
    (cpu/light.c:24-31) occludes on ANY accepted hit — the nested
    `if (fdist < 1) if (fdist == 0)` makes the distance comparison dead
    code — so the min-dist bookkeeping of _dist_kernel is wasted work, and
    once every live ray of a ray tile is occluded, every remaining triangle
    tile on that tile's worklist is dead: the reference's per-thread shadow
    early exit (the `return` inside collide_dist's caller), recast at tile
    granularity. Dead/parked ray lanes (origin >= 1e20 — shadow rays of
    missed primaries; their results are discarded by the caller's hit.mask)
    are seeded OCCLUDED via dead_ref so a few parked lanes cannot pin an
    otherwise-saturated tile; the wrapper clears them after the sweep.

    The check costs one (1, TILE_R) reduction per executed cell vs the
    ~60-op (TILE_T, TILE_R) Möller–Trumbore tile it can skip.
    """
    j = pl.program_id(0)
    k = pl.program_id(1)
    i = order_ref[j, k]

    @pl.when((k == 0) & (j == 0))
    def _():
        occ_ref[:, :] = dead_ref[:, :]

    @pl.when(k < count_ref[j])
    def _():
        row = occ_ref[pl.ds(i, 1), :]  # (1, TILE_R) int32 0/1

        @pl.when(jnp.sum(row) < TILE_R)
        def _():
            dist = _mt_tile(o_ref, d_ref, v0_ref, e1_ref, e2_ref,
                            mt_eps, self_hit_eps)
            hit = jnp.any(dist < _INF, axis=0, keepdims=True)  # (1, TILE_R)
            occ_ref[pl.ds(i, 1), :] = row | hit.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("mt_eps", "self_hit_eps"))
def any_hit_pallas(origins_p, dirs_p, v0, e1, e2, tile_mask,
                   mt_eps: float, self_hit_eps: float):
    """(R,) bool — True iff the ray has ANY accepted hit (the shadow-ray
    occlusion test). Exactly `nearest_dist_pallas(...) != 0`: acceptance is
    the identical `ok` chain, only the min-dist fold is dropped. Dead rays
    (parked origin >= 1e20) report False."""
    R = origins_p.shape[1]
    T = v0.shape[0]
    nr, nt = R // TILE_R, T // TILE_T
    live = jnp.all(jnp.abs(origins_p) < 1e20, axis=0)  # (R,)
    dead2d = (~live).reshape(nr, TILE_R).astype(jnp.int32)
    kernel = functools.partial(
        _any_kernel, mt_eps=mt_eps, self_hit_eps=self_hit_eps
    )
    ray_ix = lambda j, k, order, count: (0, order[j, k])
    tri_ix = lambda j, k, order, count: (j, 0)

    occ = None
    for s, n in _tri_tile_chunks(nt, nr):
        lo, hi = s * TILE_T, (s + n) * TILE_T
        order, count = tile_worklist(tile_mask[s:s + n])
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n, nr),
            in_specs=[
                pl.BlockSpec((nr, TILE_R), lambda j, k, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, TILE_R), ray_ix, memory_space=pltpu.VMEM),
                pl.BlockSpec((3, TILE_R), ray_ix, memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_T, 3), tri_ix, memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_T, 3), tri_ix, memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_T, 3), tri_ix, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((nr, TILE_R), lambda j, k, *_: (0, 0),
                                   memory_space=pltpu.VMEM),
        )
        o_c = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nr, TILE_R), jnp.int32),
            cost_estimate=pl.CostEstimate(
                flops=int(nr) * int(n) * TILE_R * TILE_T * 60,
                bytes_accessed=(nr * 7 * TILE_R + n * 9 * TILE_T) * 4,
                transcendentals=nr * n * TILE_R,
            ),
            interpret=_interpret(),
        )(order, count, dead2d, origins_p, dirs_p,
          v0[lo:hi], e1[lo:hi], e2[lo:hi])
        occ = o_c if occ is None else occ | o_c
    # later chunks re-seed dead lanes to 1; clear them (and any lane the
    # seeding set) so dead rays report unoccluded like collide_dist's 0.0
    return (occ.reshape(R) > 0) & live


# ---------------------------------------------------------------------------
# Winner-row fetch kernel
#
# After the sweep, each ray holds a winner slot index into the clustered
# table. XLA's TPU row-gather is a serial loop (~0.5µs/row) and the XLA
# one-hot matmul workaround materializes an (R, Tp) f32 one-hot in HBM
# (measured 3.8 ms/frame on susan, and O(R*Tp) memory — 26 GB at 100k
# triangles). This kernel keeps the one-hot entirely in VMEM: per ray tile,
# sweep ONLY the triangle tiles that actually contain winners (a tight
# worklist computed from the winner tile ids), building a (TILE_T, TILE_R)
# one-hot block and accumulating table_t @ onehot on the MXU. Exact: every
# output element is a single 1.0*x product.
# ---------------------------------------------------------------------------


def _fetch_kernel(order_ref, count_ref, idx_ref, tab_ref, out_ref):
    i = pl.program_id(0)  # ray tile
    k = pl.program_id(1)  # position in ray tile i's winner-tile worklist

    @pl.when(k == 0)
    def _():
        out_ref[:, :, :] = jnp.zeros(out_ref.shape, jnp.float32)

    @pl.when(k < count_ref[i])
    def _():
        j = order_ref[i, k]
        rows = lax.broadcasted_iota(jnp.int32, (TILE_T, TILE_R), 0) \
            + j * TILE_T
        onehot = (rows == idx_ref[0]).astype(jnp.float32)  # (TT, TR)
        contrib = lax.dot_general(
            tab_ref[:, :], onehot, (((1,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # (C, TR)
        out_ref[0, :, :] = out_ref[0, :, :] + contrib


def _fetch_small_kernel(order_ref, count_ref, idx_ref, tab_ref, out_ref):
    """Small-table fetch: ONE grid cell per ray tile, whole table resident.

    The two-axis (nr, kmax) fetch grid pays grid-sequencing overhead for
    every cell, and with winners concentrated in 1-3 tiles most cells are
    pl.when-skipped yet still sequenced — measured 1.98 ms of susan's
    16.4 ms frame for ~1 µs of real work per active cell. When the whole
    (nt, C, TILE_T) table fits comfortably in VMEM, collapse to a (nr,)
    grid and fori_loop over exactly count[i] winner tiles: 4x fewer cells
    on susan, zero skipped-cell sequencing, identical output (same one-hot
    MXU products in the same accumulation order).
    """
    i = pl.program_id(0)
    C, tt = tab_ref.shape[1], tab_ref.shape[2]

    def body(l, acc):
        j = order_ref[i, l]
        rows = lax.broadcasted_iota(jnp.int32, (tt, TILE_R), 0) + j * tt
        onehot = (rows == idx_ref[0]).astype(jnp.float32)
        tb = tab_ref[pl.ds(j, 1), :, :][0]  # (C, TILE_T)
        return acc + lax.dot_general(
            tb, onehot, (((1,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

    out_ref[0, :, :] = lax.fori_loop(
        0, count_ref[i], body, jnp.zeros((C, TILE_R), jnp.float32))


# whole-table VMEM residency cap for the single-phase fetch kernel (bytes);
# well under the ~16 MB VMEM with the (C, TILE_R) accumulator + ray blocks
_FETCH_SMALL_TABLE_BYTES = 4 * 1024 * 1024


def _fetch_rows_impl(table, idx2d):
    """(R, C) winner rows from a (Tp, C) table and (nr, TILE_R) slot ids."""
    nr = idx2d.shape[0]
    Tp, C = table.shape
    nt = Tp // TILE_T
    if Tp * C * 4 <= _FETCH_SMALL_TABLE_BYTES:
        win_tile = idx2d // TILE_T  # (nr, TILE_R)
        present = jnp.any(
            win_tile[:, :, None] == jnp.arange(nt, dtype=idx2d.dtype), axis=1
        )  # (nr, nt)
        order, count = tile_worklist(present.astype(jnp.int32))
        kmax = min(nt, TILE_R)
        order = order[:, :kmax]
        tab3 = table.T.reshape(C, nt, TILE_T).transpose(1, 0, 2)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nr,),
            in_specs=[
                pl.BlockSpec((1, 1, TILE_R), lambda i, order, count: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nt, C, TILE_T), lambda i, order, count: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, C, TILE_R), lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        out = pl.pallas_call(
            _fetch_small_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nr, C, TILE_R), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=int(nr) * 2 * C * TILE_T * TILE_R,
                bytes_accessed=(nr * TILE_R * (C + 1) + C * Tp) * 4,
                transcendentals=0,
            ),
            interpret=_interpret(),
        )(order, count, idx2d[:, None, :], tab3)
        return out.transpose(0, 2, 1).reshape(nr * TILE_R, C)
    # tight worklist: only tiles that contain some ray's winner (each ray
    # has exactly one winner tile, so count is typically 1-3 per ray tile)
    win_tile = idx2d // TILE_T  # (nr, TILE_R)
    present = jnp.any(
        win_tile[:, :, None] == jnp.arange(nt, dtype=idx2d.dtype), axis=1
    )  # (nr, nt)
    order, count = tile_worklist(present.astype(jnp.int32))
    # Each of the TILE_R rays in a tile contributes exactly one winner tile,
    # so a row of `present` has at most min(nt, TILE_R) ones: the worklist
    # (and the grid's k axis) can be statically capped there. This keeps the
    # prefetched SMEM operand at <= nr*TILE_R*4 bytes regardless of triangle
    # count — the dense (nr, nt) worklist OOM'd the ~1MB scalar memory at
    # the 246k-triangle scale tier.
    kmax = min(nt, TILE_R)
    order = order[:, :kmax]
    tab_t = table.T  # (C, Tp) — lane-major blocks for the kernel

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nr, kmax),
        in_specs=[
            # (nr, 1, TILE_R): Mosaic requires the last TWO block dims to be
            # tile-divisible or whole — a (1, TILE_R) block of (nr, TILE_R)
            # is neither when nr > 1, so the ray-tile axis is hoisted out
            pl.BlockSpec((1, 1, TILE_R), lambda i, k, order, count: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, TILE_T),
                         lambda i, k, order, count: (0, order[i, k]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, TILE_R), lambda i, k, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _fetch_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nr, C, TILE_R), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=int(nr) * 2 * C * TILE_T * TILE_R,
            bytes_accessed=(nr * TILE_R * (C + 1) + C * Tp) * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(order, count, idx2d[:, None, :], tab_t)
    return out.transpose(0, 2, 1).reshape(nr * TILE_R, C)


@jax.custom_vjp
def fetch_winner_rows(table, idx2d):
    """Differentiable winner-row fetch: rows = table[idx] via the VMEM
    one-hot kernel, with a custom VJP routing the row cotangents back to the
    table by scatter-add (the exact adjoint of a gather). idx2d is the
    (nr, TILE_R) winner-slot array straight from the sweep kernels."""
    return _fetch_rows_impl(table, idx2d)


def _fetch_fwd(table, idx2d):
    return _fetch_rows_impl(table, idx2d), (idx2d, table.shape)


def _fetch_bwd(res, g):  # g: (nr*TILE_R, C)
    idx2d, shape = res
    d_table = jnp.zeros(shape, g.dtype).at[idx2d.reshape(-1)].add(g)
    import numpy as np

    return d_table, np.zeros(idx2d.shape, jax.dtypes.float0)


fetch_winner_rows.defvjp(_fetch_fwd, _fetch_bwd)


# ---------------------------------------------------------------------------
# MXU (matmul) formulation
#
# Möller–Trumbore's four per-pair determinants are *bilinear* in the ray and
# the triangle: with per-ray features F = [d, m=o×d, o, 1, |d|] and
# per-triangle feature rows G built from {n=e1×e2, e2, e2×v0, e1, v0×e1,
# v0·n}, each determinant is one row of G @ F (scalar triple-product
# expansions; [a,b,c] = a·(b×c) is cyclic):
#
#   a     = e1·(d×e2)        = (−n)·d
#   u_num = (o−v0)·(d×e2)    = e2·m − (e2×v0)·d
#   v_num = d·((o−v0)×e1)    = (−e1)·m − (v0×e1)·d
#   t_num = (o−v0)·(e1×e2)   = n·o − (v0·n)·1
#
# so the whole rays×triangles sweep becomes four (TILE_T,16)@(16,TILE_R)
# matmuls on the MXU systolic array (precision=HIGHEST keeps f32 accuracy:
# ~1.6e-7 max rel err measured on-chip) plus a short VPU epilogue
# (divide + the reference's acceptance tests + the min/argmin fold), instead
# of ~60 VPU ops per pair. The arithmetic association differs from
# cpu/hit.c, so winners can flip exactly on geometry edges — the same f32
# jitter class the edge-aware comparator already absorbs.
# ---------------------------------------------------------------------------

_KF = 16  # feature rows, padded to a sublane multiple


def ray_features_mxu(op, dp):
    """Packed (3, Rp) rays -> (16, Rp) F feature planes, all lane-major.

    Rows: 0-2 = d, 3-5 = m = o×d, 6-8 = o, 9 = 1, 10 = |d|,
    11-13 = nd = d/|d| (for the reference-exact winner distance in the
    epilogue), 14-15 = 0.
    """
    ox, oy, oz = op[0], op[1], op[2]  # (Rp,)
    dx, dy, dz = dp[0], dp[1], dp[2]
    m = jnp.stack([oy * dz - oz * dy, oz * dx - ox * dz, ox * dy - oy * dx])
    ones = jnp.ones((1, op.shape[1]), op.dtype)
    dlen2 = dx * dx + dy * dy + dz * dz
    dlen = jnp.sqrt(jnp.where(dlen2 > 0.0, dlen2, 1.0))[None, :]
    nd = dp / dlen
    zeros = jnp.zeros((_KF - 14, op.shape[1]), op.dtype)
    return jnp.concatenate([dp, m, op, ones, dlen, nd, zeros], axis=0)


def pack_rays_mxu(origins, dirs):
    """(R,3) rays -> ((16, Rp) F feature planes, R) — see ray_features_mxu."""
    op, dp, R = pack_rays(origins, dirs)  # (3, Rp)
    return ray_features_mxu(op, dp), R


def pack_tri_features(v0, e1, e2):
    """Padded (Tp,3) v0/e1/e2 -> (4, 16, Tp) G planes [a; u_num; v_num; t_num].

    Lane-major (feature rows on sublanes, triangles on lanes): a
    (16, TILE_T) block needs no lane padding, where the transposed
    (TILE_T, 16) layout padded its 16-wide minor dim to 128 VMEM lanes —
    8x the DMA bytes per triangle block. The kernel contracts dim 0 of both
    operands (a TN matmul, native on the MXU).

    Degenerate padding rows (e1=e2=0) give n=0 -> a=0, rejected in-kernel by
    the |a| >= eps determinant test exactly like the VPU kernel.
    """
    n = jnp.cross(e1, e2)
    z1 = jnp.zeros_like(v0[:, :1])
    z3 = jnp.zeros_like(v0)
    zp = jnp.zeros((v0.shape[0], _KF - 10), v0.dtype)
    ga = jnp.concatenate([-n, z3, z3, z1, zp], axis=1)
    gu = jnp.concatenate([-jnp.cross(e2, v0), e2, z3, z1, zp], axis=1)
    gv = jnp.concatenate([-jnp.cross(v0, e1), -e1, z3, z1, zp], axis=1)
    gt = jnp.concatenate(
        [z3, z3, n, -jnp.sum(v0 * n, axis=1, keepdims=True), zp], axis=1
    )
    return jnp.stack([ga, gu, gv, gt]).transpose(0, 2, 1)  # (4, 16, Tp)


def _mxu_tile(f_ref, g_ref, mt_eps, self_hit_eps, ref_dist: bool = False):
    """Möller–Trumbore pair tile via four MXU matmuls -> dist, inf on
    reject. Same acceptance tests as _mt_tile; ref_dist as in _mt_tile
    (computed from the RECENTERED origin — the MXU backend's winners
    already differ from the scalar reference by matmul association on
    exact geometry edges, see the module note)."""
    F = f_ref[:, :]  # (16, TR)

    def dot(g):  # (16,TT)^T @ (16,TR) on the MXU (TN form), f32-accurate
        return lax.dot_general(
            g, F, (((0,), (0,)), ((), ())),
            precision=_MXU_PRECISION,
            preferred_element_type=jnp.float32,
        )

    a = dot(g_ref[0])  # (TT, TR)
    un = dot(g_ref[1])
    vn = dot(g_ref[2])
    tn = dot(g_ref[3])

    ok = jnp.abs(a) >= mt_eps
    f = 1.0 / _sel(ok, a, jnp.ones_like(a))
    u = un * f
    ok &= (u >= 0.0) & (u <= 1.0)
    v = vn * f
    ok &= (v >= 0.0) & (u + v <= 1.0)
    t = tn * f
    ok &= t > mt_eps
    if ref_dist:
        td = t * f_ref[10:11, :]  # t * |d|
        ox, oy, oz = f_ref[6:7, :], f_ref[7:8, :], f_ref[8:9, :]
        ndx, ndy, ndz = f_ref[11:12, :], f_ref[12:13, :], f_ref[13:14, :]
        ddx = (ox + ndx * td) - ox
        ddy = (oy + ndy * td) - oy
        ddz = (oz + ndz * td) - oz
        dist = jnp.sqrt((ddx * ddx + ddy * ddy) + ddz * ddz)
    else:
        dist = t * f_ref[10:11, :]  # |d| row -> dist = t * |d|
    ok &= dist > self_hit_eps
    return _sel(ok, dist, jnp.full_like(dist, _INF))


def _mxu_kernel(order_ref, count_ref, f_ref, g_ref, dist_ref, idx_ref, *,
                mt_eps, self_hit_eps):
    # triangle tile outer, worklist of active ray tiles inner — see
    # _nearest_kernel and tile_worklist on DMA/skip cost
    j = pl.program_id(0)
    k = pl.program_id(1)
    i = order_ref[j, k]

    @pl.when((k == 0) & (j == 0))
    def _():
        dist_ref[:, :] = jnp.full(dist_ref.shape, _INF, jnp.float32)
        idx_ref[:, :] = jnp.zeros(idx_ref.shape, jnp.int32)

    @pl.when(k < count_ref[j])
    def _():
        dist = _mxu_tile(f_ref, g_ref, mt_eps, self_hit_eps, ref_dist=True)
        _accum_nearest(i, j, dist, dist_ref, idx_ref)


def _mxu_dist_kernel(order_ref, count_ref, f_ref, g_ref, dist_ref, *,
                     mt_eps, self_hit_eps):
    j = pl.program_id(0)
    k = pl.program_id(1)
    i = order_ref[j, k]

    @pl.when((k == 0) & (j == 0))
    def _():
        dist_ref[:, :] = jnp.full(dist_ref.shape, _INF, jnp.float32)

    @pl.when(k < count_ref[j])
    def _():
        dist = _mxu_tile(f_ref, g_ref, mt_eps, self_hit_eps)
        _accum_min(i, dist, dist_ref)


@functools.partial(jax.jit, static_argnames=("mt_eps", "self_hit_eps"))
def nearest_hit_mxu(rayf, g, tile_mask, mt_eps: float, self_hit_eps: float):
    """MXU variant of nearest_hit_pallas.

    rayf: (16, R) from pack_rays_mxu; g: (4, T, 16) from pack_tri_features;
    tile_mask as in nearest_hit_pallas. Returns (dist (R,), idx (R,)).
    """
    R = rayf.shape[1]
    T = g.shape[2]  # g: (4, 16, Tp) lane-major feature planes
    nr, nt = R // TILE_R, T // TILE_T
    kernel = functools.partial(
        _mxu_kernel, mt_eps=mt_eps, self_hit_eps=self_hit_eps
    )

    dist = idx = None
    for s, n in _tri_tile_chunks(nt, nr):
        lo, hi = s * TILE_T, (s + n) * TILE_T
        order, count = tile_worklist(tile_mask[s:s + n])
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n, nr),
            in_specs=[
                pl.BlockSpec((_KF, TILE_R),
                             lambda j, k, order, count: (0, order[j, k]),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, _KF, TILE_T),
                             lambda j, k, order, count: (0, 0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((nr, TILE_R), lambda j, k, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nr, TILE_R), lambda j, k, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
        )
        d_c, i_c = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((nr, TILE_R), jnp.float32),
                jax.ShapeDtypeStruct((nr, TILE_R), jnp.int32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=int(nr) * int(n) * (2 * _KF * 4 + 20) * TILE_R * TILE_T,
                bytes_accessed=(nr * _KF * TILE_R + n * 4 * _KF * TILE_T) * 4,
                transcendentals=0,
            ),
            interpret=_interpret(),
        )(order, count, rayf, g[:, :, lo:hi])
        i_c = i_c + lo
        if dist is None:
            dist, idx = d_c, i_c
        else:
            dist, idx = _combine_nearest(dist, idx, d_c, i_c)
    return dist.reshape(R), idx.reshape(R)


@functools.partial(jax.jit, static_argnames=("mt_eps", "self_hit_eps"))
def nearest_dist_mxu(rayf, g, tile_mask, mt_eps: float, self_hit_eps: float):
    """MXU variant of nearest_dist_pallas (min distance, no winner index)."""
    R = rayf.shape[1]
    T = g.shape[2]  # g: (4, 16, Tp) lane-major feature planes
    nr, nt = R // TILE_R, T // TILE_T
    kernel = functools.partial(
        _mxu_dist_kernel, mt_eps=mt_eps, self_hit_eps=self_hit_eps
    )

    dist = None
    for s, n in _tri_tile_chunks(nt, nr):
        lo, hi = s * TILE_T, (s + n) * TILE_T
        order, count = tile_worklist(tile_mask[s:s + n])
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n, nr),
            in_specs=[
                pl.BlockSpec((_KF, TILE_R),
                             lambda j, k, order, count: (0, order[j, k]),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, _KF, TILE_T),
                             lambda j, k, order, count: (0, 0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((nr, TILE_R), lambda j, k, *_: (0, 0),
                                   memory_space=pltpu.VMEM),
        )
        d_c = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nr, TILE_R), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=int(nr) * int(n) * (2 * _KF * 4 + 20) * TILE_R * TILE_T,
                bytes_accessed=(nr * _KF * TILE_R + n * 4 * _KF * TILE_T) * 4,
                transcendentals=0,
            ),
            interpret=_interpret(),
        )(order, count, rayf, g[:, :, lo:hi])
        dist = d_c if dist is None else jnp.minimum(dist, d_c)
    return dist.reshape(R)


def pack_triangles(vertices, valid):
    """(T,3,3) triangle soup -> ((Tp,3) v0/e1/e2), padded to TILE_T with
    degenerate rows (e1=e2=0, rejected by the determinant test)."""
    T = vertices.shape[0]
    pad = (-T) % TILE_T
    v0 = vertices[:, 0]
    e1 = vertices[:, 1] - v0
    e2 = vertices[:, 2] - v0
    # invalid triangles -> zero edges (|a| < eps rejects them in-kernel)
    e1 = jnp.where(valid[:, None], e1, 0.0)
    e2 = jnp.where(valid[:, None], e2, 0.0)
    if pad:
        v0 = jnp.concatenate([v0, jnp.zeros((pad, 3), v0.dtype)])
        e1 = jnp.concatenate([e1, jnp.zeros((pad, 3), e1.dtype)])
        e2 = jnp.concatenate([e2, jnp.zeros((pad, 3), e2.dtype)])
    return v0, e1, e2  # (Tp, 3)


def pack_rays(origins, dirs):
    """(R,3) -> (3,Rp) planes padded to TILE_R; padded rays get dir=(0,0,1)
    and an origin far outside any scene so they miss everything."""
    R = origins.shape[0]
    pad = (-R) % TILE_R
    if pad:
        origins = jnp.concatenate(
            [origins, jnp.full((pad, 3), 1e30, origins.dtype)]
        )
        dirs = jnp.concatenate(
            [dirs, jnp.concatenate([jnp.zeros((pad, 2)), jnp.ones((pad, 1))], axis=1).astype(dirs.dtype)]
        )
    return origins.T, dirs.T, R


def cluster_triangles(vertices, valid):
    """Spatially cluster triangles into TILE_T-sized tiles (morton order).

    The file-order triangle tiles the kernel sweeps have no spatial
    coherence, so tile-level AABB culling at object granularity is weak.
    Reordering triangles by the morton key of their centroid (the same
    8-bit/axis interleaved grid as the octree's position_object,
    octree.cu:126-196, but per TRIANGLE) makes each 256-triangle tile
    spatially compact, and its tight AABB culls most (ray-tile, tri-tile)
    pairs — a BVH-leaf analog riding the existing SMEM tile mask.

    Returns (perm (Tp,) int32 — clustered slot -> original triangle index,
    with invalid/padding triangles sorted last; tile_aabb (nT,2,3) f32;
    tile_nonempty (nT,) bool). Pure jnp; jits and runs per collide call
    (O(T log T) on thousands of triangles — noise next to the R x T sweep).

    Tie-break note: the kernel's argmin then prefers the first triangle in
    CLUSTERED order rather than file order. Exact f32 distance ties between
    distinct triangles are the only case where this changes the winner —
    the same measure-zero edge class the comparator already absorbs.
    """
    T = vertices.shape[0]
    centroid = vertices.mean(axis=1)  # (T,3)
    vmin = jnp.where(valid[:, None], jnp.min(
        jnp.where(valid[:, None, None], vertices, _INF), axis=1), _INF)
    vmax = jnp.where(valid[:, None], jnp.max(
        jnp.where(valid[:, None, None], vertices, -_INF), axis=1), -_INF)
    smin = vmin.min(axis=0)
    smax = vmax.max(axis=0)
    size = jnp.where(smax - smin > 0.0, smax - smin, 1.0)
    q = jnp.clip(jnp.floor((centroid - smin) / size * 256.0), 0, 255
                 ).astype(jnp.int32)
    morton = jnp.zeros((T,), jnp.uint32)
    for b in range(8):
        grp = (((q[:, 0] >> b) & 1) << 2) | (((q[:, 1] >> b) & 1) << 1) | (
            (q[:, 2] >> b) & 1)
        morton = morton | (grp.astype(jnp.uint32) << jnp.uint32(3 * b))
    keys = jnp.where(valid, morton, jnp.uint32(0xFFFFFFFF))
    perm = jnp.argsort(keys, stable=True).astype(jnp.int32)

    pad = (-T) % TILE_T
    nT = (T + pad) // TILE_T
    svmin = vmin[perm]
    svmax = vmax[perm]
    sval = valid[perm]
    if pad:
        svmin = jnp.concatenate([svmin, jnp.full((pad, 3), _INF)])
        svmax = jnp.concatenate([svmax, jnp.full((pad, 3), -_INF)])
        sval = jnp.concatenate([sval, jnp.zeros((pad,), bool)])
    tmin = svmin.reshape(nT, TILE_T, 3).min(axis=1)
    tmax = svmax.reshape(nT, TILE_T, 3).max(axis=1)
    tile_nonempty = sval.reshape(nT, TILE_T).any(axis=1)
    # empty tiles: replace the (inf,-inf) box with a point so the slab test
    # stays NaN-free; they are masked off via tile_nonempty anyway
    tmin = jnp.where(tile_nonempty[:, None], tmin, 0.0)
    tmax = jnp.where(tile_nonempty[:, None], tmax, 0.0)
    return perm, jnp.stack([tmin, tmax], axis=1), tile_nonempty


class KernelPack(NamedTuple):
    """Static per-scene packing for the kernel backends — computed ONCE per
    render (the analog of the reference's to_cuda-time octree build,
    gpu/scene.cu:224-352) instead of per collide call: clustering + triangle
    packing would otherwise re-run inside every lax.map chunk and bounce
    iteration, where XLA cannot hoist them out of the loop bodies."""

    perm: jax.Array           # (Tp,) clustered slot -> original tri index
    tile_aabb: jax.Array      # (nT, 2, 3) per-tile AABB (clustered order)
    tile_nonempty: jax.Array  # (nT,) bool
    v0: jax.Array             # (Tp, 3) clustered + padded
    e1: jax.Array             # (Tp, 3)
    e2: jax.Array             # (Tp, 3)
    table: jax.Array | None   # (Tp, 24|32) winner-fetch table (clustered):
                              # v0(3) e1(3) e2(3) n0/n1/n2(9) obj(1), then —
                              # 32-wide only — ka(3) kd(3) ks(3) ns(1) nr(1)
                              # of the owning object, zero-padded to a
                              # sublane multiple. Fetched in-kernel by
                              # fetch_winner_rows (one one-hot MXU matmul
                              # per active pair tile — XLA's TPU row-gather
                              # is a serial loop). None when built without
                              # normals/tri_obj.


# table column layout (see KernelPack.table)
COL_V0 = slice(0, 3)
COL_E1 = slice(3, 6)
COL_E2 = slice(6, 9)
COL_N = slice(9, 18)
COL_OBJ = 18
COL_MAT = slice(19, 30)  # ka(3) kd(3) ks(3) ns(1) nr(1) — 32-wide tables only
TABLE_WIDTH_MAT = 32
TABLE_WIDTH_NOMAT = 24


def pack_geometry(vertices, valid, normals=None, tri_obj=None,
                  materials=None) -> KernelPack:
    """Cluster + pack a triangle soup for the Pallas/MXU kernels.

    With normals/tri_obj the winner-fetch table is built too (required by
    collide; collide_dist-only callers may omit them). With `materials`
    (a Materials pytree) the owning object's ka/kd/ks/ns/nr are appended per
    triangle, so collide returns them with the SAME fetch — replacing four
    per-ray gathers in shading (XLA lowers TPU row-gathers to serial loops).
    Differentiable into vertices/normals/materials: the kernel itself only
    selects, but the winner's values are re-fetched from this pack's table,
    so the pack must NOT be built under stop_gradient when gradients are
    wanted.
    """
    perm, tile_aabb, tile_nonempty = cluster_triangles(vertices, valid)
    v0, e1, e2 = pack_triangles(vertices[perm], valid[perm])
    table = None
    if normals is not None and tri_obj is not None:
        Tp = v0.shape[0]
        T = normals.shape[0]
        n = normals[perm].reshape(T, 9)
        ob = tri_obj[perm].astype(jnp.float32)[:, None]  # small ints: f32-exact
        cols = [n, ob]
        width = TABLE_WIDTH_NOMAT
        if materials is not None:
            mat = jnp.concatenate(
                [materials.ka, materials.kd, materials.ks,
                 materials.ns[:, None], materials.nr[:, None]], axis=1
            )  # (O, 11)
            # per-triangle material rows via one-hot matmul (exact 1.0*x):
            # a (T,) row-gather would lower to a serial loop on TPU
            O = mat.shape[0]
            oh = (tri_obj[perm][:, None]
                  == jnp.arange(O, dtype=tri_obj.dtype)[None, :])
            cols.append(jax.lax.dot_general(
                oh.astype(mat.dtype), mat, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=mat.dtype,
            ))
            width = TABLE_WIDTH_MAT
        body = jnp.concatenate(cols, axis=1)
        pad = Tp - T
        if pad:
            body = jnp.concatenate([body, jnp.zeros((pad, body.shape[1]))])
        table = jnp.concatenate([v0, e1, e2, body], axis=1)
        table = jnp.concatenate(
            [table, jnp.zeros((Tp, width - table.shape[1]), table.dtype)],
            axis=1,
        )
    return KernelPack(perm, tile_aabb, tile_nonempty, v0, e1, e2, table)


def tile_cull_mask_packed(op, dp, tile_aabb, tile_nonempty):
    """(nT, nR) int32 pair-tile mask from packed (3, Rp) rays — EXACT
    per-ray slab tests, vectorized over boxes.

    Everything is a 2D (nT, Rp) array (boxes on sublanes, rays on lanes) —
    well-tiled for the VPU, no 3-wide trailing dims, no Python loop over
    boxes (the previous static loop unrolled nT slab tests into the traced
    graph — linear trace/compile blowup with mesh size).
    """
    nr = op.shape[1] // TILE_R
    hit = _slab_hits_packed(op, dp, tile_aabb)  # (nT, Rp)
    hit &= tile_nonempty[:, None]
    nT = tile_aabb.shape[0]
    return hit.reshape(nT, nr, TILE_R).any(axis=2).astype(jnp.int32)


def _slab_hits_packed(op, dp, boxes):
    """(nB, Rp) bool forward-only slab test of packed rays vs boxes.

    op/dp: (3, Rp); boxes: (nB, 2, 3). Branch-free; zero direction
    components use a tiny epsilon stand-in exactly like the original
    per-box builder (parked rays have origin 3e29 -> guaranteed miss).
    """
    dsafe = jnp.where(dp == 0.0, 1e-30, dp)
    inv = 1.0 / dsafe  # (3, Rp)
    tmin = jnp.full((boxes.shape[0], op.shape[1]), -_INF)
    tmax = jnp.full((boxes.shape[0], op.shape[1]), _INF)
    for k in range(3):  # static 3 axes
        t1 = (boxes[:, 0, k][:, None] - op[k][None, :]) * inv[k][None, :]
        t2 = (boxes[:, 1, k][:, None] - op[k][None, :]) * inv[k][None, :]
        tmin = jnp.maximum(tmin, jnp.minimum(t1, t2))
        tmax = jnp.minimum(tmax, jnp.maximum(t1, t2))
    return (tmax >= tmin) & (tmax >= 0.0)


def ray_tile_intervals(op, dp):
    """Per-ray-tile conservative bounds: ((3,nr) olo/ohi/dlo/dhi, (nr,) any_live).

    Parked/dead rays (|origin| >= 1e20 — see render.py ray parking) are
    excluded from the bounds; a tile of only parked rays reports
    any_live=False and culls everything.
    """
    nr = op.shape[1] // TILE_R
    o = op.reshape(3, nr, TILE_R)
    d = dp.reshape(3, nr, TILE_R)
    live = jnp.all(jnp.abs(o) < 1e20, axis=0)  # (nr, TILE_R)
    big = jnp.where(live[None], o, _INF)
    small = jnp.where(live[None], o, -_INF)
    olo, ohi = big.min(axis=2), small.max(axis=2)  # (3, nr)
    dbig = jnp.where(live[None], d, _INF)
    dsmall = jnp.where(live[None], d, -_INF)
    dlo, dhi = dbig.min(axis=2), dsmall.max(axis=2)
    return olo, ohi, dlo, dhi, live.any(axis=1)


def tile_cull_mask_interval(op, dp, boxes, nonempty):
    """(nB, nr) int32 conservative pair-tile mask via interval arithmetic.

    Each ray TILE is abstracted to an origin box x direction box (live rays
    only); a (tile, box) pair survives iff SOME ray in that shaft could hit
    the box — interval slab test with sound division (a direction interval
    spanning 0 leaves that axis unconstrained). O(nr * nB) work vs the
    exact builder's O(R * nB): 256x less per level, at the price of
    conservative (never wrong, sometimes loose) culling.
    """
    hit, _ = _interval_slab(op, dp, boxes, nonempty)
    return hit.astype(jnp.int32)


def _interval_slab(op, dp, boxes, nonempty):
    """Interval slab core: ((nB, nr) bool hit, (nB, nr) f32 tlo).

    tlo is a SOUND lower bound on the slab-entry parameter t (unnormalized
    direction units) for any live ray of the tile against the box —
    tile_entry_lower converts it to a distance lower bound for the
    front-to-back sweep cutoff."""
    olo, ohi, dlo, dhi, any_live = ray_tile_intervals(op, dp)
    nB = boxes.shape[0]
    nr = olo.shape[1]
    tlo = jnp.full((nB, nr), -_INF)
    thi = jnp.full((nB, nr), _INF)
    for k in range(3):
        spans0 = (dlo[k] <= 0.0) & (dhi[k] >= 0.0)  # (nr,)
        # inverse-direction interval (valid only when 0 not in [dlo, dhi])
        safe_lo = jnp.where(dlo[k] == 0.0, 1e-30, dlo[k])
        safe_hi = jnp.where(dhi[k] == 0.0, -1e-30, dhi[k])
        ilo = 1.0 / safe_hi
        ihi = 1.0 / safe_lo
        # numerator intervals for both slab planes: (nB, nr)
        nlo_a = boxes[:, 0, k][:, None] - ohi[k][None, :]
        nlo_b = boxes[:, 0, k][:, None] - olo[k][None, :]
        nhi_a = boxes[:, 1, k][:, None] - ohi[k][None, :]
        nhi_b = boxes[:, 1, k][:, None] - olo[k][None, :]
        cand = [n * i for n in (nlo_a, nlo_b, nhi_a, nhi_b)
                for i in (ilo[None, :], ihi[None, :])]
        lo_k = functools.reduce(jnp.minimum, cand)
        hi_k = functools.reduce(jnp.maximum, cand)
        # axis with a sign-spanning direction interval: unconstrained,
        # UNLESS the origin interval is disjoint from the slab on that axis
        # and every direction is (near-)zero there — keep it simple and
        # fully unconstrain (sound)
        lo_k = jnp.where(spans0[None, :], -_INF, lo_k)
        hi_k = jnp.where(spans0[None, :], _INF, hi_k)
        tlo = jnp.maximum(tlo, lo_k)
        thi = jnp.minimum(thi, hi_k)
    hit = (thi >= tlo) & (thi >= 0.0)
    hit &= nonempty[:, None] & any_live[None, :]
    return hit, jnp.maximum(tlo, 0.0)


def tile_entry_lower(op, dp, boxes, nonempty):
    """(nB, nr) f32 SOUND lower bound on the DISTANCE (reference units,
    t * |d|) at which any live ray of ray tile r can first touch box b;
    +inf where the pair is culled. Distance = slab t x that ray's |d|;
    bounding over the tile with min |d| and a 1e-3 relative slack keeps the
    bound sound against the f32 rounding differences between the slab
    arithmetic and the sweep kernels' reference-exact distance chain."""
    hit, tlo = _interval_slab(op, dp, boxes, nonempty)
    nr = op.shape[1] // TILE_R
    d2 = (dp * dp).sum(axis=0).reshape(nr, TILE_R)
    o = op.reshape(3, nr, TILE_R)
    live = jnp.all(jnp.abs(o) < 1e20, axis=0)  # (nr, TILE_R)
    dmin = jnp.sqrt(jnp.min(jnp.where(live, d2, _INF), axis=1))  # (nr,)
    dmin = jnp.where(jnp.isfinite(dmin), dmin, 1.0)
    lower = tlo * dmin[None, :] * 0.999
    return jnp.where(hit, lower, _INF)


def build_tile_levels(tile_aabb, tile_nonempty, branching: int = 8,
                      top_max: int = 64):
    """Union-box hierarchy over the morton-ordered leaf tiles.

    Consecutive morton tiles are spatial neighbours (children of the same
    octree cell), so unioning `branching` consecutive tile boxes recovers
    the parent-cell box — the flat-array analog of the reference octree's
    internal nodes (octree.cu:231-360). Returns [(boxes, nonempty), ...]
    coarse -> fine, EXCLUDING the leaf level; empty when nT <= top_max.
    """
    levels = []
    boxes, nonempty = tile_aabb, tile_nonempty
    while boxes.shape[0] > top_max:
        n = boxes.shape[0]
        pad = (-n) % branching
        if pad:
            empty = jnp.stack(
                [jnp.full((3,), _INF), jnp.full((3,), -_INF)]
            )  # (2,3) inverted box: union-neutral
            boxes = jnp.concatenate(
                [boxes, jnp.broadcast_to(empty, (pad, 2, 3))])
            nonempty = jnp.concatenate([nonempty, jnp.zeros((pad,), bool)])
        g = boxes.reshape(-1, branching, 2, 3)
        boxes = jnp.stack([g[:, :, 0].min(axis=1), g[:, :, 1].max(axis=1)],
                          axis=1)
        nonempty = nonempty.reshape(-1, branching).any(axis=1)
        boxes = jnp.where(nonempty[:, None, None], boxes, 0.0)
        levels.append((boxes, nonempty))
    return levels[::-1]  # coarse -> fine


def tile_cull_mask_hierarchical(op, dp, pack, partitioning: str):
    """(nT, nR) pair-tile mask per the runtime partitioning mode.

    - "none": all-ones — true brute force (PARTITIONING_NONE,
      gpu/CMakeLists.txt:12-15).
    - "aabb": flat exact per-ray slab tests against every leaf tile box
      (PARTITIONING_AABB analog at kernel-tile granularity).
    - "octree": coarse-to-fine traversal of the morton-tile hierarchy — the
      TPU recast of the octree DFS (gpu/hit.cu:120-169). The TOP level
      (<= 64 union boxes) is tested EXACTLY per ray (this carries the
      dominant signal: a ray that misses a whole subtree is culled from all
      its leaves); every finer level uses the O(nr x nB) interval test at
      ray-tile granularity, AND-chained parent -> child. Total builder work
      is O(R * top + nr * nT) instead of O(R * nT), so the mask stays cheap
      at 100k+ triangles while the sweep kernel's worklist (the sparse
      phase of the traversal) executes only surviving pair tiles.
    """
    nT = pack.tile_aabb.shape[0]
    nr = op.shape[1] // TILE_R
    if partitioning == "none":
        return jnp.ones((nT, nr), jnp.int32)
    if partitioning == "aabb" or nT <= 64:
        # small scenes: the exact leaf test IS the whole hierarchy
        return tile_cull_mask_packed(op, dp, pack.tile_aabb,
                                     pack.tile_nonempty)
    levels = build_tile_levels(pack.tile_aabb, pack.tile_nonempty)
    top_boxes, top_nonempty = levels[0]
    mask = tile_cull_mask_packed(op, dp, top_boxes, top_nonempty)  # exact
    for boxes, nonempty in levels[1:]:
        child = tile_cull_mask_interval(op, dp, boxes, nonempty)
        nB = boxes.shape[0]
        parent = jnp.repeat(mask, 8, axis=0)[:nB]
        mask = child * parent
    leaf = tile_cull_mask_interval(op, dp, pack.tile_aabb,
                                   pack.tile_nonempty)
    parent = jnp.repeat(mask, 8, axis=0)[:nT]
    return leaf * parent


# The scalar-prefetched worklist (order: one s32 per (tri tile, ray tile)
# pair) lives in SMEM, which is ~1 MB per kernel on v5e: a dense worklist
# OOMs the scalar memory past ~250k triangles x 64k rays (measured: 246k-tri
# scale tier, "Ran out of memory in memory space smem. Used 1.00M of
# 1.00M"). The sweep wrappers below split the TRIANGLE-tile axis into
# chunks whose worklist fits this budget; splitting rays instead would
# re-stream every triangle block per sub-call, chunking triangles keeps
# total DMA identical to the unchunked kernel.
_SMEM_WORKLIST_BUDGET = 512 * 1024


def _tri_tile_chunks(nt: int, nr: int):
    """[(first tri tile, n tri tiles)] chunks whose (n, nr) s32 worklist
    fits _SMEM_WORKLIST_BUDGET. Scalar-prefetch operands pad the minor
    dimension to the 128-lane width, so the footprint is budgeted against
    max(nr, 128) — matters only for small-ray (< 32k rays) / huge-mesh
    calls, where an unpadded budget could still OOM SMEM."""
    per = max(1, _SMEM_WORKLIST_BUDGET // (4 * max(nr, 128)))
    return [(s, min(per, nt - s)) for s in range(0, nt, per)]


def _combine_nearest(dist, idx, dist_c, idx_c):
    """Fold a later triangle-chunk's (dist, idx) into the running result.
    Strict < keeps the earlier chunk on ties — chunks run in ascending
    triangle order, so this preserves the reference's first-strictly-
    smaller winner (cpu/hit.c:46-70) exactly as the in-kernel accumulator
    does across tiles."""
    better = dist_c < dist
    return jnp.where(better, dist_c, dist), jnp.where(better, idx_c, idx)


# Front-to-back occlusion cutoff (round-4 big-tier experiment): at ~1M
# triangles a frame is 85% sweep kernels (BASELINE.md roofline) and the
# hierarchy alone still executes ~13% of all pair tiles — the reference's
# octree DFS wins the same fight with per-ray front-to-back traversal +
# early exit (gpu/hit.cu:120-169). The batched recast: sweep the K nearest
# surviving triangle tiles per ray tile first (by a sound lower bound on
# their entry distance), then sweep only the remaining tiles whose entry
# bound does not exceed the ray tile's worst nearest-hit-so-far. Exact by
# construction: a culled tile satisfies entry_lower > max_r(dist_r), so no
# hit inside it can beat OR tie any ray's current winner
# (tests/test_pallas.py::test_front_to_back_sweep_bit_exact).
#
# MEASURED NEGATIVE at the 983k tier (2026-08-21): 296 ms collide vs 239
# without — a ray TILE is 64 consecutive pixels of a row, and on the
# procedural grids (and any scene with visible sky) nearly every such
# strip contains at least one miss ray, which forces that tile's cutoff to
# +inf and degenerates round B to the full remainder, leaving only the
# two-round overhead (second worklist build + entry-bound sort). A cutoff
# below the RAY-tile granularity needs either 2D-blocked ray order (still
# poisoned by any sky pixel per 16x16 block) or per-ray masking inside the
# kernel (breaks the 256-lane batching). Default OFF; RGT_F2B_TILES=<K>
# enables for occlusion-heavy content where every strip hits (interiors,
# walls of geometry).
F2B_TILES = int(os.environ.get("RGT_F2B_TILES", "0"))


def nearest_hit_front_to_back(op, dp, v0, e1, e2, tile_aabb, tile_nonempty,
                              mask, mt_eps: float, self_hit_eps: float,
                              k_near: int = F2B_TILES):
    """Two-round nearest hit: (dist (R,), idx (R,)) identical to a single
    full-mask sweep (min dist, lowest slot on ties — the reference's
    first-occurrence scan), executing far fewer pair tiles on occluded
    scenes."""
    nt, nr = mask.shape
    tent = tile_entry_lower(op, dp, tile_aabb, tile_nonempty)  # (nt, nr)
    tent = jnp.where(mask > 0, tent, _INF)
    kth = jnp.sort(tent, axis=0)[min(k_near, nt) - 1]  # (nr,)
    near = tent <= kth[None, :]
    maskA = ((mask > 0) & near).astype(jnp.int32)
    distA, idxA = nearest_hit_pallas(op, dp, v0, e1, e2, maskA,
                                     mt_eps, self_hit_eps)
    # conservative per-ray-tile cutoff: the farthest per-ray nearest hit
    # (inf as soon as one ray missed -> that ray tile keeps everything)
    cut = distA.reshape(nr, TILE_R).max(axis=1)  # (nr,)
    maskB = ((mask > 0) & ~near
             & (tent <= cut[None, :] * 1.0001)).astype(jnp.int32)
    distB, idxB = nearest_hit_pallas(op, dp, v0, e1, e2, maskB,
                                     mt_eps, self_hit_eps)
    # exact cross-round winner: lexicographic (dist, slot) minimum
    better = (distB < distA) | ((distB == distA) & (idxB < idxA))
    return (jnp.where(better, distB, distA),
            jnp.where(better, idxB, idxA))


def tile_worklist(tile_mask):
    """(nT, nR) pair-tile mask -> (order (nT, nR) int32, count (nT,) int32).

    Per triangle tile, the ray-tile indices with ACTIVE tiles first (file
    order preserved among them — stable sort, so the per-ray-tile triangle
    sweep order is unchanged) and the tail filled with the last active
    index. The kernels iterate k over columns: the block index_map reads
    order[j, k], so skipped cells repeat the previous block index — Mosaic
    elides the DMA — and cost one scalar compare instead of a streamed ray
    block. This removes the ~(1-density) wasted grid cells that dominated
    the masked kernel (86% of cells on a typical mesh scene).
    """
    active = tile_mask > 0
    count = jnp.sum(active.astype(jnp.int32), axis=1)
    order = jnp.argsort(~active, axis=1, stable=True).astype(jnp.int32)
    last = jnp.take_along_axis(
        order, jnp.maximum(count - 1, 0)[:, None], axis=1
    )  # (nT, 1) last active (or column 0 when none)
    k = jnp.arange(order.shape[1], dtype=jnp.int32)[None, :]
    order = jnp.where(k < jnp.maximum(count, 1)[:, None], order, last)
    return order, count
