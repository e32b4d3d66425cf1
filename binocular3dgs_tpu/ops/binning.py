"""Tile binning: (tile, gaussian) pair emission, sort, and per-tile ranges.

This reproduces the CUDA rasterizer's duplicate-keys + radix-sort stage
(SURVEY.md §3.5, N1) in XLA primitives with static shapes:

  * each visible gaussian emits one pair per screen tile its radius-bbox
    covers (CUDA getRect semantics)
  * variable-length emission is flattened with an exclusive cumsum +
    vectorized searchsorted — no per-gaussian loops, no dynamic shapes
  * pairs live in a static-capacity buffer (`pair_capacity`); overflow beyond
    capacity is dropped and reported (the host grows capacity and re-jits)
  * one lexicographic sort by (tile_id, depth) via lax.sort with two keys
    replaces the CUDA 64-bit-key radix sort
  * per-tile [start, count) ranges via searchsorted over the sorted tile ids

Everything here is integer index computation — gradients flow through the
*gather* of per-gaussian records by pair index (in rasterize.py), never
through the binning itself.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class TileBinning(NamedTuple):
    pair_gauss: jnp.ndarray  # (P,) int32 gaussian index per sorted pair
    pair_tile: jnp.ndarray  # (P,) int32 tile id per sorted pair (num_tiles = invalid)
    tile_start: jnp.ndarray  # (T,) int32 first pair index of each tile
    tile_count: jnp.ndarray  # (T,) int32 number of pairs of each tile
    num_pairs: jnp.ndarray  # () int32 total valid pairs (pre-truncation)


def tile_grid(width: int, height: int, tile_size: int) -> tuple[int, int]:
    return -(-width // tile_size), -(-height // tile_size)  # (TW, TH)


def tile_rect(mean2d, radius, tile_size: int, TW: int, TH: int):
    """CUDA getRect: clamped [tmin, tmax) tile bbox per gaussian.

    Returns (tmin_x, tmin_y, tmax_x, tmax_y), each (N,) int32.
    """
    px, py = mean2d[:, 0], mean2d[:, 1]
    r = radius
    tmin_x = jnp.clip(jnp.floor((px - r) / tile_size).astype(jnp.int32), 0, TW)
    tmin_y = jnp.clip(jnp.floor((py - r) / tile_size).astype(jnp.int32), 0, TH)
    tmax_x = jnp.clip(
        jnp.floor((px + r + tile_size - 1) / tile_size).astype(jnp.int32), 0, TW
    )
    tmax_y = jnp.clip(
        jnp.floor((py + r + tile_size - 1) / tile_size).astype(jnp.int32), 0, TH
    )
    return tmin_x, tmin_y, tmax_x, tmax_y


def bin_gaussians(
    mean2d: jnp.ndarray,  # (N, 2) pixel coords
    radius: jnp.ndarray,  # (N,) float; 0 => culled
    depth: jnp.ndarray,  # (N,)
    width: int,
    height: int,
    tile_size: int,
    pair_capacity: int,
) -> TileBinning:
    mean2d = jax.lax.stop_gradient(mean2d)
    radius = jax.lax.stop_gradient(radius)
    depth = jax.lax.stop_gradient(depth)

    TW, TH = tile_grid(width, height, tile_size)
    num_tiles = TW * TH
    n = mean2d.shape[0]

    tmin_x, tmin_y, tmax_x, tmax_y = tile_rect(mean2d, radius, tile_size, TW, TH)
    span_x = jnp.maximum(tmax_x - tmin_x, 0)
    span_y = jnp.maximum(tmax_y - tmin_y, 0)
    count = jnp.where(radius > 0, span_x * span_y, 0)

    cum_end = jnp.cumsum(count)  # inclusive
    num_pairs = cum_end[-1]
    offsets = cum_end - count  # exclusive

    # pair p belongs to gaussian g(p): first g with cum_end[g] > p
    p_idx = jnp.arange(pair_capacity, dtype=count.dtype)
    g = jnp.searchsorted(cum_end, p_idx, side="right").astype(jnp.int32)
    g_safe = jnp.minimum(g, n - 1)
    valid = p_idx < jnp.minimum(num_pairs, pair_capacity)

    j = (p_idx - offsets[g_safe]).astype(jnp.int32)
    bw = jnp.maximum(span_x[g_safe], 1)
    ty = tmin_y[g_safe] + j // bw
    tx = tmin_x[g_safe] + j % bw
    tile = ty * TW + tx
    tile = jnp.where(valid, tile, num_tiles).astype(jnp.int32)
    pair_depth = jnp.where(valid, depth[g_safe], jnp.inf).astype(jnp.float32)
    pair_gauss = jnp.where(valid, g_safe, 0).astype(jnp.int32)

    # lexicographic (tile, depth) sort — two sort keys, values carried along
    tile_s, _, gauss_s = jax.lax.sort(
        (tile, pair_depth, pair_gauss), num_keys=2, is_stable=False
    )

    tile_ids = jnp.arange(num_tiles + 1, dtype=jnp.int32)
    starts = jnp.searchsorted(tile_s, tile_ids, side="left").astype(jnp.int32)
    tile_start = starts[:-1]
    tile_count = starts[1:] - starts[:-1]

    return TileBinning(
        pair_gauss=gauss_s,
        pair_tile=tile_s,
        tile_start=tile_start,
        tile_count=tile_count,
        num_pairs=num_pairs,
    )
