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
    tile_row_start: int = 0,
    tile_rows: int | None = None,
) -> TileBinning:
    """`tile_row_start`/`tile_rows` restrict binning to a horizontal band of
    tile rows (tile ids are local to the band) — the unit of pixel-parallel
    sharding across devices."""
    mean2d = jax.lax.stop_gradient(mean2d)
    radius = jax.lax.stop_gradient(radius)
    depth = jax.lax.stop_gradient(depth)

    TW, TH = tile_grid(width, height, tile_size)
    if tile_rows is None:
        tile_rows = TH
    num_tiles = TW * tile_rows
    n = mean2d.shape[0]

    tmin_x, tmin_y, tmax_x, tmax_y = tile_rect(mean2d, radius, tile_size, TW, TH)
    # band restriction (no-op for the defaults); tile_row_start may be traced
    # (per-device axis index under shard_map), tile_rows must be static
    tmin_y = jnp.clip(tmin_y - tile_row_start, 0, tile_rows)
    tmax_y = jnp.clip(tmax_y - tile_row_start, 0, tile_rows)
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


def align_pairs(binning: TileBinning, chunk: int, num_tiles: int) -> TileBinning:
    """Re-layout sorted pairs so every tile's segment starts at a multiple of
    `chunk` (the Pallas DMA lane alignment). Capacity grows by at most
    num_tiles * chunk; slack slots point at gaussian 0 but are masked by
    tile_count in the kernels."""
    P = binning.pair_gauss.shape[0]
    count = binning.tile_count
    padded = ((count + chunk - 1) // chunk) * chunk
    aligned_start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(padded)[:-1].astype(jnp.int32)]
    )
    cap = P + num_tiles * chunk
    p = jnp.arange(cap, dtype=jnp.int32)
    t = jnp.searchsorted(aligned_start + padded, p, side="right").astype(jnp.int32)
    t_safe = jnp.minimum(t, num_tiles - 1)
    k = p - aligned_start[t_safe]
    src = binning.tile_start[t_safe] + k
    valid = (t < num_tiles) & (k < count[t_safe])
    gauss = jnp.where(valid, binning.pair_gauss[jnp.clip(src, 0, P - 1)], 0)
    return TileBinning(
        pair_gauss=gauss,
        pair_tile=jnp.where(valid, t_safe, num_tiles),
        tile_start=aligned_start,
        tile_count=count,
        num_pairs=binning.num_pairs,
    )
