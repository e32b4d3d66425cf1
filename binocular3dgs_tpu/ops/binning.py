"""Tile binning: depth-ordered (tile, gaussian) pair emission + packed-key sort.

Reproduces the CUDA rasterizer's duplicate-keys + radix-sort stage
(SURVEY.md §3.5, N1 — reference consumer `gaussian_renderer/__init__.py:85-93`)
with TPU-friendly primitives and static shapes. The round-1 version used
`jnp.searchsorted` over the pair axis (binary-search gathers: ~90 ms at 800k
pairs on a v5e, measured) plus a segment re-alignment pass (~125 ms); this
version is gather-free on the pair axis:

  * gaussians are depth-ordered once (argsort over N, not pairs); within any
    tile, ascending gaussian *rank* == ascending depth, so depth drops out of
    the sort key entirely (the CUDA kernel packs depth bits into its 64-bit
    key for the same reason — order, not value)
  * per-pair segment descriptors (rank, tile bbox, segment offset) are
    recovered with scatter-at-segment-start + `lax.cummax` over packed int32
    words instead of per-pair searchsorted + gathers: a gaussian's descriptor
    is scattered once at its first pair slot and the running maximum fills
    the rest of its segment (ranks in the high bits keep the words monotone)
  * one single-key `lax.sort` over packed `(tile << gbits) | rank` int32
    keys; both fields are unpacked from the sorted key by bit arithmetic —
    nothing is carried through the sort
  * per-tile [start, count) ranges via a small searchsorted (num_tiles
    queries, not num_pairs)

When the packed words do not fit in 31 bits (very large capacity x tile
count), `_bin_fallback` keeps the same contract using
searchsorted(method='sort') + a two-key sort.

`pair_gauss` is in DEPTH-RANK space: callers gather per-gaussian data with
`reordered[pair_gauss]` where `reordered = original[binning.order]`, or map
back to caller indices via `binning.order[pair_gauss]`.

Everything here is integer index computation — gradients flow through the
*gather* of per-gaussian records by pair index (in rasterize.py), never
through the binning itself.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class TileBinning(NamedTuple):
    pair_gauss: jnp.ndarray  # (P,) int32 depth-rank of the gaussian per sorted pair
    pair_tile: jnp.ndarray  # (P,) int32 tile id per sorted pair (num_tiles = invalid)
    tile_start: jnp.ndarray  # (T,) int32 first pair index of each tile
    tile_count: jnp.ndarray  # (T,) int32 number of pairs of each tile
    num_pairs: jnp.ndarray  # () int32 total wanted pairs (pre-truncation)
    order: jnp.ndarray  # (N,) int32 depth order: original index of rank i
    rank_offsets: jnp.ndarray  # (N+1,) int32 emission offset per depth rank
    # (exclusive prefix sum of per-rank pair counts; pairs of rank g occupy
    # emission slots [rank_offsets[g], rank_offsets[g+1]) before truncation
    # at pair capacity — lets consumers compute exact per-rank segment
    # bounds without a searchsorted over the pair axis)


def tile_grid(width: int, height: int, tile_size: int) -> tuple[int, int]:
    return -(-width // tile_size), -(-height // tile_size)  # (TW, TH)


def tile_rect(mean2d, radius, tile_size: int, TW: int, TH: int):
    """CUDA getRect: clamped [tmin, tmax) tile bbox per gaussian.

    `radius` is (N,) for an isotropic radius or (N, 2) for per-axis extents
    (the tight opacity-aware binning bound from ops/project.py).
    Returns (tmin_x, tmin_y, tmax_x, tmax_y), each (N,) int32.
    """
    px, py = mean2d[:, 0], mean2d[:, 1]
    if radius.ndim == 2:
        rx, ry = radius[:, 0], radius[:, 1]
    else:
        rx = ry = radius
    tmin_x = jnp.clip(jnp.floor((px - rx) / tile_size).astype(jnp.int32), 0, TW)
    tmin_y = jnp.clip(jnp.floor((py - ry) / tile_size).astype(jnp.int32), 0, TH)
    tmax_x = jnp.clip(
        jnp.floor((px + rx + tile_size - 1) / tile_size).astype(jnp.int32), 0, TW
    )
    tmax_y = jnp.clip(
        jnp.floor((py + ry + tile_size - 1) / tile_size).astype(jnp.int32), 0, TH
    )
    return tmin_x, tmin_y, tmax_x, tmax_y


def _bits(n: int) -> int:
    """Static bit width needed for values in [0, n]."""
    return max(int(n).bit_length(), 1)


def _segment_fill(
    values: jnp.ndarray, offsets: jnp.ndarray, count: jnp.ndarray, pair_capacity: int
):
    """Scatter `values[g]` at pair slot `offsets[g]` for emitting gaussians
    (count > 0), then forward-fill each segment with a cumulative max.
    Correct as long as values are monotone non-decreasing in g (rank bits
    live in the high bits to guarantee it).

    Zero-count gaussians are routed to UNIQUE out-of-bounds slots (dropped)
    instead of colliding at the next segment's offset: in-bounds offsets of
    emitters are strictly increasing, so every index is unique and the
    scatter lowers to XLA's fast unique-indices path — measured 1.06 ->
    0.05 ms per fill at N=100k/P=600k on a v5e vs the general scatter-max
    (scripts/probe_segfill.py)."""
    g = jnp.arange(values.shape[0], dtype=jnp.int32)
    idx = jnp.where(count > 0, offsets, pair_capacity + g)
    a = jnp.zeros(pair_capacity, jnp.int32).at[idx].set(
        values, mode="drop", unique_indices=True
    )
    return jax.lax.cummax(a, axis=0)


def bin_gaussians(
    mean2d: jnp.ndarray,  # (N, 2) pixel coords
    radius: jnp.ndarray,  # (N,) isotropic or (N, 2) per-axis extents; 0 => culled
    depth: jnp.ndarray,  # (N,)
    width: int,
    height: int,
    tile_size: int,
    pair_capacity: int,
    force_fallback: bool = False,
) -> TileBinning:
    mean2d = jax.lax.stop_gradient(mean2d)
    radius = jax.lax.stop_gradient(radius)
    depth = jax.lax.stop_gradient(depth)

    TW, TH = tile_grid(width, height, tile_size)
    num_tiles = TW * TH
    n = mean2d.shape[0]
    r_ok = jnp.min(radius, axis=1) > 0 if radius.ndim == 2 else radius > 0

    # depth-rank ordering: one N-sized argsort replaces per-pair depth keys
    order = jnp.argsort(jnp.where(r_ok, depth, jnp.inf)).astype(jnp.int32)
    mean2d = mean2d[order]
    radius = radius[order]
    r_ok = r_ok[order]

    tmin_x, tmin_y, tmax_x, tmax_y = tile_rect(mean2d, radius, tile_size, TW, TH)
    span_x = jnp.maximum(tmax_x - tmin_x, 0)
    span_y = jnp.maximum(tmax_y - tmin_y, 0)
    count = jnp.where(r_ok, span_x * span_y, 0).astype(jnp.int32)

    cum_end = jnp.cumsum(count)
    num_pairs = cum_end[-1]
    offsets = (cum_end - count).astype(jnp.int32)

    bg = _bits(n - 1)
    bx = _bits(TW)
    by = _bits(TH)
    bt = _bits(num_tiles)
    packed_ok = (
        (bg + bx + by <= 31) and (_bits(pair_capacity) + bx <= 31)
        and (bg + bt <= 31) and not force_fallback
    )

    p_idx = jnp.arange(pair_capacity, dtype=jnp.int32)
    valid = p_idx < jnp.minimum(num_pairs, pair_capacity)

    if packed_ok:
        g_ids = jnp.arange(n, dtype=jnp.int32)
        w1 = (g_ids << (bx + by)) | (tmin_x << by) | tmin_y
        w2 = (offsets << bx) | span_x
        a1 = _segment_fill(w1, offsets, count, pair_capacity)
        a2 = _segment_fill(w2, offsets, count, pair_capacity)

        g = a1 >> (bx + by)
        tx0 = (a1 >> by) & ((1 << bx) - 1)
        ty0 = a1 & ((1 << by) - 1)
        sx = jnp.maximum(a2 & ((1 << bx) - 1), 1)
        j = p_idx - (a2 >> bx)
        tile = (ty0 + j // sx) * TW + tx0 + j % sx

        key = jnp.where(valid, (tile << bg) | g, num_tiles << bg)
        (key_s,) = jax.lax.sort((key,), num_keys=1, is_stable=False)
        tile_s = key_s >> bg
        gauss_s = jnp.where(tile_s < num_tiles, key_s & ((1 << bg) - 1), 0)
    else:
        tile_s, gauss_s = _bin_fallback(
            tmin_x, tmin_y, span_x, offsets, cum_end, valid, p_idx, n, TW, num_tiles
        )

    tile_ids = jnp.arange(num_tiles + 1, dtype=jnp.int32)
    starts = jnp.searchsorted(tile_s, tile_ids, side="left").astype(jnp.int32)
    tile_start = starts[:-1]
    tile_count = starts[1:] - starts[:-1]

    return TileBinning(
        pair_gauss=gauss_s.astype(jnp.int32),
        pair_tile=tile_s.astype(jnp.int32),
        tile_start=tile_start,
        tile_count=tile_count,
        num_pairs=num_pairs,
        order=order,
        rank_offsets=jnp.concatenate(
            [jnp.zeros(1, jnp.int32), cum_end.astype(jnp.int32)]
        ),
    )


def _bin_fallback(tmin_x, tmin_y, span_x, offsets, cum_end, valid, p_idx, n, TW, num_tiles):
    """searchsorted(method='sort') + stacked gather + two-key sort; same
    contract as the packed path for sizes whose words overflow int32."""
    g = jnp.searchsorted(cum_end, p_idx, side="right", method="sort").astype(jnp.int32)
    g_safe = jnp.minimum(g, n - 1)
    tab = jnp.stack([tmin_x, tmin_y, span_x, offsets], axis=0)  # one batched gather
    vals = tab[:, g_safe]
    tx0, ty0, sx_raw, seg_off = vals[0], vals[1], vals[2], vals[3]
    sx = jnp.maximum(sx_raw, 1)
    j = p_idx - seg_off
    tile = (ty0 + j // sx) * TW + tx0 + j % sx
    tile = jnp.where(valid, tile, num_tiles).astype(jnp.int32)
    gauss = jnp.where(valid, g_safe, 0).astype(jnp.int32)
    tile_s, gauss_s = jax.lax.sort((tile, gauss), num_keys=2, is_stable=False)
    gauss_s = jnp.where(tile_s < num_tiles, gauss_s, 0)
    return tile_s, gauss_s
