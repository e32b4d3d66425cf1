"""Tile blend with custom VJP — the compositing core of the rasterizer.

Reproduces the CUDA renderCUDA forward/backward pair (behavior spec
SURVEY.md §3.5) on (tile, pixel, chunk) dense blocks:

  forward: per tile, walk its depth-sorted pair list front-to-back in chunks;
  per-pixel transmittance chain with the 0.99 alpha clamp, 1/255 alpha skip,
  power>0 skip, and T<1e-4 termination (a pixel's blending freezes at the
  first pair that would cross it). Outputs rgb (+ T_final*bg), unnormalized
  alpha-weighted depth, alpha = 1-T_final, plus (non-differentiable)
  T_final and per-pixel last-contributor indices for the backward.

  backward: walks the pair lists back-to-front, reconstructing transmittance
  by division from T_final (like the CUDA backward) and accumulating suffix
  color/depth sums, producing exact cotangents for mean2d / conic / color /
  opacity / depth per gaussian via scatter-add — no O(pairs) residuals are
  stored; memory is O(gaussians + tiles*pixels).

The sequential per-chunk recurrences are vectorized with (masked) cumulative
products/sums along the chunk axis, so XLA sees pure dense math; per-chunk
bodies run under lax.scan. The same math is reused by the Pallas TPU kernels
(ops/blend_pallas.py) which replace the scan with on-chip loops.

Termination-mask subtlety: the kill index computed from the *raw* running
product equals the kill index of the frozen-T semantics, because both chains
agree up to the first kill (see ops/rasterize_reference.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

ALPHA_MIN = 1.0 / 255.0
T_MIN = 1e-4
ALPHA_CLAMP = 0.99


class BlendInputs(NamedTuple):
    mean2d: jnp.ndarray  # (N, 2)
    conic: jnp.ndarray  # (N, 3)
    color: jnp.ndarray  # (N, 3)
    opacity: jnp.ndarray  # (N,)
    depth: jnp.ndarray  # (N,)


def _tile_pixel_coords(TW: int, TH: int, tile_size: int):
    T = TW * TH
    S = tile_size * tile_size
    t = jnp.arange(T, dtype=jnp.int32)
    s = jnp.arange(S, dtype=jnp.int32)
    px = (t % TW)[:, None] * tile_size + (s % tile_size)[None, :]
    py = (t // TW)[:, None] * tile_size + (s // tile_size)[None, :]
    return px.astype(jnp.float32), py.astype(jnp.float32)


def _chunk_alpha(inputs: BlendInputs, g, valid, px, py):
    """alpha (T, S, C) for one chunk of pairs, with skip masks applied.

    g: (T, C) gaussian ids; valid: (T, C); px/py: (T, S).
    Returns (alpha_raw, color_g (T,C,3), depth_g (T,C)).
    """
    m = inputs.mean2d[g]  # (T, C, 2)
    con = inputs.conic[g]  # (T, C, 3)
    op = jnp.where(valid, inputs.opacity[g], 0.0)  # (T, C)
    dx = m[:, None, :, 0] - px[:, :, None]  # (T, S, C)
    dy = m[:, None, :, 1] - py[:, :, None]
    a_, b_, c_ = con[:, None, :, 0], con[:, None, :, 1], con[:, None, :, 2]
    power = -0.5 * (a_ * dx * dx + c_ * dy * dy) - b_ * dx * dy
    alpha = jnp.minimum(ALPHA_CLAMP, op[:, None, :] * jnp.exp(power))
    alpha = jnp.where((power > 0.0) | (alpha < ALPHA_MIN), 0.0, alpha)
    return alpha, inputs.color[g], jnp.where(valid, inputs.depth[g], 0.0)


def _chain(alpha, T_in, done_in):
    """Front-to-back transmittance chain over the chunk axis (last axis).

    Returns (a_eff, T_before, T_out, done_out); all per (T, S, C)/(T, S).
    """
    alpha = jnp.where(done_in[..., None], 0.0, alpha)
    one_minus = 1.0 - alpha
    T_incl_raw = T_in[..., None] * jnp.cumprod(one_minus, axis=-1)
    T_before_raw = jnp.concatenate([T_in[..., None], T_incl_raw[..., :-1]], axis=-1)
    kill = T_before_raw * one_minus < T_MIN
    killed = jnp.cumsum(kill.astype(jnp.int32), axis=-1) > 0  # inclusive
    a_eff = jnp.where(killed, 0.0, alpha)
    T_incl = T_in[..., None] * jnp.cumprod(1.0 - a_eff, axis=-1)
    T_before = jnp.concatenate([T_in[..., None], T_incl[..., :-1]], axis=-1)
    return a_eff, T_before, T_incl[..., -1], done_in | killed[..., -1]


def blend_forward_xla(
    inputs: BlendInputs,
    pair_gauss: jnp.ndarray,  # (P,)
    tile_start: jnp.ndarray,  # (T,)
    tile_count: jnp.ndarray,  # (T,)
    TW: int,
    TH: int,
    tile_size: int,
    max_pairs_per_tile: int,
    chunk: int,
):
    T = TW * TH
    S = tile_size * tile_size
    P = pair_gauss.shape[0]
    px, py = _tile_pixel_coords(TW, TH, tile_size)
    n_chunks = -(-max_pairs_per_tile // chunk)

    def body(carry, c):
        T_run, done, rgb, dep, n_contrib = carry
        k = c * chunk + jnp.arange(chunk, dtype=jnp.int32)  # (C,)
        idx = tile_start[:, None] + k[None, :]
        valid = k[None, :] < tile_count[:, None]
        g = pair_gauss[jnp.clip(idx, 0, P - 1)]
        alpha, col, dz = _chunk_alpha(inputs, g, valid, px, py)
        alpha = jnp.where(valid[:, None, :], alpha, 0.0)
        a_eff, T_before, T_out, done_out = _chain(alpha, T_run, done)
        w = a_eff * T_before  # (T, S, C)
        rgb = rgb + jnp.einsum("tsc,tcr->tsr", w, col)
        dep = dep + jnp.einsum("tsc,tc->ts", w, dz)
        contributed = a_eff > 0.0
        n_new = jnp.max(
            jnp.where(contributed, k[None, None, :] + 1, 0), axis=-1
        )
        n_contrib = jnp.maximum(n_contrib, n_new)
        return (T_out, done_out, rgb, dep, n_contrib), None

    init = (
        jnp.ones((T, S), jnp.float32),
        jnp.zeros((T, S), bool),
        jnp.zeros((T, S, 3), jnp.float32),
        jnp.zeros((T, S), jnp.float32),
        jnp.zeros((T, S), jnp.int32),
    )
    (T_final, _, rgb, dep, n_contrib), _ = jax.lax.scan(
        jax.checkpoint(body), init, jnp.arange(n_chunks, dtype=jnp.int32)
    )
    return rgb, dep, T_final, n_contrib


def blend_backward_xla(
    inputs: BlendInputs,
    pair_gauss: jnp.ndarray,
    tile_start: jnp.ndarray,
    tile_count: jnp.ndarray,
    TW: int,
    TH: int,
    tile_size: int,
    max_pairs_per_tile: int,
    chunk: int,
    T_final: jnp.ndarray,  # (T, S)
    n_contrib: jnp.ndarray,  # (T, S)
    d_rgb: jnp.ndarray,  # (T, S, 3) cotangent incl. the bg-term handled outside
    d_dep: jnp.ndarray,  # (T, S)
    d_Tfin: jnp.ndarray,  # (T, S) cotangent of T_final (from alpha/bg outputs)
):
    T = TW * TH
    S = tile_size * tile_size
    P = pair_gauss.shape[0]
    N = inputs.mean2d.shape[0]
    px, py = _tile_pixel_coords(TW, TH, tile_size)
    n_chunks = -(-max_pairs_per_tile // chunk)

    zero_grads = BlendInputs(
        mean2d=jnp.zeros((N, 2), jnp.float32),
        conic=jnp.zeros((N, 3), jnp.float32),
        color=jnp.zeros((N, 3), jnp.float32),
        opacity=jnp.zeros((N,), jnp.float32),
        depth=jnp.zeros((N,), jnp.float32),
    )

    def body(carry, c_rev):
        T_run, S_rgb, S_dep, grads = carry
        c = n_chunks - 1 - c_rev
        k = c * chunk + jnp.arange(chunk, dtype=jnp.int32)
        idx = tile_start[:, None] + k[None, :]
        valid = k[None, :] < tile_count[:, None]
        g = jnp.where(valid, pair_gauss[jnp.clip(idx, 0, P - 1)], 0)
        alpha_raw, col, dz = _chunk_alpha(inputs, g, valid, px, py)
        keep = valid[:, None, :] & (k[None, None, :] < n_contrib[..., None])
        a = jnp.where(keep, alpha_raw, 0.0)  # (T, S, C)
        one_minus = jnp.maximum(1.0 - a, 1.0 - ALPHA_CLAMP)
        # suffix products within the chunk: sp[i] = prod_{j>=i}(1-a_j)
        sp = jnp.flip(jnp.cumprod(jnp.flip(one_minus, axis=-1), axis=-1), axis=-1)
        T_i = T_run[..., None] / sp  # transmittance before pair i
        w = a * T_i
        # suffix sums: S_i = carry + sum_{j>i in chunk} c_j w_j
        cw = w[..., None] * col[:, None, :, :]  # (T, S, C, 3)
        suff_rgb = jnp.flip(jnp.cumsum(jnp.flip(cw, axis=-2), axis=-2), axis=-2) - cw
        suff_rgb = suff_rgb + S_rgb[..., None, :]
        zw = w * dz[:, None, :]
        suff_dep = jnp.flip(jnp.cumsum(jnp.flip(zw, axis=-1), axis=-1), axis=-1) - zw
        suff_dep = suff_dep + S_dep[..., None]

        inv_om = 1.0 / one_minus
        Tn = T_final[..., None]
        # bg and output-alpha cotangents act through T_final (d_Tfin below)
        d_alpha = jnp.einsum(
            "tsr,tscr->tsc",
            d_rgb,
            col[:, None, :, :] * T_i[..., None] - suff_rgb * inv_om[..., None],
        )
        d_alpha = d_alpha + d_dep[..., None] * (dz[:, None, :] * T_i - suff_dep * inv_om)
        d_alpha = d_alpha + d_Tfin[..., None] * (-Tn * inv_om)
        d_alpha = jnp.where(keep & (a > 0), d_alpha, 0.0)

        # alpha = min(0.99, op * G): clamped -> zero grad to op and power
        m = inputs.mean2d[g]
        con = inputs.conic[g]
        op = inputs.opacity[g]
        dx = m[:, None, :, 0] - px[:, :, None]
        dy = m[:, None, :, 1] - py[:, :, None]
        a_, b_, c_ = con[:, None, :, 0], con[:, None, :, 1], con[:, None, :, 2]
        power = -0.5 * (a_ * dx * dx + c_ * dy * dy) - b_ * dx * dy
        G = jnp.exp(power)
        unclamped = (op[:, None, :] * G) <= ALPHA_CLAMP
        d_alpha_eff = jnp.where(unclamped, d_alpha, 0.0)
        d_op = jnp.sum(G * d_alpha_eff, axis=1)  # (T, C)
        d_pow = a * d_alpha_eff  # alpha * d_alpha (a = op*G when unclamped)
        d_ca = jnp.sum(-0.5 * dx * dx * d_pow, axis=1)
        d_cb = jnp.sum(-dx * dy * d_pow, axis=1)
        d_cc = jnp.sum(-0.5 * dy * dy * d_pow, axis=1)
        d_dx = (-(a_ * dx + b_ * dy)) * d_pow
        d_dy = (-(c_ * dy + b_ * dx)) * d_pow
        d_mx = jnp.sum(d_dx, axis=1)
        d_my = jnp.sum(d_dy, axis=1)
        d_col = jnp.einsum("tsc,tsr->tcr", w, d_rgb)
        d_z = jnp.einsum("tsc,ts->tc", w, d_dep)

        gf = g.reshape(-1)
        grads = BlendInputs(
            mean2d=grads.mean2d.at[gf].add(
                jnp.stack([d_mx, d_my], axis=-1).reshape(-1, 2)
            ),
            conic=grads.conic.at[gf].add(
                jnp.stack([d_ca, d_cb, d_cc], axis=-1).reshape(-1, 3)
            ),
            color=grads.color.at[gf].add(d_col.reshape(-1, 3)),
            opacity=grads.opacity.at[gf].add(d_op.reshape(-1)),
            depth=grads.depth.at[gf].add(d_z.reshape(-1)),
        )

        # carries for the next (earlier) chunk
        T_run_new = T_i[..., 0]  # transmittance before this chunk's first pair
        S_rgb_new = S_rgb + jnp.sum(cw, axis=-2)
        S_dep_new = S_dep + jnp.sum(zw, axis=-1)
        return (T_run_new, S_rgb_new, S_dep_new, grads), None

    init = (T_final, jnp.zeros((T, S, 3), jnp.float32), jnp.zeros((T, S), jnp.float32), zero_grads)
    (Tr, _, _, grads), _ = jax.lax.scan(
        jax.checkpoint(body), init, jnp.arange(n_chunks, dtype=jnp.int32)
    )
    return grads
