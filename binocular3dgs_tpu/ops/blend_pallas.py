"""Pallas TPU kernels for the tile blend — the hot path of the rasterizer.

Same math and termination semantics as ops/blend.py (the XLA scan version),
but executed as one kernel program per 16x16 tile with:

  * scalar-prefetched per-tile [start, count) pair ranges (SMEM)
  * per-chunk async DMA of the sorted pair records from HBM
    (records are stored field-major (16, P) so a chunk lands as (16, C)
    with pairs on lanes — no in-kernel transposes)
  * a dynamic while-loop over chunks with early exit when every pixel's
    transmittance chain has terminated (the XLA scan always pays the
    static worst case; this kernel pays the true per-tile depth)
  * lane-axis prefix/suffix products implemented as log2(C) masked
    pltpu.roll steps (cumprod does not lower on TPU Pallas)
  * the backward walks chunks in reverse from ceil(max n_contrib / C),
    reconstructing transmittance by division from T_final exactly like
    the CUDA backward; per-pair cotangents are written back to an
    aliased pre-zeroed (16, P) buffer, then segment-summed per gaussian
    by the caller

Record rows: 0:mx 1:my 2:conic_a 3:conic_b 4:conic_c 5:opacity
6:r 7:g 8:b 9:depth 10-15:padding. The custom VJP lives in
ops/rasterize.py; gradients flow through the XLA-side gather that builds
the records, so the kernel only produces d_records.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ALPHA_MIN = 1.0 / 255.0
T_MIN = 1e-4
ALPHA_CLAMP = 0.99
REC_ROWS = 16


def _lane_iota(S, C):
    return jax.lax.broadcasted_iota(jnp.int32, (S, C), 1)


def _cumprod_lanes(x, C):
    """Inclusive prefix product along the lane axis (log-step)."""
    lane = _lane_iota(x.shape[0], C)
    sh = 1
    while sh < C:
        x = x * jnp.where(lane >= sh, pltpu.roll(x, sh, axis=1), 1.0)
        sh *= 2
    return x


def _rev_cumprod_lanes(x, C):
    """Inclusive suffix product along the lane axis."""
    lane = _lane_iota(x.shape[0], C)
    sh = 1
    while sh < C:
        x = x * jnp.where(lane < C - sh, pltpu.roll(x, C - sh, axis=1), 1.0)
        sh *= 2
    return x


def _rev_cumsum_lanes(x, C):
    """Inclusive suffix sum along the lane axis."""
    lane = _lane_iota(x.shape[0], C)
    sh = 1
    while sh < C:
        x = x + jnp.where(lane < C - sh, pltpu.roll(x, C - sh, axis=1), 0.0)
        sh *= 2
    return x


def _cummax_lanes(x, C):
    lane = _lane_iota(x.shape[0], C)
    sh = 1
    while sh < C:
        x = jnp.maximum(x, jnp.where(lane >= sh, pltpu.roll(x, sh, axis=1), x))
        sh *= 2
    return x


def _pixel_coords(tile_id, TW: int, ts: int, S: int):
    """(S, 1) pixel-center x/y for a flat tile id."""
    s = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    tx = tile_id % TW
    ty = tile_id // TW
    px = (tx * ts + s % ts).astype(jnp.float32)
    py = (ty * ts + s // ts).astype(jnp.float32)
    return px, py


def _chunk_alpha_from_rec(rec, px, py, valid_lane):
    """alpha (S, C) from a record chunk rec (16, C); masks applied."""
    mx = rec[0:1, :]
    my = rec[1:2, :]
    ca = rec[2:3, :]
    cb = rec[3:4, :]
    cc = rec[4:5, :]
    op = jnp.where(valid_lane, rec[5:6, :], 0.0)
    dx = mx - px  # (S, C)
    dy = my - py
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    alpha = jnp.minimum(ALPHA_CLAMP, op * jnp.exp(power))
    alpha = jnp.where((power > 0.0) | (alpha < ALPHA_MIN), 0.0, alpha)
    return alpha, power


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _forward_kernel(
    # scalar prefetch
    tile_start_ref, tile_count_ref,
    # inputs
    records_ref,  # (16, P) ANY/HBM
    # outputs (per tile)
    r_ref, g_ref, b_ref, dep_ref, tfin_ref, ncontrib_ref,  # (1, S) each
    # scratch
    rec_buf, dma_sem,
    *, TW: int, ts: int, C: int,
):
    S = ts * ts
    t = pl.program_id(0)
    start = tile_start_ref[t]
    count = tile_count_ref[t]
    px, py = _pixel_coords(t, TW, ts, S)
    lane = _lane_iota(S, C)
    n_chunks = pl.cdiv(count, C)

    def cond(carry):
        c, T_run, done, acc_r, acc_g, acc_b, acc_d, nc = carry
        return (c < n_chunks) & jnp.logical_not(jnp.all(done))

    def body(carry):
        c, T_run, done, acc_r, acc_g, acc_b, acc_d, nc = carry
        copy = pltpu.make_async_copy(
            records_ref.at[:, pl.ds(start + c * C, C)], rec_buf, dma_sem
        )
        copy.start()
        copy.wait()
        rec = rec_buf[:, :]
        k = c * C + lane  # global pair index within the tile (S, C)
        valid = k < count
        alpha, _ = _chunk_alpha_from_rec(rec, px, py, valid)
        alpha = jnp.where(done, 0.0, alpha)

        one_minus = 1.0 - alpha
        T_incl_raw = T_run * _cumprod_lanes(one_minus, C)
        T_before_raw = jnp.where(lane > 0, pltpu.roll(T_incl_raw, 1, axis=1), T_run)
        kill = (T_before_raw * one_minus < T_MIN).astype(jnp.float32)
        killed = _cummax_lanes(kill, C) > 0.0  # inclusive
        a_eff = jnp.where(killed, 0.0, alpha)
        one_minus_eff = 1.0 - a_eff
        T_incl = T_run * _cumprod_lanes(one_minus_eff, C)
        T_before = jnp.where(lane > 0, pltpu.roll(T_incl, 1, axis=1), T_run)
        w = a_eff * T_before  # (S, C)

        acc_r = acc_r + jnp.sum(w * rec[6:7, :], axis=1, keepdims=True)
        acc_g = acc_g + jnp.sum(w * rec[7:8, :], axis=1, keepdims=True)
        acc_b = acc_b + jnp.sum(w * rec[8:9, :], axis=1, keepdims=True)
        acc_d = acc_d + jnp.sum(w * rec[9:10, :], axis=1, keepdims=True)
        nc = jnp.maximum(nc, jnp.max(jnp.where(a_eff > 0.0, k + 1, 0), axis=1, keepdims=True))
        T_run_new = T_incl[:, C - 1 :]
        done_new = done | (jnp.max(killed.astype(jnp.int32), axis=1, keepdims=True) > 0)
        return (c + 1, T_run_new, done_new, acc_r, acc_g, acc_b, acc_d, nc)

    init = (
        jnp.int32(0),
        jnp.ones((S, 1), jnp.float32),
        jnp.zeros((S, 1), dtype=bool),
        jnp.zeros((S, 1), jnp.float32),
        jnp.zeros((S, 1), jnp.float32),
        jnp.zeros((S, 1), jnp.float32),
        jnp.zeros((S, 1), jnp.float32),
        jnp.zeros((S, 1), jnp.int32),
    )
    _, T_run, _, acc_r, acc_g, acc_b, acc_d, nc = jax.lax.while_loop(cond, body, init)
    r_ref[0, 0, :] = acc_r[:, 0]
    g_ref[0, 0, :] = acc_g[:, 0]
    b_ref[0, 0, :] = acc_b[:, 0]
    dep_ref[0, 0, :] = acc_d[:, 0]
    tfin_ref[0, 0, :] = T_run[:, 0]
    ncontrib_ref[0, 0, :] = nc[:, 0]


@functools.partial(
    jax.jit, static_argnames=("TW", "TH", "ts", "chunk", "interpret")
)
def blend_forward_pallas(
    records,  # (16, P) float32, field-major sorted pair records
    tile_start,  # (T,) int32
    tile_count,  # (T,) int32
    TW: int,
    TH: int,
    ts: int,
    chunk: int = 128,
    interpret: bool = False,
):
    T = TW * TH
    S = ts * ts
    kernel = functools.partial(_forward_kernel, TW=TW, ts=ts, C=chunk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, 1, S), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM)
            for _ in range(6)
        ],
        scratch_shapes=[
            pltpu.VMEM((REC_ROWS, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out_shape = [jax.ShapeDtypeStruct((T, 1, S), jnp.float32) for _ in range(5)] + [
        jax.ShapeDtypeStruct((T, 1, S), jnp.int32)
    ]
    r, g, b, dep, tfin, nc = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(tile_start, tile_count, records)
    rgb = jnp.stack([r[:, 0], g[:, 0], b[:, 0]], axis=-1)
    return rgb, dep[:, 0], tfin[:, 0], nc[:, 0]


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _backward_kernel(
    tile_start_ref, tile_count_ref,
    records_ref,  # (16, P) ANY
    tfin_ref, ncontrib_ref,  # (1, S)
    dr_ref, dg_ref, db_ref, ddep_ref, dtfin_ref,  # (1, S)
    zeros_ref,  # (16, P) ANY — aliased to the output (pre-zeroed)
    d_records_ref,  # (16, P) ANY (aliased, pre-zeroed)
    rec_buf, drec_buf, dma_sem, dma_sem_out,
    *, TW: int, ts: int, C: int,
):
    S = ts * ts
    t = pl.program_id(0)
    start = tile_start_ref[t]
    count = tile_count_ref[t]
    px, py = _pixel_coords(t, TW, ts, S)
    lane = _lane_iota(S, C)

    T_final = tfin_ref[0, 0, :].reshape(S, 1)
    n_contrib = ncontrib_ref[0, 0, :].reshape(S, 1)
    d_r = dr_ref[0, 0, :].reshape(S, 1)
    d_g = dg_ref[0, 0, :].reshape(S, 1)
    d_b = db_ref[0, 0, :].reshape(S, 1)
    d_dep = ddep_ref[0, 0, :].reshape(S, 1)
    d_tf = dtfin_ref[0, 0, :].reshape(S, 1)

    nc_max = jnp.max(n_contrib)
    n_chunks = pl.cdiv(jnp.minimum(nc_max, count), C)

    def cond(carry):
        c_rev = carry[0]
        return c_rev < n_chunks

    def body(carry):
        c_rev, T_run, s_r, s_g, s_b, s_d = carry
        c = n_chunks - 1 - c_rev
        copy = pltpu.make_async_copy(
            records_ref.at[:, pl.ds(start + c * C, C)], rec_buf, dma_sem
        )
        copy.start()
        copy.wait()
        rec = rec_buf[:, :]
        k = c * C + lane
        valid = (k < count) & (k < n_contrib)
        alpha_raw, power = _chunk_alpha_from_rec(rec, px, py, k < count)
        a = jnp.where(valid, alpha_raw, 0.0)
        one_minus = jnp.maximum(1.0 - a, 1.0 - ALPHA_CLAMP)
        sp = _rev_cumprod_lanes(one_minus, C)  # prod_{j>=i}(1-a_j)
        T_i = T_run / sp  # transmittance before pair i (S, C)
        w = a * T_i

        colr = rec[6:7, :]
        colg = rec[7:8, :]
        colb = rec[8:9, :]
        z = rec[9:10, :]
        cwr = w * colr
        cwg = w * colg
        cwb = w * colb
        zw = w * z
        # suffix sums: S_i = carry + sum_{j>i in chunk} x_j
        suf_r = _rev_cumsum_lanes(cwr, C) - cwr + s_r
        suf_g = _rev_cumsum_lanes(cwg, C) - cwg + s_g
        suf_b = _rev_cumsum_lanes(cwb, C) - cwb + s_b
        suf_d = _rev_cumsum_lanes(zw, C) - zw + s_d

        inv_om = 1.0 / one_minus
        d_alpha = (
            d_r * (colr * T_i - suf_r * inv_om)
            + d_g * (colg * T_i - suf_g * inv_om)
            + d_b * (colb * T_i - suf_b * inv_om)
            + d_dep * (z * T_i - suf_d * inv_om)
            + d_tf * (-T_final * inv_om)
        )
        d_alpha = jnp.where(valid & (a > 0.0), d_alpha, 0.0)

        op = rec[5:6, :]
        G = jnp.exp(power)
        unclamped = (op * G) <= ALPHA_CLAMP
        d_alpha_eff = jnp.where(unclamped, d_alpha, 0.0)
        mx = rec[0:1, :]
        my = rec[1:2, :]
        ca = rec[2:3, :]
        cb = rec[3:4, :]
        cc = rec[4:5, :]
        dx = mx - px
        dy = my - py
        d_op = jnp.sum(G * d_alpha_eff, axis=0, keepdims=True)  # (1, C)
        d_pow = a * d_alpha_eff
        d_ca = jnp.sum(-0.5 * dx * dx * d_pow, axis=0, keepdims=True)
        d_cb = jnp.sum(-dx * dy * d_pow, axis=0, keepdims=True)
        d_cc = jnp.sum(-0.5 * dy * dy * d_pow, axis=0, keepdims=True)
        d_mx = jnp.sum(-(ca * dx + cb * dy) * d_pow, axis=0, keepdims=True)
        d_my = jnp.sum(-(cc * dy + cb * dx) * d_pow, axis=0, keepdims=True)
        d_colr = jnp.sum(w * d_r, axis=0, keepdims=True)
        d_colg = jnp.sum(w * d_g, axis=0, keepdims=True)
        d_colb = jnp.sum(w * d_b, axis=0, keepdims=True)
        d_z = jnp.sum(w * d_dep, axis=0, keepdims=True)

        zero_row = jnp.zeros((1, C), jnp.float32)
        drec = jnp.concatenate(
            [d_mx, d_my, d_ca, d_cb, d_cc, d_op, d_colr, d_colg, d_colb, d_z]
            + [zero_row] * (REC_ROWS - 10),
            axis=0,
        )
        drec_buf[:, :] = drec
        out_copy = pltpu.make_async_copy(
            drec_buf, d_records_ref.at[:, pl.ds(start + c * C, C)], dma_sem_out
        )
        out_copy.start()
        out_copy.wait()

        T_run_new = T_run / sp[:, 0:1]  # transmittance before this chunk
        s_r_new = s_r + jnp.sum(cwr, axis=1, keepdims=True)
        s_g_new = s_g + jnp.sum(cwg, axis=1, keepdims=True)
        s_b_new = s_b + jnp.sum(cwb, axis=1, keepdims=True)
        s_d_new = s_d + jnp.sum(zw, axis=1, keepdims=True)
        return (c_rev + 1, T_run_new, s_r_new, s_g_new, s_b_new, s_d_new)

    init = (
        jnp.int32(0),
        T_final,
        jnp.zeros((S, 1), jnp.float32),
        jnp.zeros((S, 1), jnp.float32),
        jnp.zeros((S, 1), jnp.float32),
        jnp.zeros((S, 1), jnp.float32),
    )
    jax.lax.while_loop(cond, body, init)


@functools.partial(
    jax.jit, static_argnames=("TW", "TH", "ts", "chunk", "interpret")
)
def blend_backward_pallas(
    records,  # (16, P)
    tile_start,
    tile_count,
    T_final,  # (T, S)
    n_contrib,  # (T, S) int32
    d_rgb,  # (T, S, 3)
    d_dep,  # (T, S)
    d_Tfin,  # (T, S)
    TW: int,
    TH: int,
    ts: int,
    chunk: int = 128,
    interpret: bool = False,
):
    T = TW * TH
    S = ts * ts
    P = records.shape[1]
    kernel = functools.partial(_backward_kernel, TW=TW, ts=ts, C=chunk)

    def tile_spec():
        return pl.BlockSpec((1, 1, S), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # records
            tile_spec(),  # T_final
            tile_spec(),  # n_contrib
            tile_spec(),  # d_r
            tile_spec(),  # d_g
            tile_spec(),  # d_b
            tile_spec(),  # d_dep
            tile_spec(),  # d_Tfin
            pl.BlockSpec(memory_space=pl.ANY),  # zeros (aliased to output)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((REC_ROWS, chunk), jnp.float32),
            pltpu.VMEM((REC_ROWS, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    zeros = jnp.zeros((REC_ROWS, P), jnp.float32)
    d_records = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((REC_ROWS, P), jnp.float32),
        input_output_aliases={10: 0},  # zeros input (after 2 scalar-prefetch args) -> output
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        tile_start, tile_count, records,
        T_final[:, None, :], n_contrib[:, None, :],
        d_rgb[..., 0][:, None, :], d_rgb[..., 1][:, None, :], d_rgb[..., 2][:, None, :],
        d_dep[:, None, :], d_Tfin[:, None, :],
        zeros,
    )
    return d_records
