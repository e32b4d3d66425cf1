"""Pallas TPU kernels for the tile blend — the hot path of the rasterizer.

Same math and termination semantics as ops/blend.py (the XLA scan version),
but executed as one kernel program per 16x16 tile with:

  * scalar-prefetched per-tile [start, count) pair ranges (SMEM); segment
    starts are arbitrary — each DMA reads from the chunk-aligned address at
    or below the segment start and the leading out-of-segment lanes are
    masked off (k < 0), so no re-alignment pass over the pair buffer is
    needed (the round-1 align_pairs stage cost ~125 ms/render on a v5e)
  * per-chunk async DMA of sorted pair records from HBM; records are
    field-major (16, P) so a chunk lands as (16, C) whose field rows (1, C)
    broadcast directly against per-pixel columns (S, 1) — no transposes
  * work arrays are (S=256 pixels, C=chunk pairs); all cross-chunk state
    (transmittance, accumulators, termination flags, contributor counts)
    lives in small (S, 1) VMEM scratch refs, so the dynamic while-loop over
    chunks carries only scalars (vector loop-carries previously spilled
    hundreds of vregs per iteration and were ~30x slower)
  * early exit once every pixel's transmittance chain has terminated; the
    rare-kill corrective rescan runs under lax.cond only when some pixel
    actually terminates in the chunk
  * lane-axis prefix/suffix scans as log2(C) masked pltpu.roll steps
    (cumprod/cumsum do not lower on TPU Pallas); "last column" extraction via
    a one-hot MXU contraction to stay in the (S, 1) orientation
  * the backward walks chunks in reverse from the per-tile max contributor,
    reconstructing transmittance by division from T_final exactly like the
    CUDA backward; per-pair cotangents are accumulated (read-add-write DMA,
    safe because the TPU grid runs sequentially) into an aliased pre-zeroed
    (16, P) buffer — boundary chunks shared by two adjacent tiles compose
    correctly — and segment-summed per gaussian by the caller

Record rows: 0:mx 1:my 2:conic_a 3:conic_b 4:conic_c 5:opacity
6:r 7:g 8:b 9:depth 10-15:padding. The custom VJP lives in
ops/rasterize.py; gradients flow through the XLA-side gather that builds the
records, so the kernels only produce d_records.
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
    """Inclusive prefix product along the lane (chunk) axis (log-step)."""
    lane = _lane_iota(x.shape[0], C)
    sh = 1
    while sh < C:
        x = x * jnp.where(lane >= sh, pltpu.roll(x, sh, axis=1), 1.0)
        sh *= 2
    return x


def _rev_cumprod_lanes(x, C):
    lane = _lane_iota(x.shape[0], C)
    sh = 1
    while sh < C:
        x = x * jnp.where(lane < C - sh, pltpu.roll(x, C - sh, axis=1), 1.0)
        sh *= 2
    return x


def _rev_cumsum_lanes(x, C):
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


def _last_col(x, C):
    """x[:, C-1:C] as (S, 1) via a one-hot MXU contraction."""
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0) == C - 1).astype(x.dtype)
    return jax.lax.dot_general(
        x, onehot, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _shift_right(x, first_col, C):
    """Exclusive shift along lanes: column i gets x[i-1], column 0 first_col."""
    lane = _lane_iota(x.shape[0], C)
    return jnp.where(lane >= 1, pltpu.roll(x, 1, axis=1), first_col)


def _pixel_coords(tile_id, TW: int, ts: int, S: int):
    """(S, 1) pixel x/y for a flat tile id."""
    s = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    tx = tile_id % TW
    ty = tile_id // TW
    px = (tx * ts + s % ts).astype(jnp.float32)
    py = (ty * ts + s // ts).astype(jnp.float32)
    return px, py


def _chunk_alpha(rec, px, py, valid_lane):
    """alpha (S, C) for a record chunk rec (16, C); skip masks applied.

    valid_lane: (1, C) pair validity; px/py: (S, 1).
    """
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
    tile_start_ref, tile_count_ref,
    records_ref,  # (16, P) HBM
    r_ref, g_ref, b_ref, dep_ref, tfin_ref, ncontrib_ref,  # (1, 1, S)
    rec_buf, dma_sem, T_run_ref, done_ref, acc_ref, nc_ref,
    *, TW: int, ts: int, C: int,
):
    S = ts * ts
    t = pl.program_id(0)
    seg_start = tile_start_ref[t]
    count = tile_count_ref[t]
    base = pl.multiple_of((seg_start // C) * C, C)  # chunk-aligned DMA base
    off = seg_start - base  # leading lanes of chunk 0 belong to the prior tile
    px, py = _pixel_coords(t, TW, ts, S)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    n_chunks = pl.cdiv(off + count, C)

    T_run_ref[:, :] = jnp.ones((S, 1), jnp.float32)
    done_ref[:, :] = jnp.zeros((S, 1), jnp.float32)
    acc_ref[:, :] = jnp.zeros((S, 4), jnp.float32)
    nc_ref[:, :] = jnp.zeros((S, 1), jnp.int32)

    def cond(carry):
        c, all_done = carry
        return (c < n_chunks) & (all_done < 0.5)

    def body(carry):
        c, _ = carry
        copy = pltpu.make_async_copy(
            records_ref.at[:, pl.ds(pl.multiple_of(base + c * C, C), C)], rec_buf, dma_sem
        )
        copy.start()
        copy.wait()
        rec = rec_buf[:, :]
        T_run = T_run_ref[:, :]  # (S, 1)
        done = done_ref[:, :]

        k = c * C + lane1 - off  # (1, C) position within the tile's segment
        valid = (k >= 0) & (k < count)
        alpha, _ = _chunk_alpha(rec, px, py, valid)
        alpha = jnp.where(done > 0.5, 0.0, alpha)  # (S, 1) mask broadcast

        one_minus = 1.0 - alpha
        cp_raw = _cumprod_lanes(one_minus, C)
        T_before_raw = T_run * _shift_right(cp_raw, 1.0, C)
        kill = T_before_raw * one_minus < T_MIN
        any_kill = jnp.max(kill.astype(jnp.float32)) > 0.0

        def with_kill(_):
            killed = _cummax_lanes(kill.astype(jnp.float32), C)
            a_eff = jnp.where(killed > 0.0, 0.0, alpha)
            cp = _cumprod_lanes(1.0 - a_eff, C)
            T_before = T_run * _shift_right(cp, 1.0, C)
            done_new = jnp.maximum(done, _last_col(killed, C))
            return a_eff, T_before, cp, done_new

        def no_kill(_):
            return alpha, T_before_raw, cp_raw, done

        a_eff, T_before, cp, done_new = jax.lax.cond(any_kill, with_kill, no_kill, None)
        w = a_eff * T_before  # (S, C)

        acc = acc_ref[:, :]
        acc_ref[:, :] = acc + jnp.concatenate(
            [
                jnp.sum(w * rec[6:7, :], axis=1, keepdims=True),
                jnp.sum(w * rec[7:8, :], axis=1, keepdims=True),
                jnp.sum(w * rec[8:9, :], axis=1, keepdims=True),
                jnp.sum(w * rec[9:10, :], axis=1, keepdims=True),
            ],
            axis=1,
        )
        nc_ref[:, :] = jnp.maximum(
            nc_ref[:, :], jnp.max(jnp.where(a_eff > 0.0, k + 1, 0), axis=1, keepdims=True)
        )
        T_run_ref[:, :] = T_run * _last_col(cp, C)
        done_ref[:, :] = done_new
        return (c + 1, jnp.min(done_new))

    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.float32(0.0)))
    acc = acc_ref[:, :]
    r_ref[0, 0, :] = acc[:, 0]
    g_ref[0, 0, :] = acc[:, 1]
    b_ref[0, 0, :] = acc[:, 2]
    dep_ref[0, 0, :] = acc[:, 3]
    tfin_ref[0, 0, :] = T_run_ref[:, 0]
    ncontrib_ref[0, 0, :] = nc_ref[:, 0]


@functools.partial(jax.jit, static_argnames=("TW", "TH", "ts", "chunk", "interpret"))
def blend_forward_pallas(
    records,  # (16, P) float32, field-major sorted pair records (chunk-aligned)
    tile_start,  # (T,) int32, multiples of chunk
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
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=[
            pl.BlockSpec((1, 1, S), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM)
            for _ in range(6)
        ],
        scratch_shapes=[
            pltpu.VMEM((REC_ROWS, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.VMEM((S, 1), jnp.float32),  # T_run
            pltpu.VMEM((S, 1), jnp.float32),  # done
            pltpu.VMEM((S, 4), jnp.float32),  # rgb + depth accumulators
            pltpu.VMEM((S, 1), jnp.int32),  # n_contrib
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
    records_ref,  # (16, P) HBM
    tfin_ref, ncontrib_ref,  # (1, 1, S)
    dr_ref, dg_ref, db_ref, ddep_ref, dtfin_ref,  # (1, 1, S)
    zeros_ref,  # (16, P) HBM — aliased to the output (pre-zeroed)
    d_records_ref,  # (16, P) HBM (aliased)
    rec_buf, drec_buf, acc_buf, dma_sem, dma_sem_acc, dma_sem_out, T_run_ref, suf_ref,
    *, TW: int, ts: int, C: int,
):
    S = ts * ts
    t = pl.program_id(0)
    seg_start = tile_start_ref[t]
    count = tile_count_ref[t]
    base = pl.multiple_of((seg_start // C) * C, C)
    off = seg_start - base
    px, py = _pixel_coords(t, TW, ts, S)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)

    # per-tile pixel vectors, transposed once into the (S, 1) orientation
    T_final = jnp.transpose(tfin_ref[0, :, :], (1, 0))  # (S, 1)
    n_contrib = jnp.transpose(ncontrib_ref[0, :, :], (1, 0))
    d_r = jnp.transpose(dr_ref[0, :, :], (1, 0))
    d_g = jnp.transpose(dg_ref[0, :, :], (1, 0))
    d_b = jnp.transpose(db_ref[0, :, :], (1, 0))
    d_dep = jnp.transpose(ddep_ref[0, :, :], (1, 0))
    d_tf = jnp.transpose(dtfin_ref[0, :, :], (1, 0))

    nc_max = jnp.max(n_contrib)
    n_chunks = pl.cdiv(off + jnp.minimum(nc_max, count), C)

    T_run_ref[:, :] = T_final
    suf_ref[:, :] = jnp.zeros((S, 4), jnp.float32)

    def cond(c_rev):
        return c_rev < n_chunks

    def body(c_rev):
        c = n_chunks - 1 - c_rev
        copy = pltpu.make_async_copy(
            records_ref.at[:, pl.ds(pl.multiple_of(base + c * C, C), C)], rec_buf, dma_sem
        )
        copy.start()
        # prefetch the existing d_records chunk for the accumulate-write:
        # boundary chunks are shared with the adjacent tile's cotangents
        acc_copy = pltpu.make_async_copy(
            d_records_ref.at[:, pl.ds(pl.multiple_of(base + c * C, C), C)],
            acc_buf,
            dma_sem_acc,
        )
        acc_copy.start()
        copy.wait()
        rec = rec_buf[:, :]
        T_run = T_run_ref[:, :]
        suf = suf_ref[:, :]

        k = c * C + lane1 - off
        in_count = (k >= 0) & (k < count)
        keep = in_count & (k < n_contrib)  # (S, C)
        alpha_raw, power = _chunk_alpha(rec, px, py, in_count)
        a = jnp.where(keep, alpha_raw, 0.0)
        one_minus = jnp.maximum(1.0 - a, 1.0 - ALPHA_CLAMP)
        sp = _rev_cumprod_lanes(one_minus, C)  # prod_{j>=i}(1-a_j)
        T_i = T_run / sp
        w = a * T_i

        colr = rec[6:7, :]
        colg = rec[7:8, :]
        colb = rec[8:9, :]
        z = rec[9:10, :]
        cwr = w * colr
        cwg = w * colg
        cwb = w * colb
        zw = w * z
        suf_r = _rev_cumsum_lanes(cwr, C) - cwr + suf[:, 0:1]
        suf_g = _rev_cumsum_lanes(cwg, C) - cwg + suf[:, 1:2]
        suf_b = _rev_cumsum_lanes(cwb, C) - cwb + suf[:, 2:3]
        suf_d = _rev_cumsum_lanes(zw, C) - zw + suf[:, 3:4]

        inv_om = 1.0 / one_minus
        d_alpha = (
            d_r * (colr * T_i - suf_r * inv_om)
            + d_g * (colg * T_i - suf_g * inv_om)
            + d_b * (colb * T_i - suf_b * inv_om)
            + d_dep * (z * T_i - suf_d * inv_om)
            + d_tf * (-T_final * inv_om)
        )
        d_alpha = jnp.where(keep & (a > 0.0), d_alpha, 0.0)

        op = rec[5:6, :]
        G = jnp.exp(power)
        d_alpha_eff = jnp.where(op * G <= ALPHA_CLAMP, d_alpha, 0.0)
        mx = rec[0:1, :]
        my = rec[1:2, :]
        ca = rec[2:3, :]
        cb = rec[3:4, :]
        cc = rec[4:5, :]
        dx = mx - px
        dy = my - py
        d_pow = a * d_alpha_eff
        # per-pair reductions over pixels (sublane axis) -> (1, C) rows
        d_mx = jnp.sum(-(ca * dx + cb * dy) * d_pow, axis=0, keepdims=True)
        d_my = jnp.sum(-(cc * dy + cb * dx) * d_pow, axis=0, keepdims=True)
        d_ca = jnp.sum(-0.5 * dx * dx * d_pow, axis=0, keepdims=True)
        d_cb = jnp.sum(-dx * dy * d_pow, axis=0, keepdims=True)
        d_cc = jnp.sum(-0.5 * dy * dy * d_pow, axis=0, keepdims=True)
        d_op = jnp.sum(G * d_alpha_eff, axis=0, keepdims=True)
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
        # out-of-segment lanes contribute exactly 0 (a = 0 there), so adding
        # onto the neighbor tile's values is a no-op for its lanes
        acc_copy.wait()
        drec_buf[:, :] = drec + acc_buf[:, :]
        out_copy = pltpu.make_async_copy(
            drec_buf,
            d_records_ref.at[:, pl.ds(pl.multiple_of(base + c * C, C), C)],
            dma_sem_out,
        )
        out_copy.start()
        out_copy.wait()

        # transmittance before this chunk's first pair: divide by the chunk's
        # total product (sp column 0) via one-hot contraction
        onehot0 = (jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0) == 0).astype(sp.dtype)
        sp0 = jax.lax.dot_general(
            sp, onehot0, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        T_run_ref[:, :] = T_run / sp0
        suf_ref[:, :] = suf + jnp.concatenate(
            [
                jnp.sum(cwr, axis=1, keepdims=True),
                jnp.sum(cwg, axis=1, keepdims=True),
                jnp.sum(cwb, axis=1, keepdims=True),
                jnp.sum(zw, axis=1, keepdims=True),
            ],
            axis=1,
        )
        return c_rev + 1

    jax.lax.while_loop(cond, body, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("TW", "TH", "ts", "chunk", "interpret"))
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
            pl.BlockSpec(memory_space=pltpu.HBM),  # records
            tile_spec(),  # T_final
            tile_spec(),  # n_contrib
            tile_spec(),  # d_r
            tile_spec(),  # d_g
            tile_spec(),  # d_b
            tile_spec(),  # d_dep
            tile_spec(),  # d_Tfin
            pl.BlockSpec(memory_space=pltpu.HBM),  # zeros (aliased to output)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((REC_ROWS, chunk), jnp.float32),  # rec_buf
            pltpu.VMEM((REC_ROWS, chunk), jnp.float32),  # drec_buf
            pltpu.VMEM((REC_ROWS, chunk), jnp.float32),  # acc_buf
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.VMEM((S, 1), jnp.float32),  # T_run
            pltpu.VMEM((S, 4), jnp.float32),  # suffix sums
        ],
    )
    zeros = jnp.zeros((REC_ROWS, P), jnp.float32)
    d_records = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((REC_ROWS, P), jnp.float32),
        input_output_aliases={10: 0},  # zeros input (after 2 scalar-prefetch args)
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
