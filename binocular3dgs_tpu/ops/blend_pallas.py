"""Pallas TPU kernels for the tile blend — the hot path of the rasterizer.

Same math and termination semantics as ops/blend.py (the XLA scan version),
but executed as one kernel program per 16x16 tile with:

  * scalar-prefetched per-tile [start, count) pair ranges (SMEM); segment
    starts are arbitrary — each DMA reads from the chunk-aligned address at
    or below the segment start and the leading out-of-segment lanes are
    masked off (k < 0), so no re-alignment pass over the pair buffer exists
  * software-pipelined record DMA: the forward keeps a persistent global
    slot counter (SMEM scratch survives across the sequential TPU grid) and
    always has exactly one chunk DMA in flight — while computing chunk c it
    fetches chunk c+1, and on a tile's last chunk it prefetches the NEXT
    tile's first chunk, so the per-tile entry wait finds data already
    resident (the unpipelined version stalled ~1-2us per chunk, ~10 ms/frame
    at 3024 tiles on a v5e)
  * records are field-major (16, P) so a chunk lands as (16, C) whose field
    rows (1, C) broadcast directly against per-pixel columns (S, 1)
  * work arrays are (S=256 pixels, C=chunk pairs); all cross-chunk state
    (transmittance, accumulators, termination flags, contributor counts)
    lives in small (S, k) VMEM scratch refs, so the dynamic while-loop over
    chunks carries only scalars
  * early exit once every pixel's transmittance chain has terminated; the
    termination mask is cumulative by construction (the raw transmittance
    chain is monotone within a chunk), so no corrective rescan exists
  * the kernels are VPU-bound, so every (S, C) elementwise chain that can be
    a matmul is one: the EWA exponent is a 6-monomial basis contraction,
    prefix/suffix products run as triangular matmuls in log space,
    accumulation/moment reductions are dots, and "last column" extraction is
    a one-hot contraction staying in the (S, 1) orientation
  * FORWARD outputs are plane-major: one (5, T, S) float block (planes
    r, g, b, depth, T_final) + one (T, S) int block (n_contrib). The rgb/z
    accumulator is kept LANE-major (4, S) so its output write is a direct
    row copy — the earlier (T, 5, S) tile-major layout wrote (S, 1)
    accumulator columns into lane-major (1, S) rows, forcing a vreg
    transpose per output row per tile (measured: forward 8.4 -> 1.3
    ms/frame in the chained train step at 3024 tiles on a v5e)
  * the forward's quadratic pixel basis is built ONCE in tile-LOCAL
    coordinates and the per-pair polynomial coefficients are shifted by the
    tile origin ((1, C) lane math) — no per-tile (S, k) basis rebuild
  * the BACKWARD keeps the tile-major (G, 6, S) input pipeline and per-tile
    (1, S) -> (S, 1) input transposes: a plane-major backward with batched
    staging transposes measured 2.5x SLOWER in the chained step (8.6 vs
    3.4 ms/frame — see docs/planar_blend_notes.md), so the forward's plane
    outputs are re-oriented by ONE XLA transpose (lanes preserved) in
    blend_backward_pallas instead. It walks chunks in reverse from the
    per-tile max contributor (per-tile maxima are precomputed XLA-side and
    scalar-prefetched),
    reconstructing transmittance by division from T_final exactly like the
    CUDA backward; per-pair cotangents are accumulated (read-add-write DMA,
    safe because the TPU grid runs sequentially and the final write is
    drained before the grid step ends) into an aliased pre-zeroed (16, P)
    buffer — boundary chunks shared by two adjacent tiles compose correctly
    — and reach the per-gaussian arrays through the XLA-side gather VJP

Record rows: 0:mx 1:my 2:conic_a 3:conic_b 4:conic_c 5:opacity
6:r 7:g 8:b 9:depth 10:radius(binning only) 11-15:padding. The custom VJP
lives in ops/rasterize.py; gradients flow through the XLA-side gathers that
build the records, so the kernels only produce d_records.

ROOFLINE (v5e-1, 100k gaussians, 1008x756, 600k pair capacity, 3024 tiles,
measured 2026-08-21 in the chained train step): forward 1.3 ms/frame,
backward 2.2 ms/frame. Neither is HBM-bandwidth bound: the forward streams
~57 MB (records read + outputs) = 0.07 ms at the 819 GB/s HBM roofline; the
backward's three streams (records + d_records read-add-write) total
~115 MB = 0.14 ms. Both kernels are PER-TILE FIXED-COST bound — DMA issue
latency, per-tile staging/transposes, and the ~2-chunk-deep while loop give
~0.4 us/tile forward and ~0.7 us/tile backward of overhead that dwarfs the
~0.1 us/tile of HBM time. Implied ceiling if per-tile overhead were fully
amortized: ~0.2 ms/frame fwd+bwd combined, i.e. the remaining lever is
fewer/larger tiles or batching multiple tiles per inner iteration, not
arithmetic (the VPU/MXU work is already matmul-packed and far from the 197
TFLOP/s roofline by construction — a gather/blend kernel has ~60 useful
FLOPs per pair-pixel). At the current 3.5 ms/frame combined, the blend is
no longer the train step's bottleneck (see BENCH stage_breakdown_ms:
binning + pair-gather VJP cost ~2x more).

Behavior contract: the CUDA renderCUDA forward/backward pair (SURVEY.md
§3.5, reference consumer `gaussian_renderer/__init__.py:85-93`).
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
LIVE_ROWS = 10  # rows 0..9 carry data; 10..15 are alignment padding
# (Mosaic requires sublane slices aligned to 8, so DMA streams move the
# full 16-row table; LIVE_ROWS only bounds the compute)


# -- precision discipline (found on real v5e hardware, 2026-08-21) --------
# Default TPU matmul precision truncates f32 inputs to bf16 on the MXU;
# interpret mode computes f32 and cannot catch it. The log-space
# transmittance scans amplify that truncation into ~10x-wrong gradients.
# Mosaic only offers DEFAULT (1 bf16 pass) or HIGHEST (6 passes), so exact
# dots are built from DEFAULT passes with error-compensated bf16 splits:
# x = hi + lo (hi = bf16(x), lo = x - hi, both exactly bf16-representable),
# and the MXU accumulates every pass in f32. When one operand is already
# exactly bf16-representable (the 0/1 triangular masks, the integer-valued
# tile-local monomial basis <= 225), TWO passes give ~16-bit-mantissa
# accuracy (rel ~1e-5, vs 0.4% truncated); three passes (dropping lo*lo)
# for arbitrary x arbitrary. Measured: a fraction of HIGHEST's cost.


def _split(x):
    """x -> (hi, lo) bf16 arrays with hi + lo ~= x to ~16 mantissa bits.

    hi is carved out by BIT-MASKING the top 16 bits (bf16 == the top half
    of an f32): cast-based formulations (hi = bf16(x), lo = x - f32(hi))
    get algebraically elided by XLA under --xla_allow_excess_precision —
    the f32->bf16->f32 round-trip folds to x, lo folds to 0, and the
    "compensated" dot silently degrades to a single truncated pass
    (measured: bit-identical error to DEFAULT). Bitwise ops cannot fold."""
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    hi_f = jax.lax.bitcast_convert_type(
        bits & jnp.uint32(0xFFFF0000), jnp.float32
    )  # exactly bf16-representable (truncated mantissa)
    lo = x - hi_f  # exact in f32
    return hi_f.astype(jnp.bfloat16), lo.astype(jnp.bfloat16)


def _split3(x):
    """x -> (hi, mid, lo) bf16 arrays: 8+8+8 mantissa bits covers the full
    f32 mantissa, so hi+mid+lo == x to f32 rounding (same bit-mask
    rationale as _split)."""
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    hi_f = jax.lax.bitcast_convert_type(bits & jnp.uint32(0xFFFF0000), jnp.float32)
    r1 = x - hi_f
    bits1 = jax.lax.bitcast_convert_type(r1, jnp.uint32)
    mid_f = jax.lax.bitcast_convert_type(bits1 & jnp.uint32(0xFFFF0000), jnp.float32)
    lo = r1 - mid_f
    return hi_f.astype(jnp.bfloat16), mid_f.astype(jnp.bfloat16), lo.astype(jnp.bfloat16)


# NOTE: passes pin precision=DEFAULT explicitly — the package sets the
# GLOBAL default matmul precision to "highest" (see __init__.py), which
# would silently turn each compensated pass into a 6-pass product.
_P_FAST = jax.lax.Precision.DEFAULT


def _dot_exact_a3(a_exact, b, dims):
    """a @ b where `a` is exactly bf16-representable and `b` needs FULL f32
    mantissa (cancellation-sensitive contractions): 3 bf16 passes."""
    a16 = a_exact.astype(jnp.bfloat16)
    bh, bm, bl = _split3(b)
    f = lambda y: jax.lax.dot_general(
        a16, y, dims, preferred_element_type=jnp.float32, precision=_P_FAST
    )
    return f(bh) + (f(bm) + f(bl))


def _dot_exact_a(a_exact, b, dims):
    """a @ b where `a` is exactly bf16-representable: 2 bf16 passes."""
    a16 = a_exact.astype(jnp.bfloat16)
    bh, bl = _split(b)
    f = lambda y: jax.lax.dot_general(
        a16, y, dims, preferred_element_type=jnp.float32, precision=_P_FAST
    )
    return f(bh) + f(bl)


def _dot_exact_b(a, b_exact, dims):
    """a @ b where `b` is exactly bf16-representable: 2 bf16 passes."""
    b16 = b_exact.astype(jnp.bfloat16)
    ah, al = _split(a)
    f = lambda y: jax.lax.dot_general(
        y, b16, dims, preferred_element_type=jnp.float32, precision=_P_FAST
    )
    return f(ah) + f(al)


def _dot3(a, b, dims):
    """a @ b, both arbitrary f32: 3 bf16 passes (bf16x3, ~f32 accuracy)."""
    ah, al = _split(a)
    bh, bl = _split(b)
    f = lambda x, y: jax.lax.dot_general(
        x, y, dims, preferred_element_type=jnp.float32, precision=_P_FAST
    )
    return f(ah, bh) + (f(ah, bl) + f(al, bh))


_DIMS_LANES = (((1,), (0,)), ((), ()))


def _last_col(x, C):
    """x[:, C-1:C] as (S, 1) — an exact lane slice (the earlier one-hot MXU
    contraction silently truncated its inputs to bf16 at default chip
    precision, and costs 6 passes at exact precision)."""
    return x[:, C - 1 : C]


def _pixel_coords(tile_id, TW: int, ts: int, S: int):
    """(S, 1) pixel x/y for a flat tile id."""
    s = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    tx = tile_id % TW
    ty = tile_id // TW
    px = (tx * ts + s % ts).astype(jnp.float32)
    py = (ty * ts + s // ts).astype(jnp.float32)
    return px, py


def _local_coords(ts: int, S: int):
    """(S, 1) tile-LOCAL pixel u/v (tile-independent — build once)."""
    s = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    return (s % ts).astype(jnp.float32), (s // ts).astype(jnp.float32)


def _tile_origin(tile_id, TW: int, ts: int):
    """(x0, y0) float scalars of a tile's top-left pixel."""
    tx = tile_id % TW
    ty = tile_id // TW
    return (tx * ts).astype(jnp.float32), (ty * ts).astype(jnp.float32)


def _pixel_basis(px, py, S):
    """(S, 6) quadratic monomial basis [1, x, y, x^2, xy, y^2] per pixel.

    The EWA exponent is a quadratic form in pixel coordinates, so the whole
    (S, C) power array is ONE MXU matmul `basis @ coeffs` instead of ~10 VPU
    ops per (pixel, pair) — the kernels are VPU-bound, so every (S, C)
    elementwise op moved to the MXU is a direct win.
    """
    one = jnp.ones((S, 1), jnp.float32)
    return jnp.concatenate([one, px, py, px * px, px * py, py * py], axis=1)


def _power_coeffs(rec, x0=None, y0=None):
    """(6, C) per-pair coefficients of the quadratic exponent.

    power(x, y) = -0.5*ca*(x-mx)^2 - 0.5*cc*(y-my)^2 - cb*(x-mx)*(y-my)
                = c0 + c1*x + c2*y + c3*x^2 + c4*xy + c5*y^2

    With a tile origin (x0, y0), coefficients are expressed in tile-LOCAL
    pixel coordinates by shifting the splat center — (1, C) lane math, so
    the (S, 6) monomial basis can be built once for all tiles instead of
    per tile (per-tile (S, k) sublane-oriented builds cost ~1 us each).
    """
    mx = rec[0:1, :]
    my = rec[1:2, :]
    if x0 is not None:
        mx = mx - x0
        my = my - y0
    ca = rec[2:3, :]
    cb = rec[3:4, :]
    cc = rec[4:5, :]
    c0 = -0.5 * (ca * mx * mx + cc * my * my) - cb * mx * my
    c1 = ca * mx + cb * my
    c2 = cc * my + cb * mx
    c3 = -0.5 * ca
    c4 = -cb
    c5 = -0.5 * cc
    return jnp.concatenate([c0, c1, c2, c3, c4, c5], axis=0)


def _chunk_alpha(rec, basis, valid_lane, x0, y0):
    """alpha (S, C) for a record chunk rec (16, C); skip masks applied.

    The EWA exponent rides the MXU as `basis @ coeffs` with a 3-way
    bf16-split of the coefficients (full f32 mantissa): the quadratic
    expands into monomial terms up to ~1e3 that cancel to an O(10)
    exponent, so 2-way (16-bit) splitting leaves ~1e-2 exponent error
    (measured as 1.8% image error vs the dense oracle) while 3-way is
    ~6e-5 — and K=6 passes are nearly free. A direct VPU dx/dy evaluation
    is bit-exact but costs ~10 (S, C) VPU ops in a VPU-bound kernel
    (measured +35 ms/step). The forward and backward MUST compute alpha
    identically (the backward gates pairs on thresholds and reconstructs
    transmittance by division — a single bit-flip at the ALPHA_MIN cut
    amplifies ~100x into the gradients), which this shared helper
    guarantees."""
    coeffs = _power_coeffs(rec, x0, y0)  # (6, C) — cheap (1, C) vector math
    power = _dot_exact_a3(basis, coeffs, _DIMS_LANES)  # (S, C) on the MXU
    op = jnp.where(valid_lane, rec[5:6, :], 0.0)
    alpha = jnp.minimum(ALPHA_CLAMP, op * jnp.exp(power))
    alpha = jnp.where((power > 0.0) | (alpha < ALPHA_MIN), 0.0, alpha)
    return alpha, power


def _lane_pos(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1)


def _tri_strict_upper(C):
    """(C, C) f32 with [i, j] = 1 iff i < j: exclusive prefix sum mask."""
    i = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
    return (i < j).astype(jnp.float32)


def _tri_lower_incl(C):
    """(C, C) f32 with [i, j] = 1 iff i >= j: inclusive suffix sum mask."""
    i = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
    return (i >= j).astype(jnp.float32)


def _scan_lanes3(x, tri):
    """(S, C) @ (C, C) triangular-mask scan, 3-way split (full f32
    mantissa; the mask is exactly bf16-representable). A VPU log-step
    roll/select scan is bit-exact but measured +35 ms/step in these
    VPU-bound kernels; 3 bf16 MXU passes cost a fraction of that."""
    xh, xm, xl = _split3(x)
    t16 = tri.astype(jnp.bfloat16)
    f = lambda y: jax.lax.dot_general(
        y, t16, _DIMS_LANES, preferred_element_type=jnp.float32, precision=_P_FAST
    )
    return f(xh) + (f(xm) + f(xl))


def _scan_lanes2(x, tri):
    """2-pass (16-bit) variant for scans whose result only shapes SMOOTH
    gradient values (never a threshold decision): ~1.4e-5 relative."""
    return _dot_exact_b(x, tri, _DIMS_LANES)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _forward_tile(
    t, base_next, tile_start_ref, tile_count_ref, records_ref,
    rec_buf, dma_sem, q_ref, T_run_ref, done_ref, acc_ref, nc_ref,
    basis, tri_x,
    *, TW: int, ts: int, C: int,
):
    """Blend one tile's pair segment; assumes a DMA for this tile's chunk 0
    is already in flight (slot q % 2) and leaves one for `base_next`.

    `basis` is the tile-LOCAL (S, 6) monomial basis (shared by all tiles);
    the tile origin is folded into the per-pair coefficients instead."""
    S = ts * ts
    seg_start = tile_start_ref[t]
    count = tile_count_ref[t]
    base = pl.multiple_of((seg_start // C) * C, C)  # chunk-aligned DMA base
    off = seg_start - base  # leading lanes of chunk 0 belong to the prior tile
    x0, y0 = _tile_origin(t, TW, ts)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    n_chunks = pl.cdiv(off + count, C)

    def dma(addr, slot):
        return pltpu.make_async_copy(
            records_ref.at[:, pl.ds(pl.multiple_of(addr, C), C)],
            rec_buf.at[slot],
            dma_sem.at[slot],
        )

    T_run_ref[:, :] = jnp.ones((S, 1), jnp.float32)
    done_ref[:, :] = jnp.zeros((S, 1), jnp.float32)
    acc_ref[:, :] = jnp.zeros((4, S), jnp.float32)  # lane-major (rows r g b z)
    nc_ref[:, :] = jnp.zeros((S, 1), jnp.int32)

    def cond(carry):
        c, all_done = carry
        return (c < n_chunks) & (all_done < 0.5)

    def body(carry):
        c, _ = carry
        q = q_ref[0]
        slot = jax.lax.rem(q, 2)
        dma(base + c * C, slot).wait()  # chunk c (issued one iteration ago)
        # keep exactly one DMA in flight: next local chunk, or the next
        # tile's first chunk when this is the last one
        next_addr = jnp.where(c + 1 < n_chunks, base + (c + 1) * C, base_next)
        dma(next_addr, 1 - slot).start()
        q_ref[0] = q + 1

        rec = rec_buf[slot]
        T_run = T_run_ref[:, :]  # (S, 1)
        done = done_ref[:, :]

        k = c * C + lane1 - off  # (1, C) position within the tile's segment
        valid = (k >= 0) & (k < count)
        alpha, _ = _chunk_alpha(rec, basis, valid, x0, y0)
        alpha = jnp.where(done > 0.5, 0.0, alpha)  # (S, 1) mask broadcast

        # prefix transmittance via ONE (3-pass split) MXU contraction in
        # log space: cumprod(1-a) = exp(cumsum(log1p(-a))). T_after is
        # monotone non-increasing along the chunk (factors in (0, 1]), so
        # the CUDA termination test `T * (1-a) < T_MIN => stop before
        # blending` yields a mask that is already cumulative
        one_minus = 1.0 - alpha
        # 2-pass split (~1.4e-5 relative): the scan shapes transmittance
        # VALUES only — the termination mask derives from it monotonically
        # and the backward gates on n_contrib, so no threshold consistency
        # is at stake (unlike the power contraction above)
        cp_excl = jnp.exp(_scan_lanes2(jnp.log1p(-alpha), tri_x))  # prod_{j<i}
        cp_raw = cp_excl * one_minus  # inclusive
        T_after = T_run * cp_raw
        kill = T_after < T_MIN  # (S, C), monotone per row
        a_eff = jnp.where(kill, 0.0, alpha)
        T_before = T_run * cp_excl
        w = a_eff * T_before  # (S, C)

        # acc += [r g b z] @ w^T — one MXU contraction instead of 4 masked
        # lane reductions; kept LANE-major (4, S) so the output write is a
        # direct row copy (a (S, 4)-oriented accumulator forces per-row vreg
        # transposes at the output, ~6.8 ms/frame measured)
        acc_ref[:, :] = acc_ref[:, :] + _dot3(
            rec[6:10, :], w, (((1,), (1,)), ((), ()))
        )
        nc_ref[:, :] = jnp.maximum(
            nc_ref[:, :], jnp.max(jnp.where(a_eff > 0.0, k + 1, 0), axis=1, keepdims=True)
        )
        # final T of the chunk = cp at the last unkilled lane (cp_raw is
        # non-increasing, so a masked lane-min finds it); all-killed rows
        # keep T_run via the min-with-1
        cp_done = jnp.min(jnp.where(kill, 2.0, cp_raw), axis=1, keepdims=True)
        T_run_ref[:, :] = T_run * jnp.minimum(cp_done, 1.0)
        # kill is monotone, so "any kill" == "last lane killed" == row done
        done_new = jnp.maximum(done, _last_col(kill.astype(jnp.float32), C))
        done_ref[:, :] = done_new
        return (c + 1, jnp.min(done_new))

    final_c, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.float32(0.0)))

    # pipeline invariant fixup: if the loop exited early (termination) or
    # never ran (empty tile), the in-flight DMA is not `base_next` — drain it
    # and issue the right one
    @pl.when((final_c < n_chunks) | (n_chunks == 0))
    def _():
        q = q_ref[0]
        slot = jax.lax.rem(q, 2)
        dma(base, slot).wait()  # address irrelevant: waits the slot semaphore
        dma(base_next, 1 - slot).start()
        q_ref[0] = q + 1


def _forward_kernel(
    tile_start_ref, tile_count_ref,
    records_ref,  # (16, P) HBM
    out_ref,  # (5, G, S): r g b depth T_final planes per grouped tile
    ncontrib_ref,  # (G, S) int32
    rec_buf,  # (2, 16, C) ping-pong
    dma_sem,  # DMA sems (2,)
    q_ref,  # SMEM (1,): global DMA slot counter (persists across grid steps)
    T_run_ref, done_ref, acc_ref, nc_ref, tn_ref,
    *, TW: int, ts: int, C: int, T: int, G: int,
):
    """Processes G consecutive tiles per grid step — the per-step grid
    machinery (output block DMA, prologue/epilogue) measured ~2.6 us/tile at
    G=1 on a v5e, dwarfing the ~1 us of per-tile compute.

    Orientation discipline (measured ~6.8 ms/frame when violated): the rgb/z
    accumulator is LANE-major (4, S) so its output write is a row copy; the
    (S, 1)-oriented T_run and n_contrib columns are staged into (S, 2G)
    scratch and transposed ONCE per grid step instead of once per tile; the
    (5, T, S) output layout keeps S on the lane axis so the XLA side never
    pads a tiny trailing dim to 128 lanes."""
    step = pl.program_id(0)
    t0 = step * G
    S = ts * ts
    u, v = _local_coords(ts, S)
    basis = _pixel_basis(u, v, S)  # tile-local: shared by every tile
    tri_x = _tri_strict_upper(C)

    # warmup: the very first grid step issues tile 0's chunk-0 fetch; every
    # later tile finds its own already in flight (issued by its predecessor)
    @pl.when(step == 0)
    def _():
        q_ref[0] = 0
        first_base = pl.multiple_of((tile_start_ref[0] // C) * C, C)
        pltpu.make_async_copy(
            records_ref.at[:, pl.ds(first_base, C)], rec_buf.at[0], dma_sem.at[0]
        ).start()

    for g in range(G):
        t = t0 + g
        nt = jnp.minimum(t + 1, T - 1)
        base_next = pl.multiple_of((tile_start_ref[nt] // C) * C, C)
        _forward_tile(
            t, base_next, tile_start_ref, tile_count_ref, records_ref,
            rec_buf, dma_sem, q_ref, T_run_ref, done_ref, acc_ref, nc_ref,
            basis, tri_x,
            TW=TW, ts=ts, C=C,
        )
        out_ref[0:4, g, :] = acc_ref[:, :]
        tn_ref[:, g : g + 1] = T_run_ref[:, :]
        tn_ref[:, G + g : G + g + 1] = nc_ref[:, :].astype(jnp.float32)
    # one batched (S, 2G) -> (2G, S) transpose per grid step
    tn_t = jnp.transpose(tn_ref[:, :], (1, 0))
    out_ref[4, :, :] = tn_t[0:G, :]
    ncontrib_ref[:, :] = tn_t[G : 2 * G, :].astype(jnp.int32)

    # last step: drain the final in-flight DMA before the kernel ends
    @pl.when(t0 + G >= T)
    def _():
        q = q_ref[0]
        pltpu.make_async_copy(
            records_ref.at[:, pl.ds(0, C)],
            rec_buf.at[jax.lax.rem(q, 2)],
            dma_sem.at[jax.lax.rem(q, 2)],
        ).wait()


@functools.partial(
    jax.jit, static_argnames=("TW", "TH", "ts", "chunk", "interpret", "group")
)
def blend_forward_pallas(
    records,  # (16, P) float32, field-major sorted pair records (+chunk pad)
    tile_start,  # (T,) int32 (arbitrary offsets)
    tile_count,  # (T,) int32
    TW: int,
    TH: int,
    ts: int,
    chunk: int = 128,
    interpret: bool = False,
    group: int = 8,
):
    T = TW * TH
    S = ts * ts
    G = min(group, T)
    T_pad = -(-T // G) * G
    if T_pad != T:
        # padding tiles are empty (count 0) and their base points at pair 0
        tile_start = jnp.concatenate(
            [tile_start, jnp.zeros(T_pad - T, jnp.int32)])
        tile_count = jnp.concatenate(
            [tile_count, jnp.zeros(T_pad - T, jnp.int32)])
    kernel = functools.partial(_forward_kernel, TW=TW, ts=ts, C=chunk, T=T_pad, G=G)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T_pad // G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=[
            pl.BlockSpec((5, G, S), lambda i, *_: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, S), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, REC_ROWS, chunk), jnp.float32),  # ping-pong rec_buf
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((1,), jnp.int32),  # global slot counter
            pltpu.VMEM((S, 1), jnp.float32),  # T_run
            pltpu.VMEM((S, 1), jnp.float32),  # done
            pltpu.VMEM((4, S), jnp.float32),  # rgb + depth accumulators (lane-major)
            pltpu.VMEM((S, 1), jnp.int32),  # n_contrib
            pltpu.VMEM((S, 2 * G), jnp.float32),  # staged T_final | nc columns
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((5, T_pad, S), jnp.float32),
        jax.ShapeDtypeStruct((T_pad, S), jnp.int32),
    ]
    out5, nc = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(tile_start, tile_count, records)
    # raw kernel layout: (5, T, S) planes r g b depth T_final + (T, S) int32
    return out5[:, :T], nc[:T]


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _backward_tile(
    t, g, tile_start_ref, tile_count_ref, nc_max_ref,
    records_ref, g7_ref, d_records_ref,
    rec_buf, acc_buf, drec_buf,
    rec_sem, acc_sem, out_sem,
    T_run_ref, suf_ref,
    *, TW: int, ts: int, C: int,
):
    S = ts * ts
    seg_start = tile_start_ref[t]
    count = tile_count_ref[t]
    base = pl.multiple_of((seg_start // C) * C, C)
    off = seg_start - base
    # CRITICAL: identical alpha recompute to the forward — tile-LOCAL basis
    # + origin-shifted coefficients, same dot implementation. The backward
    # reconstructs transmittance by division and gates pairs on thresholds
    # (ALPHA_MIN, the n_contrib cut); any fwd/bwd alpha bit-mismatch flips
    # threshold decisions and the division amplifies each flip up to 100x
    # (measured: a global-coordinate basis here exploded grad norms 150x
    # once the forward moved to the tile-local basis).
    u, v = _local_coords(ts, S)
    basis = _pixel_basis(u, v, S)
    x0, y0 = _tile_origin(t, TW, ts)
    tri_s = _tri_lower_incl(C)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)

    # per-tile pixel vectors: ONE (7, S) -> (S, 7) transpose per tile (the
    # seven separate (1, S) -> (S, 1) column transposes this replaces cost
    # ~0.4 us/tile extra on a v5e); field order T_final, d_r, d_g, d_b,
    # d_dep, d_Tfin, n_contrib(as f32)
    sc = jnp.transpose(g7_ref[g, :, :], (1, 0))  # (S, 7)
    T_final = sc[:, 0:1]
    D4 = sc[:, 1:5]  # d_r d_g d_b d_dep
    d_tf = sc[:, 5:6]
    n_contrib = sc[:, 6:7].astype(jnp.int32)
    tfd = d_tf * T_final  # (S, 1)

    n_chunks = pl.cdiv(off + jnp.minimum(nc_max_ref[t], count), C)

    def rec_dma(c, slot):
        return pltpu.make_async_copy(
            records_ref.at[:, pl.ds(pl.multiple_of(base + c * C, C), C)],
            rec_buf.at[slot],
            rec_sem.at[slot],
        )

    def acc_dma(c, slot):
        return pltpu.make_async_copy(
            d_records_ref.at[:, pl.ds(pl.multiple_of(base + c * C, C), C)],
            acc_buf.at[slot],
            acc_sem.at[slot],
        )

    def out_dma(c, slot):
        return pltpu.make_async_copy(
            drec_buf.at[slot],
            d_records_ref.at[:, pl.ds(pl.multiple_of(base + c * C, C), C)],
            out_sem.at[slot],
        )

    # prefetch the first processed chunk (the deepest one)
    @pl.when(n_chunks > 0)
    def _():
        rec_dma(n_chunks - 1, jax.lax.rem(n_chunks - 1, 2)).start()
        acc_dma(n_chunks - 1, jax.lax.rem(n_chunks - 1, 2)).start()

    T_run_ref[:, :] = T_final
    suf_ref[:, :] = jnp.zeros((S, 1), jnp.float32)

    def cond(c_rev):
        return c_rev < n_chunks

    def body(c_rev):
        c = n_chunks - 1 - c_rev
        slot = jax.lax.rem(c, 2)
        rec_dma(c, slot).wait()
        acc_dma(c, slot).wait()
        # fetch the next (shallower) chunk while computing this one; chunks
        # within a tile are disjoint, so the read cannot race this chunk's
        # write-back
        @pl.when(c > 0)
        def _():
            rec_dma(c - 1, 1 - slot).start()
            acc_dma(c - 1, 1 - slot).start()

        rec = rec_buf[slot]
        T_run = T_run_ref[:, :]
        suf = suf_ref[:, :]  # (S, 1): combined later-chunk suffix

        k = c * C + lane1 - off
        in_count = (k >= 0) & (k < count)
        keep = in_count & (k < n_contrib)  # (S, C)
        alpha_raw, power = _chunk_alpha(rec, basis, in_count, x0, y0)
        a = jnp.where(keep, alpha_raw, 0.0)
        one_minus = jnp.maximum(1.0 - a, 1.0 - ALPHA_CLAMP)
        # suffix product prod_{j>=i}(1-a_j) via one 3-pass MXU contraction
        # in log space (one_minus >= 0.01, so the log is finite)
        sp = jnp.exp(_scan_lanes2(jnp.log(one_minus), tri_s))
        T_i = T_run / sp
        w = a * T_i

        # r = the d_out-weighted color response; the reference backward's
        # four per-channel suffix sums collapse into ONE by linearity
        # (d_r/d_g/d_b/d_dep are constants along the pair axis) — and the
        # 4-term broadcast chain is one (S, 4) @ (4, C) MXU contraction
        r = _dot3(D4, rec[6:10, :], _DIMS_LANES)  # (S, C)
        q = w * r
        suf_q = _scan_lanes2(q, tri_s)  # inclusive suffix sum (2-pass MXU)
        suffix_after = suf_q - q + suf  # Σ_{j>i} q_j incl. later chunks

        inv_om = 1.0 / one_minus
        d_alpha = T_i * r - inv_om * (suffix_after + tfd)
        d_alpha = jnp.where(keep & (a > 0.0), d_alpha, 0.0)

        op = rec[5:6, :]
        G = jnp.exp(power)
        d_alpha_eff = jnp.where(op * G <= ALPHA_CLAMP, d_alpha, 0.0)
        d_pow = a * d_alpha_eff

        # all ten per-pair reductions become two MXU contractions:
        #   M  = basis^T @ [d_pow | G*d_alpha_eff]  -> quadratic moments + d_op
        #   dcol = D4^T @ w                          -> color/depth cotangents
        dims_s = (((0,), (0,)), ((), ()))
        X = jnp.concatenate([d_pow, G * d_alpha_eff], axis=1)  # (S, 2C)
        M2 = _dot_exact_a(basis, X, dims_s)
        M = M2[:, :C]  # (6, C) moments of d_pow over [1, x, y, x^2, xy, y^2]
        d_op = M2[0:1, C:]
        dcol = _dot3(D4, w, dims_s)

        # basis moments are in tile-LOCAL coordinates — shift the splat
        # centers the same way ((x - mx) is translation-invariant)
        mx = rec[0:1, :] - x0
        my = rec[1:2, :] - y0
        ca = rec[2:3, :]
        cb = rec[3:4, :]
        cc = rec[4:5, :]
        M0, Mx, My = M[0:1, :], M[1:2, :], M[2:3, :]
        Mxx, Mxy, Myy = M[3:4, :], M[4:5, :], M[5:6, :]
        ex = Mx - mx * M0  # Σ (x - mx) d_pow
        ey = My - my * M0
        d_mx = ca * ex + cb * ey
        d_my = cc * ey + cb * ex
        d_ca = -0.5 * (Mxx - 2.0 * mx * Mx + mx * mx * M0)
        d_cb = -(Mxy - mx * My - my * Mx + mx * my * M0)
        d_cc = -0.5 * (Myy - 2.0 * my * My + my * my * M0)

        zero_row = jnp.zeros((1, C), jnp.float32)
        drec = jnp.concatenate(
            [d_mx, d_my, d_ca, d_cb, d_cc, d_op, dcol]
            + [zero_row] * (REC_ROWS - LIVE_ROWS),
            axis=0,
        )
        # accumulate-write: out-of-segment lanes contribute exactly 0 (a = 0
        # there), so adding onto the neighbor tile's values is a no-op for
        # its lanes. Wait the older in-flight write before reusing its
        # buffer (ping-pong), drain fully after the loop.
        @pl.when(c_rev >= 2)
        def _():
            out_dma(c + 2, slot).wait()

        drec_buf[slot] = drec + acc_buf[slot]
        out_dma(c, slot).start()

        # transmittance before this chunk's first pair (divide by the chunk
        # total product = sp column 0) and the suffix carry (= suf_q column
        # 0, the chunk's total Σq) — via exact-split one-hot contraction
        onehot0 = (jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0) == 0).astype(sp.dtype)
        col0 = _dot_exact_b(jnp.concatenate([sp, suf_q], axis=0), onehot0, _DIMS_LANES)
        T_run_ref[:, :] = T_run / col0[:S]
        suf_ref[:, :] = suf + col0[S:]
        return c_rev + 1

    jax.lax.while_loop(cond, body, jnp.int32(0))

    # drain outstanding writes: the next tile may read these chunks
    @pl.when(n_chunks >= 2)
    def _():
        out_dma(1, jax.lax.rem(1, 2)).wait()

    @pl.when(n_chunks >= 1)
    def _():
        out_dma(0, 0).wait()


def _backward_kernel(
    tile_start_ref, tile_count_ref, nc_max_ref,
    records_ref,  # (16, P) HBM
    g7_ref,  # (G, 7, S): T_final, d_r, d_g, d_b, d_dep, d_Tfin, n_contrib
    zeros_ref,  # (16, P) HBM — aliased to the output (pre-zeroed)
    d_records_ref,  # (16, P) HBM (aliased)
    rec_buf,  # (2, 10, C)
    acc_buf,  # (2, 10, C)
    drec_buf,  # (2, 10, C)
    rec_sem, acc_sem, out_sem,
    T_run_ref, suf_ref,
    *, TW: int, ts: int, C: int, G: int,
):
    step = pl.program_id(0)
    for g in range(G):
        _backward_tile(
            step * G + g, g, tile_start_ref, tile_count_ref, nc_max_ref,
            records_ref, g7_ref, d_records_ref,
            rec_buf, acc_buf, drec_buf, rec_sem, acc_sem, out_sem,
            T_run_ref, suf_ref, TW=TW, ts=ts, C=C,
        )


@functools.partial(
    jax.jit, static_argnames=("TW", "TH", "ts", "chunk", "interpret", "group")
)
def blend_backward_pallas(
    records,  # (16, P)
    tile_start,
    tile_count,
    out5,  # (5, T, S) forward output planes (plane 4 = T_final)
    n_contrib,  # (T, S) int32
    d_out5,  # (5, T, S) cotangents of the forward output
    TW: int,
    TH: int,
    ts: int,
    chunk: int = 128,
    interpret: bool = False,
    group: int = 8,
):
    T = TW * TH
    S = ts * ts
    P = records.shape[1]
    G = min(group, T)
    T_pad = -(-T // G) * G

    nc_max = jnp.max(n_contrib, axis=1).astype(jnp.int32)  # (T,) scalar-prefetched
    # (T, 7, S): T_final then d_r d_g d_b d_dep d_Tfin then n_contrib(f32).
    # The forward emits plane-major (5, T, S) (its fast write orientation);
    # this one XLA transpose (lanes preserved — S stays minor) feeds the
    # backward's tile-major input pipeline, which measured faster than a
    # plane-major in-kernel staging variant (docs/planar_blend_notes.md).
    # n_contrib rides as a float plane so the kernel does ONE (7, S) ->
    # (S, 7) transpose per tile instead of seven column transposes.
    g7 = jnp.transpose(
        jnp.concatenate(
            [out5[4:5], d_out5, n_contrib.astype(jnp.float32)[None]], axis=0
        ),
        (1, 0, 2),
    )
    if T_pad != T:
        pad = T_pad - T
        tile_start = jnp.concatenate([tile_start, jnp.zeros(pad, jnp.int32)])
        tile_count = jnp.concatenate([tile_count, jnp.zeros(pad, jnp.int32)])
        nc_max = jnp.concatenate([nc_max, jnp.zeros(pad, jnp.int32)])
        g7 = jnp.concatenate([g7, jnp.zeros((pad, 7, S), jnp.float32)])

    kernel = functools.partial(_backward_kernel, TW=TW, ts=ts, C=chunk, G=G)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T_pad // G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # records
            pl.BlockSpec((G, 7, S), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),  # zeros (aliased to output)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, REC_ROWS, chunk), jnp.float32),  # rec_buf
            pltpu.VMEM((2, REC_ROWS, chunk), jnp.float32),  # acc_buf
            pltpu.VMEM((2, REC_ROWS, chunk), jnp.float32),  # drec_buf
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((S, 1), jnp.float32),  # T_run
            pltpu.VMEM((S, 1), jnp.float32),  # combined suffix sum
        ],
    )
    zeros = jnp.zeros((REC_ROWS, P), jnp.float32)
    d_records = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((REC_ROWS, P), jnp.float32),
        input_output_aliases={5: 0},  # zeros input (after 3 scalar-prefetch args)
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        tile_start, tile_count, nc_max, records,
        g7,
        zeros,
    )
    return d_records
