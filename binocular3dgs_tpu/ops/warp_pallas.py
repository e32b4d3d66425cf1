"""Pallas TPU kernels for the horizontal inverse warp (ops/warp.py).

XLA lowers the warp's per-pixel column gather to a general gather (~8 ms at
1008x756 on a v5e), its VJP to a scatter-add (~67 ms, measured), and even a
lane-axis jnp.take_along_axis measures ~46 ms. An earlier Pallas version
built a (W, W) one-hot matrix per row and contracted it on the MXU
(~3.4 ms fwd) — still dominated by the O(W^2) one-hot build on the VPU.

This version is a *shift-accumulate* kernel: for an 8-row block, only
integer shifts s in [min floor(d), max floor(d) + 1] can contribute, so

    out   = sum_s coeff_s * roll(img,  -s)   with
    coeff_s[c] = w0[c]*[x0[c] == s] + w1[c]*[x0[c] == s-1]
    d_img = sum_s roll(coeff_s * d_out, +s)  (exact transpose, same loop)

The loop length adapts to the block's actual disparity range (a dynamic
while_loop): cost is O(range * W) per block instead of O(W^2) per row —
~30x less work for typical binocular disparities (tens of pixels), with
the worst case degenerating to the one-hot cost. Each dynamic iteration
covers STRIDE consecutive shifts with ONE dynamic rotate plus STRIDE
statically-unrolled sub-rolls: the per-iteration fixed cost of a Mosaic
while_loop + dynamic_rotate measured ~1 us, which dominated when a block's
disparity range was large (the worst case runs range/STRIDE dynamic
iterations instead of range). Out-of-bounds pixels have both weights
zeroed (reference `utils/graphics_utils.py:80-125` zero-fill), which also
kills wrap-around lanes of the roll. The forward also emits diff = g1 - g0,
the only residual the disparity cotangent needs (d_disp = sum_ch
diff * d_out on valid pixels, computed in ops/warp.py).

Images are channels-first (C, H, W); blocks are (C, R, Wp) with R = 8 rows
(the Mosaic sublane granule) and Wp = W padded to a lane multiple of 128
(tpu.dynamic_rotate requires aligned shapes); validity is evaluated against
the REAL width, so padded lanes never carry weight. Rolls use pltpu.roll
(dynamic lane rotate) per 2D channel plane on hardware and jnp.roll in
interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 8  # sublane granule
STRIDE = 16  # shifts covered per dynamic loop iteration (static unroll)


def _roll_lanes(x, shift, interpret: bool):
    """roll a (C, R, Wp) block along lanes by a (possibly traced) shift;
    hardware rolls go per 2D channel plane (Mosaic dynamic_rotate is
    happiest on 2D). Static shifts are normalized mod the lane count —
    pltpu.roll rejects negative python ints (traced values pass through;
    the rotate is modular either way)."""
    if interpret:
        return jnp.roll(x, shift, axis=-1)
    if isinstance(shift, int):
        shift = shift % x.shape[-1]
    return jnp.stack(
        [pltpu.roll(x[c], shift, axis=1) for c in range(x.shape[0])], axis=0
    )


def _block_weights(disp, W):
    """disp: (R, W). Returns (x0i, w0, w1) with weights zeroed on invalid
    (out-of-bounds) pixels."""
    x0 = jnp.floor(disp)
    x0i = x0.astype(jnp.int32)
    col = jax.lax.broadcasted_iota(jnp.int32, disp.shape, 1)
    c0 = col + x0i
    valid = (c0 >= 0) & (c0 + 1 < W)
    frac = disp - x0
    w1 = jnp.where(valid, frac, 0.0)
    w0 = jnp.where(valid, 1.0 - frac, 0.0)
    return x0i, w0, w1


def _fwd_kernel(disp_ref, img_ref, out_ref, diff_ref, *, W: int, interpret: bool):
    disp = disp_ref[:, :]  # (R, W)
    img = img_ref[:, :, :]  # (C, R, W)
    x0i, w0, w1 = _block_weights(disp, W)
    # only shifts that actually occur in this block contribute; invalid
    # pixels are masked by zero weights, so clamp their x0 out of the range
    # reduction to keep the loop short
    live = (w0 + w1) > 0.0
    x0_live = jnp.where(live, x0i, jnp.iinfo(jnp.int32).max)
    x1_live = jnp.where(live, x0i, jnp.iinfo(jnp.int32).min)
    smin = jnp.min(x0_live)
    smax = jnp.max(x1_live) + 1  # x1 = x0 + 1 contributes at shift s = x0+1

    def body(carry):
        s, acc, dif = carry
        base = _roll_lanes(img, -s, interpret)  # one dynamic rotate
        for k in range(STRIDE):  # static sub-rolls
            g = _roll_lanes(base, -k, interpret) if k else base
            m0 = (x0i == s + k).astype(jnp.float32)
            m1 = (x0i == s + k - 1).astype(jnp.float32)
            coeff = w0 * m0 + w1 * m1  # (R, W)
            acc = acc + coeff[None] * g
            dif = dif + (m1 - m0)[None] * g
        return (s + STRIDE, acc, dif)

    def cond(carry):
        return carry[0] <= smax

    zero = jnp.zeros_like(img)
    # empty range (fully invalid block) never enters the loop
    _, out, diff = jax.lax.while_loop(cond, body, (smin, zero, zero))
    out_ref[:, :, :] = out
    diff_ref[:, :, :] = diff


def _bwd_kernel(disp_ref, dout_ref, dimg_ref, *, W: int, interpret: bool):
    disp = disp_ref[:, :]
    dout = dout_ref[:, :, :]  # (C, R, W)
    x0i, w0, w1 = _block_weights(disp, W)
    live = (w0 + w1) > 0.0
    x0_live = jnp.where(live, x0i, jnp.iinfo(jnp.int32).max)
    x1_live = jnp.where(live, x0i, jnp.iinfo(jnp.int32).min)
    smin = jnp.min(x0_live)
    smax = jnp.max(x1_live) + 1

    def body(carry):
        s, acc = carry
        # roll(x, s + k) = roll(roll(x, k), s): accumulate the static
        # sub-shift terms first, then ONE dynamic rotate for the group
        inner = jnp.zeros_like(dout)
        for k in range(STRIDE):
            coeff = w0 * (x0i == s + k) + w1 * (x0i == s + k - 1)
            inner = inner + _roll_lanes(coeff[None] * dout, k, interpret)
        acc = acc + _roll_lanes(inner, s, interpret)
        return (s + STRIDE, acc)

    def cond(carry):
        return carry[0] <= smax

    _, dimg = jax.lax.while_loop(cond, body, (smin, jnp.zeros_like(dout)))
    dimg_ref[:, :, :] = dimg


def _pad_block(x, H, axis):
    """Pad rows to a multiple of 8 (sublanes) and width to a multiple of 128
    (lanes — required by the dynamic rotate)."""
    pad_h = (-H) % ROWS
    W = x.shape[-1]
    pad_w = (-W) % 128
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad_h)
    cfg[-1] = (0, pad_w)
    return jnp.pad(x, cfg), H + pad_h, W + pad_w


@functools.partial(jax.jit, static_argnames=("interpret",))
def warp_forward_pallas(image, disparity, interpret: bool = False):
    """image: (C, H, W); disparity: (H, W). Returns (out, diff)."""
    C, H, W = image.shape
    image_p, Hp, Wp = _pad_block(image, H, 1)
    disp_p, _, _ = _pad_block(disparity, H, 0)
    kernel = functools.partial(_fwd_kernel, W=W, interpret=interpret)
    out, diff = pl.pallas_call(
        kernel,
        grid=(Hp // ROWS,),
        in_specs=[
            pl.BlockSpec((ROWS, Wp), lambda h: (h, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, ROWS, Wp), lambda h: (0, h, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((C, ROWS, Wp), lambda h: (0, h, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, ROWS, Wp), lambda h: (0, h, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, Hp, Wp), jnp.float32),
            jax.ShapeDtypeStruct((C, Hp, Wp), jnp.float32),
        ],
        interpret=interpret,
    )(disp_p, image_p)
    return out[:, :H, :W], diff[:, :H, :W]


@functools.partial(jax.jit, static_argnames=("interpret",))
def warp_backward_pallas(disparity, d_out, interpret: bool = False):
    """Transpose warp: d_image from d_out. disparity: (H, W); d_out (C, H, W)."""
    C, H, W = d_out.shape
    dout_p, Hp, Wp = _pad_block(d_out, H, 1)
    disp_p, _, _ = _pad_block(disparity, H, 0)
    kernel = functools.partial(_bwd_kernel, W=W, interpret=interpret)
    out = pl.pallas_call(
        kernel,
        grid=(Hp // ROWS,),
        in_specs=[
            pl.BlockSpec((ROWS, Wp), lambda h: (h, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, ROWS, Wp), lambda h: (0, h, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, ROWS, Wp), lambda h: (0, h, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, Hp, Wp), jnp.float32),
        interpret=interpret,
    )(disp_p, dout_p)
    return out[:, :H, :W]
