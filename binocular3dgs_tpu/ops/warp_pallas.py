"""Pallas TPU kernels for the horizontal inverse warp (ops/warp.py).

XLA lowers the warp's per-pixel column gather to a general gather (~8 ms at
1008x756 on a v5e) and its VJP to a scatter-add (~67 ms, measured) — both
pathological on TPU. Here each image row is warped as a banded one-hot
matrix contraction on the MXU instead:

    M[w, c] = valid[c] * (w0[c] * [w == c0[c]] + w1[c] * [w == c1[c]])
    out[c, ch]  = sum_w M[w, c] * img[w, ch]        (forward)
    d_img[w,ch] = sum_c M[w, c] * d_out[c, ch]      (transpose — same M)

The one-hot M is built on the VPU per row ((W, W) compares) and contracted
immediately in VMEM, so the (H, W, W) tensor XLA would materialize never
exists. Out-of-bounds columns produce all-zero one-hot columns, which
reproduces the reference's zero fill (`utils/graphics_utils.py:80-125`)
without clipping. The forward also emits diff = g1 - g0, the only residual
the disparity cotangent needs (d_disp = sum_ch diff * d_out on valid pixels).

Grid is one program per image row; input/output rows are auto-pipelined by
block specs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_weights(disp_row, W):
    """disp_row: (1, W). Returns (c0, c1, w0, w1) with weights zeroed on
    invalid (out-of-bounds) pixels."""
    x0 = jnp.floor(disp_row)
    x0i = x0.astype(jnp.int32)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    c0 = col + x0i
    c1 = c0 + 1
    valid = (c0 >= 0) & (c1 < W)
    frac = disp_row - x0
    w1 = jnp.where(valid, frac, 0.0)
    w0 = jnp.where(valid, 1.0 - frac, 0.0)
    return c0, c1, w0, w1


def _fwd_kernel(disp_ref, img_ref, out_ref, diff_ref, *, W: int):
    d = disp_ref[0, :, :]  # (1, W)
    c0, c1, w0, w1 = _row_weights(d, W)
    wrow = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)  # source index per row
    oh0 = (wrow == c0).astype(jnp.float32)  # (W, W): [w == c0[c]]
    oh1 = (wrow == c1).astype(jnp.float32)
    img = img_ref[0, :, :]  # (W, C)
    dims = (((0,), (0,)), ((), ()))
    g0 = jax.lax.dot_general(oh0, img, dims, preferred_element_type=jnp.float32)
    g1 = jax.lax.dot_general(oh1, img, dims, preferred_element_type=jnp.float32)
    # the (1, W) weights index output pixel c = the one-hots' axis 1, so they
    # fold into M by broadcasting — no lane->sublane transpose ever needed
    M = oh0 * w0 + oh1 * w1
    out = jax.lax.dot_general(M, img, dims, preferred_element_type=jnp.float32)
    out_ref[0, :, :] = out
    diff_ref[0, :, :] = g1 - g0


def _bwd_kernel(disp_ref, dout_ref, dimg_ref, *, W: int):
    d = disp_ref[0, :, :]  # (1, W)
    c0, c1, w0, w1 = _row_weights(d, W)
    wrow = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)
    M = (wrow == c0).astype(jnp.float32) * w0 + (wrow == c1).astype(jnp.float32) * w1
    dout = dout_ref[0, :, :]  # (W, C), rows indexed by output pixel c
    dimg = jax.lax.dot_general(
        M, dout, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dimg_ref[0, :, :] = dimg


@functools.partial(jax.jit, static_argnames=("interpret",))
def warp_forward_pallas(image, disparity, interpret: bool = False):
    """image: (H, W, C); disparity: (H, W). Returns (out, diff)."""
    H, W, C = image.shape
    kernel = functools.partial(_fwd_kernel, W=W)
    # disparity is fed as (H, 1, W): Mosaic requires a block's last two dims
    # to divide (8, 128) or equal the array dims — (1, W) against (H, W) does
    # neither, (1, 1, W) against (H, 1, W) matches both trailing dims
    out, diff = pl.pallas_call(
        kernel,
        grid=(H,),
        in_specs=[
            pl.BlockSpec((1, 1, W), lambda h: (h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, C), lambda h: (h, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, W, C), lambda h: (h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, C), lambda h: (h, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H, W, C), jnp.float32),
            jax.ShapeDtypeStruct((H, W, C), jnp.float32),
        ],
        interpret=interpret,
    )(disparity[:, None, :], image)
    return out, diff


@functools.partial(jax.jit, static_argnames=("interpret",))
def warp_backward_pallas(disparity, d_out, interpret: bool = False):
    """Transpose warp: d_image from d_out. disparity: (H, W); d_out (H, W, C)."""
    H, W, C = d_out.shape
    kernel = functools.partial(_bwd_kernel, W=W)
    return pl.pallas_call(
        kernel,
        grid=(H,),
        in_specs=[
            pl.BlockSpec((1, 1, W), lambda h: (h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, C), lambda h: (h, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, W, C), lambda h: (h, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W, C), jnp.float32),
        interpret=interpret,
    )(disparity[:, None, :], d_out)
