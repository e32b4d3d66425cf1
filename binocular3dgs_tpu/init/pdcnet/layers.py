"""Torch-exact NN primitives for the PDCNet+ port (NHWC, inference mode).

Every function here reproduces the numerical behavior of the corresponding
torch op used by the reference dense matcher (verified by parity tests in
tests/test_pdcnet_layers.py):

  conv2d               nn.Conv2d (weights converted OIHW -> HWIO)
  conv_transpose2d     nn.ConvTranspose2d(k=4, s=2, p=1) — the deconv /
                       BilinearConvTranspose2d of reference models/modules/
                       {mod.py:39-45, bilinear_deconv.py}
  batch_norm           nn.BatchNorm2d eval mode / the custom inference
                       BatchNorm (reference models/modules/batch_norm.py)
  leaky_relu           nn.LeakyReLU(0.1), the network-wide activation
  resize_bilinear      F.interpolate(mode='bilinear', align_corners=False)
  resize_area          F.interpolate(mode='area') — the pre-processing resize
                       (reference models/base_matching_net.py:121-141)
  grid_sample_bilinear F.grid_sample(align_corners=True, zero padding)
  warp                 flow warp (reference models/base_matching_net.py:228-262)
  l2norm               FeatureL2Norm (reference models/modules/
                       feature_correlation_layer.py:5-13)

Params are a flat {torch_state_dict_name: array} dict; helpers take the dict
plus a name prefix.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_DN = ("NHWC", "HWIO", "NHWC")


def conv2d(x, params, prefix, stride=1, padding=1, dilation=1):
    """x: (B, H, W, Cin); weight at f"{prefix}.weight" is HWIO."""
    w = params[f"{prefix}.weight"]
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=_DN,
    )
    b = params.get(f"{prefix}.bias")
    if b is not None:
        out = out + b
    return out


def conv_transpose2d(x, params, prefix, stride=2, padding=1):
    """torch ConvTranspose2d. Converted weight layout: HWIO where I=in, O=out
    and the spatial taps are pre-flipped (see convert.py), so this is a plain
    lhs-dilated convolution."""
    w = params[f"{prefix}.weight"]
    k = w.shape[0]
    pad = k - 1 - padding
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        lhs_dilation=(stride, stride),
        dimension_numbers=_DN,
    )
    b = params.get(f"{prefix}.bias")
    if b is not None:
        out = out + b
    return out


def batch_norm(x, params, prefix, eps=1e-5):
    mean = params[f"{prefix}.running_mean"]
    var = params[f"{prefix}.running_var"]
    gamma = params[f"{prefix}.weight"]
    beta = params[f"{prefix}.bias"]
    scale = gamma / jnp.sqrt(var + eps)
    return x * scale + (beta - mean * scale)


def leaky_relu(x, slope=0.1):
    return jnp.where(x >= 0, x, slope * x)


def relu(x):
    return jnp.maximum(x, 0.0)


def conv_block(x, params, prefix, stride=1, padding=1, dilation=1, bn=True, act="leaky"):
    """reference models/modules/mod.py:conv — Conv2d [+ BatchNorm] [+ LeakyReLU(0.1)].

    In torch the block is an nn.Sequential, so names are {prefix}.0 for the
    conv, {prefix}.1 for the BN.
    """
    out = conv2d(x, params, f"{prefix}.0", stride, padding, dilation)
    if bn:
        out = batch_norm(out, params, f"{prefix}.1")
    if act == "leaky":
        out = leaky_relu(out)
    elif act == "relu":
        out = relu(out)
    return out


def maxpool2x2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def l2norm(x, axis=-1, eps=1e-6):
    """FeatureL2Norm: x / sqrt(sum(x^2) + eps) over the channel axis."""
    norm = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True) + eps)
    return x / norm


# ---------------------------------------------------------------------------
# resizing / sampling
# ---------------------------------------------------------------------------


def _linear_weights(in_size: int, out_size: int, align_corners: bool):
    """Per-output source coords for 1-D bilinear, torch semantics."""
    out_idx = np.arange(out_size, dtype=np.float64)
    if align_corners:
        src = out_idx * (in_size - 1) / max(out_size - 1, 1)
    else:
        scale = in_size / out_size
        src = np.maximum((out_idx + 0.5) * scale - 0.5, 0.0)
    i0 = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w1 = (src - i0).astype(np.float32)
    return i0, i1, 1.0 - w1, w1


def resize_bilinear(x, out_hw, align_corners=False):
    """(B, H, W, C) -> (B, h, w, C), exact torch F.interpolate bilinear
    (no antialiasing, also when downscaling — unlike jax.image.resize)."""
    H, W = x.shape[1], x.shape[2]
    h, w = int(out_hw[0]), int(out_hw[1])
    if (H, W) == (h, w):
        return x
    y0, y1, wy0, wy1 = _linear_weights(H, h, align_corners)
    x0, x1, wx0, wx1 = _linear_weights(W, w, align_corners)
    top = x[:, y0]
    bot = x[:, y1]
    rows = top * wy0[None, :, None, None] + bot * wy1[None, :, None, None]
    left = rows[:, :, x0]
    right = rows[:, :, x1]
    return left * wx0[None, None, :, None] + right * wx1[None, None, :, None]


def resize_area(x, out_hw):
    """torch F.interpolate(mode='area') == adaptive average pooling: output
    cell (i, j) averages input rows [floor(i*H/h), ceil((i+1)*H/h))."""
    H, W = x.shape[1], x.shape[2]
    h, w = int(out_hw[0]), int(out_hw[1])
    if (H, W) == (h, w):
        return x

    def axis_matrix(in_size, out_size):
        m = np.zeros((out_size, in_size), np.float32)
        for i in range(out_size):
            lo = (i * in_size) // out_size
            hi = -((-(i + 1) * in_size) // out_size)  # ceil
            m[i, lo:hi] = 1.0 / (hi - lo)
        return jnp.asarray(m)

    my = axis_matrix(H, h)
    mx = axis_matrix(W, w)
    x = jnp.einsum("oh,bhwc->bowc", my, x)
    return jnp.einsum("ow,bhwc->bhoc", mx, x)


def grid_sample_bilinear(x, grid, align_corners=True):
    """torch F.grid_sample(bilinear, padding_mode='zeros').

    x: (B, H, W, C); grid: (B, h, w, 2) with normalized coords in [-1, 1]
    (last dim = (gx, gy)). Out-of-range taps contribute zero.
    """
    B, H, W, C = x.shape
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        fx = (gx + 1.0) * 0.5 * (W - 1)
        fy = (gy + 1.0) * 0.5 * (H - 1)
    else:
        fx = ((gx + 1.0) * W - 1.0) * 0.5
        fy = ((gy + 1.0) * H - 1.0) * 0.5

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx1 = fx - x0
    wy1 = fy - y0

    def tap(yi, xi, wgt):
        inb = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        vals = x[jnp.arange(B)[:, None, None], yi_c, xi_c]  # (B, h, w, C)
        return vals * (wgt * inb)[..., None]

    out = (
        tap(y0, x0, (1 - wx1) * (1 - wy1))
        + tap(y0, x0 + 1, wx1 * (1 - wy1))
        + tap(y0 + 1, x0, (1 - wx1) * wy1)
        + tap(y0 + 1, x0 + 1, wx1 * wy1)
    )
    return out


def warp(x, flow):
    """Backward-warp x by flow (reference base_matching_net.py:228-262):
    out(p) = x(p + flow(p)), bilinear, align_corners=True, zero padding.

    x: (B, H, W, C); flow: (B, H, W, 2) in pixels.
    """
    B, H, W, _ = flow.shape
    xs = jnp.arange(W, dtype=flow.dtype)
    ys = jnp.arange(H, dtype=flow.dtype)
    gx = xs[None, None, :] + flow[..., 0]
    gy = ys[None, :, None] + flow[..., 1]
    gx = 2.0 * gx / max(W - 1, 1) - 1.0
    gy = 2.0 * gy / max(H - 1, 1) - 1.0
    return grid_sample_bilinear(x, jnp.stack([gx, gy], axis=-1), align_corners=True)


# ---------------------------------------------------------------------------
# flow <-> mapping (reference flow_and_mapping_operations.py:53,126)
# ---------------------------------------------------------------------------


def _grid(H, W, dtype=jnp.float32):
    xs = jnp.arange(W, dtype=dtype)
    ys = jnp.arange(H, dtype=dtype)
    gx = jnp.broadcast_to(xs[None, :], (H, W))
    gy = jnp.broadcast_to(ys[:, None], (H, W))
    return jnp.stack([gx, gy], axis=-1)  # (H, W, 2)


def convert_flow_to_mapping(flow):
    """(B, H, W, 2) pixel flow -> absolute mapping."""
    return flow + _grid(flow.shape[1], flow.shape[2], flow.dtype)[None]


def convert_mapping_to_flow(mapping):
    return mapping - _grid(mapping.shape[1], mapping.shape[2], mapping.dtype)[None]


def unnormalise_mapping_and_convert_to_flow(nmap):
    """reference models/modules/mod.py:unnormalise_and_convert_mapping_to_flow;
    nmap: (B, H, W, 2) normalized to [-1, 1]."""
    B, H, W, _ = nmap.shape
    mx = (nmap[..., 0] + 1.0) * (W - 1) / 2.0
    my = (nmap[..., 1] + 1.0) * (H - 1) / 2.0
    g = _grid(H, W, nmap.dtype)
    return jnp.stack([mx - g[None, ..., 0], my - g[None, ..., 1]], axis=-1)
