"""Global + Local GOCor: learned correlation via unrolled steepest descent.

Re-implements (inference mode, functional) the reference modules:
  * GlobalGOCor with GlobalCorrFlexibleContextAwareInitializer and query loss
    (reference third_party/GOCor/GOCor/global_gocor.py:26-305,
     global_corr_initializer.py:139-188, fourdim.py SeparableConv4d,
     optimizer_selection_functions.py:5-53)
  * LocalGOCor with LocalCorrSimpleInitializer, 9x9 search window
    (reference third_party/GOCor/GOCor/local_gocor.py:35-58, 160-385)
  * DistanceMap binning (distance.py) and LeakyReluPar activations
    (activation.py)

The filter "maps" are per-position 1x1 filters, so every filter<->feature
product is one einsum contraction — MXU-friendly, no conv-with-groups tricks
needed on TPU. PDCNet_plus configuration (reference model_selection.py:144-171):
global: 3 iters, steplength_reg 0.1, query loss with SeparableConv4d(3,16,16),
train_label_map False; local: 7 iters, no query loss.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..correlation import local_correlation, local_correlation_transpose
from .layers import leaky_relu

# ---------------------------------------------------------------------------
# shared pieces
# ---------------------------------------------------------------------------


def distance_bins(offsets_y, offsets_x, num_bins=10, bin_displacement=0.5):
    """DistanceMap (reference distance.py): per-offset triangular histogram
    over distance bins. offsets: (H,) and (W,) -> (H, W, num_bins)."""
    dist = jnp.sqrt(offsets_y[:, None] ** 2 + offsets_x[None, :] ** 2)
    centers = jnp.arange(num_bins, dtype=jnp.float32)
    diff = dist[..., None] / bin_displacement - centers
    tri = jnp.maximum(1.0 - jnp.abs(diff[..., :-1]), 0.0)
    last = jnp.clip(1.0 + diff[..., -1:], 0.0, 1.0)
    return jnp.concatenate([tri, last], axis=-1)


def _bin_predict(bins, params, name, sigmoid=False):
    """1x1 conv over the bin axis; weight stored HWIO (1, 1, bins, 1)."""
    w = params[name].reshape(-1)
    out = jnp.einsum("...b,b->...", bins, w)
    return jax.nn.sigmoid(out) if sigmoid else out


def leaky_relu_par(x, a):
    return (1.0 - a) / 2.0 * jnp.abs(x) + (1.0 + a) / 2.0 * x


def leaky_relu_par_deriv(x, a):
    return (1.0 - a) / 2.0 * jnp.sign(x) + (1.0 + a) / 2.0


# ---------------------------------------------------------------------------
# SeparableConv4d (reference fourdim.py, permute_back_output=False)
# ---------------------------------------------------------------------------


def _conv_same(x, w):
    """x: (B, H, W, Cin); w: HWIO, odd kernel, SAME padding, stride 1."""
    k = w.shape[0]
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((k // 2, k // 2), (k // 2, k // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def separable_conv4d(x, params, prefix):
    """x: (b, H, W, H2, W2) -> (b, H2, W2, out, H, W).

    conv1 (1->inter) over the last spatial pair, conv2 (inter->out) over the
    first. Weights {prefix}.weight1 (k,k,1,inter), {prefix}.weight2
    (k,k,inter,out); bias=False in the GOCor config.
    """
    b, H, W, H2, W2 = x.shape
    w1 = params[f"{prefix}.weight1"]
    w2 = params[f"{prefix}.weight2"]
    inter = w1.shape[-1]
    out_dim = w2.shape[-1]
    x2 = _conv_same(x.reshape(b * H * W, H2, W2, 1), w1)  # (bHW, H2, W2, inter)
    x2 = x2.reshape(b, H, W, H2 * W2, inter)
    x3 = _conv_same(
        jnp.moveaxis(x2, 3, 1).reshape(b * H2 * W2, H, W, inter), w2
    )  # (bH2W2, H, W, out)
    return x3.reshape(b, H2, W2, H, W, out_dim).transpose(0, 1, 2, 5, 3, 4)


def separable_conv4d_transpose(x, params, prefix):
    """Adjoint of separable_conv4d: (b, H2, W2, out, H, W) -> (b, H, W, H2, W2).

    conv_transpose with stride 1 and SAME padding equals correlation with the
    spatially-flipped kernel, i.e. a plain conv with w[::-1, ::-1] and
    swapped I/O.
    """
    b, H2, W2, out_dim, H, W = x.shape
    w1 = params[f"{prefix}.weight1"]  # (k, k, 1, inter)
    w2 = params[f"{prefix}.weight2"]  # (k, k, inter, out)
    w2_t = w2[::-1, ::-1].transpose(0, 1, 3, 2)  # (k, k, out, inter)
    w1_t = w1[::-1, ::-1].transpose(0, 1, 3, 2)  # (k, k, inter, 1)
    x2 = _conv_same(
        x.transpose(0, 1, 2, 4, 5, 3).reshape(b * H2 * W2, H, W, out_dim), w2_t
    )  # (bH2W2, H, W, inter)
    inter = x2.shape[-1]
    x2 = x2.reshape(b, H2 * W2, H, W, inter)
    x3 = _conv_same(
        jnp.moveaxis(x2, 1, 3).reshape(b * H * W, H2, W2, inter), w1_t
    )  # (bHW, H2, W2, 1)
    return x3.reshape(b, H, W, H2, W2)


# ---------------------------------------------------------------------------
# Global GOCor
# ---------------------------------------------------------------------------


def _global_unfold_map(g, H, W):
    """reference global_gocor.py:_unfold_map — from a (2H-1, 2W-1) offset map
    g (value at center = zero offset) build map[(py,px) flat, y, x] =
    g[H-1 + y - py, W-1 + x - px]."""
    iy = (H - 1) + np.arange(H)[None, :] - np.arange(H)[:, None]  # (py, y)
    ix = (W - 1) + np.arange(W)[None, :] - np.arange(W)[:, None]
    m = g[iy[:, None, :, None], ix[None, :, None, :]]  # (py, px, y, x)
    return m.reshape(H * W, H, W)


def _flexible_context_aware_init(feat, params, prefix):
    """GlobalCorrFlexibleContextAwareInitializer (reference
    global_corr_initializer.py:139-188). feat: (b, H, W, d) -> (b, HW, d)."""
    b, H, W, d = feat.shape
    w = feat.reshape(b, H * W, d)
    bg = jnp.mean(w, axis=1, keepdims=True)  # (b, 1, d)
    ff = jnp.sum(w * w, axis=2, keepdims=True)  # (b, HW, 1)
    bb = jnp.sum(bg * bg, axis=2, keepdims=True)  # (b, 1, 1)
    fb = jnp.sum(w * bg, axis=2, keepdims=True)  # (b, HW, 1)
    den = jnp.maximum(ff * bb - fb * fb, 1e-6)
    tfg = params[f"{prefix}.target_fg"]  # (d,)
    tbg = params[f"{prefix}.target_bg"]
    fg_scale = tfg[None, None, :] * bb - tbg[None, None, :] * fb
    bg_scale = tfg[None, None, :] * fb - tbg[None, None, :] * ff
    return (fg_scale * w - bg_scale * bg) / den


def global_gocor(ref_feat, query_feat, params, prefix="corr.corr_module",
                 num_iter=3, steplength_reg=0.1, min_filter_reg=1e-5,
                 num_dist_bins=10, bin_displacement=0.5):
    """GlobalGOCor forward (reference global_gocor.py:145-354), PDCNet_plus
    config: FlexibleContextAware init, query loss with SeparableConv4d.

    ref_feat, query_feat: (b, H, W, d), L2-normalized by the caller.
    Returns scores (b, h2, w2, H*W) — query position spatial, channel =
    ref position (put_query_feat_in_channel_dimension=True layout transposed
    to NHWC).
    """
    b, H, W, d = ref_feat.shape
    H2, W2 = query_feat.shape[1:3]
    opt = f"{prefix}.filter_optimizer"

    filter_map = _flexible_context_aware_init(ref_feat, params, f"{prefix}.filter_initializer")

    # distance-bin predictions on the (2H-1, 2W-1) offset map
    offs_y = jnp.arange(-(H - 1), H, dtype=jnp.float32)
    offs_x = jnp.arange(-(W - 1), W, dtype=jnp.float32)
    bins = distance_bins(offs_y, offs_x, num_dist_bins, bin_displacement)
    target_full = _bin_predict(bins, params, f"{opt}.label_map_predictor.weight")
    vplus_full = _bin_predict(bins, params, f"{opt}.spatial_weight_predictor.weight")
    wm_full = _bin_predict(bins, params, f"{opt}.target_mask_predictor.0.weight", sigmoid=True)
    target_map = _global_unfold_map(target_full, H, W)[None]  # (1, HW, H, W)
    v_plus = _global_unfold_map(vplus_full, H, W)[None]
    weight_m = _global_unfold_map(wm_full, H, W)[None]

    step_length = jnp.exp(params[f"{opt}.log_step_length"])[0]
    freg = params[f"{opt}.filter_reg"][0]
    reg_weight = jnp.maximum(freg * freg, min_filter_reg**2)

    rf = ref_feat.reshape(b, H * W, d)
    qf = query_feat.reshape(b, H2 * W2, d)

    def apply_filter(feat_flat, filt, h, w):
        # (b, P, d) x (b, N, d) -> (b, N, h, w)
        return jnp.einsum("bnd,bpd->bnp", filt, feat_flat).reshape(b, -1, h, w)

    def feat_transpose(feat_flat, res, h, w):
        return jnp.einsum("bnp,bpd->bnd", res.reshape(b, -1, h * w), feat_flat)

    def body(_, filter_map):
        scores_ref = apply_filter(rf, filter_map, H, W)  # (b, HW, H, W)
        act = v_plus * leaky_relu_par(scores_ref, weight_m)
        dact = v_plus * leaky_relu_par_deriv(scores_ref, weight_m)
        residuals = dact * (act - v_plus * target_map)
        filter_grad = reg_weight * filter_map + feat_transpose(rf, residuals, H, W)

        # query loss L_q via the 4D regularizer
        scores_q = apply_filter(qf, filter_map, H2, W2).reshape(b, H, W, H2, W2)
        lq_res = separable_conv4d(scores_q, params, f"{opt}.reg_layer")
        reg_tp = separable_conv4d_transpose(lq_res, params, f"{opt}.reg_layer")
        filter_grad = filter_grad + feat_transpose(qf, reg_tp.reshape(b, H * W, H2, W2), H2, W2)

        # step length alpha (sum over all dims per sequence: sum_dims=(1, 2))
        sg_ref = dact * apply_filter(rf, filter_grad, H, W)
        alpha_den = jnp.sum(sg_ref.reshape(b, -1) ** 2, axis=1)
        sg_q = apply_filter(qf, filter_grad, H2, W2).reshape(b, H, W, H2, W2)
        ad_q = separable_conv4d(sg_q, params, f"{opt}.reg_layer")
        alpha_den = alpha_den + jnp.sum(ad_q.reshape(b, -1) ** 2, axis=1)

        alpha_num = jnp.sum(filter_grad.reshape(b, -1) ** 2, axis=1)
        alpha_den = jnp.maximum(alpha_den + reg_weight * alpha_num, 1e-8)
        alpha_den = alpha_den + steplength_reg * alpha_num
        alpha = alpha_num / alpha_den
        return filter_map - (step_length * alpha)[:, None, None] * filter_grad

    filter_map = jax.lax.fori_loop(0, num_iter, body, filter_map, unroll=True)

    # put_query_feat_in_channel_dimension=True (reference global_gocor.py:352-355):
    # spatial dims = reference (target) positions, channels = query positions
    scores = jnp.einsum("bnd,bpd->bnp", filter_map, qf)  # (b, HW_ref, H2W2)
    return scores.reshape(b, H, W, H2 * W2)


# ---------------------------------------------------------------------------
# Local GOCor
# ---------------------------------------------------------------------------


def _local_simple_init(feat, params, prefix):
    """LocalCorrSimpleInitializer (reference local_gocor.py:35-58)."""
    scaling = params[f"{prefix}.scaling"][0]
    return scaling * feat / (jnp.mean(feat * feat, axis=-1, keepdims=True) + 1e-6)


def local_gocor(ref_feat, query_feat, params, prefix="local_corr",
                num_iter=7, min_filter_reg=1e-5, md=4,
                num_dist_bins=10, bin_displacement=0.5):
    """LocalGOCor forward (reference local_gocor.py:334-430), 9x9 window,
    reference-loss-only optimizer. feats: (b, H, W, d) -> (b, H, W, 81)."""
    d = ref_feat.shape[-1]
    opt = f"{prefix}.filter_optimizer"

    filter_map = _local_simple_init(ref_feat, params, f"{prefix}.filter_initializer")

    offs = jnp.arange(-md, md + 1, dtype=jnp.float32)
    bins = distance_bins(offs, offs, num_dist_bins, bin_displacement)  # (9, 9, B)
    target_map = _bin_predict(bins, params, f"{opt}.label_map_predictor.weight").reshape(1, 1, 1, -1)
    v_plus = _bin_predict(bins, params, f"{opt}.spatial_weight_predictor.weight").reshape(1, 1, 1, -1)
    weight_m = _bin_predict(bins, params, f"{opt}.target_mask_predictor.0.weight", sigmoid=True).reshape(1, 1, 1, -1)

    step_length = jnp.exp(params[f"{opt}.log_step_length"])[0]
    freg = params[f"{opt}.filter_reg"][0]
    reg_weight = jnp.maximum(freg * freg, min_filter_reg**2) / (d * d)

    def body(_, filter_map):
        scores = local_correlation(filter_map, ref_feat, md)  # (b, H, W, 81)
        act = v_plus * leaky_relu_par(scores, weight_m)
        dact = v_plus * leaky_relu_par_deriv(scores, weight_m)
        residuals = dact * (act - v_plus * target_map)
        filter_grad = reg_weight * filter_map + local_correlation_transpose(residuals, ref_feat, md)

        sg = dact * local_correlation(filter_grad, ref_feat, md)
        alpha_den = jnp.sum(sg * sg, axis=-1, keepdims=True)
        alpha_num = jnp.sum(filter_grad * filter_grad, axis=-1, keepdims=True)
        alpha_den = jnp.maximum(alpha_den + reg_weight * alpha_num, 1e-8)
        alpha = alpha_num / alpha_den
        return filter_map - (step_length * alpha) * filter_grad

    filter_map = jax.lax.fori_loop(0, num_iter, body, filter_map, unroll=True)
    return local_correlation(filter_map, query_feat, md)
