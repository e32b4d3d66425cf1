"""PDCNet+ model forward (reference models/PDCNet/PDCNet.py:479-642).

Functional port of `PDCNetModel.forward` in the PDCNet_plus configuration
(reference model_selection.py:144-171):

  * 4-level coarse-to-fine: L-Net on 256x256 images (level 4: GlobalGOCor at
    16^2 + CMDTop mapping decoder; level 3: LocalGOCor at 32^2 + flow decoder
    + adaptive-reso PWC refinement) and H-Net on the original-resolution
    images (levels 2 and 1 at 1/8 and 1/4 + final PWC refinement).
  * 2-mode Laplace mixture uncertainty at every level (small fixed variance
    1.0; large variance constrained to [2, 256^2] on the L-Net and
    [2, 520^2] on the H-Net).
  * make_two_feature_copies=True: a separate VGG pyramid (`pyramid_256`) for
    the 256x256 images.

Inputs are NHWC imagenet-normalized images; flows are (b, h, w, 2) in pixel
units of the corresponding full-resolution image (matching the reference's
scaling conventions at PDCNet.py:330-334, 544-556).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..correlation import local_correlation
from .decoders import cmd_top_residual, flow_estimator_residual, pwc_refinement
from .gocor import global_gocor, local_gocor
from .layers import (
    conv_transpose2d,
    l2norm,
    leaky_relu,
    relu,
    resize_bilinear,
    unnormalise_mapping_and_convert_to_flow,
    warp,
)
from .uncertainty import (
    constrain_large_log_var_map,
    corr_uncertainty_decoder,
    uncertainty_predictor,
)
from .vgg import vgg_pyramid

VAR_1 = 1.0  # var_1_minus_plus — fixed small variance
VAR_2_MINUS = 2.0
VAR_2_PLUS = 520.0**2
VAR_2_PLUS_256 = 256.0**2


def extract_features(im_t, im_s, im_t_256, im_s_256, params):
    """reference base_matching_net.py:424-452 with make_two_feature_copies."""
    pyr_t = vgg_pyramid(im_t, params, "pyramid", eigth_resolution=True)
    pyr_s = vgg_pyramid(im_s, params, "pyramid", eigth_resolution=True)
    c11, c12 = pyr_t[-2], pyr_t[-1]  # 1/4 (128ch), 1/8 (256ch)
    c21, c22 = pyr_s[-2], pyr_s[-1]
    pyr_t256 = vgg_pyramid(im_t_256, params, "pyramid_256")
    pyr_s256 = vgg_pyramid(im_s_256, params, "pyramid_256")
    c13, c23 = pyr_t256[-2], pyr_s256[-2]  # 32x32 (256ch)
    c14, c24 = pyr_t256[-1], pyr_s256[-1]  # 16x16 (512ch)
    return c14, c24, c13, c23, c12, c22, c11, c21


def _plain_global_corr(c_target, c_source):
    """use_global_corr_layer (reference base_pdcnet.py:84-103): plain global
    correlation of l2-normed features, relu'd then channel-l2-normed.
    Output (b, h_t, w_t, hs*ws)."""
    t = l2norm(c_target)
    s = l2norm(c_source)
    b, hs, ws, c = s.shape
    corr = jnp.einsum("bhwc,bnc->bhwn", t, s.reshape(b, hs * ws, c))
    return l2norm(relu(corr))


def _uncertainty_at_level(corr_for_dec, x_layer, up_unc, up_flow, params, level, search_size):
    """estimate_uncertainty_components (reference PDCNet.py:291-316)."""
    cu = corr_uncertainty_decoder(corr_for_dec, params, f"corr_uncertainty_decoder{level}", search_size)
    pieces = [cu, x_layer]
    if up_unc is not None:
        pieces += [up_unc, up_flow]
    u_in = jnp.concatenate(pieces, axis=-1)
    return uncertainty_predictor(u_in, params, f"uncertainty_decoder{level}")


def _two_mode_log_var(large_log_var):
    small = jnp.full_like(large_log_var, np.log(VAR_1))
    return jnp.concatenate([small, large_log_var], axis=-1)


def _upscale_uncertainty(log_var_map, weight_map, out_hw):
    up_w = resize_bilinear(weight_map, out_hw, align_corners=False)
    up_large = resize_bilinear(log_var_map[..., 1:2], out_hw, align_corners=False)
    return _two_mode_log_var(up_large), up_w


def pdcnet_forward(im_target, im_source, im_target_256, im_source_256, params,
                   global_iters=3, local_iters=7):
    """Full 4-level forward. Returns (output_256, output) dicts like the
    reference (PDCNet.py:616-642): flow_estimates + uncertainty_estimates
    ([log_var_map, weight_map] per level), all NHWC."""
    h_ori, w_ori = im_target.shape[1:3]
    h_256, w_256 = im_target_256.shape[1:3]

    c14, c24, c13, c23, c12, c22, c11, c21 = extract_features(
        im_target, im_source, im_target_256, im_source_256, params
    )

    # ---- level 4 (16x16 global, mapping decoder) — PDCNet.py:319-367 ----
    corr4 = leaky_relu(
        global_gocor(l2norm(c14), l2norm(c24), params, num_iter=global_iters)
    )  # normalize='leakyrelu'
    init_map = jnp.zeros(corr4.shape[:3] + (2,), corr4.dtype)
    x4, est_map4 = cmd_top_residual(
        jnp.concatenate([corr4, init_map], axis=-1), params, "decoder4"
    )
    flow4 = unnormalise_mapping_and_convert_to_flow(est_map4)
    ratio_x = 16.0 / float(w_256)
    ratio_y = 16.0 / float(h_256)
    flow4 = flow4 / jnp.asarray([ratio_x, ratio_y], flow4.dtype)

    corr4_unc = _plain_global_corr(c14, c24)  # corr_for_corr_uncertainty_decoder='corr'
    large4, weight4 = _uncertainty_at_level(corr4_unc, x4, None, None, params, 4, 16)
    large4 = constrain_large_log_var_map(VAR_2_MINUS, VAR_2_PLUS_256, large4)
    log_var4 = _two_mode_log_var(large4)

    # ---- upscale to 32x32 (deconv4) — PDCNet.py:446-476, 488-497 ----
    up_flow4 = conv_transpose2d(flow4, params, "deconv4")
    up_log_var4, up_weight4 = _upscale_uncertainty(log_var4, weight4, (32, 32))
    up_unc4 = jnp.concatenate([up_log_var4, up_weight4], axis=-1)

    # ---- level 3 (32x32 local) — PDCNet.py:369-443, 499-513 ----
    x3, flow3, log_var3, weight3 = _flow_level(
        ratio=32.0 / float(w_256), c_t=c13, c_s=c23, up_flow=up_flow4, up_unc=up_unc4,
        params=params, level=3, refinement_stem="dc_conv", up_feat=None,
        sigma_max=VAR_2_PLUS_256, refinement=True, local_iters=local_iters,
    )

    out_hw_8 = (h_ori // 8, w_ori // 8)
    up_flow3 = resize_bilinear(flow3, out_hw_8, align_corners=False)
    up_flow3 = up_flow3 * jnp.asarray(
        [float(w_ori) / float(w_256), float(h_ori) / float(h_256)], flow3.dtype
    )
    up_log_var3, up_weight3 = _upscale_uncertainty(log_var3, weight3, out_hw_8)
    up_unc3 = jnp.concatenate([up_log_var3, up_weight3], axis=-1)

    # ---- level 2 (1/8) — no refinement (refinement_at_all_levels=False) ----
    x2, flow2, log_var2, weight2 = _flow_level(
        ratio=1.0 / 8.0, c_t=c12, c_s=c22, up_flow=up_flow3, up_unc=up_unc3,
        params=params, level=2, refinement_stem="l_dc_conv", up_feat=None,
        sigma_max=VAR_2_PLUS, refinement=False, local_iters=local_iters,
    )

    out_hw_4 = (h_ori // 4, w_ori // 4)
    up_flow2 = conv_transpose2d(flow2, params, "deconv2")
    up_feat2 = conv_transpose2d(x2, params, "upfeat2")
    up_log_var2, up_weight2 = _upscale_uncertainty(log_var2, weight2, out_hw_4)
    up_unc2 = jnp.concatenate([up_log_var2, up_weight2], axis=-1)

    # ---- level 1 (1/4) — final PWC refinement ----
    x1, flow1, log_var1, weight1 = _flow_level(
        ratio=1.0 / 4.0, c_t=c11, c_s=c21, up_flow=up_flow2, up_unc=up_unc2,
        params=params, level=1, refinement_stem="l_dc_conv", up_feat=up_feat2,
        sigma_max=VAR_2_PLUS, refinement=True, local_iters=local_iters,
    )

    output_256 = {
        "flow_estimates": [flow4, flow3],
        "correlation": corr4,
        "uncertainty_estimates": [[log_var4, weight4], [log_var3, weight3]],
    }
    output = {
        "flow_estimates": [flow2, flow1],
        "uncertainty_estimates": [[log_var2, weight2], [log_var1, weight1]],
    }
    return output_256, output


def _flow_level(ratio, c_t, c_s, up_flow, up_unc, params, level, refinement_stem,
                up_feat, sigma_max, refinement, local_iters):
    """estimate_at_flowlevel (reference PDCNet.py:369-443)."""
    up_flow_warping = up_flow * ratio
    c_s_warped = warp(c_s, up_flow_warping)

    corr = leaky_relu(local_gocor(c_t, c_s_warped, params, num_iter=local_iters))

    pieces = [corr, up_flow]
    if up_feat is not None:
        pieces.append(up_feat)
    pieces.append(up_unc)
    x, res_flow = flow_estimator_residual(
        jnp.concatenate(pieces, axis=-1), params, f"decoder{level}"
    )

    x_ = jnp.zeros_like(x)
    if refinement:
        input_refinement = res_flow + up_flow
        x_, res_flow_ = pwc_refinement(
            jnp.concatenate([x, input_refinement], axis=-1), params, refinement_stem
        )
        res_flow = res_flow + res_flow_
    flow = res_flow + up_flow

    # plain local correlation (not GOCor) feeds the uncertainty decoder
    corr_unc = leaky_relu(local_correlation(c_t, c_s_warped))
    large, weight = _uncertainty_at_level(corr_unc, x_ + x, up_unc, up_flow, params, level, 9)
    large = constrain_large_log_var_map(VAR_2_MINUS, sigma_max, large)
    return x, flow, _two_mode_log_var(large), weight
