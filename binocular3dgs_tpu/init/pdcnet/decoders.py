"""Mapping/flow decoders and PWC refinement (reference models/modules/mod.py,
matching_modules.py, base_matching_net.py:379-411).

PDCNet_plus uses the residual-connection variants
(reference model_selection.py:157-171):
  * CMDTopResidualConnections for the global mapping decoder (decoder4)
  * OpticalFlowEstimatorResidualConnection for flow decoders (decoder3/2/1)
  * dilated-conv PWC refinement stacks dc_conv1-7 / l_dc_conv1-7

All blocks are mod.py:conv Sequentials (Conv2d + BatchNorm2d + LeakyReLU(0.1));
`final`/`predict_flow` heads are bare Conv2d.
"""

from __future__ import annotations

import jax.numpy as jnp

from .layers import conv2d, conv_block, leaky_relu


def _residual_trunk(x, params, prefix):
    """Shared trunk of the ResidualConnection decoders (reference
    mod.py:116-144, 208-240): conv_0 .. conv_4 with two 1x1 skips."""
    x0 = conv_block(x, params, f"{prefix}.conv_0", act=None)
    x0_relu = leaky_relu(x0)
    x2 = conv_block(
        conv_block(x0_relu, params, f"{prefix}.conv_1"), params, f"{prefix}.conv_2", act=None
    )
    x2_skip = x2 + conv_block(x0, params, f"{prefix}.conv0_skip", padding=0, act=None)
    x2_skip_relu = leaky_relu(x2_skip)
    x4 = conv_block(
        conv_block(x2_skip_relu, params, f"{prefix}.conv_3"), params, f"{prefix}.conv_4", act=None
    )
    x4_skip = x4 + conv_block(x2_skip, params, f"{prefix}.conv2_skip", padding=0, act=None)
    return leaky_relu(x4_skip)


def cmd_top_residual(x, params, prefix):
    """CMDTopResidualConnections (output_x=True): returns (x 32ch, mapping 2ch)."""
    feats = _residual_trunk(x, params, prefix)
    mapping = conv2d(feats, params, f"{prefix}.final")
    return feats, mapping


def flow_estimator_residual(x, params, prefix):
    """OpticalFlowEstimatorResidualConnection: returns (x 32ch, flow 2ch)."""
    feats = _residual_trunk(x, params, prefix)
    flow = conv2d(feats, params, f"{prefix}.predict_flow")
    return feats, flow


_DILATIONS = (1, 2, 4, 8, 16, 1)


def pwc_refinement(x, params, stem):
    """PWC-Net context network (reference base_matching_net.py:379-411):
    six dilated conv blocks + flow head. stem is 'dc_conv' (adaptive reso)
    or 'l_dc_conv' (finest level)."""
    for i, d in enumerate(_DILATIONS, start=1):
        x = conv_block(x, params, f"{stem}{i}", padding=d, dilation=d)
    res = conv2d(x, params, f"{stem}7")
    return x, res
