"""Mixture-density uncertainty decoders and P_R confidence closed forms
(reference models/PDCNet/mod_uncertainty.py).

PDCNet_plus predicts a 2-mode Laplace mixture per pixel: one fixed small
variance (var_1_minus_plus = 1.0) and one learned large variance constrained
to [var_2_minus, var_2_plus] (2.0 .. 520^2, or 256^2 for the L-Net levels).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .layers import conv2d, conv_block, maxpool2x2


def corr_uncertainty_decoder(corr, params, prefix, search_size):
    """MixtureDensityEstimatorFromCorr (reference mod_uncertainty.py:69-135),
    output_all_channels_together=True, in_channels=1.

    corr: (b, h, w, s*s) local/global cost volume; each position's s x s
    correlation patch is treated as a 1-channel image -> 6 output channels.
    """
    b, h, w, ss = corr.shape
    s = search_size
    x = corr.reshape(b * h * w, s, s, 1)
    if s == 16:
        x = conv_block(x, params, f"{prefix}.conv_0", padding=0)
        x = maxpool2x2(x)
        x = conv_block(x, params, f"{prefix}.conv_1", padding=0)
        x = conv_block(x, params, f"{prefix}.conv_2", padding=0)
    elif s == 9:
        x = conv_block(x, params, f"{prefix}.conv_0", padding=0)
        x = conv_block(x, params, f"{prefix}.conv_1", padding=0)
        x = conv_block(x, params, f"{prefix}.conv_2", padding=0)
    else:
        raise ValueError(f"unsupported search size {s}")
    x = conv2d(x, params, f"{prefix}.predict_uncertainty", padding=0)  # (bhw, 1, 1, 6)
    return x.reshape(b, h, w, -1)


def uncertainty_predictor(x, params, prefix):
    """MixtureDensityEstimatorFromUncertaintiesAndFlow (reference
    mod_uncertainty.py:184-225), output_channels=3 ->
    (large_log_var (b,h,w,1), weight_map (b,h,w,2))."""
    x = conv_block(x, params, f"{prefix}.conv_0")
    x = conv_block(x, params, f"{prefix}.conv_1")
    u = conv2d(x, params, f"{prefix}.predict_uncertainty_final")
    return u[..., 0:1], u[..., 1:]


def constrain_large_log_var_map(var_min, var_max, large_log_var_map):
    """reference base_pdcnet.py:constrain_large_log_var_map (both bounds > 0):
    log(var_min + (var_max - var_min) * sigmoid(x - log(var_max)))."""
    return jnp.log(
        var_min + (var_max - var_min) * jax.nn.sigmoid(large_log_var_map - np.log(var_max))
    )


def p_r_of_mixture(weight_map, log_var_map, R=1.0, gaussian=False):
    """P_R of a K-mode mixture (reference mod_uncertainty.py:16-34).
    weight_map/log_var_map: (b, h, w, K) -> (b, h, w, 1)."""
    proba = jax.nn.softmax(weight_map, axis=-1)
    var = jnp.exp(log_var_map)
    if gaussian:
        p = proba * (1.0 - jnp.exp(-(R**2) / (2.0 * var)))
    else:
        p = proba * (1.0 - jnp.exp(-np.sqrt(2.0) * R / jnp.sqrt(var))) ** 2
    return jnp.sum(p, axis=-1, keepdims=True)


def average_variance_of_mixture(weight_map, log_var_map):
    """reference mod_uncertainty.py:8-13."""
    proba = jax.nn.softmax(weight_map, axis=-1)
    return jnp.sum(proba * jnp.exp(log_var_map), axis=-1, keepdims=True)
