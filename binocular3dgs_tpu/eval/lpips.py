"""LPIPS perceptual metric in JAX.

Behavioral parity target: reference `lpipsPyTorch/` (LPIPS v0.1: backbone
conv features, imagenet scaling, unit-normalize along channels, 1x1 linear
heads, spatial mean, sum over layers). The reference downloads torchvision
VGG16 weights + richzhang linear heads at runtime; this environment has no
network egress and no torchvision, so weights must be supplied explicitly:

    lpips_fn = make_lpips(load_lpips_weights("/path/to/weights.npz"))

`convert_torch_weights` turns (vgg16_state_dict, lin_state_dict) torch
checkpoints into the npz layout. When no weights are available the eval CLI
reports LPIPS as null rather than failing the whole evaluation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 features: conv indices per block (torchvision layout), relu slices
# after layers [3, 8, 15, 22, 29] -> relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
VGG16_CFG = [
    (2, [64, 64]),
    (2, [128, 128]),
    (3, [256, 256, 256]),
    (3, [512, 512, 512]),
    (3, [512, 512, 512]),
]
# imagenet shift/scale used by LPIPS (reference lpipsPyTorch/modules/lpips.py)
SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def convert_torch_weights(vgg_state: dict, lin_state: dict) -> dict[str, np.ndarray]:
    """torchvision vgg16 `features.*` + richzhang linear-head state dicts
    (as numpy or torch tensors) -> flat npz-able dict.

    Accepts the raw richzhang download layout (`lin{l}.model.1.weight`, what
    `lpipsPyTorch/modules/utils.py:13-20` downloads) AND the renamed layout
    the reference produces from it (`{l}.1.weight`, after stripping 'lin'
    and 'model.')."""

    def arr(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    out = {}
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    for i, idx in enumerate(conv_idx):
        w = arr(vgg_state[f"features.{idx}.weight"])  # (O, I, 3, 3)
        b = arr(vgg_state[f"features.{idx}.bias"])
        out[f"conv{i}.w"] = np.transpose(w, (2, 3, 1, 0))  # HWIO
        out[f"conv{i}.b"] = b
    for l in range(5):
        for key in (f"lin{l}.model.1.weight", f"{l}.1.weight"):
            if key in lin_state:
                w = arr(lin_state[key])  # (1, C, 1, 1)
                break
        else:
            raise KeyError(f"linear head {l} not found in lin_state")
        out[f"lin{l}.w"] = w[0, :, 0, 0]
    return out


def save_lpips_weights(path: str, weights: dict[str, np.ndarray]) -> None:
    np.savez(path, **weights)


def load_lpips_weights(path: str) -> dict[str, np.ndarray]:
    z = np.load(path)
    return {k: z[k] for k in z.files}


def _vgg_features(weights, x):
    """x: (B, H, W, 3) in [0,1] -> list of 5 feature maps (after each block's
    last relu, with 2x2 maxpool between blocks)."""
    # the reference feeds [0,1] images straight into z_score — no [-1,1]
    # rescale (lpipsPyTorch/modules/networks.py:50-53, called from metrics.py
    # with [0,1] tensors)
    x = (x - SHIFT) / SCALE
    feats = []
    ci = 0
    for b, (n, chans) in enumerate(VGG16_CFG):
        for _ in range(n):
            w = jnp.asarray(weights[f"conv{ci}.w"])
            bb = jnp.asarray(weights[f"conv{ci}.b"])
            x = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            ) + bb
            x = jax.nn.relu(x)
            ci += 1
        feats.append(x)
        if b < 4:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
    return feats


def make_lpips(weights: dict[str, np.ndarray]):
    """Returns lpips(img1, img2) on (H, W, 3) [0,1] images."""

    @jax.jit
    def lpips(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
        x = img1[None] if img1.ndim == 3 else img1
        y = img2[None] if img2.ndim == 3 else img2
        fx = _vgg_features(weights, x)
        fy = _vgg_features(weights, y)
        total = 0.0
        for l, (a, b) in enumerate(zip(fx, fy)):
            # reference normalize_activation: x / (sqrt(sum x^2) + eps)
            a = a / (jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True)) + 1e-10)
            b = b / (jnp.sqrt(jnp.sum(b * b, axis=-1, keepdims=True)) + 1e-10)
            d = (a - b) ** 2
            lin = jnp.asarray(weights[f"lin{l}.w"])
            total = total + jnp.mean(jnp.sum(d * lin, axis=-1), axis=(1, 2))
        return total[0]

    return lpips
