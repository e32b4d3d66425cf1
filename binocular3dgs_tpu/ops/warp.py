"""Disparity-based inverse image warping — the binocular-consistency core.

Behavioral parity target: reference `utils/graphics_utils.py:80-125`
(`inverse_warp_images`, from monodepth): horizontal-only backward warp with
per-pixel float disparity, linear interpolation between the two straddling
columns, and zeroing wherever *either* interpolation column is out of bounds.

The torch version loops over batch and channels with integer index tensors;
here it is one vectorized gather. Gradients flow to the image through the
gather and to the disparity through the interpolation weights only (floor is
piecewise-constant), matching the detached LongTensor indices upstream.
"""

from __future__ import annotations

import jax.numpy as jnp


def inverse_warp_image(image: jnp.ndarray, disparity: jnp.ndarray) -> jnp.ndarray:
    """Warp `image` horizontally by per-pixel `disparity`.

    image: (H, W, C); disparity: (H, W) or (H, W, 1).
    out(r, c) = (x1 - d) * image[r, c + x0] + (d - x0) * image[r, c + x1]
    with x0 = floor(d), x1 = x0 + 1; zero where either column is OOB.
    """
    if disparity.ndim == 3:
        disparity = disparity[..., 0]
    H, W = image.shape[0], image.shape[1]
    x0 = jnp.floor(disparity)
    x0i = x0.astype(jnp.int32)
    cols = jnp.arange(W, dtype=jnp.int32)[None, :]
    c0 = cols + x0i
    c1 = c0 + 1
    valid = (c0 >= 0) & (c0 < W) & (c1 >= 0) & (c1 < W)
    c0c = jnp.clip(c0, 0, W - 1)
    c1c = jnp.clip(c1, 0, W - 1)
    rows = jnp.arange(H, dtype=jnp.int32)[:, None]
    g0 = image[rows, c0c]  # (H, W, C)
    g1 = image[rows, c1c]
    w1 = (disparity - x0)[..., None]
    w0 = 1.0 - w1
    out = w0 * g0 + w1 * g1
    return jnp.where(valid[..., None], out, 0.0)


def warp_mask(disparity: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Validity mask = warp of an all-ones image (reference `train.py:133`),
    (H, W, 1) in [0, 1]."""
    ones = jnp.ones((height, width, 1), dtype=jnp.float32)
    return inverse_warp_image(ones, disparity)
