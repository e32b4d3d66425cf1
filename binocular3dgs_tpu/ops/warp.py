"""Disparity-based inverse image warping — the binocular-consistency core.

Behavioral parity target: reference `utils/graphics_utils.py:80-125`
(`inverse_warp_images`, from monodepth): horizontal-only backward warp with
per-pixel float disparity, linear interpolation between the two straddling
columns, and zeroing wherever *either* interpolation column is out of bounds.

The torch version loops over batch and channels with integer index tensors;
here it is one vectorized gather (XLA path) or a banded one-hot MXU
contraction with a custom VJP (Pallas path, ops/warp_pallas.py — XLA's
gather lowering costs ~8 ms and its scatter-add VJP ~67 ms at 1008x756 on a
v5e; even jnp.take_along_axis along lanes measures ~46 ms). Gradients flow
to the image through the gather/contraction and to the disparity through
the interpolation weights only (floor is piecewise-constant), matching the
detached LongTensor indices upstream.

Images are channels-first (C, H, W) — see ops/losses.py docstring.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def inverse_warp_image(
    image: jnp.ndarray, disparity: jnp.ndarray, backend: str = "auto"
) -> jnp.ndarray:
    """Warp `image` horizontally by per-pixel `disparity`.

    image: (C, H, W); disparity: (H, W).
    out(r, c) = (x1 - d) * image[r, c + x0] + (d - x0) * image[r, c + x1]
    with x0 = floor(d), x1 = x0 + 1; zero where either column is OOB.

    backend: "auto" (pallas on TPU, xla elsewhere), "xla", or "pallas"
    (interpret mode off-TPU). The pallas path has a custom VJP — XLA's
    gather/scatter lowering of this pattern is pathological on TPU.
    """
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "pallas":
        interpret = jax.default_backend() != "tpu"
        return _warp_pallas(image, disparity, interpret)
    return _warp_xla(image, disparity)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _warp_pallas(image, disparity, interpret):
    from .warp_pallas import warp_forward_pallas

    out, _ = warp_forward_pallas(image, disparity, interpret)
    return out


def _warp_pallas_fwd(image, disparity, interpret):
    from .warp_pallas import warp_forward_pallas

    out, diff = warp_forward_pallas(image, disparity, interpret)
    return out, (diff, disparity)


def _warp_pallas_bwd(interpret, res, d_out):
    from .warp_pallas import warp_backward_pallas

    diff, disparity = res
    W = diff.shape[-1]
    x0 = jnp.floor(disparity)
    c0 = jnp.arange(W, dtype=jnp.int32)[None, :] + x0.astype(jnp.int32)
    valid = (c0 >= 0) & (c0 + 1 < W)
    d_disp = jnp.sum(diff * d_out, axis=0) * valid.astype(jnp.float32)
    d_image = warp_backward_pallas(disparity, d_out, interpret)
    return d_image, d_disp


_warp_pallas.defvjp(_warp_pallas_fwd, _warp_pallas_bwd)


def _warp_xla(image: jnp.ndarray, disparity: jnp.ndarray) -> jnp.ndarray:
    C, H, W = image.shape
    x0 = jnp.floor(disparity)
    x0i = x0.astype(jnp.int32)
    cols = jnp.arange(W, dtype=jnp.int32)[None, :]
    c0 = cols + x0i
    c1 = c0 + 1
    valid = (c0 >= 0) & (c1 < W)
    c0c = jnp.clip(c0, 0, W - 1)
    c1c = jnp.clip(c1, 0, W - 1)
    # flat channel-major gather (single-axis, minor-most indices)
    rows = jnp.arange(H, dtype=jnp.int32)[:, None] * W
    flat = image.reshape(C, H * W)
    g0 = flat[:, (rows + c0c).reshape(-1)].reshape(C, H, W)
    g1 = flat[:, (rows + c1c).reshape(-1)].reshape(C, H, W)
    w1 = (disparity - x0)[None]
    w0 = 1.0 - w1
    out = w0 * g0 + w1 * g1
    return jnp.where(valid[None], out, 0.0)


def warp_mask(disparity: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Validity mask = warp of an all-ones image (reference `train.py:133`),
    (H, W) in [0, 1].

    Computed analytically: warping ones yields w0 + w1 = 1 wherever both
    interpolation columns are in bounds and 0 elsewhere, and the reference's
    gradient to disparity is identically zero there too (d(w0+w1)/dd = 0),
    so a comparison mask is exact — no gather needed."""
    cols = jnp.arange(width, dtype=jnp.int32)[None, :]
    c0 = cols + jnp.floor(disparity).astype(jnp.int32)
    valid = (c0 >= 0) & (c0 + 1 < width)
    return valid.astype(jnp.float32)
