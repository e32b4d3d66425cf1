"""Local windowed correlation (cost volume) ops.

Behavioral parity target: the CuPy `FunctionCorrelation` kernels
(reference `submodules/dense_matcher/models/modules/local_correlation/
correlation.py:15-241`): a 9x9 local cost volume

    out[b, d, y, x] = mean_c( ref[b, c, y, x] * query[b, c, y+dy, x+dx] )

for displacements (dx, dy) in [-4, 4]^2 (md=4, 81 channels), with zero
padding outside the image. The dense-init pipeline only runs this at
inference (`triangulate.py:147` under inference_mode), so no custom VJP is
needed — and as pure jnp it is differentiable anyway.

TPU-native formulation: one shifted-window einsum per displacement — 81
batched (C-contraction) multiplies that XLA fuses; channels-last layout.
"""

from __future__ import annotations

import jax.numpy as jnp


def local_correlation(ref: jnp.ndarray, query: jnp.ndarray, md: int = 4) -> jnp.ndarray:
    """ref, query: (B, H, W, C) -> cost volume (B, H, W, (2*md+1)^2).

    Displacement order matches the CUDA kernel: channel index
    d = (dy + md) * (2*md+1) + (dx + md), i.e. row-major over (dy, dx).
    """
    B, H, W, C = ref.shape
    pad = md
    qp = jnp.pad(query, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    outs = []
    for dy in range(-md, md + 1):
        for dx in range(-md, md + 1):
            shifted = qp[:, pad + dy : pad + dy + H, pad + dx : pad + dx + W, :]
            outs.append(jnp.sum(ref * shifted, axis=-1) / C)
    return jnp.stack(outs, axis=-1)


def local_correlation_transpose(v: jnp.ndarray, feat: jnp.ndarray, md: int = 4) -> jnp.ndarray:
    """Adjoint of `local_correlation` in its first argument (the CuPy
    `FunctionCorrelationTranspose`, reference correlation.py:112-174 —
    `kernel_Correlation_updateGradFirst` semantics):

        out[b, y, x, c] = (1/C) * sum_{dy,dx} v[b, y, x, d(dy,dx)]
                                             * feat[b, y+dy, x+dx, c]

    v: (B, H, W, (2*md+1)^2); feat: (B, H, W, C) -> (B, H, W, C).
    """
    B, H, W, C = feat.shape
    pad = md
    fp = jnp.pad(feat, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    out = jnp.zeros_like(feat)
    k = 0
    for dy in range(-md, md + 1):
        for dx in range(-md, md + 1):
            shifted = fp[:, pad + dy : pad + dy + H, pad + dx : pad + dx + W, :]
            out = out + v[..., k : k + 1] * shifted
            k += 1
    return out / C


def global_correlation(ref: jnp.ndarray, query: jnp.ndarray) -> jnp.ndarray:
    """Full global correlation (B, H, W, H*W): every ref position against
    every query position (reference GlobalFeatureCorrelationLayer behavior,
    `models/modules/feature_correlation_layer.py:75`). One MXU matmul."""
    B, H, W, C = ref.shape
    r = ref.reshape(B, H * W, C)
    q = query.reshape(B, H * W, C)
    corr = jnp.einsum("bnc,bmc->bnm", r, q)
    return corr.reshape(B, H, W, H * W)
