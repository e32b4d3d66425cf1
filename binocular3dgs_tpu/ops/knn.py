"""Mean squared distance to the 3 nearest neighbors.

Behavioral parity target: simple-knn `distCUDA2`
(reference `submodules/simple-knn/simple_knn.cu:147-183`): for each point,
the mean of squared distances to its 3 exact nearest neighbors (self
excluded). The CUDA version accelerates with Morton-sorted box culling; on
TPU a blocked brute-force O(P^2/B) dense distance computation maps straight
onto the MXU (one (B,3)x(3,P) matmul per block) and runs once per training
job, so exactness is kept with no spatial data structure.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("block_size",))
def mean_sq_dist_3nn(points: jnp.ndarray, block_size: int = 1024) -> jnp.ndarray:
    """points (P, 3) -> (P,) mean of squared distances to the 3 exact NN.

    Matches distCUDA2 semantics; callers clamp with 1e-7 and take
    log(sqrt(...)) per reference `scene/gaussian_model.py:134-135`.
    """
    P = points.shape[0]
    points = points.astype(jnp.float32)
    num_blocks = -(-P // block_size)
    padded = jnp.pad(points, ((0, num_blocks * block_size - P), (0, 0)))
    sq_norms = jnp.sum(points * points, axis=-1)  # (P,)

    def block_fn(i, out):
        start = i * block_size
        blk = jax.lax.dynamic_slice(padded, (start, 0), (block_size, 3))  # (B, 3)
        blk_sq = jnp.sum(blk * blk, axis=-1)  # (B,)
        # squared distances via the MXU: |a|^2 + |b|^2 - 2 a.b
        cross = blk @ points.T  # (B, P)
        d2 = blk_sq[:, None] + sq_norms[None, :] - 2.0 * cross
        d2 = jnp.maximum(d2, 0.0)
        # mask self-distances and the zero-padding rows' influence is cropped later
        idx = start + jax.lax.broadcasted_iota(jnp.int32, (block_size, 1), 0)[:, 0]
        col = jax.lax.broadcasted_iota(jnp.int32, (block_size, P), 1)
        d2 = jnp.where(col == idx[:, None], jnp.inf, d2)
        # 3 smallest via top_k on negated values
        neg_top3, _ = jax.lax.top_k(-d2, 3)  # (B, 3)
        mean3 = jnp.mean(-neg_top3, axis=-1)
        return jax.lax.dynamic_update_slice(out, mean3, (start,))

    out = jnp.zeros(num_blocks * block_size, dtype=jnp.float32)
    out = jax.lax.fori_loop(0, num_blocks, block_fn, out)
    return out[:P]
