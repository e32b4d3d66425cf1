"""Gaussian point-cloud model state: fixed-capacity padded parameter buffers.

Behavioral parity target: reference `scene/gaussian_model.py` (parameter
groups, activations, init-from-pcd, PLY snapshots). The torch version grows
and shrinks tensors in place with optimizer-state surgery; on TPU all shapes
must be static under jit, so parameters live in fixed-capacity buffers of
size `capacity >= count` with an `active` mask. Densification (see
models/densify.py) rewrites the buffers functionally; capacity growth is a
host-side event that re-pads to the next power of two.

Feature layout is [coeff, channel] like the reference (`_features_dc` is
(P, 1, 3), `_features_rest` (P, K-1, 3)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core.sh import num_sh_coeffs, rgb_to_sh
from ..core.transforms import inverse_sigmoid
from ..data.ply import PointCloud, load_gaussian_ply, save_gaussian_ply
from ..ops.knn import mean_sq_dist_3nn


@struct.dataclass
class GaussianParams:
    """Raw (pre-activation) learnable parameters, all shape (capacity, ...)."""

    xyz: jnp.ndarray  # (N, 3)
    f_dc: jnp.ndarray  # (N, 1, 3)
    f_rest: jnp.ndarray  # (N, K-1, 3)
    opacity: jnp.ndarray  # (N, 1) pre-sigmoid
    scaling: jnp.ndarray  # (N, 3) log-scale
    rotation: jnp.ndarray  # (N, 4) unnormalized quaternion (w, x, y, z)


@struct.dataclass
class GaussianModel:
    params: GaussianParams
    active: jnp.ndarray  # (N,) bool
    max_sh_degree: int = struct.field(pytree_node=False, default=1)
    active_sh_degree: int = struct.field(pytree_node=False, default=0)
    spatial_lr_scale: float = struct.field(pytree_node=False, default=1.0)

    @property
    def capacity(self) -> int:
        return self.params.xyz.shape[0]

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.active.astype(jnp.int32))

    # -- activations (reference `scene/gaussian_model.py:26-41`) -------------
    def get_scaling(self):
        return jnp.exp(self.params.scaling)

    def get_rotation(self):
        q = self.params.rotation
        return q / jnp.linalg.norm(q, axis=-1, keepdims=True)

    def get_opacity(self):
        return jax.nn.sigmoid(self.params.opacity)

    def get_features(self):
        return jnp.concatenate([self.params.f_dc, self.params.f_rest], axis=1)

    def one_up_sh_degree(self) -> "GaussianModel":
        if self.active_sh_degree < self.max_sh_degree:
            return self.replace(active_sh_degree=self.active_sh_degree + 1)
        return self


def next_pow2(n: int) -> int:
    return 1 << max(0, (int(n) - 1)).bit_length()


def create_from_pcd(
    pcd: PointCloud,
    spatial_lr_scale: float,
    max_sh_degree: int = 1,
    capacity: int | None = None,
    capacity_margin: float = 2.0,
) -> GaussianModel:
    """Initialize from a point cloud (reference `scene/gaussian_model.py:124-147`).

    * colors -> DC SH band, higher bands zero
    * log-scales from sqrt(mean 3-NN squared distance), isotropic
    * identity quaternions, opacity sigmoid^-1(0.1)
    """
    points = np.asarray(pcd.points, dtype=np.float32)
    colors = np.asarray(pcd.colors, dtype=np.float32)
    P = points.shape[0]
    K = num_sh_coeffs(max_sh_degree)
    if capacity is None:
        capacity = next_pow2(int(P * capacity_margin))

    dist2 = np.maximum(np.asarray(mean_sq_dist_3nn(jnp.asarray(points))), 1e-7)
    log_scales = np.log(np.sqrt(dist2))[:, None].repeat(3, axis=1)

    def padded(arr, fill=0.0):
        out = np.full((capacity,) + arr.shape[1:], fill, dtype=np.float32)
        out[:P] = arr
        return jnp.asarray(out)

    f_dc = np.asarray(rgb_to_sh(colors))[:, None, :]  # (P, 1, 3)
    rot = np.zeros((P, 4), dtype=np.float32)
    rot[:, 0] = 1.0
    opa = np.asarray(inverse_sigmoid(jnp.full((P, 1), 0.1, dtype=jnp.float32)))

    params = GaussianParams(
        xyz=padded(points),
        f_dc=padded(f_dc),
        f_rest=jnp.zeros((capacity, K - 1, 3), dtype=jnp.float32),
        opacity=padded(opa),
        # inactive rows get tiny scale so they render to nothing even if touched
        scaling=padded(log_scales, fill=-20.0),
        # identity quaternion everywhere (normalization of 0 is nan-prone)
        rotation=jnp.asarray(
            np.concatenate(
                [np.ones((capacity, 1), np.float32), np.zeros((capacity, 3), np.float32)], axis=1
            )
        ).at[:P].set(jnp.asarray(rot)),
    )
    active = jnp.zeros(capacity, dtype=bool).at[:P].set(True)
    return GaussianModel(
        params=params,
        active=active,
        max_sh_degree=max_sh_degree,
        active_sh_degree=0,
        spatial_lr_scale=float(spatial_lr_scale),
    )


def grow_capacity(model: GaussianModel, new_capacity: int) -> GaussianModel:
    """Host-side capacity growth: re-pad every buffer (active rows unchanged)."""
    old = model.capacity
    assert new_capacity >= old
    extra = new_capacity - old

    def pad(arr, fill):
        pad_block = jnp.full((extra,) + arr.shape[1:], fill, dtype=arr.dtype)
        return jnp.concatenate([arr, pad_block], axis=0)

    p = model.params
    params = GaussianParams(
        xyz=pad(p.xyz, 0.0),
        f_dc=pad(p.f_dc, 0.0),
        f_rest=pad(p.f_rest, 0.0),
        opacity=pad(p.opacity, 0.0),
        scaling=pad(p.scaling, -20.0),
        rotation=jnp.concatenate(
            [
                p.rotation,
                jnp.concatenate(
                    [jnp.ones((extra, 1), p.rotation.dtype), jnp.zeros((extra, 3), p.rotation.dtype)],
                    axis=1,
                ),
            ],
            axis=0,
        ),
    )
    active = jnp.concatenate([model.active, jnp.zeros(extra, dtype=bool)])
    return model.replace(params=params, active=active)


def save_ply(model: GaussianModel, path: str) -> None:
    """Snapshot active gaussians in the 3DGS PLY layout."""
    active = np.asarray(model.active)
    p = model.params
    save_gaussian_ply(
        path,
        np.asarray(p.xyz)[active],
        np.asarray(p.f_dc)[active],
        np.asarray(p.f_rest)[active],
        np.asarray(p.opacity)[active],
        np.asarray(p.scaling)[active],
        np.asarray(p.rotation)[active],
    )


def load_ply(
    path: str,
    max_sh_degree: int = 1,
    capacity: int | None = None,
    capacity_margin: float = 2.0,
    spatial_lr_scale: float = 1.0,
) -> GaussianModel:
    """Load a snapshot; active_sh_degree = max (reference `gaussian_model.py:256`)."""
    raw = load_gaussian_ply(path, max_sh_degree)
    P = raw["xyz"].shape[0]
    if capacity is None:
        capacity = next_pow2(int(P * capacity_margin))

    def padded(arr, fill=0.0):
        out = np.full((capacity,) + arr.shape[1:], fill, dtype=np.float32)
        out[:P] = arr
        return jnp.asarray(out)

    rot = np.zeros((capacity, 4), dtype=np.float32)
    rot[:, 0] = 1.0
    rot[:P] = raw["rotation"]
    params = GaussianParams(
        xyz=padded(raw["xyz"]),
        f_dc=padded(raw["f_dc"]),
        f_rest=padded(raw["f_rest"]),
        opacity=padded(raw["opacity"]),
        scaling=padded(raw["scaling"], fill=-20.0),
        rotation=jnp.asarray(rot),
    )
    active = jnp.zeros(capacity, dtype=bool).at[:P].set(True)
    return GaussianModel(
        params=params,
        active=active,
        max_sh_degree=max_sh_degree,
        active_sh_degree=max_sh_degree,
        spatial_lr_scale=spatial_lr_scale,
    )
