"""Geometric transforms: quaternions, covariances, camera matrices, schedules.

Behavioral parity targets:
  * quaternion -> rotation, L = R @ diag(s): reference `utils/general_utils.py:78-110`
  * world-to-view / projection builders: reference `utils/graphics_utils.py:31-77`
  * exponential (log-lerp) learning rate schedule: reference `utils/general_utils.py:29-62`

Convention note. The reference stores camera matrices *transposed* so points
multiply as row vectors: ``p_clip = [p, 1] @ full_proj``. We adopt the same
row-vector convention for all on-device 4x4 matrices (`world_view`, `proj`,
`full_proj`), so exported cameras/checkpoints interoperate bit-for-bit with
3DGS tooling.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Normalized quaternion(s) [..., 4] (w, x, y, z) -> rotation [..., 3, 3]."""
    norm = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
    q = q / norm
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def build_scaling_rotation(s: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """L = R @ diag(s), [..., 3, 3] (reference `utils/general_utils.py:101`)."""
    R = quat_to_rotmat(q)
    return R * s[..., None, :]


def covariance_from_scaling_rotation(
    scaling: jnp.ndarray, scaling_modifier, rotation: jnp.ndarray
) -> jnp.ndarray:
    """Full 3D covariance Sigma = L L^T, [..., 3, 3]."""
    L = build_scaling_rotation(scaling_modifier * scaling, rotation)
    return L @ jnp.swapaxes(L, -1, -2)


def strip_symmetric(cov: jnp.ndarray) -> jnp.ndarray:
    """Upper-triangular 6-vector (xx, xy, xz, yy, yz, zz) of [..., 3, 3]."""
    return jnp.stack(
        [
            cov[..., 0, 0],
            cov[..., 0, 1],
            cov[..., 0, 2],
            cov[..., 1, 1],
            cov[..., 1, 2],
            cov[..., 2, 2],
        ],
        axis=-1,
    )


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


def fov2focal(fov: float, pixels: int) -> float:
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal2fov(focal: float, pixels: int) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))


def world_to_view(
    R: np.ndarray,
    t: np.ndarray,
    translate: np.ndarray | None = None,
    scale: float = 1.0,
) -> np.ndarray:
    """4x4 world-to-camera matrix (column-vector convention), host-side numpy.

    `R` is the camera-to-world rotation (COLMAP R transposed, as the data layer
    produces), `t` the world-to-camera translation. Optional `translate`/`scale`
    move the camera center in world space (reference `utils/graphics_utils.py:38-49`).
    """
    Rt = np.zeros((4, 4), dtype=np.float64)
    Rt[:3, :3] = R.transpose()
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    if translate is None and scale == 1.0:
        return Rt.astype(np.float32)
    C2W = np.linalg.inv(Rt)
    center = C2W[:3, 3]
    center = (center + (0.0 if translate is None else translate)) * scale
    C2W[:3, 3] = center
    return np.linalg.inv(C2W).astype(np.float32)


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """Perspective projection (column-vector convention), host-side numpy.

    Matches reference `utils/graphics_utils.py:51-71`: maps view z in
    [znear, zfar] to NDC z in [~0, 1] without the -znear offset of standard GL.
    """
    tan_half_fovx = math.tan(fovx / 2.0)
    tan_half_fovy = math.tan(fovy / 2.0)
    P = np.zeros((4, 4), dtype=np.float64)
    P[0, 0] = 1.0 / tan_half_fovx
    P[1, 1] = 1.0 / tan_half_fovy
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    P[3, 2] = 1.0
    return P.astype(np.float32)


def expon_lr_schedule(
    lr_init: float,
    lr_final: float,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
    max_steps: int = 1_000_000,
):
    """Log-linear decay with optional warmup easing (reference `utils/general_utils.py:29`).

    Returns a function usable both with python ints (host) and traced arrays
    (inside jit).
    """

    def helper(step):
        if lr_init == 0.0 and lr_final == 0.0:
            return jnp.zeros_like(jnp.asarray(step, dtype=jnp.float32))
        step = jnp.asarray(step, dtype=jnp.float32)
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
            )
        else:
            delay_rate = 1.0
        t = jnp.clip(step / max_steps, 0.0, 1.0)
        log_lerp = jnp.exp(math.log(lr_init) * (1 - t) + math.log(lr_final) * t)
        lr = delay_rate * log_lerp
        # Reference returns 0.0 for negative steps.
        return jnp.where(step < 0, 0.0, lr)

    return helper
