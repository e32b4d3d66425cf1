"""Gaussian preprocessing: projection, EWA splatting covariance, culling, SH color.

This is the differentiable "vertex stage" shared by the dense oracle renderer
and the tile-binned production rasterizer. The math reproduces the behavior
contract of diff-gaussian-rasterization's forward preprocess (SURVEY.md §3.5):

  * perspective projection through the row-convention full_proj matrix with
    the 1e-7-guarded homogeneous divide
  * view-space depth cull at z <= 0.2
  * EWA: cov2d = J W Sigma W^T J^T with the +0.3 pixel dilation and the
    1.3*tan(fov) frustum clamp on the Jacobian linearization point
  * radius = ceil(3 * sqrt(max eigenvalue)), conic = inverse covariance
  * SH -> RGB with the +0.5 shift and clamp at 0

All of it is plain jnp (vectorized over the capacity axis) and thus fully
XLA-fusable and differentiable; no custom VJP is needed at this stage.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from ..core.camera import Camera
from ..core.sh import eval_sh


class ProjectedGaussians(NamedTuple):
    mean2d: jnp.ndarray  # (N, 2) pixel coords of the splat center
    depth: jnp.ndarray  # (N,) view-space z
    conic: jnp.ndarray  # (N, 3) inverse 2D covariance (a, b, c)
    color: jnp.ndarray  # (N, 3) RGB after SH evaluation
    opacity: jnp.ndarray  # (N,) post-sigmoid opacity
    radius: jnp.ndarray  # (N,) float screen radius in pixels (0 => culled)
    visible: jnp.ndarray  # (N,) bool
    bin_extent: jnp.ndarray  # (N, 2) tight per-axis binning extents (px)


def compute_cov3d(scaling: jnp.ndarray, rotation_raw: jnp.ndarray, scaling_modifier=1.0):
    """Sigma = (R S)(R S)^T from activated scales and raw quaternions,
    packed as (N, 6): (xx, xy, xz, yy, yz, zz) — the reference CUDA layout.

    Component-wise on (N,) arrays: rank-3 (N, 3, 3) intermediates force the
    TPU T(k, 128) tiled layout on the tiny trailing dims (128/3 lanes
    wasted) and measured ~3.5 ms per fusion in the projection VJP; the
    scalarized form fuses into plain (N,)-lane elementwise code.
    """
    q = rotation_raw / jnp.linalg.norm(rotation_raw, axis=-1, keepdims=True)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    # rotation matrix rows (reference utils/general_utils.py:78-101)
    R00 = 1 - 2 * (y * y + z * z)
    R01 = 2 * (x * y - r * z)
    R02 = 2 * (x * z + r * y)
    R10 = 2 * (x * y + r * z)
    R11 = 1 - 2 * (x * x + z * z)
    R12 = 2 * (y * z - r * x)
    R20 = 2 * (x * z - r * y)
    R21 = 2 * (y * z + r * x)
    R22 = 1 - 2 * (x * x + y * y)
    s0 = scaling_modifier * scaling[..., 0]
    s1 = scaling_modifier * scaling[..., 1]
    s2 = scaling_modifier * scaling[..., 2]
    # L = R diag(s); Sigma = L L^T => Sigma_ik = sum_j R_ij R_kj s_j^2
    a0, a1, a2 = s0 * s0, s1 * s1, s2 * s2
    xx = R00 * R00 * a0 + R01 * R01 * a1 + R02 * R02 * a2
    xy = R00 * R10 * a0 + R01 * R11 * a1 + R02 * R12 * a2
    xz = R00 * R20 * a0 + R01 * R21 * a1 + R02 * R22 * a2
    yy = R10 * R10 * a0 + R11 * R11 * a1 + R12 * R12 * a2
    yz = R10 * R20 * a0 + R11 * R21 * a1 + R12 * R22 * a2
    zz = R20 * R20 * a0 + R21 * R21 * a1 + R22 * R22 * a2
    return jnp.stack([xx, xy, xz, yy, yz, zz], axis=-1)


def ewa_cov2d(
    xyz: jnp.ndarray,
    cov3d: jnp.ndarray,
    camera: Camera,
    dilation: float = 0.3,
    valid: jnp.ndarray | None = None,
):
    """Project 3D covariances to screen space (2x2), returns (N, 3) packed
    (xx, xy, yy) *after* adding the low-pass dilation.

    `cov3d` is (N, 6) packed (xx, xy, xz, yy, yz, zz) or (N, 3, 3) dense.
    `valid` masks rows whose view-space point is usable (z > cull); invalid
    rows are computed at a safe dummy point to keep all arithmetic finite
    (NaNs would otherwise leak through `where` into gradients).

    Fully component-wise (no (N, 2, 3)/(N, 2, 2) batched-matrix
    intermediates — see compute_cov3d docstring for why).
    """
    if cov3d.ndim == 3:
        cov3d = jnp.stack(
            [
                cov3d[..., 0, 0], cov3d[..., 0, 1], cov3d[..., 0, 2],
                cov3d[..., 1, 1], cov3d[..., 1, 2], cov3d[..., 2, 2],
            ],
            axis=-1,
        )
    Wm = camera.world_view.T[:3, :3]  # actual W2C rotation (applied to col vectors)
    ones = jnp.ones_like(xyz[..., :1])
    t = (jnp.concatenate([xyz, ones], axis=-1) @ camera.world_view)[..., :3]  # view space
    if valid is not None:
        t = jnp.where(valid[..., None], t, jnp.asarray([0.0, 0.0, 1.0], dtype=t.dtype))
    fx = camera.focal_x
    fy = camera.focal_y
    limx = 1.3 * camera.tanfovx
    limy = 1.3 * camera.tanfovy
    tz = t[..., 2]
    txtz = jnp.clip(t[..., 0] / tz, -limx, limx) * tz
    tytz = jnp.clip(t[..., 1] / tz, -limy, limy) * tz
    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    # J is the 2x3 Jacobian of the perspective projection at the clamped
    # point: row 0 = (fx/z, 0, -fx tx/z^2), row 1 = (0, fy/z, -fy ty/z^2).
    j00 = fx * inv_z
    j02 = -fx * txtz * inv_z2
    j11 = fy * inv_z
    j12 = -fy * tytz * inv_z2
    # T = J W (2x3), rows expanded against the static 3x3 W
    T00 = j00 * Wm[0, 0] + j02 * Wm[2, 0]
    T01 = j00 * Wm[0, 1] + j02 * Wm[2, 1]
    T02 = j00 * Wm[0, 2] + j02 * Wm[2, 2]
    T10 = j11 * Wm[1, 0] + j12 * Wm[2, 0]
    T11 = j11 * Wm[1, 1] + j12 * Wm[2, 1]
    T12 = j11 * Wm[1, 2] + j12 * Wm[2, 2]
    cxx, cxy, cxz = cov3d[..., 0], cov3d[..., 1], cov3d[..., 2]
    cyy, cyz, czz = cov3d[..., 3], cov3d[..., 4], cov3d[..., 5]
    # cov2d = T Sigma T^T: first U = T Sigma (2x3), then U T^T (symmetric 2x2)
    U00 = T00 * cxx + T01 * cxy + T02 * cxz
    U01 = T00 * cxy + T01 * cyy + T02 * cyz
    U02 = T00 * cxz + T01 * cyz + T02 * czz
    U10 = T10 * cxx + T11 * cxy + T12 * cxz
    U11 = T10 * cxy + T11 * cyy + T12 * cyz
    U12 = T10 * cxz + T11 * cyz + T12 * czz
    xx = U00 * T00 + U01 * T01 + U02 * T02 + dilation
    xy = U10 * T00 + U11 * T01 + U12 * T02
    yy = U10 * T10 + U11 * T11 + U12 * T12 + dilation
    return jnp.stack([xx, xy, yy], axis=-1)


def project_gaussians(
    xyz: jnp.ndarray,  # (N, 3)
    scaling: jnp.ndarray,  # (N, 3) activated (exp'd)
    rotation_raw: jnp.ndarray,  # (N, 4)
    opacity: jnp.ndarray,  # (N,) activated (sigmoid'd)
    features: jnp.ndarray,  # (N, K, 3) SH coeffs, [coeff, channel]
    active: jnp.ndarray,  # (N,) bool
    camera: Camera,
    sh_degree: int,
    scaling_modifier=1.0,
    dilation: float = 0.3,
    znear_cull: float = 0.2,
    color_precomp: jnp.ndarray | None = None,
    cov3d_precomp: jnp.ndarray | None = None,
    mean2d_carrier: jnp.ndarray | None = None,
) -> ProjectedGaussians:
    """Vectorized vertex stage.

    `mean2d_carrier`: optional (N, 2) zeros added to the projected center in
    *NDC half-extent units* — its cotangent is exactly the reference's
    `means2D.grad` used for densification stats (`scene/gaussian_model.py:409`).
    """
    N = xyz.shape[0]
    ones = jnp.ones((N, 1), dtype=xyz.dtype)
    xyz1 = jnp.concatenate([xyz, ones], axis=-1)

    p_view = xyz1 @ camera.world_view
    depth = p_view[..., 2]
    in_front = depth > znear_cull

    p_hom = xyz1 @ camera.full_proj
    # sanitize the homogeneous divide for culled points (w ~ 0 behind camera)
    w_hom = jnp.where(in_front, p_hom[..., 3], 1.0)
    p_w = 1.0 / (w_hom + 1e-7)
    ndc = p_hom[..., :3] * p_w[..., None]

    W, H = camera.width, camera.height
    # ndc2pix: ((v + 1) * S - 1) / 2
    px = ((ndc[..., 0] + 1.0) * W - 1.0) * 0.5
    py = ((ndc[..., 1] + 1.0) * H - 1.0) * 0.5
    mean2d = jnp.stack([px, py], axis=-1)
    if mean2d_carrier is not None:
        # carrier is in NDC half-extent units: pixel = carrier * (0.5*W, 0.5*H)
        mean2d = mean2d + mean2d_carrier * jnp.asarray([0.5 * W, 0.5 * H], dtype=mean2d.dtype)

    if cov3d_precomp is not None:
        cov3d = cov3d_precomp
    else:
        cov3d = compute_cov3d(scaling, rotation_raw, scaling_modifier)
    cov2d = ewa_cov2d(xyz, cov3d, camera, dilation, valid=in_front)  # (N, 3) xx, xy, yy

    det = cov2d[..., 0] * cov2d[..., 2] - cov2d[..., 1] * cov2d[..., 1]
    det_ok = det > 0.0
    det_safe = jnp.where(det_ok, det, 1.0)
    inv_det = 1.0 / det_safe
    conic = jnp.stack(
        [cov2d[..., 2] * inv_det, -cov2d[..., 1] * inv_det, cov2d[..., 0] * inv_det], axis=-1
    )

    mid = 0.5 * (cov2d[..., 0] + cov2d[..., 2])
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda1 = mid + disc
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, 0.0)))

    visible = active & in_front & det_ok
    radius = jnp.where(visible, radius, 0.0)

    # Tight per-axis BINNING extents — lossless pair-count reduction. A pair
    # contributes to a pixel only when BOTH (a) the blend keeps it:
    # alpha = opa*exp(power) >= ALPHA_MIN (1/255), i.e. mahalanobis distance
    # <= d_max = sqrt(2 ln(255*opa)) whose axis-aligned extent is
    # d_max*sqrt(cov_axis), and (b) the pixel's tile intersects the CUDA
    # getRect square of half-width `radius` (the reference's coverage rule,
    # kept by the dense oracle). Binning with the per-axis min of the two
    # therefore drops only tiles with exactly-zero contribution: rendered
    # output and gradients are unchanged, and the REPORTED radius keeps
    # reference densification semantics. Opacity decay drives opacities down
    # over training, so this shrinks the pair list exactly where the
    # workload grows.
    # +1 px slack: the getRect tmax formula floor((px+r+ts-1)/ts) assumes the
    # fractional part of px is absorbed by an over-ceiled radius; a raw
    # fractional extent can miss the last tile by < 1 px. Capped at `radius`
    # so coverage never exceeds the reference rect (beyond which the
    # reference composites nothing even at alpha >= 1/255).
    d_max = jnp.sqrt(jnp.maximum(2.0 * jnp.log(255.0 * opacity), 0.0))
    ext = jnp.stack(
        [
            jnp.minimum(
                d_max * jnp.sqrt(jnp.maximum(cov2d[..., 0], 0.0)) + 1.0, radius
            ),
            jnp.minimum(
                d_max * jnp.sqrt(jnp.maximum(cov2d[..., 2], 0.0)) + 1.0, radius
            ),
        ],
        axis=-1,
    )
    bin_extent = jax.lax.stop_gradient(
        jnp.where((visible & (d_max > 0.0))[..., None], ext, 0.0)
    )
    # sanitize every per-gaussian output for invisible rows so no non-finite
    # value (or spurious gradient) can leak into the blend
    mean2d = jnp.where(visible[..., None], mean2d, 0.0)
    conic = jnp.where(
        visible[..., None], conic, jnp.asarray([1.0, 0.0, 1.0], dtype=conic.dtype)
    )
    depth = jnp.where(visible, depth, 0.0)
    opacity = jnp.where(visible, opacity, 0.0)

    if color_precomp is not None:
        color = color_precomp
    else:
        dir_pp = xyz - camera.cam_center
        norm = jnp.sqrt(jnp.sum(dir_pp * dir_pp, axis=-1, keepdims=True))
        dir_pp = dir_pp / jnp.maximum(norm, 1e-8)
        # features are [coeff, channel]; eval_sh wants [..., channel, coeff]
        sh = jnp.swapaxes(features, -1, -2)
        color = jnp.maximum(eval_sh(sh_degree, sh, dir_pp) + 0.5, 0.0)

    return ProjectedGaussians(
        mean2d=mean2d,
        depth=depth,
        conic=conic,
        color=color,
        opacity=opacity,
        radius=radius,
        visible=visible,
        bin_extent=bin_extent,
    )
