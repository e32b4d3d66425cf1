"""Dense reference renderer — the golden oracle.

O(pixels * gaussians) differentiable forward reproducing the exact
compositing semantics of the CUDA tile rasterizer (behavior spec SURVEY.md
§3.5 / reference `gaussian_renderer/__init__.py:85-103`):

  * depth-sorted front-to-back alpha blending per pixel
  * alpha = min(0.99, opacity * exp(power)), skipped when power > 0 or
    alpha < 1/255
  * termination: a gaussian that would push transmittance below 1e-4 is not
    composited and blending stops (emulated with masked cumulative products)
  * outputs rgb (+ T_final * bg), unnormalized alpha-weighted view-z depth
    (ashawkey fork behavior consumed by the disparity loss, `train.py:131`),
    alpha = 1 - T_final, and integer radii for the densification filter

Used for correctness tests of the production tiled/Pallas rasterizer and as
a CPU-runnable fallback. Everything is pure jnp => autodiff gives exact
gradients, including through depth and alpha.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..core.camera import Camera
from ..models.gaussians import GaussianModel
from .project import ProjectedGaussians, project_gaussians

ALPHA_MIN = 1.0 / 255.0
T_MIN = 1e-4
ALPHA_CLAMP = 0.99


@struct.dataclass
class RenderOutput:
    image: jnp.ndarray  # (3, H, W) — channels-first (planar): a trailing
    # channel dim of 3 would be padded to 128 lanes by the TPU tiled layout
    # (42x memory blowup on every image-space op, measured ~1-4 ms/fusion)
    depth: jnp.ndarray  # (H, W)
    alpha: jnp.ndarray  # (H, W)
    radii: jnp.ndarray  # (N,) float; 0 => culled
    visible: jnp.ndarray  # (N,) bool (radii > 0)
    # Pair-list pressure (tiled rasterizer only; None from the dense oracle):
    # total wanted (tile, gaussian) pairs BEFORE capacity truncation, and the
    # largest single tile's wanted pair count. When num_pairs exceeds
    # pairs_per_gaussian * capacity (or max_tile_pairs exceeds
    # max_pairs_per_tile on the XLA backend) the deepest splats silently
    # vanish — Trainer watches these and grows the capacity (re-jit).
    num_pairs: jnp.ndarray | None = None  # () int32
    max_tile_pairs: jnp.ndarray | None = None  # () int32
    pair_capacity: jnp.ndarray | None = None  # () int32 static capacity baked in


def blend_dense(
    proj: ProjectedGaussians,
    width: int,
    height: int,
    bg: jnp.ndarray,
    alpha_min: float = ALPHA_MIN,
    t_min: float = T_MIN,
    alpha_clamp: float = ALPHA_CLAMP,
    tile_size: int = 16,
):
    """Per-pixel front-to-back composite of all gaussians (dense).

    `tile_size` reproduces the CUDA rasterizer's tile-granular culling: a
    gaussian only touches pixels whose 16x16 tile intersects its radius bbox
    (even pixels beyond 3 sigma inside such tiles *are* composited, and
    pixels outside the bbox's tiles are not — exact CUDA semantics).
    """
    from .binning import tile_grid, tile_rect

    order = jnp.argsort(jnp.where(proj.visible, proj.depth, jnp.inf))
    mean2d = proj.mean2d[order]
    conic = proj.conic[order]
    color = proj.color[order]
    opacity = jnp.where(proj.visible, proj.opacity, 0.0)[order]
    depth = proj.depth[order]
    radius = proj.radius[order]

    n = mean2d.shape[0]
    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    dx = jnp.broadcast_to(mean2d[None, None, :, 0] - xs[None, :, None], (height, width, n))
    dy = jnp.broadcast_to(mean2d[None, None, :, 1] - ys[:, None, None], (height, width, n))

    a, b, c = conic[:, 0], conic[:, 1], conic[:, 2]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy  # (H, W, N)
    alpha = jnp.minimum(alpha_clamp, opacity * jnp.exp(power))
    alpha = jnp.where((power > 0.0) | (alpha < alpha_min), 0.0, alpha)

    # tile-granular bbox culling (CUDA binning semantics)
    TW, TH = tile_grid(width, height, tile_size)
    tmin_x, tmin_y, tmax_x, tmax_y = tile_rect(mean2d, radius, tile_size, TW, TH)
    ptx = (xs.astype(jnp.int32) // tile_size)[None, :, None]  # (1, W, 1)
    pty = (ys.astype(jnp.int32) // tile_size)[:, None, None]  # (H, 1, 1)
    covered = (
        (ptx >= tmin_x[None, None, :])
        & (ptx < tmax_x[None, None, :])
        & (pty >= tmin_y[None, None, :])
        & (pty < tmax_y[None, None, :])
    )
    alpha = jnp.where(covered, alpha, 0.0)

    # termination semantics: first gaussian whose inclusion drops T below t_min
    # kills blending (itself excluded); emulate with raw cumprod + masks.
    one_minus = 1.0 - alpha
    T_incl_raw = jnp.cumprod(one_minus, axis=-1)
    T_before_raw = jnp.concatenate(
        [jnp.ones_like(T_incl_raw[..., :1]), T_incl_raw[..., :-1]], axis=-1
    )
    kill = T_before_raw * one_minus < t_min
    killed_up_to = jnp.cumsum(kill.astype(jnp.int32), axis=-1) > 0  # inclusive
    keep = ~killed_up_to

    alpha_eff = jnp.where(keep, alpha, 0.0)
    T_incl = jnp.cumprod(1.0 - alpha_eff, axis=-1)
    T_before = jnp.concatenate([jnp.ones_like(T_incl[..., :1]), T_incl[..., :-1]], axis=-1)
    w = alpha_eff * T_before  # (H, W, N)

    image = jnp.einsum("hwn,nc->chw", w, color) + T_incl[..., -1][None] * bg[:, None, None]
    depth_out = w @ depth
    alpha_out = 1.0 - T_incl[..., -1]
    return image, depth_out, alpha_out


def render_dense(
    camera: Camera,
    model: GaussianModel,
    bg: jnp.ndarray,
    scaling_modifier=1.0,
    override_color: jnp.ndarray | None = None,
    mean2d_carrier: jnp.ndarray | None = None,
    dilation: float = 0.3,
    znear_cull: float = 0.2,
) -> RenderOutput:
    """Full render matching the reference render() contract
    (`gaussian_renderer/__init__.py:18-103`)."""
    proj = project_gaussians(
        xyz=model.params.xyz,
        scaling=model.get_scaling(),
        rotation_raw=model.params.rotation,
        opacity=model.get_opacity()[..., 0],
        features=model.get_features(),
        active=model.active,
        camera=camera,
        sh_degree=model.active_sh_degree,
        scaling_modifier=scaling_modifier,
        dilation=dilation,
        znear_cull=znear_cull,
        color_precomp=override_color,
        mean2d_carrier=mean2d_carrier,
    )
    image, depth, alpha = blend_dense(proj, camera.width, camera.height, bg)
    return RenderOutput(
        image=image,
        depth=depth,
        alpha=alpha,
        radii=proj.radius,
        visible=proj.radius > 0,
    )
