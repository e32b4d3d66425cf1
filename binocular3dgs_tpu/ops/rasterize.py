"""Production tiled rasterizer: project -> bin -> sort -> blend (custom VJP).

Drop-in replacement for ops/rasterize_reference.render_dense with the same
outputs (RenderOutput) and gradients, but O(pairs) instead of O(P * pixels):

  1. vertex stage (ops/project.py) — differentiable XLA
  2. tile binning + (tile, depth) sort (ops/binning.py) — integer XLA,
     wrapped in stop_gradient
  3. blend (ops/blend.py) — custom VJP; forward walks per-tile pair lists
     front-to-back, backward reconstructs transmittance by division from
     T_final, exactly like the CUDA kernels

Static capacities (jit-able): `pair_capacity = pairs_per_gaussian * N` and
`max_pairs_per_tile`; overflow is dropped (deepest pairs last) — callers can
inspect `RenderOutput.num_pairs` against capacity and re-jit larger.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RasterConfig
from ..core.camera import Camera
from ..models.gaussians import GaussianModel
from .binning import bin_gaussians, tile_grid
from .blend import BlendInputs, blend_backward_xla, blend_forward_xla
from .project import project_gaussians
from .rasterize_reference import RenderOutput

_DEFAULT_RASTER = RasterConfig()


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _blend(inputs: BlendInputs, pair_gauss, tile_start, tile_count, TW, TH, ts, mpt, chunk):
    rgb, dep, T_final, _ = blend_forward_xla(
        inputs, pair_gauss, tile_start, tile_count, TW, TH, ts, mpt, chunk
    )
    return rgb, dep, T_final


def _blend_fwd(inputs, pair_gauss, tile_start, tile_count, TW, TH, ts, mpt, chunk):
    rgb, dep, T_final, n_contrib = blend_forward_xla(
        inputs, pair_gauss, tile_start, tile_count, TW, TH, ts, mpt, chunk
    )
    res = (inputs, pair_gauss, tile_start, tile_count, T_final, n_contrib)
    return (rgb, dep, T_final), res


def _blend_bwd(TW, TH, ts, mpt, chunk, res, cotangents):
    inputs, pair_gauss, tile_start, tile_count, T_final, n_contrib = res
    d_rgb, d_dep, d_Tfin = cotangents
    grads = blend_backward_xla(
        inputs, pair_gauss, tile_start, tile_count, TW, TH, ts, mpt, chunk,
        T_final, n_contrib, d_rgb, d_dep, d_Tfin,
    )
    f0 = jax.dtypes.float0

    def int_zero(x):
        return np.zeros(x.shape, dtype=f0)

    return (grads, int_zero(pair_gauss), int_zero(tile_start), int_zero(tile_count))


_blend.defvjp(_blend_fwd, _blend_bwd)


# ---------------------------------------------------------------------------
# pallas backend: custom VJP at the (16, P) record level — gradients flow to
# per-gaussian arrays through the XLA-side gather that builds the records
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _blend_records_pallas(records, tile_start, tile_count, TW, TH, ts, chunk, interpret):
    from .blend_pallas import blend_forward_pallas

    rgb, dep, tfin, _ = blend_forward_pallas(
        records, tile_start, tile_count, TW, TH, ts, chunk, interpret
    )
    return rgb, dep, tfin


def _blend_records_pallas_fwd(records, tile_start, tile_count, TW, TH, ts, chunk, interpret):
    from .blend_pallas import blend_forward_pallas

    rgb, dep, tfin, nc = blend_forward_pallas(
        records, tile_start, tile_count, TW, TH, ts, chunk, interpret
    )
    return (rgb, dep, tfin), (records, tile_start, tile_count, tfin, nc)


def _blend_records_pallas_bwd(TW, TH, ts, chunk, interpret, res, cots):
    from .blend_pallas import blend_backward_pallas

    records, tile_start, tile_count, tfin, nc = res
    d_rgb, d_dep, d_tfin = cots
    d_records = blend_backward_pallas(
        records, tile_start, tile_count, tfin, nc, d_rgb, d_dep, d_tfin,
        TW, TH, ts, chunk, interpret,
    )
    f0 = jax.dtypes.float0
    return (
        d_records,
        np.zeros(tile_start.shape, dtype=f0),
        np.zeros(tile_count.shape, dtype=f0),
    )


_blend_records_pallas.defvjp(_blend_records_pallas_fwd, _blend_records_pallas_bwd)


def _blend_via_pallas(inputs: BlendInputs, binning, TW, TH, ts, chunk, interpret):
    from .binning import align_pairs
    from .blend_pallas import REC_ROWS

    binning = align_pairs(binning, chunk, TW * TH)
    fields = jnp.stack(
        [
            inputs.mean2d[:, 0],
            inputs.mean2d[:, 1],
            inputs.conic[:, 0],
            inputs.conic[:, 1],
            inputs.conic[:, 2],
            inputs.opacity,
            inputs.color[:, 0],
            inputs.color[:, 1],
            inputs.color[:, 2],
            inputs.depth,
        ],
        axis=0,
    )  # (10, N)
    fields = jnp.concatenate(
        [fields, jnp.zeros((REC_ROWS - fields.shape[0], fields.shape[1]), fields.dtype)],
        axis=0,
    )
    records = fields[:, binning.pair_gauss]  # (16, P) — differentiable gather
    # pad the pair axis so a partial final DMA chunk never reads out of bounds
    records = jnp.pad(records, ((0, 0), (0, chunk)))
    return _blend_records_pallas(
        records, binning.tile_start, binning.tile_count, TW, TH, ts, chunk, interpret
    )


def _tiles_to_image(tiles: jnp.ndarray, TW: int, TH: int, ts: int, H: int, W: int):
    """(T, S, ...) tile blocks -> (H, W, ...) image crop."""
    trailing = tiles.shape[2:]
    x = tiles.reshape((TH, TW, ts, ts) + trailing)
    x = jnp.moveaxis(x, 2, 1).reshape((TH * ts, TW * ts) + trailing)
    return x[:H, :W]


def render_tiled(
    camera: Camera,
    model: GaussianModel,
    bg: jnp.ndarray,
    scaling_modifier=1.0,
    override_color: jnp.ndarray | None = None,
    mean2d_carrier: jnp.ndarray | None = None,
    raster: RasterConfig = _DEFAULT_RASTER,
    tile_row_start=0,
    tile_rows: int | None = None,
) -> RenderOutput:
    """`tile_row_start` (traceable) + `tile_rows` (static) restrict rendering
    to a horizontal band of tile rows — the pixel-parallel sharding unit; the
    returned image then has height tile_rows * tile_size (uncropped)."""
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
        dilation=raster.dilation,
        znear_cull=raster.znear_cull,
        color_precomp=override_color,
        mean2d_carrier=mean2d_carrier,
    )

    W, H = camera.width, camera.height
    ts = raster.tile_size
    TW, TH = tile_grid(W, H, ts)
    band = tile_rows is not None
    rows = tile_rows if band else TH
    N = proj.mean2d.shape[0]
    pair_capacity = raster.pairs_per_gaussian * N

    binning = bin_gaussians(
        proj.mean2d, proj.radius, proj.depth, W, H, ts, pair_capacity,
        tile_row_start=tile_row_start, tile_rows=rows,
    )

    # the blend computes pixel coords from band-local tile ids, so shift the
    # splat centers into band-local pixel space (constant shift: carrier
    # gradients are unaffected)
    row_off_px = jnp.asarray(tile_row_start, jnp.float32) * ts if band else 0.0
    mean2d_blend = proj.mean2d - jnp.stack(
        [jnp.zeros((), jnp.float32), jnp.asarray(row_off_px, jnp.float32)]
    )
    inputs = BlendInputs(
        mean2d=mean2d_blend,
        conic=proj.conic,
        color=proj.color,
        opacity=proj.opacity,
        depth=proj.depth,
    )
    backend = raster.backend
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "pallas":
        interpret = jax.default_backend() != "tpu"
        rgb_t, dep_t, T_final_t = _blend_via_pallas(
            inputs, binning, TW, rows, ts, raster.pallas_chunk, interpret
        )
    else:
        mpt = min(raster.max_pairs_per_tile, pair_capacity)
        rgb_t, dep_t, T_final_t = _blend(
            inputs, binning.pair_gauss, binning.tile_start, binning.tile_count,
            TW, rows, ts, mpt, raster.chunk,
        )
    crop_h = rows * ts if band else H
    rgb = _tiles_to_image(rgb_t, TW, rows, ts, crop_h, W)
    dep = _tiles_to_image(dep_t[..., None], TW, rows, ts, crop_h, W)[..., 0]
    T_final = _tiles_to_image(T_final_t[..., None], TW, rows, ts, crop_h, W)[..., 0]

    image = rgb + T_final[..., None] * bg[None, None, :]
    alpha = 1.0 - T_final
    return RenderOutput(
        image=image, depth=dep, alpha=alpha, radii=proj.radius, visible=proj.radius > 0
    )
