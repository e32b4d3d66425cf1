"""Production tiled rasterizer: project -> bin -> sort -> blend (custom VJP).

Drop-in replacement for ops/rasterize_reference.render_dense with the same
outputs (RenderOutput) and gradients, but O(pairs) instead of O(P * pixels):

  1. vertex stage (ops/project.py) — differentiable XLA
  2. field-major record table (16, N) built from the vertex outputs, then
     depth-reordered once (ops/binning.py orders gaussians by view depth so
     pair sort keys need no depth component)
  3. tile binning + packed-key sort (ops/binning.py) — integer XLA, wrapped
     in stop_gradient
  4. blend (ops/blend.py XLA scan or ops/blend_pallas.py TPU kernels) —
     custom VJP; forward walks per-tile pair lists front-to-back, backward
     reconstructs transmittance by division from T_final, exactly like the
     CUDA kernels (reference consumer contract: SURVEY.md §3.5)

Static capacity (jit-able): `pair_capacity = pairs_per_gaussian * N`;
overflow is dropped (deepest pairs last) — callers can inspect
`RenderOutput.num_pairs` against capacity and re-jit larger.
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
# per-gaussian arrays through the XLA-side gathers that build the records
# (depth reorder, then pair gather)
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _blend_records_pallas(records, tile_start, tile_count, TW, TH, ts, chunk, interpret, group):
    """Returns the raw merged (5, T, S) kernel output planes (r g b depth
    T_final); callers slice/reshape it with plain XLA ops so the custom VJP
    sees one (5, T, S) cotangent, matching blend_backward_pallas's
    d_out5."""
    from .blend_pallas import blend_forward_pallas

    out5, _ = blend_forward_pallas(
        records, tile_start, tile_count, TW, TH, ts, chunk, interpret, group
    )
    return out5


def _blend_records_pallas_fwd(records, tile_start, tile_count, TW, TH, ts, chunk, interpret, group):
    from .blend_pallas import blend_forward_pallas

    out5, nc = blend_forward_pallas(
        records, tile_start, tile_count, TW, TH, ts, chunk, interpret, group
    )
    return out5, (records, tile_start, tile_count, out5, nc)


def _blend_records_pallas_bwd(TW, TH, ts, chunk, interpret, group, res, d_out5):
    from .blend_pallas import blend_backward_pallas

    records, tile_start, tile_count, out5, nc = res
    d_records = blend_backward_pallas(
        records, tile_start, tile_count, out5, nc, d_out5,
        TW, TH, ts, chunk, interpret, group,
    )
    f0 = jax.dtypes.float0
    return (
        d_records,
        np.zeros(tile_start.shape, dtype=f0),
        np.zeros(tile_count.shape, dtype=f0),
    )


_blend_records_pallas.defvjp(_blend_records_pallas_fwd, _blend_records_pallas_bwd)


@jax.custom_vjp
def _reorder_fields(fields, order, inv_order):
    """fields[:, order] with a gather-based VJP: XLA's transpose of a
    permutation gather is a scatter (~3 ms at (16, 100k) on a v5e); gathering
    by the inverse permutation is ~10x cheaper."""
    return fields[:, order]


def _reorder_fields_fwd(fields, order, inv_order):
    return fields[:, order], inv_order


def _reorder_fields_bwd(inv_order, d_fd):
    f0 = jax.dtypes.float0
    return (
        d_fd[:, inv_order],
        np.zeros(inv_order.shape, dtype=f0),
        np.zeros(inv_order.shape, dtype=f0),
    )


_reorder_fields.defvjp(_reorder_fields_fwd, _reorder_fields_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _gather_records(fields_d, pair_gauss, rank_offsets, num_pairs, chunk, n, sort_bf16=False):
    """records = fields_d[:, pair_gauss] (+ chunk padding), with a custom VJP.

    XLA's VJP of the pair gather is a scatter-add of (16, P) into (16, N)
    (~12 ms at 800k pairs on a v5e). The transpose here sorts the cotangent
    ROWS as sort payloads keyed by gaussian rank (lax.sort with 10 f32
    payload rows — an explicit argsort + permutation gather of the same
    data costs 5.4 ms, TPU gathers being pathological while its sort is
    fast) and segment-sums them with one cumsum + boundary gathers.

    Per-rank segment bounds come from the binning's `rank_offsets`
    (emission-order prefix sums) — NOT from a searchsorted over the pair
    axis: searchsorted(method='sort') concatenates and re-sorts 900k keys,
    measured 5.3 ms/render on a v5e; the bounds arithmetic below is free.
    Bound bookkeeping: emission order is rank-major, so truncation at pair
    capacity drops a SUFFIX of emission slots; valid pairs of rank g occupy
    [clip(off[g], 0, Pv), clip(off[g+1], 0, Pv)) of the valid region, and
    the P - Pv invalid tail pairs sort into rank 0's segment (their keys
    are 0) where their exactly-zero cotangents (the blend backward only
    writes inside tile segments onto a pre-zeroed buffer) are a no-op.

    The chunk padding (so a partial final DMA never reads OOB) is folded
    into the gather index — the pad columns hold rank 0's values, which
    every consumer masks by count.
    """
    idx = jnp.concatenate([pair_gauss, jnp.zeros(chunk, jnp.int32)])
    return fields_d[:, idx]


def _gather_records_fwd(fields_d, pair_gauss, rank_offsets, num_pairs, chunk, n, sort_bf16=False):
    out = _gather_records(fields_d, pair_gauss, rank_offsets, num_pairs, chunk, n, sort_bf16)
    return out, (pair_gauss, rank_offsets, num_pairs)


def _gather_records_bwd(chunk, n, sort_bf16, res, d_records):
    from .blend_pallas import REC_ROWS

    pair_gauss, rank_offsets, num_pairs = res
    P = pair_gauss.shape[0]
    # rows 10..15 are alignment padding with exactly-zero cotangents (the
    # blend backward writes zeros there) — keep them out of the sort and
    # the cumsum, which are HBM-bound on the pair axis
    live = 10
    d = d_records[:live, :P]
    if sort_bf16:
        # halve the sort's payload bytes: 10 f32 rows ride as 5 bf16-pair
        # words (bitcast — the sort moves bits verbatim); costs bf16
        # rounding on individual cotangents BEFORE the f32 segment cumsum
        db = d.astype(jnp.bfloat16)
        packed = tuple(
            jax.lax.bitcast_convert_type(
                jnp.stack([db[2 * i], db[2 * i + 1]], axis=-1), jnp.float32
            )
            for i in range(live // 2)
        )
        sorted_all = jax.lax.sort((pair_gauss,) + packed, num_keys=1, is_stable=False)
        rows = []
        for arr in sorted_all[1:]:
            two = jax.lax.bitcast_convert_type(arr, jnp.bfloat16)
            rows += [two[..., 0], two[..., 1]]
        d_sorted = jnp.stack(rows, axis=0).astype(jnp.float32)
    else:
        sorted_all = jax.lax.sort(
            (pair_gauss,) + tuple(d[i] for i in range(live)), num_keys=1, is_stable=False
        )
        d_sorted = jnp.stack(sorted_all[1:], axis=0)
    csum = jnp.cumsum(d_sorted, axis=1)
    Pv = jnp.minimum(num_pairs, P).astype(jnp.int32)
    tail = P - Pv  # invalid pairs, sorted into rank 0 (zero cotangents)
    off = jnp.clip(rank_offsets, 0, Pv)
    lo = jnp.where(jnp.arange(n, dtype=jnp.int32) > 0, off[:-1] + tail, 0)
    hi = off[1:] + tail
    idx = jnp.maximum(jnp.concatenate([hi, lo]) - 1, 0)  # one combined gather
    both = csum[:, idx]
    hi_v = jnp.where(hi > 0, both[:, :n], 0.0)
    lo_v = jnp.where(lo > 0, both[:, n:], 0.0)
    out = jnp.concatenate(
        [hi_v - lo_v, jnp.zeros((REC_ROWS - live, n), d_records.dtype)], axis=0
    )
    f0 = jax.dtypes.float0
    return (
        out,
        np.zeros(pair_gauss.shape, dtype=f0),
        np.zeros(rank_offsets.shape, dtype=f0),
        np.zeros(num_pairs.shape, dtype=f0),
    )


_gather_records.defvjp(_gather_records_fwd, _gather_records_bwd)


def _build_fields(proj, mean2d):
    """Field-major (REC_ROWS, N) record table. Rows 0-9 are the blend record
    layout (blend_pallas.py docstring); row 10 carries the (non-diff) screen
    radius for binning."""
    from .blend_pallas import REC_ROWS

    fields = jnp.stack(
        [
            mean2d[:, 0],
            mean2d[:, 1],
            proj.conic[:, 0],
            proj.conic[:, 1],
            proj.conic[:, 2],
            proj.opacity,
            proj.color[:, 0],
            proj.color[:, 1],
            proj.color[:, 2],
            proj.depth,
            jax.lax.stop_gradient(proj.radius),
        ],
        axis=0,
    )
    return jnp.concatenate(
        [fields, jnp.zeros((REC_ROWS - fields.shape[0], fields.shape[1]), fields.dtype)],
        axis=0,
    )


def _tiles_to_planes(tiles: jnp.ndarray, TW: int, TH: int, ts: int, H: int, W: int):
    """(K, T, S) per-tile channel planes -> (K, H, W) planar image crop.

    Planar (channels-first) everywhere on purpose: any array with a tiny
    trailing dim (3/5/6) gets the TPU T(8,128) tiled layout padded to 128
    lanes (up to 42x memory blowup on every op touching it)."""
    K = tiles.shape[0]
    x = tiles.reshape(K, TH, TW, ts, ts)
    x = jnp.transpose(x, (0, 1, 3, 2, 4)).reshape(K, TH * ts, TW * ts)
    return x[:, :H, :W]


def project_for_render(
    camera: Camera,
    model: GaussianModel,
    scaling_modifier=1.0,
    override_color: jnp.ndarray | None = None,
    mean2d_carrier: jnp.ndarray | None = None,
    raster: RasterConfig = _DEFAULT_RASTER,
):
    """The differentiable vertex stage of render_tiled, exposed separately so
    the multi-chip path can shard it over the gaussian axis and all-gather
    the (smaller) projected outputs (parallel/sharding.py)."""
    return project_gaussians(
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
    proj = project_for_render(
        camera, model, scaling_modifier, override_color, mean2d_carrier, raster
    )
    return rasterize_projected(
        camera, proj, bg, raster=raster,
        tile_row_start=tile_row_start, tile_rows=tile_rows,
    )


def rasterize_projected(
    camera: Camera,
    proj,
    bg: jnp.ndarray,
    raster: RasterConfig = _DEFAULT_RASTER,
    tile_row_start=0,
    tile_rows: int | None = None,
) -> RenderOutput:
    """Binning + blend on an already-projected gaussian set (see
    project_for_render)."""
    W, H = camera.width, camera.height
    ts = raster.tile_size
    TW, TH = tile_grid(W, H, ts)
    band = tile_rows is not None
    rows = tile_rows if band else TH
    N = proj.mean2d.shape[0]
    pair_capacity = raster.pairs_per_gaussian * N

    # shift splat centers into band-local pixel space up front (constant
    # shift: carrier gradients are unaffected); binning and blend then both
    # work in band-local coordinates
    if band:
        row_off_px = jnp.asarray(tile_row_start, jnp.float32) * ts
        mean2d = proj.mean2d - jnp.stack([jnp.zeros((), jnp.float32), row_off_px])
    else:
        mean2d = proj.mean2d

    binning = bin_gaussians(
        mean2d, proj.bin_extent, proj.depth, W, rows * ts, ts, pair_capacity
    )

    backend = raster.backend
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "pallas":
        interpret = jax.default_backend() != "tpu"
        chunk = raster.pallas_chunk
        fields = _build_fields(proj, mean2d)
        inv_order = jnp.argsort(binning.order).astype(jnp.int32)
        fields_d = _reorder_fields(fields, binning.order, inv_order)
        # pair gather (custom VJP; pads the pair axis so a partial final DMA
        # chunk never reads OOB)
        records = _gather_records(
            fields_d, binning.pair_gauss, binning.rank_offsets,
            jax.lax.stop_gradient(binning.num_pairs), chunk, N,
            raster.grad_sort_bf16,
        )
        out5 = _blend_records_pallas(
            records, binning.tile_start, binning.tile_count, TW, rows, ts, chunk,
            interpret, raster.pallas_tile_group,
        )  # (5, T, S): planes r g b depth T_final
    else:
        pair_gauss = binning.order[binning.pair_gauss]  # back to caller index space
        inputs = BlendInputs(
            mean2d=mean2d,
            conic=proj.conic,
            color=proj.color,
            opacity=proj.opacity,
            depth=proj.depth,
        )
        mpt = min(raster.max_pairs_per_tile, pair_capacity)
        rgb_t, dep_t, T_final_t = _blend(
            inputs, pair_gauss, binning.tile_start, binning.tile_count,
            TW, rows, ts, mpt, raster.chunk,
        )
        out5 = jnp.concatenate(
            [jnp.moveaxis(rgb_t, 2, 0), dep_t[None], T_final_t[None]], axis=0
        )
    crop_h = rows * ts if band else H
    planes = _tiles_to_planes(out5, TW, rows, ts, crop_h, W)  # (5, h, W)
    rgb, dep, T_final = planes[0:3], planes[3], planes[4]

    image = rgb + T_final[None] * bg[:, None, None]
    alpha = 1.0 - T_final
    return RenderOutput(
        image=image,
        depth=dep,
        alpha=alpha,
        radii=proj.radius,
        visible=proj.radius > 0,
        num_pairs=jax.lax.stop_gradient(binning.num_pairs),
        max_tile_pairs=jax.lax.stop_gradient(jnp.max(binning.tile_count)),
        pair_capacity=jnp.asarray(pair_capacity, jnp.int32),
    )
