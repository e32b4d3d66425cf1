"""Multi-chip execution: pixel-band-parallel rendering over a device mesh.

The reference has no intra-job parallelism (SURVEY.md §2.4 — one scene per
GPU). The TPU-native scaling design shards the *pixel tile rows* of each
render across devices:

  * gaussian parameters are replicated (a few-shot scene is O(100MB) at most)
  * every device runs the (cheap, ~1 ms) vertex stage, then bins + blends
    only its own horizontal band of tile rows (ops/rasterize.render_tiled
    band mode); the per-band pair capacity — and with it the emission, sort,
    and record-gather sizes — shrinks with the device count
    (RasterConfig.band_pairs_per_gaussian), so per-device binning work is
    O(pairs/N_devices), not replicated
  * bands are all-gathered over ICI into the full image so the loss (which
    has cross-band SSIM windows) is computed replicated
  * the backward runs band-local rasterizer kernels per device; the replicated
    parameter cotangents are psum'd by the shard_map transpose — the gradient
    all-reduce of gaussian attributes rides ICI

This scales pixels/s with device count for the hot rasterizer at the cost of
one image all-gather (~MBs) per render. The same mesh composes with a "view"
axis for batching independent renders (e.g. the binocular pair).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import Config, RasterConfig
from ..core.camera import Camera
from ..models.gaussians import GaussianModel
from ..ops.binning import tile_grid
from ..ops.rasterize import render_tiled
from ..ops.rasterize_reference import RenderOutput


def make_mesh(n_devices: int | None = None, axis: str = "tile") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def make_sharded_render(
    mesh: Mesh,
    width: int,
    height: int,
    raster: RasterConfig | None = None,
    axis: str = "tile",
    shard_gaussians: bool = False,
):
    """A render function with the render_tiled signature that splits tile
    rows across `mesh[axis]` and returns replicated full-image outputs.

    `shard_gaussians=True` additionally shards the VERTEX stage over the same
    axis (SURVEY.md §2.4 gaussian-parallelism): each device projects only
    capacity/ndev primitives, then the (13-float) projected outputs are
    all-gathered over ICI for band-local binning+blend. The all-gather
    transpose (psum_scatter of projection cotangents) keeps gradients exact.
    Projection is O(N) VPU work (~0.6 ms of the ~31 ms step at 100k on a
    v5e, BENCH_r05 stage_breakdown_ms), so this pays off only at primitive
    counts (~1M+) where vertex work rivals the blend — see README
    "Parallelism notes" and the bench's `n8_shardg_step_ms` on/off
    comparison; the pixel-band blend sharding is unchanged either way."""
    raster = raster or RasterConfig()
    ts = raster.tile_size
    TW, TH = tile_grid(width, height, ts)
    ndev = mesh.shape[axis]
    rows_per_dev = -(-TH // ndev)
    # each device bins only its band: shrink its static pair capacity (and
    # the sort/gather sizes with it). 3x slack over a uniform split absorbs
    # bands that concentrate the scene; overflow drops deepest pairs exactly
    # like the single-device path.
    ppg_band = raster.band_pairs_per_gaussian
    if ppg_band is None:
        ppg_band = max(4, -(-raster.pairs_per_gaussian * 3 // ndev))
    raster = dataclasses.replace(raster, pairs_per_gaussian=ppg_band)

    warned = []

    def _render_band(camera, model, bg, carrier):
        d = jax.lax.axis_index(axis)
        # gaussian-axis sharding needs an even split of the (static) capacity;
        # capacities are next_pow2-padded so this holds for power-of-two meshes
        if shard_gaussians and model.capacity % ndev != 0 and not warned:
            # trace-time signal (capacity is static): the caller asked for
            # vertex sharding but the replicated path will run instead
            warned.append(True)
            import warnings

            warnings.warn(
                f"shard_gaussians=True but capacity {model.capacity} is not "
                f"divisible by {ndev} devices; vertex stage runs replicated",
                stacklevel=2,
            )
        if shard_gaussians and model.capacity % ndev == 0:
            from ..ops.project import ProjectedGaussians
            from ..ops.rasterize import project_for_render, rasterize_projected

            cap = model.capacity
            shard = cap // ndev
            sl = lambda x: jax.lax.dynamic_slice_in_dim(x, d * shard, shard, 0)
            local_model = model.replace(
                params=jax.tree.map(sl, model.params), active=sl(model.active)
            )
            proj_local = project_for_render(
                camera, local_model, mean2d_carrier=sl(carrier), raster=raster
            )
            # projected outputs are ~13 floats/gaussian vs ~23 of raw params:
            # gather the small thing, shard the compute
            proj = ProjectedGaussians(
                *(jax.lax.all_gather(f, axis, axis=0, tiled=True) for f in proj_local)
            )
            out = rasterize_projected(
                camera, proj, bg, raster=raster,
                tile_row_start=d * rows_per_dev, tile_rows=rows_per_dev,
            )
        else:
            out = render_tiled(
                camera, model, bg,
                mean2d_carrier=carrier, raster=raster,
                tile_row_start=d * rows_per_dev, tile_rows=rows_per_dev,
            )
        return out

    def local_render(camera, model, bg, carrier):
        out = _render_band(camera, model, bg, carrier)
        # bands -> full replicated image over ICI (image is planar (3, h, W):
        # bands concatenate along the height axis)
        image = jax.lax.all_gather(out.image, axis, axis=1, tiled=True)[:, :height]
        depth = jax.lax.all_gather(out.depth, axis, axis=0, tiled=True)[:height]
        alpha = jax.lax.all_gather(out.alpha, axis, axis=0, tiled=True)[:height]
        return RenderOutput(
            image=image, depth=depth, alpha=alpha, radii=out.radii, visible=out.visible,
            # band-local pair pressure: report the worst band vs the BAND
            # capacity (each device's static pair list is band-sized)
            num_pairs=jax.lax.pmax(out.num_pairs, axis),
            max_tile_pairs=jax.lax.pmax(out.max_tile_pairs, axis),
            pair_capacity=out.pair_capacity,
        )

    sharded = jax.shard_map(
        local_render,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )

    def render_fn(camera: Camera, model: GaussianModel, bg, mean2d_carrier=None, **_):
        carrier = (
            mean2d_carrier
            if mean2d_carrier is not None
            else jnp.zeros((model.capacity, 2), jnp.float32)
        )
        return sharded(camera, model, bg, carrier)

    return render_fn


def make_sharded_train_step(
    cfg: Config,
    mesh: Mesh,
    width: int,
    height: int,
    spatial_lr_scale: float,
    binocular: bool = False,
    use_alpha_weight: bool = False,
    axis: str = "tile",
    shard_gaussians: bool = False,
    shard_adam: bool = False,
):
    """The full jit'd train step with the rasterizer sharded over the mesh.

    `shard_adam=True` partitions the Adam moments along the gaussian axis
    (SURVEY.md §2.4 table, last row): each device stores and updates only
    capacity/ndev of the 2x23-float/gaussian optimizer state; the parameter
    update's all-gather is inserted by XLA. Bit-exact vs replicated."""
    from jax.sharding import NamedSharding

    from ..train.step import make_train_step

    render_fn = make_sharded_render(
        mesh, width, height, cfg.raster, axis, shard_gaussians=shard_gaussians
    )
    opt_state_sharding = None
    if shard_adam:
        def opt_state_sharding(x):
            spec = P(axis, *([None] * (x.ndim - 1)))
            return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    return make_train_step(
        render_fn, cfg, spatial_lr_scale,
        binocular=binocular, use_alpha_weight=use_alpha_weight,
        opt_state_sharding=opt_state_sharding,
    )
