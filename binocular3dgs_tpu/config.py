"""Configuration dataclasses.

Names and defaults mirror the reference flag system (`arguments/__init__.py:47-91`
plus the ad-hoc train.py flags at `train.py:269-285`) so reference run recipes
translate 1:1. TPU-specific knobs (capacity, tiling, mesh) live in
:class:`RasterConfig` / :class:`ParallelConfig`.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field


@dataclass
class ModelConfig:
    # reference `arguments/__init__.py:47-58`
    sh_degree: int = 1
    source_path: str = ""
    model_path: str = ""
    images: str = "images"
    resolution: int = -1
    white_background: bool = False
    eval: bool = False


@dataclass
class PipelineConfig:
    # reference `arguments/__init__.py:65-70`
    convert_SHs_python: bool = False
    compute_cov3D_python: bool = False
    debug: bool = False


@dataclass
class OptimizationConfig:
    # reference `arguments/__init__.py:72-91`
    iterations: int = 30_000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 0.0002
    random_background: bool = False


@dataclass
class TrainConfig:
    # reference `train.py:269-285` method flags
    opacity_decay: bool = True
    opacity_decay_factor: float = 0.995
    cam_trans_dist: float = 0.4
    binocular_consistency: bool = True
    shift_cam_start: int = 20_000
    dataset_name: str = "LLFF"
    n_views: int = 3
    suffix: str | None = None
    test_iterations: tuple[int, ...] = (30_000,)
    save_iterations: tuple[int, ...] = (30_000,)
    checkpoint_iterations: tuple[int, ...] = ()
    start_checkpoint: str | None = None
    seed: int = 0
    # Host-loop elimination: run up to this many train iterations per device
    # dispatch as one jit'd lax.fori_loop (camera selection moves on-device
    # to jax.random — statistically equivalent to the reference's host
    # random.choice, not bit-identical). Chunks never straddle protocol
    # boundaries (SH bumps, densification, binocular flip, report/save).
    # 0 = auto (densification_interval); 1 = one dispatch per iteration.
    fused_steps: int = 0


@dataclass
class RasterConfig:
    """TPU rasterizer knobs (no reference analog — the CUDA kernel hardcodes these)."""

    tile_size: int = 16  # pixels per tile side (16x16 tiles like CUDA 3DGS)
    # Static capacity of the (tile, gaussian) pair list as a multiple of the
    # Gaussian capacity. Overflowing pairs are dropped (reported via num_pairs).
    pairs_per_gaussian: int = 12
    # Upper bound for Trainer's self-healing pair-capacity growth (doubling
    # pairs_per_gaussian and re-jitting when RenderOutput.num_pairs nears
    # capacity — mirrors the gaussian-capacity growth).
    max_pairs_per_gaussian: int = 96
    # Per-band override used by the sharded renderer: each device bins only
    # its tile-row band, so its pair capacity (and sort size) can shrink with
    # the device count. None = auto: max(4, ceil(pairs_per_gaussian * 3 / ndev)).
    band_pairs_per_gaussian: int | None = None
    # Static bound on pairs blended per tile; deeper pairs are dropped (they
    # sit behind T<1e-4 termination in practice).
    max_pairs_per_tile: int = 2048
    # Per-chunk gaussians in the blend inner loop.
    chunk: int = 32
    # Blend backend: "auto" (pallas on TPU, xla elsewhere), "xla", or "pallas"
    # (pallas runs in interpreter mode off-TPU).
    backend: str = "auto"
    # Pair chunk length for the pallas kernels (lane dimension). Must be a
    # multiple of 128 on real TPU hardware — the record DMA slices the lane
    # axis by it (Mosaic tiling constraint); smaller values only work in
    # interpret mode.
    pallas_chunk: int = 128
    # Tiles blended per pallas grid step — amortizes the per-step grid
    # machinery (~2.6 us/tile at group=1, measured on a v5e).
    pallas_tile_group: int = 8
    # Pack the pair-gather VJP's 10 f32 cotangent sort payloads as 5
    # bf16-pair words (halves the dominant grad sort's payload bytes,
    # 5.9 -> ~3.7 ms/render-pair measured on a v5e) at the cost of bf16
    # rounding (~0.4% relative) on individual per-pair cotangents before
    # the f32 segment accumulation. Off by default: gradients stay exactly
    # f32-accumulated like the CUDA reference's atomicAdd path.
    grad_sort_bf16: bool = False
    # Numerical constants of the CUDA rasterizer behavior spec (SURVEY.md §3.5)
    alpha_min: float = 1.0 / 255.0
    transmittance_min: float = 1e-4
    alpha_clamp: float = 0.99
    dilation: float = 0.3  # screen-space low-pass added to cov2d diagonal
    znear_cull: float = 0.2


@dataclass
class ParallelConfig:
    """Device-mesh layout. axes: view-parallel x tile-parallel."""

    view_axis: int = 1
    tile_axis: int = 1


@dataclass
class GaussianCapacityConfig:
    """Fixed-capacity buffer management (densification on static shapes)."""

    initial_margin: float = 2.0  # capacity = next_pow2(margin * n_init)
    growth_trigger: float = 0.9  # grow when count > trigger * capacity
    max_capacity: int = 4_000_000


@dataclass
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    pipeline: PipelineConfig = field(default_factory=PipelineConfig)
    opt: OptimizationConfig = field(default_factory=OptimizationConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    raster: RasterConfig = field(default_factory=RasterConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    capacity: GaussianCapacityConfig = field(default_factory=GaussianCapacityConfig)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "Config":
        raw = json.loads(text)

        def build(klass, data):
            fields = {f.name: f for f in dataclasses.fields(klass)}
            kwargs = {}
            for k, v in data.items():
                if k not in fields:
                    continue
                if dataclasses.is_dataclass(fields[k].type) or k in (
                    "model", "pipeline", "opt", "train", "raster", "parallel", "capacity",
                ):
                    sub = {
                        "model": ModelConfig,
                        "pipeline": PipelineConfig,
                        "opt": OptimizationConfig,
                        "train": TrainConfig,
                        "raster": RasterConfig,
                        "parallel": ParallelConfig,
                        "capacity": GaussianCapacityConfig,
                    }[k]
                    kwargs[k] = build(sub, v)
                elif isinstance(v, list):
                    kwargs[k] = tuple(v)
                else:
                    kwargs[k] = v
            return klass(**kwargs)

        return build(cls, raw)


def save_config(cfg: Config, path: str) -> None:
    with open(path, "w") as f:
        f.write(cfg.to_json())


def load_config(path: str) -> Config:
    with open(path) as f:
        return Config.from_json(f.read())
