"""Benchmark: binocular 3DGS training throughput on the current backend.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: a synthetic LLFF-scale scene (100k gaussians, 1008x756 render — the
reference's LLFF half-res protocol order of magnitude) running the FULL
binocular train step (two renders, L1+D-SSIM+disparity losses, backward,
Adam). Metric: train iterations/s.

vs_baseline: the reference publishes no numbers (BASELINE.md); we normalize
against a nominal 20 it/s for the reference CUDA pipeline on a modern GPU
(30k iters in ~25 min with two renders/iter), so vs_baseline = value / 20.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

NOMINAL_REFERENCE_ITERS_PER_S = 20.0


def make_workload(n=100_000, width=1008, height=756, seed=0):
    import jax.numpy as jnp

    from binocular3dgs_tpu.core.camera import make_camera
    from binocular3dgs_tpu.models.gaussians import GaussianModel, GaussianParams

    rng = np.random.default_rng(seed)
    cap = n
    xyz = np.stack(
        [rng.uniform(-2, 2, cap), rng.uniform(-1.5, 1.5, cap), rng.uniform(3, 9, cap)], 1
    ).astype(np.float32)
    params = GaussianParams(
        xyz=jnp.asarray(xyz),
        f_dc=jnp.asarray(rng.normal(size=(cap, 1, 3)).astype(np.float32) * 0.3),
        f_rest=jnp.zeros((cap, 3, 3), jnp.float32),
        opacity=jnp.asarray(rng.uniform(-2, 1, (cap, 1)).astype(np.float32)),
        scaling=jnp.asarray(np.log(rng.uniform(0.005, 0.02, (cap, 3))).astype(np.float32)),
        rotation=jnp.asarray(
            np.concatenate([np.ones((cap, 1)), np.zeros((cap, 3))], 1).astype(np.float32)
        ),
    )
    model = GaussianModel(
        params=params,
        active=jnp.ones(cap, dtype=bool),
        max_sh_degree=1,
        active_sh_degree=1,
    )
    cam = make_camera(np.eye(3), np.zeros(3), 0.9, 0.7, width, height)
    gt = jnp.asarray(rng.random((height, width, 3)).astype(np.float32))
    return model, cam, gt


def main():
    import jax
    import jax.numpy as jnp

    from binocular3dgs_tpu.config import Config
    from binocular3dgs_tpu.ops.rasterize import render_tiled
    from binocular3dgs_tpu.train.state import init_train_state
    from binocular3dgs_tpu.train.step import make_train_step

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        n, width, height = 100_000, 1008, 756
        iters = 20
    else:  # CPU smoke-test configuration
        n, width, height = 2_000, 128, 96
        iters = 5

    model, cam, gt = make_workload(n, width, height)
    cfg = Config()
    cfg.raster.pairs_per_gaussian = 8
    if not on_tpu:
        cfg.raster.backend = "xla"
        cfg.raster.max_pairs_per_tile = 256
        cfg.raster.chunk = 16

    step = make_train_step(
        lambda *a, **k: render_tiled(*a, raster=cfg.raster, **k),
        cfg,
        spatial_lr_scale=1.0,
        binocular=True,
        use_alpha_weight=False,
    )
    state = init_train_state(model)
    aw = jnp.zeros((height, width), jnp.float32)
    key = jax.random.PRNGKey(0)
    bg = jnp.zeros(3)

    # warmup / compile
    state, _ = step(state, cam, gt, aw, jnp.int32(1), key, bg)
    jax.block_until_ready(state)

    t0 = time.time()
    for i in range(iters):
        key, sub = jax.random.split(key)
        state, metrics = step(state, cam, gt, aw, jnp.int32(2 + i), sub, bg)
    jax.block_until_ready(state)
    dt = (time.time() - t0) / iters
    iters_per_s = 1.0 / dt

    print(
        json.dumps(
            {
                "metric": "binocular_train_iters_per_s",
                "value": round(iters_per_s, 3),
                "unit": f"it/s ({n} gaussians, {width}x{height}, 2 renders/it, {jax.default_backend()})",
                "vs_baseline": round(iters_per_s / NOMINAL_REFERENCE_ITERS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
