"""Minimal probe: time compile and single-step execution of the bench workload."""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

t0 = time.perf_counter()
print("backend:", jax.default_backend(), flush=True)
print(f"devices in {time.perf_counter()-t0:.1f}s", flush=True)

from bench import make_workload
from binocular3dgs_tpu.config import Config
from binocular3dgs_tpu.ops.rasterize import render_tiled
from binocular3dgs_tpu.train.state import init_train_state
from binocular3dgs_tpu.train.step import make_train_step

n, width, height = 100_000, 1008, 756
model, cam, gt = make_workload(n, width, height)
cfg = Config()
cfg.raster.pairs_per_gaussian = 8

# render forward alone first (cheapest compile); hoist the jitted callable
# so the repeat timings measure cached-executable runs, not retraces
render_f = jax.jit(lambda m: render_tiled(cam, m, jnp.zeros(3), raster=cfg.raster).image.sum())
t0 = time.perf_counter()
v = float(render_f(model))
print(f"render fwd compile+run: {time.perf_counter()-t0:.1f}s (val {v:.3f})", flush=True)
t0 = time.perf_counter()
for _ in range(3):
    float(render_f(model))
print(f"render fwd 3 runs: {time.perf_counter()-t0:.2f}s", flush=True)

step = make_train_step(
    lambda *a, **k: render_tiled(*a, raster=cfg.raster, **k),
    cfg, spatial_lr_scale=1.0, binocular=True, use_alpha_weight=False,
)
state0 = init_train_state(model)
aw = jnp.zeros((height, width), jnp.float32)
bg = jnp.zeros(3)

step_f = jax.jit(step)
t0 = time.perf_counter()
st, m = step_f(state0, cam, gt, aw, jnp.int32(2), jax.random.PRNGKey(0), bg)
print(f"train step compile+run: {time.perf_counter()-t0:.1f}s loss={float(m.loss):.4f}", flush=True)
t0 = time.perf_counter()
for i in range(5):
    st, m = step_f(st, cam, gt, aw, jnp.int32(3 + i), jax.random.PRNGKey(i), bg)
float(m.loss)
print(f"train step 5 runs: {time.perf_counter()-t0:.2f}s", flush=True)
