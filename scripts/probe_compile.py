"""Separate compile time from run time for the tiled render forward."""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

print("start imports", flush=True)
from bench import make_workload
from binocular3dgs_tpu.config import Config
from binocular3dgs_tpu.ops.rasterize import render_tiled

print("imports done", flush=True)
n, width, height = 100_000, 1008, 756
t0 = time.perf_counter()
model, cam, gt = make_workload(n, width, height)
print(f"workload: {time.perf_counter()-t0:.1f}s", flush=True)
cfg = Config()
cfg.raster.pairs_per_gaussian = 8

f = jax.jit(lambda m: render_tiled(cam, m, jnp.zeros(3), raster=cfg.raster).image.sum())
t0 = time.perf_counter()
lowered = f.lower(model)
print(f"lower: {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
compiled = lowered.compile()
print(f"compile: {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
v = float(compiled(model))
print(f"run1: {time.perf_counter()-t0:.2f}s val={v:.3f}", flush=True)
t0 = time.perf_counter()
v = float(compiled(model))
print(f"run2: {time.perf_counter()-t0:.2f}s", flush=True)
