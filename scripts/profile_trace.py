"""Op-level device-time attribution of the binocular train step via
jax.profiler traces.

Captures an xplane trace of K executions of the full jit'd train step (or
--what=fwd / --what=grad for the render forward / forward+backward alone) and
prints device ops aggregated by name, longest first — the ground truth for
"where does the step go" (the chained-loop profilers only see stage
boundaries; this sees XLA fusions, Pallas kernels, and copies individually).

Usage: python scripts/profile_trace.py [--what step|fwd|grad] [--n 100000]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def capture(fn, steps=8):
    fn()  # compile + warm
    d = tempfile.mkdtemp(prefix="jaxtrace_")
    jax.profiler.start_trace(d)
    for _ in range(steps):
        fn()
    jax.profiler.stop_trace()
    return d


def device_ops(trace_dir, steps):
    (path,) = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    with gzip.open(path) as f:
        data = json.load(f)
    ev = data.get("traceEvents", [])
    device_pids = {
        e["pid"]
        for e in ev
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    durs = collections.Counter()
    counts = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            # skip the module-level envelope event (it spans all child ops)
            if e["name"].startswith("jit_"):
                continue
            durs[e["name"]] += e.get("dur", 0)
            counts[e["name"]] += 1
    total = sum(durs.values())
    print(f"device total {total / steps / 1000:.2f} ms/step over {steps} steps")
    for name, us in durs.most_common(40):
        print(f"{us / steps / 1000:9.3f} ms  x{counts[name] // steps:<3d} {name}")
    return durs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--width", type=int, default=1008)
    ap.add_argument("--height", type=int, default=756)
    ap.add_argument("--pairs_per_gaussian", type=int, default=8)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--what", default="step", choices=("step", "fwd", "grad"))
    args = ap.parse_args()

    from bench import make_workload

    from binocular3dgs_tpu.config import Config
    from binocular3dgs_tpu.ops.rasterize import render_tiled
    from binocular3dgs_tpu.train.state import init_train_state
    from binocular3dgs_tpu.train.step import make_train_step

    model, cam, gt = make_workload(args.n, args.width, args.height)
    cfg = Config()
    cfg.raster.pairs_per_gaussian = args.pairs_per_gaussian
    print(f"backend={jax.default_backend()} what={args.what} n={args.n}")

    if args.what == "fwd":
        f = jax.jit(
            lambda p: render_tiled(
                cam, model.replace(params=p), jnp.zeros(3), raster=cfg.raster
            ).image.sum()
        )
        run = lambda: float(f(model.params))
    elif args.what == "grad":
        def loss(p):
            out = render_tiled(cam, model.replace(params=p), jnp.zeros(3), raster=cfg.raster)
            return jnp.sum(out.image) + jnp.sum(out.depth) + jnp.sum(out.alpha)

        g = jax.jit(lambda p: jax.grad(loss)(p).xyz.sum())
        run = lambda: float(g(model.params))
    else:
        step = make_train_step(
            lambda *a, **k: render_tiled(*a, raster=cfg.raster, **k),
            cfg, spatial_lr_scale=1.0, binocular=True, use_alpha_weight=False,
        )
        state0 = init_train_state(model)
        aw = jnp.zeros((args.height, args.width), jnp.float32)
        bg = jnp.zeros(3)
        key = jax.random.PRNGKey(0)
        sf = jax.jit(step)

        def run():
            st, m = sf(state0, cam, gt, aw, jnp.int32(2), key, bg)
            float(m.loss)

    d = capture(run, args.steps)
    device_ops(d, args.steps)


if __name__ == "__main__":
    main()
