"""Identify what the hot fusions in the chained train step actually compute,
via the args metadata on xplane trace events."""
import collections
import glob
import gzip
import json
import sys
import tempfile

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bench import make_workload
from binocular3dgs_tpu.config import Config
from binocular3dgs_tpu.ops.rasterize import render_tiled
from binocular3dgs_tpu.train.state import init_train_state
from binocular3dgs_tpu.train.step import make_train_step


def main():
    ppg = 6
    n, width, height = 100_000, 1008, 756
    model, cam, gt = make_workload(n, width, height)
    cfg = Config()
    cfg.raster.pairs_per_gaussian = ppg

    step = make_train_step(
        lambda *a, **k: render_tiled(*a, raster=cfg.raster, **k),
        cfg, spatial_lr_scale=1.0, binocular=True, use_alpha_weight=False,
    )
    state0 = init_train_state(model)
    aw = jnp.zeros((height, width), jnp.float32)
    bg = jnp.zeros(3)

    @jax.jit
    def run_steps(state, k):
        def body(i, carry):
            st, key = carry
            key, sub = jax.random.split(key)
            st, _ = step(st, cam, gt, aw, jnp.int32(2) + i, sub, bg)
            return (st, key)

        st, _ = jax.lax.fori_loop(0, k, body, (state, jax.random.PRNGKey(0)))
        return jnp.sum(st.model.params.xyz[0])

    for _ in range(2):
        float(run_steps(state0, 1))
    d = tempfile.mkdtemp(prefix="fnames_")
    jax.profiler.start_trace(d)
    float(run_steps(state0, 4))
    jax.profiler.stop_trace()

    (path,) = glob.glob(f"{d}/**/*.trace.json.gz", recursive=True)
    with gzip.open(path) as f:
        data = json.load(f)
    ev = data.get("traceEvents", [])
    device_pids = {
        e["pid"] for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    best = {}
    durs = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            nm = e["name"]
            durs[nm] += e.get("dur", 0)
            a = e.get("args") or {}
            if nm not in best and a:
                best[nm] = a
    for name, us in durs.most_common(30):
        a = best.get(name, {})
        keys = {k: str(v)[:300] for k, v in a.items()}
        print(f"== {name}  total {us/1000:.2f} ms")
        for k, v in keys.items():
            print(f"   {k}: {v}")


if __name__ == "__main__":
    main()
