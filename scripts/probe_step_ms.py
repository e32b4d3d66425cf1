"""Quick probe: bench-style chained train-step timing at a given pairs_per_gaussian."""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bench import make_workload
from binocular3dgs_tpu.config import Config
from binocular3dgs_tpu.ops.rasterize import render_tiled
from binocular3dgs_tpu.train.state import init_train_state
from binocular3dgs_tpu.train.step import make_train_step


def main():
    ppg = int(sys.argv[1]) if len(sys.argv) > 1 else 6
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

    for _ in range(3):
        float(run_steps(state0, 1))
    iters = 20
    t0 = time.perf_counter(); float(run_steps(state0, 1)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(run_steps(state0, 1 + iters)); tk = time.perf_counter() - t0
    print(f"ppg={ppg} step_ms={(tk - t1) / iters * 1000:.2f}")


if __name__ == "__main__":
    main()
