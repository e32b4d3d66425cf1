"""Stage-by-stage timing of one binocular train step on the current backend.

Timing methodology (important on the remote-TPU "axon" tunnel, where
`block_until_ready` does not reliably block and per-call round-trips cost
~30 ms): every stage runs K iterations chained inside ONE jit'd
`lax.fori_loop`, each iteration consuming the previous one's result (a tiny
perturbation defeats CSE/DCE), and the loop result is fetched to host. The
per-iteration cost is (t[K] - t[1]) / (K - 1) — tunnel latency and dispatch
cancel out.

Usage: python scripts/profile_step.py [--n 100000] [--width 1008] [--height 756]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def chain_time(make_body, iters=20, label=""):
    """make_body() -> (body_fn, init_acc). body_fn(acc) -> new scalar acc."""
    body_fn, init = make_body()

    @jax.jit
    def run(a0, n):
        return jax.lax.fori_loop(0, n, lambda i, acc: body_fn(acc), a0)

    float(run(init, 1))  # compile + warm
    t0 = time.perf_counter()
    float(run(init, 1))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(init, 1 + iters))
    tK = time.perf_counter() - t0
    ms = (tK - t1) / iters * 1000.0
    print(f"{label:32s} {ms:8.2f} ms")
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--width", type=int, default=1008)
    ap.add_argument("--height", type=int, default=756)
    ap.add_argument("--pairs_per_gaussian", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from bench import make_workload

    from binocular3dgs_tpu.config import Config
    from binocular3dgs_tpu.ops.binning import bin_gaussians, tile_grid
    from binocular3dgs_tpu.ops.blend_pallas import (
        blend_backward_pallas,
        blend_forward_pallas,
    )
    from binocular3dgs_tpu.ops.project import project_gaussians
    from binocular3dgs_tpu.ops.rasterize import _build_fields, render_tiled
    from binocular3dgs_tpu.train.state import init_train_state
    from binocular3dgs_tpu.train.step import make_train_step

    model, cam, gt = make_workload(args.n, args.width, args.height)
    cfg = Config()
    cfg.raster.pairs_per_gaussian = args.pairs_per_gaussian
    print(f"backend={jax.default_backend()} n={args.n} {args.width}x{args.height}")

    W, H, ts = cam.width, cam.height, cfg.raster.tile_size
    TW, TH = tile_grid(W, H, ts)
    chunk = cfg.raster.pallas_chunk
    pair_capacity = cfg.raster.pairs_per_gaussian * args.n
    it = args.iters

    def f_project(params):
        m = model.replace(params=params)
        return project_gaussians(
            xyz=m.params.xyz, scaling=m.get_scaling(), rotation_raw=m.params.rotation,
            opacity=m.get_opacity()[..., 0], features=m.get_features(), active=m.active,
            camera=cam, sh_degree=m.active_sh_degree,
        )

    # --- stage 1: vertex / projection ---
    def mk_project():
        def body(acc):
            p = model.params.replace(xyz=model.params.xyz + acc * 1e-12)
            proj = f_project(p)
            return jnp.sum(proj.mean2d) * 1e-12
        return body, jnp.float32(0.0)

    chain_time(mk_project, it, "project fwd")

    proj = jax.jit(f_project)(model.params)

    # --- stage 2: binning (emission + packed sort + ranges) ---
    def consume_bin(b):
        return (
            jnp.sum(b.pair_gauss.astype(jnp.float32))
            + jnp.sum(b.tile_start.astype(jnp.float32))
        ) * 1e-12

    def mk_bin():
        def body(acc):
            b = bin_gaussians(
                proj.mean2d + acc * 1e-9, proj.radius, proj.depth, W, H, ts, pair_capacity
            )
            return consume_bin(b)
        return body, jnp.float32(0.0)

    chain_time(mk_bin, it, "bin (emit+sort+ranges)")

    binning = jax.jit(
        lambda: bin_gaussians(proj.mean2d, proj.radius, proj.depth, W, H, ts, pair_capacity)
    )()
    print(f"  num_pairs = {int(binning.num_pairs)} / capacity {pair_capacity}")

    # --- stage 3: record build (field stack + depth reorder + pair gather) ---
    def build_records(proj_, acc):
        fields = _build_fields(proj_, proj_.mean2d + acc * 1e-12)
        fields_d = fields[:, binning.order]
        rec = fields_d[:, binning.pair_gauss]
        return jnp.pad(rec, ((0, 0), (0, chunk)))

    def mk_gather():
        def body(acc):
            return jnp.sum(build_records(proj, acc)[5]) * 1e-12
        return body, jnp.float32(0.0)

    chain_time(mk_gather, it, "record build (reorder+gather)")

    records = jax.jit(lambda: build_records(proj, jnp.float32(0.0)))()

    # --- stage 3b: record build VJP (the scatter-adds back to fields) ---
    def mk_gather_vjp():
        ct = records * 0.5

        def body(acc):
            _, vjp = jax.vjp(lambda p: build_records(p, acc), proj)
            (d_proj,) = vjp(ct)
            return jnp.sum(d_proj.mean2d) * 1e-12
        return body, jnp.float32(0.0)

    chain_time(mk_gather_vjp, it, "record build VJP (scatter)")

    # --- stage 4: blend forward pallas ---
    def mk_blend_fwd():
        def body(acc):
            out5, nc = blend_forward_pallas(
                records + acc * 1e-12, binning.tile_start, binning.tile_count,
                TW=TW, TH=TH, ts=ts, chunk=chunk,
            )
            return jnp.sum(out5[:, 0]) * 1e-12
        return body, jnp.float32(0.0)

    chain_time(mk_blend_fwd, it, "blend fwd pallas")

    out5_t, nc_t = blend_forward_pallas(
        records, binning.tile_start, binning.tile_count, TW=TW, TH=TH, ts=ts, chunk=chunk
    )

    # --- stage 5: blend backward pallas ---
    d_out5 = jnp.ones_like(out5_t)

    def mk_blend_bwd():
        def body(acc):
            d_records = blend_backward_pallas(
                records + acc * 1e-12, binning.tile_start, binning.tile_count,
                out5_t, nc_t, d_out5, TW=TW, TH=TH, ts=ts, chunk=chunk,
            )
            return jnp.sum(d_records[5]) * 1e-12
        return body, jnp.float32(0.0)

    chain_time(mk_blend_bwd, it, "blend bwd pallas")

    # --- full render forward ---
    def mk_render():
        def body(acc):
            p = model.params.replace(xyz=model.params.xyz + acc * 1e-12)
            out = render_tiled(cam, model.replace(params=p), jnp.zeros(3), raster=cfg.raster)
            return jnp.sum(out.image) * 1e-12
        return body, jnp.float32(0.0)

    chain_time(mk_render, it, "render fwd (full)")

    # --- render fwd+bwd ---
    def mk_render_grad():
        def body(acc):
            def loss(p):
                out = render_tiled(
                    cam, model.replace(params=p), jnp.zeros(3), raster=cfg.raster
                )
                return jnp.sum(out.image) + jnp.sum(out.depth) + jnp.sum(out.alpha)

            p = model.params.replace(xyz=model.params.xyz + acc * 1e-12)
            g = jax.grad(loss)(p)
            return jnp.sum(g.xyz) * 1e-12
        return body, jnp.float32(0.0)

    chain_time(mk_render_grad, it, "render fwd+bwd (full)")

    # --- full binocular train step (chained through state) ---
    step = make_train_step(
        lambda *a, **k: render_tiled(*a, raster=cfg.raster, **k), cfg,
        spatial_lr_scale=1.0, binocular=True, use_alpha_weight=False,
    )
    state0 = init_train_state(model)
    aw = jnp.zeros((H, W), jnp.float32)
    bg = jnp.zeros(3)

    @jax.jit
    def run_steps(state, n):
        def body(i, carry):
            st, key = carry
            key, sub = jax.random.split(key)
            st, _ = step(st, cam, gt, aw, jnp.int32(2) + i, sub, bg)
            return (st, key)

        st, _ = jax.lax.fori_loop(0, n, body, (state, jax.random.PRNGKey(0)))
        return jnp.sum(st.model.params.xyz[0])

    float(run_steps(state0, 1))
    t0 = time.perf_counter(); float(run_steps(state0, 1)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(run_steps(state0, 1 + it)); tK = time.perf_counter() - t0
    ms = (tK - t1) / it * 1000.0
    print(f"{'FULL binocular train step':32s} {ms:8.2f} ms  ({1000.0 / ms:.2f} it/s)")


if __name__ == "__main__":
    main()
