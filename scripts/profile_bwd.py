"""Attribute the rasterizer backward's XLA-glue time (beyond the Pallas
blend kernel) to individual stages: pure-vjp apply, the pair-gather VJP, the
depth-reorder VJP, the inverse-permutation argsort, and the projection VJP.

Same chained-fori_loop timing as profile_step.py (see that file's docstring
for why: the axon tunnel neither blocks reliably nor misses its result
cache).

Usage: python scripts/profile_bwd.py [--n 100000] [--width 1008] [--height 756]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def chain_time(make_body, iters=20, label=""):
    body_fn, init = make_body()

    @jax.jit
    def run(a0, n):
        return jax.lax.fori_loop(0, n, lambda i, acc: body_fn(acc), a0)

    float(run(init, 1))
    t0 = time.perf_counter()
    float(run(init, 1))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(init, 1 + iters))
    tK = time.perf_counter() - t0
    ms = (tK - t1) / iters * 1000.0
    print(f"{label:36s} {ms:8.2f} ms", flush=True)
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
    from binocular3dgs_tpu.ops import rasterize as rz
    from binocular3dgs_tpu.ops.binning import bin_gaussians, tile_grid
    from binocular3dgs_tpu.ops.project import project_gaussians
    from binocular3dgs_tpu.ops.rasterize import render_tiled

    model, cam, gt = make_workload(args.n, args.width, args.height)
    cfg = Config()
    cfg.raster.pairs_per_gaussian = args.pairs_per_gaussian
    print(f"backend={jax.default_backend()} n={args.n} {args.width}x{args.height}")
    it = args.iters
    N = args.n
    W, H, ts = cam.width, cam.height, cfg.raster.tile_size
    TW, TH = tile_grid(W, H, ts)
    chunk = cfg.raster.pallas_chunk
    pair_capacity = cfg.raster.pairs_per_gaussian * N

    def loss(p):
        out = render_tiled(cam, model.replace(params=p), jnp.zeros(3), raster=cfg.raster)
        return jnp.sum(out.image) + jnp.sum(out.depth) + jnp.sum(out.alpha)

    # --- pure vjp apply (forward residuals precomputed once) ---
    # The pullback (a jax.tree_util.Partial) is passed as a jit ARGUMENT:
    # closing over it would bake its ~50MB residuals into the HLO as
    # literals, which the remote compiler chews on for tens of minutes.
    _, pullback = jax.vjp(loss, model.params)

    @jax.jit
    def run_vjp(pb, a0, n):
        def body(i, acc):
            (g,) = pb(1.0 + acc * 1e-12)
            return jnp.sum(g.xyz) * 1e-12
        return jax.lax.fori_loop(0, n, body, a0)

    float(run_vjp(pullback, jnp.float32(0.0), 1))
    t0 = time.perf_counter()
    float(run_vjp(pullback, jnp.float32(0.0), 1))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run_vjp(pullback, jnp.float32(0.0), 1 + it))
    tK = time.perf_counter() - t0
    print(f"{'vjp apply only (cached residuals)':36s} {(tK - t1) / it * 1000:8.2f} ms",
          flush=True)

    # --- forward-only for reference ---
    def mk_fwd():
        def body(acc):
            p = model.params.replace(xyz=model.params.xyz + acc * 1e-12)
            return loss(p) * 1e-12
        return body, jnp.float32(0.0)

    chain_time(mk_fwd, it, "render fwd (loss)")

    # --- pieces ---
    proj = jax.jit(
        lambda: project_gaussians(
            xyz=model.params.xyz, scaling=model.get_scaling(),
            rotation_raw=model.params.rotation, opacity=model.get_opacity()[..., 0],
            features=model.get_features(), active=model.active, camera=cam,
            sh_degree=model.active_sh_degree,
        )
    )()
    binning = jax.jit(
        lambda: bin_gaussians(proj.mean2d, proj.radius, proj.depth, W, H, ts, pair_capacity)
    )()
    fields = jax.jit(lambda: rz._build_fields(proj, proj.mean2d))()
    order = binning.order
    inv_order = jnp.argsort(order).astype(jnp.int32)
    fields_d = fields[:, order]
    P = binning.pair_gauss.shape[0]

    def mk_argsort_inv():
        def body(acc):
            o = order + jnp.int32(acc * 0)
            return jnp.sum(jnp.argsort(o)[:1].astype(jnp.float32)) * 1e-12 + acc * 1e-12
        return body, jnp.float32(0.0)

    chain_time(mk_argsort_inv, it, "argsort(order) inverse perm")

    def mk_scatter_inv():
        def body(acc):
            o = order + jnp.int32(acc * 0)
            inv = jnp.zeros_like(o).at[o].set(jnp.arange(N, dtype=jnp.int32))
            return jnp.sum(inv[:1].astype(jnp.float32)) * 1e-12 + acc * 1e-12
        return body, jnp.float32(0.0)

    chain_time(mk_scatter_inv, it, "scatter-iota inverse perm")

    # gather VJP: d_records -> per-rank segment sums
    d_records = jnp.ones((16, P + chunk), jnp.float32)

    def mk_gather_vjp():
        def body(acc):
            d = d_records + acc * 1e-12
            out = rz._gather_records_bwd(
                chunk, N,
                (binning.pair_gauss, binning.rank_offsets, binning.num_pairs),
                d,
            )[0]
            return jnp.sum(out[5]) * 1e-12
        return body, jnp.float32(0.0)

    chain_time(mk_gather_vjp, it, "pair-gather VJP (sort+cumsum)")

    # reorder VJP: one (16, N) gather by inv_order
    d_fd = jnp.ones_like(fields_d)

    def mk_reorder_vjp():
        def body(acc):
            d = d_fd + acc * 1e-12
            return jnp.sum(d[:, inv_order][5]) * 1e-12
        return body, jnp.float32(0.0)

    chain_time(mk_reorder_vjp, it, "depth-reorder VJP (gather)")

    # projection VJP
    def proj_loss(p):
        m = model.replace(params=p)
        pr = project_gaussians(
            xyz=m.params.xyz, scaling=m.get_scaling(), rotation_raw=m.params.rotation,
            opacity=m.get_opacity()[..., 0], features=m.get_features(), active=m.active,
            camera=cam, sh_degree=m.active_sh_degree,
        )
        return (
            jnp.sum(pr.mean2d) + jnp.sum(pr.conic) + jnp.sum(pr.color)
            + jnp.sum(pr.opacity) + jnp.sum(pr.depth)
        )

    def mk_proj_vjp():
        def body(acc):
            p = model.params.replace(xyz=model.params.xyz + acc * 1e-12)
            g = jax.grad(proj_loss)(p)
            return jnp.sum(g.xyz) * 1e-12
        return body, jnp.float32(0.0)

    chain_time(mk_proj_vjp, it, "project fwd+VJP")

    # binning + record build fwd (already profiled separately; here together)
    def mk_bin_build():
        def body(acc):
            b = bin_gaussians(
                proj.mean2d + acc * 1e-9, proj.radius, proj.depth, W, H, ts, pair_capacity
            )
            inv = jnp.argsort(b.order).astype(jnp.int32)
            fd = rz._reorder_fields(fields, b.order, inv)
            rec = rz._gather_records(
                fd, b.pair_gauss, b.rank_offsets, b.num_pairs, chunk, N
            )
            return jnp.sum(rec[5][:8]) * 1e-12
        return body, jnp.float32(0.0)

    chain_time(mk_bin_build, it, "bin + argsort + reorder + gather fwd")


if __name__ == "__main__":
    main()
