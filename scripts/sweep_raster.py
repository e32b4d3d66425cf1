"""Sweep RasterConfig (tile_size, pallas_chunk) for render fwd / fwd+bwd."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def chain_time(make_body, iters=10):
    body_fn, init = make_body()

    @jax.jit
    def run(a0, n):
        return jax.lax.fori_loop(0, n, lambda i, acc: body_fn(acc), a0)

    float(run(init, 1))
    t0 = time.perf_counter(); float(run(init, 1)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(run(init, 1 + iters)); tK = time.perf_counter() - t0
    return (tK - t1) / iters * 1000.0


def main():
    from bench import make_workload
    from binocular3dgs_tpu.config import Config
    from binocular3dgs_tpu.ops.rasterize import render_tiled

    model, cam, gt = make_workload(100_000, 1008, 756)
    print(f"backend={jax.default_backend()}")

    import itertools

    for ts, chunk, group in itertools.product((16,), (128, 256, 512), (8, 16, 32)):
            cfg = Config()
            cfg.raster.pairs_per_gaussian = 8
            cfg.raster.tile_size = ts
            cfg.raster.pallas_chunk = chunk
            cfg.raster.pallas_tile_group = group

            def mk_fwd():
                def body(acc):
                    p = model.params.replace(xyz=model.params.xyz + acc * 1e-12)
                    out = render_tiled(
                        cam, model.replace(params=p), jnp.zeros(3), raster=cfg.raster
                    )
                    return jnp.sum(out.image) * 1e-12
                return body, jnp.float32(0.0)

            def mk_grad():
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

            f = chain_time(mk_fwd)
            g = chain_time(mk_grad)
            print(
                f"ts={ts:3d} chunk={chunk:4d} group={group:3d}: "
                f"fwd {f:7.2f} ms  fwd+bwd {g:7.2f} ms", flush=True,
            )


if __name__ == "__main__":
    main()
