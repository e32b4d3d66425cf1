"""Chained timing of the non-render pieces of the binocular train step."""

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
    t0 = time.perf_counter(); float(run(init, 1)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(run(init, 1 + iters)); tK = time.perf_counter() - t0
    ms = (tK - t1) / iters * 1000.0
    print(f"{label:32s} {ms:8.2f} ms")
    return ms


def main():
    from binocular3dgs_tpu.config import Config
    from binocular3dgs_tpu.ops.losses import l1_loss, smooth_loss, ssim
    from binocular3dgs_tpu.ops.warp import inverse_warp_image, warp_mask

    H, W = 756, 1008
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
    gt = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
    disp = jnp.asarray((rng.random((H, W)) * 20 - 10).astype(np.float32))
    print(f"backend={jax.default_backend()} {W}x{H}")

    def mk(fn):
        def mk_():
            def body(acc):
                return fn(acc) * 1e-9
            return body, jnp.float32(0.0)
        return mk_

    chain_time(mk(lambda a: l1_loss(img + a, gt)), label="l1 fwd")
    chain_time(mk(lambda a: ssim(img + a, gt)), label="ssim fwd")
    chain_time(mk(lambda a: jax.grad(lambda x: ssim(x, gt))(img + a).sum()), label="ssim fwd+bwd")
    chain_time(mk(lambda a: smooth_loss(disp + a, gt)), label="smooth fwd")
    chain_time(
        mk(lambda a: jax.grad(lambda d: smooth_loss(d, gt))(disp + a).sum()),
        label="smooth fwd+bwd",
    )
    chain_time(mk(lambda a: inverse_warp_image(img + a, disp).sum()), label="warp fwd")
    chain_time(
        mk(
            lambda a: sum(
                jnp.sum(g)
                for g in jax.grad(
                    lambda x, d: inverse_warp_image(x, d).sum(), argnums=(0, 1)
                )(img + a, disp)
            )
        ),
        label="warp fwd+bwd",
    )
    chain_time(mk(lambda a: warp_mask(disp + a, H, W).sum()), label="warp_mask fwd")

    # adam + decay on 100k-capacity params
    from bench import make_workload
    from binocular3dgs_tpu.train.state import adam_update, group_lrs, init_train_state

    model, _, _ = make_workload(100_000, 64, 64)
    state = init_train_state(model)
    grads = jax.tree.map(jnp.ones_like, model.params)
    lrs = group_lrs(Config().opt, 1e-4)

    def mk_adam():
        def body(acc):
            g = jax.tree.map(lambda x: x + acc * 1e-12, grads)
            p, m, v, t = adam_update(
                model.params, g, state.adam_m, state.adam_v, state.adam_step, lrs, model.active
            )
            return jnp.sum(p.xyz) * 1e-9
        return body, jnp.float32(0.0)

    chain_time(mk_adam, label="adam update 100k")


if __name__ == "__main__":
    main()
