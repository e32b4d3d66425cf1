"""Sharded rendering/training on the virtual 8-device CPU mesh: parity with
the single-device path (the SURVEY §4.4 distributed-test substitute)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from binocular3dgs_tpu.config import Config, RasterConfig
from binocular3dgs_tpu.core.camera import make_camera
from binocular3dgs_tpu.ops.rasterize import render_tiled
from binocular3dgs_tpu.parallel.sharding import make_mesh, make_sharded_render, make_sharded_train_step
from binocular3dgs_tpu.train.state import init_train_state
from binocular3dgs_tpu.train.step import make_train_step

from test_rasterize_tiled import random_scene

W, H = 64, 48
RASTER = RasterConfig(backend="xla", max_pairs_per_tile=256, chunk=8)


def camera():
    return make_camera(np.eye(3), np.zeros(3), 0.9, 0.7, W, H)


class TestShardedRender:
    @pytest.mark.parametrize("ndev", [2, 8])
    def test_matches_single_device(self, ndev):
        cam = camera()
        m = random_scene(seed=0, n=48)
        bg = jnp.asarray([0.2, 0.1, 0.3])
        mesh = make_mesh(ndev)
        render_sharded = make_sharded_render(mesh, W, H, RASTER)
        out_s = jax.jit(lambda mm: render_sharded(cam, mm, bg))(m)
        out_1 = render_tiled(cam, m, bg, raster=RASTER)
        np.testing.assert_allclose(out_s.image, out_1.image, atol=1e-5)
        np.testing.assert_allclose(out_s.depth, out_1.depth, atol=1e-4)
        np.testing.assert_allclose(out_s.alpha, out_1.alpha, atol=1e-5)
        np.testing.assert_allclose(out_s.radii, out_1.radii)

    @pytest.mark.slow  # ~3 min/param on CPU: grad through the all-gathered
    # vertex stage compiles a second full backward per device count
    @pytest.mark.parametrize("ndev", [2, 8])
    def test_gaussian_shard_matches_single_device(self, ndev):
        """Gaussian-axis vertex sharding (SURVEY §2.4): project N/ndev per
        device + all-gather projected outputs — must match the replicated
        path bit-for-bit in outputs and gradients."""
        cam = camera()
        m = random_scene(seed=7, n=48, cap=64)  # cap divisible by ndev
        bg = jnp.asarray([0.2, 0.1, 0.3])
        mesh = make_mesh(ndev)
        render_sharded = make_sharded_render(mesh, W, H, RASTER, shard_gaussians=True)
        out_s = jax.jit(lambda mm: render_sharded(cam, mm, bg))(m)
        out_1 = render_tiled(cam, m, bg, raster=RASTER)
        np.testing.assert_allclose(out_s.image, out_1.image, atol=1e-5)
        np.testing.assert_allclose(out_s.depth, out_1.depth, atol=1e-4)
        np.testing.assert_allclose(out_s.radii, out_1.radii)

        tgt = jnp.asarray(np.random.default_rng(8).random((3, H, W)).astype(np.float32))

        def loss(render_fn, params):
            out = render_fn(cam, m.replace(params=params), bg, mean2d_carrier=None)
            return jnp.mean((out.image - tgt) ** 2) + 0.1 * jnp.mean(out.alpha)

        g1 = jax.grad(
            lambda p: loss(lambda *a, **k: render_tiled(*a, raster=RASTER, **k), p)
        )(m.params)
        gs = jax.grad(lambda p: loss(render_sharded, p))(m.params)
        for name in ("xyz", "f_dc", "opacity", "scaling", "rotation"):
            a, b = np.asarray(getattr(g1, name)), np.asarray(getattr(gs, name))
            scale = np.abs(a).max() + 1e-8
            np.testing.assert_allclose(b, a, atol=1e-5 * scale, err_msg=name)

    @pytest.mark.slow
    def test_pallas_backend_matches_single_device(self):
        """The production TPU configuration — band-sharded render with the
        Pallas blend — must match the single-device render (interpret mode
        on the CPU mesh; VERDICT r1 weak-spot #2)."""
        raster_p = RasterConfig(backend="pallas", pallas_chunk=8, pairs_per_gaussian=16)
        cam = camera()
        m = random_scene(seed=5, n=32)
        bg = jnp.asarray([0.1, 0.2, 0.3])
        mesh = make_mesh(4)
        render_sharded = make_sharded_render(mesh, W, H, raster_p)
        out_s = jax.jit(lambda mm: render_sharded(cam, mm, bg))(m)
        out_1 = render_tiled(cam, m, bg, raster=raster_p)
        # band-local binning reorders f32 summation: ~1e-5-level drift
        np.testing.assert_allclose(out_s.image, out_1.image, atol=1e-4)
        np.testing.assert_allclose(out_s.depth, out_1.depth, rtol=2e-4, atol=3e-4)
        np.testing.assert_allclose(out_s.alpha, out_1.alpha, atol=1e-4)
        # gradients through the sharded pallas custom-VJP path
        tgt = jnp.asarray(np.random.default_rng(6).random((3, H, W)).astype(np.float32))

        def loss(render_fn, params):
            out = render_fn(cam, m.replace(params=params), bg, mean2d_carrier=None)
            return jnp.mean((out.image - tgt) ** 2) + 0.1 * jnp.mean(out.alpha)

        g1 = jax.grad(
            lambda p: loss(lambda *a, **k: render_tiled(*a, raster=raster_p, **k), p)
        )(m.params)
        gs = jax.grad(lambda p: loss(render_sharded, p))(m.params)
        for name in ("xyz", "f_dc", "opacity", "scaling", "rotation"):
            a, b = np.asarray(getattr(g1, name)), np.asarray(getattr(gs, name))
            scale = np.abs(a).max() + 1e-8
            np.testing.assert_allclose(b, a, atol=1e-2 * scale, err_msg=name)

    @pytest.mark.slow
    def test_gradients_match_with_psum(self):
        cam = camera()
        m = random_scene(seed=1, n=32)
        bg = jnp.zeros(3)
        tgt = jnp.asarray(np.random.default_rng(2).random((3, H, W)).astype(np.float32))
        mesh = make_mesh(4)
        render_sharded = make_sharded_render(mesh, W, H, RASTER)

        def loss(render_fn, params):
            out = render_fn(cam, m.replace(params=params), bg, mean2d_carrier=None)
            return jnp.mean((out.image - tgt) ** 2) + 0.1 * jnp.mean(out.alpha)

        g1 = jax.grad(lambda p: loss(lambda *a, **k: render_tiled(*a, raster=RASTER, **k), p))(
            m.params
        )
        gs = jax.grad(lambda p: loss(render_sharded, p))(m.params)
        for name in ("xyz", "f_dc", "opacity", "scaling", "rotation"):
            a, b = np.asarray(getattr(g1, name)), np.asarray(getattr(gs, name))
            scale = np.abs(a).max() + 1e-8
            np.testing.assert_allclose(b, a, atol=1e-2 * scale, err_msg=name)


class TestShardedTrainStep:
    @pytest.mark.slow
    def test_step_matches_single_device(self):
        cfg = Config()
        cfg.raster = RASTER
        cfg.opt.densify_from_iter = 10_000
        m = random_scene(seed=3, n=40, cap=64)
        state = init_train_state(m)
        cam = camera()
        gt = jnp.asarray(np.random.default_rng(4).random((3, H, W)).astype(np.float32))
        aw = jnp.zeros((H, W))
        key = jax.random.PRNGKey(0)

        step_1 = make_train_step(
            lambda *a, **k: render_tiled(*a, raster=RASTER, **k),
            cfg, 1.0, binocular=True, use_alpha_weight=False,
        )
        mesh = make_mesh(8)
        step_8 = make_sharded_train_step(cfg, mesh, W, H, 1.0, binocular=True)

        s1, m1 = step_1(state, cam, gt, aw, jnp.int32(1), key, jnp.zeros(3))
        s8, m8 = step_8(state, cam, gt, aw, jnp.int32(1), key, jnp.zeros(3))
        np.testing.assert_allclose(float(m8.loss), float(m1.loss), rtol=1e-5)
        np.testing.assert_allclose(
            float(m8.disparity_loss), float(m1.disparity_loss), rtol=1e-4
        )
        for name in ("xyz", "opacity", "scaling"):
            a = np.asarray(getattr(s1.model.params, name))
            b = np.asarray(getattr(s8.model.params, name))
            np.testing.assert_allclose(b, a, atol=2e-5, err_msg=name)
        np.testing.assert_allclose(
            np.asarray(s8.grad_accum), np.asarray(s1.grad_accum), atol=1e-4
        )

    @pytest.mark.slow
    def test_sharded_adam_matches_replicated(self):
        """SURVEY §2.4 last row: Adam moments partitioned along the gaussian
        axis (shard_adam=True) must be bit-compatible with the replicated
        optimizer — same losses, params, and moments over multiple steps,
        while the moment arrays actually live sharded on the mesh."""
        cfg = Config()
        cfg.raster = RASTER
        cfg.opt.densify_from_iter = 10_000
        m = random_scene(seed=9, n=40, cap=64)  # cap divisible by 8
        cam = camera()
        gt = jnp.asarray(np.random.default_rng(5).random((3, H, W)).astype(np.float32))
        aw = jnp.zeros((H, W))
        key = jax.random.PRNGKey(0)
        mesh = make_mesh(8)

        step_rep = make_sharded_train_step(cfg, mesh, W, H, 1.0, binocular=True)
        step_sha = make_sharded_train_step(
            cfg, mesh, W, H, 1.0, binocular=True, shard_adam=True
        )

        sr = ss = init_train_state(m)
        for it in range(1, 4):
            sr, mr = step_rep(sr, cam, gt, aw, jnp.int32(it), key, jnp.zeros(3))
            ss, ms = step_sha(ss, cam, gt, aw, jnp.int32(it), key, jnp.zeros(3))
            np.testing.assert_allclose(float(ms.loss), float(mr.loss), rtol=1e-6)

        # the sharded state's moments are actually partitioned over the mesh
        sh = ss.adam_m.xyz.sharding
        assert not sh.is_fully_replicated, sh
        for name in ("xyz", "f_dc", "opacity", "scaling", "rotation"):
            a = np.asarray(getattr(sr.model.params, name))
            b = np.asarray(getattr(ss.model.params, name))
            np.testing.assert_allclose(b, a, atol=1e-6, err_msg=name)
            am = np.asarray(getattr(sr.adam_m, name))
            bm = np.asarray(getattr(ss.adam_m, name))
            np.testing.assert_allclose(bm, am, atol=1e-6, err_msg="m:" + name)
            av = np.asarray(getattr(sr.adam_v, name))
            bv = np.asarray(getattr(ss.adam_v, name))
            np.testing.assert_allclose(bv, av, atol=1e-9, err_msg="v:" + name)
