"""Pallas blend kernels (interpret mode on CPU) vs the dense oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from binocular3dgs_tpu.config import RasterConfig
from binocular3dgs_tpu.core.camera import make_camera
from binocular3dgs_tpu.ops.rasterize import render_tiled
from binocular3dgs_tpu.ops.rasterize_reference import render_dense

from test_render_dense import make_model
from test_rasterize_tiled import random_scene

W, H = 48, 32
FOVX, FOVY = 0.9, 0.7

RASTER_P = RasterConfig(backend="pallas", pallas_chunk=8, pairs_per_gaussian=16)


def small_camera():
    return make_camera(np.eye(3), np.zeros(3), FOVX, FOVY, W, H)


class TestPallasBlend:
    @pytest.mark.parametrize("seed", [0, 1])
    @pytest.mark.slow
    def test_forward_parity(self, seed):
        cam = small_camera()
        m = random_scene(seed=seed, n=24, spread=0.8)
        bg = jnp.asarray([0.15, 0.3, 0.45])
        out_d = render_dense(cam, m, bg)
        out_p = render_tiled(cam, m, bg, raster=RASTER_P)
        np.testing.assert_allclose(out_p.image, out_d.image, atol=3e-5)
        np.testing.assert_allclose(out_p.depth, out_d.depth, atol=3e-4)
        np.testing.assert_allclose(out_p.alpha, out_d.alpha, atol=3e-5)

    def test_forward_heavy_overdraw(self):
        cam = small_camera()
        n = 60
        rng = np.random.default_rng(2)
        xyz = np.stack(
            [rng.uniform(-0.3, 0.3, n), rng.uniform(-0.2, 0.2, n), np.linspace(2, 8, n)], axis=1
        )
        m = make_model(xyz, rng.random((n, 3)), np.full(n, 0.97), np.full((n, 3), 0.8))
        out_d = render_dense(cam, m, jnp.zeros(3))
        out_p = render_tiled(cam, m, jnp.zeros(3), raster=RASTER_P)
        np.testing.assert_allclose(out_p.image, out_d.image, atol=3e-5)
        np.testing.assert_allclose(out_p.alpha, out_d.alpha, atol=3e-5)

    @pytest.mark.slow
    def test_gradient_parity(self):
        cam = small_camera()
        m = random_scene(seed=3, n=20, spread=0.8)
        bg = jnp.asarray([0.2, 0.1, 0.4])
        rng = np.random.default_rng(5)
        tgt = jnp.asarray(rng.random((3, H, W)).astype(np.float32))

        def loss(render_fn, params, carrier):
            mm = m.replace(params=params)
            out = render_fn(cam, mm, bg, mean2d_carrier=carrier)
            return (
                jnp.mean((out.image - tgt) ** 2)
                + 0.05 * jnp.mean(out.depth)
                + 0.1 * jnp.mean(out.alpha**2)
            )

        carrier = jnp.zeros((m.capacity, 2))
        gd, cd = jax.grad(lambda p, c: loss(render_dense, p, c), argnums=(0, 1))(m.params, carrier)
        gp, cp = jax.grad(
            lambda p, c: loss(lambda *a, **k: render_tiled(*a, raster=RASTER_P, **k), p, c),
            argnums=(0, 1),
        )(m.params, carrier)
        for name in ("xyz", "f_dc", "f_rest", "opacity", "scaling", "rotation"):
            a, b = np.asarray(getattr(gd, name)), np.asarray(getattr(gp, name))
            scale = np.abs(a).max() + 1e-8
            np.testing.assert_allclose(b, a, atol=1e-2 * scale, err_msg=name)
        np.testing.assert_allclose(
            np.asarray(cp), np.asarray(cd), atol=1e-2 * (np.abs(np.asarray(cd)).max() + 1e-8)
        )
