"""Production tiled rasterizer vs the dense golden oracle: forward and
gradient parity, binning correctness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from binocular3dgs_tpu.config import RasterConfig
from binocular3dgs_tpu.core.camera import make_camera
from binocular3dgs_tpu.ops.binning import bin_gaussians, tile_grid
from binocular3dgs_tpu.ops.rasterize import render_tiled
from binocular3dgs_tpu.ops.rasterize_reference import render_dense

from test_render_dense import make_model, simple_camera, W, H


def random_scene(n=64, seed=0, spread=1.2, zmin=3.0, zmax=9.0, smin=0.05, smax=0.4, cap=None):
    rng = np.random.default_rng(seed)
    xyz = np.stack(
        [
            rng.uniform(-spread, spread, n),
            rng.uniform(-spread * 0.75, spread * 0.75, n),
            rng.uniform(zmin, zmax, n),
        ],
        axis=1,
    )
    colors = rng.random((n, 3))
    ops = rng.uniform(0.2, 0.95, n)
    scales = rng.uniform(smin, smax, (n, 3))
    quats = rng.normal(size=(n, 4))
    return make_model(xyz, colors, ops, scales, capacity=cap, quats=quats)


class TestBinning:
    def test_bruteforce_pairs(self):
        rng = np.random.default_rng(1)
        n, w, h, ts = 20, 64, 48, 16
        mean2d = jnp.asarray(rng.uniform(-10, 70, (n, 2)).astype(np.float32))
        radius = jnp.asarray(np.round(rng.uniform(0, 20, n)).astype(np.float32))
        depth = jnp.asarray(rng.uniform(1, 10, n).astype(np.float32))
        out = bin_gaussians(mean2d, radius, depth, w, h, ts, 512)
        TW, TH = tile_grid(w, h, ts)

        # brute force: gaussian g covers tile (tx, ty) iff its clamped bbox does
        expected = {t: [] for t in range(TW * TH)}
        for g in range(n):
            r = float(radius[g])
            if r <= 0:
                continue
            x, y = float(mean2d[g, 0]), float(mean2d[g, 1])
            tx0 = min(TW, max(0, int(np.floor((x - r) / ts))))
            ty0 = min(TH, max(0, int(np.floor((y - r) / ts))))
            tx1 = min(TW, max(0, int((x + r + ts - 1) // ts)))
            ty1 = min(TH, max(0, int((y + r + ts - 1) // ts)))
            for ty in range(ty0, ty1):
                for tx in range(tx0, tx1):
                    expected[ty * TW + tx].append(g)

        start = np.asarray(out.tile_start)
        count = np.asarray(out.tile_count)
        order = np.asarray(out.order)
        pg = order[np.asarray(out.pair_gauss)]  # depth-rank -> original index
        d = np.asarray(depth)
        for t in range(TW * TH):
            got = sorted(pg[start[t] : start[t] + count[t]].tolist())
            assert got == sorted(expected[t]), f"tile {t}"
            # depth-sorted within tile
            seq = pg[start[t] : start[t] + count[t]]
            depths = d[seq]
            assert (np.diff(depths) >= 0).all()

    def test_fallback_path_matches_packed(self):
        """The searchsorted fallback (for word sizes overflowing int32) must
        produce the identical binning."""
        rng = np.random.default_rng(7)
        n, w, h, ts = 40, 96, 64, 16
        mean2d = jnp.asarray(rng.uniform(-10, 100, (n, 2)).astype(np.float32))
        radius = jnp.asarray(np.round(rng.uniform(0, 25, n)).astype(np.float32))
        depth = jnp.asarray(rng.uniform(1, 10, n).astype(np.float32))
        a = bin_gaussians(mean2d, radius, depth, w, h, ts, 1024)
        b = bin_gaussians(mean2d, radius, depth, w, h, ts, 1024, force_fallback=True)
        np.testing.assert_array_equal(np.asarray(a.pair_tile), np.asarray(b.pair_tile))
        np.testing.assert_array_equal(np.asarray(a.pair_gauss), np.asarray(b.pair_gauss))
        np.testing.assert_array_equal(np.asarray(a.tile_start), np.asarray(b.tile_start))
        np.testing.assert_array_equal(np.asarray(a.tile_count), np.asarray(b.tile_count))
        assert int(a.num_pairs) == int(b.num_pairs)

    def test_zero_radius_culled(self):
        out = bin_gaussians(
            jnp.zeros((4, 2)), jnp.zeros(4), jnp.ones(4), 32, 32, 16, 64
        )
        assert int(out.num_pairs) == 0
        assert int(out.tile_count.sum()) == 0

    def test_overflow_reported(self):
        n = 10
        mean2d = jnp.full((n, 2), 16.0)
        radius = jnp.full(n, 100.0)  # covers all tiles
        depth = jnp.linspace(1, 2, n)
        out = bin_gaussians(mean2d, radius, depth, 64, 64, 16, pair_capacity=32)
        assert int(out.num_pairs) == n * 16  # wanted
        assert int(out.tile_count.sum()) == 32  # truncated to capacity


RASTER = RasterConfig(max_pairs_per_tile=256, chunk=8)


class TestTiledVsDense:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_forward_parity(self, seed):
        cam = simple_camera()
        m = random_scene(seed=seed, n=48)
        bg = jnp.asarray([0.1, 0.2, 0.3])
        out_d = render_dense(cam, m, bg)
        out_t = render_tiled(cam, m, bg, raster=RASTER)
        np.testing.assert_allclose(out_t.image, out_d.image, atol=2e-5)
        np.testing.assert_allclose(out_t.depth, out_d.depth, atol=2e-4)
        np.testing.assert_allclose(out_t.alpha, out_d.alpha, atol=2e-5)
        np.testing.assert_allclose(out_t.radii, out_d.radii)

    def test_forward_parity_sh1(self):
        cam = simple_camera()
        m = random_scene(seed=3, n=32)
        m = m.replace(
            active_sh_degree=1,
            params=m.params.replace(
                f_rest=jnp.asarray(np.random.default_rng(4).normal(size=(32, 3, 3)) * 0.1)
            ),
        )
        bg = jnp.zeros(3)
        out_d = render_dense(cam, m, bg)
        out_t = render_tiled(cam, m, bg, raster=RASTER)
        np.testing.assert_allclose(out_t.image, out_d.image, atol=2e-5)

    def test_forward_parity_inactive(self):
        cam = simple_camera()
        m = random_scene(seed=5, n=16, cap=32)
        bg = jnp.ones(3)
        out_d = render_dense(cam, m, bg)
        out_t = render_tiled(cam, m, bg, raster=RASTER)
        np.testing.assert_allclose(out_t.image, out_d.image, atol=2e-5)

    def test_opaque_termination_parity(self):
        # heavy overdraw to hit the T<1e-4 termination path in both renderers
        cam = simple_camera()
        n = 120
        rng = np.random.default_rng(6)
        xyz = np.stack(
            [rng.uniform(-0.5, 0.5, n), rng.uniform(-0.4, 0.4, n), np.linspace(2, 12, n)], axis=1
        )
        m = make_model(xyz, rng.random((n, 3)), np.full(n, 0.97), np.full((n, 3), 1.0))
        out_d = render_dense(cam, m, jnp.zeros(3))
        out_t = render_tiled(cam, m, jnp.zeros(3), raster=RASTER)
        np.testing.assert_allclose(out_t.image, out_d.image, atol=3e-5)
        np.testing.assert_allclose(out_t.alpha, out_d.alpha, atol=3e-5)

    @pytest.mark.parametrize("seed", [0, 7])
    @pytest.mark.slow
    def test_gradient_parity(self, seed):
        cam = simple_camera()
        m = random_scene(seed=seed, n=40)
        bg = jnp.asarray([0.3, 0.1, 0.2])
        rng = np.random.default_rng(100 + seed)
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
        gt_, ct = jax.grad(
            lambda p, c: loss(lambda *a, **k: render_tiled(*a, raster=RASTER, **k), p, c),
            argnums=(0, 1),
        )(m.params, carrier)

        # tolerance: the custom backward reconstructs T by division (like the
        # CUDA kernel) — ~1e-3-relative f32 drift vs the oracle's cumprod
        for name in ("xyz", "f_dc", "f_rest", "opacity", "scaling", "rotation"):
            a, b = np.asarray(getattr(gd, name)), np.asarray(getattr(gt_, name))
            scale = np.abs(a).max() + 1e-8
            np.testing.assert_allclose(b, a, atol=1e-2 * scale, err_msg=name)
        np.testing.assert_allclose(
            np.asarray(ct), np.asarray(cd), atol=1e-2 * (np.abs(np.asarray(cd)).max() + 1e-8)
        )

    def test_image_not_multiple_of_tile(self):
        # 50x38 is not a multiple of 16 — crop path
        cam_odd = make_camera(np.eye(3), np.zeros(3), 0.9, 0.7, 50, 38)
        m = random_scene(seed=8, n=24)
        out_d = render_dense(cam_odd, m, jnp.zeros(3))
        out_t = render_tiled(cam_odd, m, jnp.zeros(3), raster=RASTER)
        assert out_t.image.shape == (3, 38, 50)
        np.testing.assert_allclose(out_t.image, out_d.image, atol=2e-5)
