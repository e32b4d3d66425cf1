"""Golden-oracle dense renderer tests: analytic single/two-gaussian checks,
culling, depth/alpha semantics, gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from binocular3dgs_tpu.core.camera import make_camera
from binocular3dgs_tpu.core.transforms import inverse_sigmoid
from binocular3dgs_tpu.models.gaussians import GaussianModel, GaussianParams, create_from_pcd
from binocular3dgs_tpu.ops.knn import mean_sq_dist_3nn
from binocular3dgs_tpu.ops.rasterize_reference import render_dense
from binocular3dgs_tpu.data.ply import PointCloud

W, H = 64, 48
FOVX, FOVY = 0.9, 0.7


def simple_camera():
    # camera at origin looking down +z (R = I as camera-to-world rotation)
    return make_camera(np.eye(3), np.zeros(3), FOVX, FOVY, W, H)


def make_model(xyz, colors, opacities, scales, capacity=None, quats=None):
    n = len(xyz)
    cap = capacity or n
    quats = quats if quats is not None else np.tile([1.0, 0, 0, 0], (n, 1))

    def pad(a, fill=0.0):
        out = np.full((cap,) + np.asarray(a).shape[1:], fill, np.float32)
        out[:n] = a
        return jnp.asarray(out)

    from binocular3dgs_tpu.core.sh import rgb_to_sh

    params = GaussianParams(
        xyz=pad(xyz),
        f_dc=pad(np.asarray(rgb_to_sh(jnp.asarray(colors)))[:, None, :]),
        f_rest=jnp.zeros((cap, 3, 3), jnp.float32),
        opacity=pad(np.asarray(inverse_sigmoid(jnp.asarray(opacities)))[:, None]),
        scaling=pad(np.log(scales), fill=-20.0),
        rotation=pad(quats, fill=0.0).at[n:, 0].set(1.0),
    )
    active = jnp.zeros(cap, bool).at[:n].set(True)
    return GaussianModel(params=params, active=active, max_sh_degree=1, active_sh_degree=0)


class TestKnn:
    def test_matches_bruteforce(self):
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(300, 3)).astype(np.float32)
        d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        expected = np.sort(d2, axis=1)[:, :3].mean(axis=1)
        got = np.asarray(mean_sq_dist_3nn(jnp.asarray(pts), block_size=128))
        np.testing.assert_allclose(got, expected, rtol=1e-4)

    def test_uniform_grid(self):
        # 3 nearest neighbors of interior points of a unit-spaced line are at
        # distances 1, 1, 2 -> mean sq = (1+1+4)/3
        pts = np.zeros((10, 3), np.float32)
        pts[:, 0] = np.arange(10)
        got = np.asarray(mean_sq_dist_3nn(jnp.asarray(pts)))
        np.testing.assert_allclose(got[5], 2.0, rtol=1e-5)


class TestCreateFromPcd:
    def test_init_values(self):
        rng = np.random.default_rng(1)
        pcd = PointCloud(points=rng.normal(size=(50, 3)), colors=rng.random((50, 3)))
        m = create_from_pcd(pcd, spatial_lr_scale=2.5, max_sh_degree=1)
        assert m.capacity == 128  # next_pow2(100)
        assert int(m.count()) == 50
        np.testing.assert_allclose(np.asarray(m.get_opacity())[:50], 0.1, rtol=1e-5)
        # scales: log(sqrt(mean 3nn sq dist)) replicated over 3 axes
        s = np.asarray(m.params.scaling)[:50]
        assert np.allclose(s[:, 0], s[:, 1]) and np.allclose(s[:, 1], s[:, 2])
        # DC color roundtrip
        from binocular3dgs_tpu.core.sh import sh_to_rgb

        np.testing.assert_allclose(
            np.asarray(sh_to_rgb(m.params.f_dc[:50, 0])), pcd.colors, rtol=1e-5, atol=1e-6
        )
        assert m.spatial_lr_scale == 2.5


class TestDenseRenderer:
    def test_background_only(self):
        cam = simple_camera()
        m = make_model(np.zeros((1, 3)) + [0, 0, -5.0], np.ones((1, 3)), [0.9], np.ones((1, 3)))
        bg = jnp.array([0.2, 0.4, 0.6])
        out = render_dense(cam, m, bg)
        # gaussian behind the camera: culled, image == bg
        np.testing.assert_allclose(out.image, np.broadcast_to(np.asarray(bg)[:, None, None], (3, H, W)), atol=1e-6)
        assert float(out.radii[0]) == 0.0
        np.testing.assert_allclose(out.alpha, 0.0, atol=1e-7)
        np.testing.assert_allclose(out.depth, 0.0, atol=1e-7)

    def test_single_gaussian_center_value(self):
        cam = simple_camera()
        z, s, op = 5.0, 0.05, 0.8
        color = np.array([[1.0, 0.5, 0.25]])
        m = make_model(np.array([[0, 0, z]]), color, [op], np.full((1, 3), s))
        bg = jnp.zeros(3)
        out = render_dense(cam, m, bg)
        # analytic EWA: isotropic gaussian aligned with camera ->
        # sigma2 = (f * s / z)^2 + 0.3 per axis
        fx = W / (2 * np.tan(FOVX / 2))
        fy = H / (2 * np.tan(FOVY / 2))
        sx2 = (fx * s / z) ** 2 + 0.3
        sy2 = (fy * s / z) ** 2 + 0.3
        cx, cy = (W - 1) / 2, (H - 1) / 2  # ndc2pix of center
        px, py = int(round(cx)), int(round(cy))
        ddx, ddy = cx - px, cy - py
        power = -0.5 * (ddx * ddx / sx2 + ddy * ddy / sy2)
        alpha = min(0.99, op * np.exp(power))
        np.testing.assert_allclose(out.image[:, py, px], color[0] * alpha, rtol=1e-4)
        np.testing.assert_allclose(out.depth[py, px], z * alpha, rtol=1e-4)
        np.testing.assert_allclose(out.alpha[py, px], alpha, rtol=1e-4)
        # radius = ceil(3 * sqrt(max eigenvalue)), with the CUDA-spec
        # max(0.1, ...) discriminant clamp that slightly inflates the radius of
        # near-isotropic splats (binning-only conservatism)
        mid = 0.5 * (sx2 + sy2)
        lam1 = mid + np.sqrt(max(0.1, mid * mid - sx2 * sy2))
        assert float(out.radii[0]) == np.ceil(3 * np.sqrt(lam1))
        assert bool(out.visible[0])

    def test_two_gaussians_depth_order(self):
        cam = simple_camera()
        red, blue = [1.0, 0, 0], [0, 0, 1.0]
        op = 0.6
        m = make_model(
            np.array([[0, 0, 8.0], [0, 0, 4.0]]),  # listed back-to-front on purpose
            np.array([blue, red]),
            [op, op],
            np.full((2, 3), 2.0),  # huge -> alpha ~ op at center
        )
        bg = jnp.ones(3)
        out = render_dense(cam, m, bg)
        px, py = W // 2, H // 2
        # nearly flat splats: alpha ~= op everywhere near center
        expected = (
            np.array(red) * op
            + np.array(blue) * op * (1 - op)
            + 1.0 * (1 - op) ** 2
        )
        np.testing.assert_allclose(out.image[:, py, px], expected, rtol=2e-3)
        d_expected = 4.0 * op + 8.0 * op * (1 - op)
        np.testing.assert_allclose(out.depth[py, px], d_expected, rtol=2e-3)

    def test_opacity_clamped_at_099(self):
        cam = simple_camera()
        m = make_model(np.array([[0, 0, 5.0]]), np.ones((1, 3)), [0.9999], np.full((1, 3), 1.0))
        out = render_dense(cam, m, jnp.zeros(3))
        assert float(out.alpha.max()) <= 0.99 + 1e-6

    def test_inactive_not_rendered(self):
        cam = simple_camera()
        m = make_model(np.array([[0, 0, 5.0]]), np.ones((1, 3)), [0.9], np.ones((1, 3)), capacity=4)
        m_off = m.replace(active=jnp.zeros(4, bool))
        out = render_dense(cam, m_off, jnp.zeros(3))
        np.testing.assert_allclose(out.image, 0.0, atol=1e-7)

    def test_transmittance_termination(self):
        # 200 nearly-opaque gaussians stacked: far ones must not contribute and
        # alpha saturates near 1 (but composited T never goes below 1e-4 rule)
        cam = simple_camera()
        n = 200
        xyz = np.zeros((n, 3))
        xyz[:, 2] = np.linspace(2, 50, n)
        m = make_model(xyz, np.ones((n, 3)), np.full(n, 0.95), np.full((n, 3), 3.0))
        out = render_dense(cam, m, jnp.zeros(3))
        assert float(out.alpha[H // 2, W // 2]) > 0.999
        # depth must be close to the front depth (weights collapse quickly)
        assert abs(float(out.depth[H // 2, W // 2]) - 2.0) < 0.5

    def test_sh_view_dependence(self):
        # degree-1 coefficients make color depend on viewing direction
        cam = simple_camera()
        m = make_model(np.array([[1.5, 0, 5.0]]), np.full((1, 3), 0.5), [0.9], np.full((1, 3), 0.3))
        m = m.replace(
            params=m.params.replace(f_rest=m.params.f_rest.at[0, :, :].set(0.4)),
            active_sh_degree=1,
        )
        out = render_dense(cam, m, jnp.zeros(3))
        m0 = m.replace(active_sh_degree=0)
        out0 = render_dense(cam, m0, jnp.zeros(3))
        assert not np.allclose(out.image, out0.image)

    def test_gradients_flow(self):
        cam = simple_camera()
        m = make_model(
            np.array([[0.2, -0.1, 5.0], [-0.3, 0.2, 6.0]]),
            np.array([[0.9, 0.2, 0.1], [0.1, 0.8, 0.3]]),
            [0.7, 0.6],
            # anisotropic scales + tilted quats so rotation has nonzero grad
            np.array([[0.3, 0.1, 0.2], [0.15, 0.4, 0.1]]),
            quats=np.array([[0.9, 0.3, 0.2, 0.1], [0.8, -0.2, 0.4, 0.3]]),
        )
        target = jnp.zeros((3, H, W))

        def loss_fn(params, carrier):
            mm = m.replace(params=params)
            out = render_dense(cam, mm, jnp.zeros(3), mean2d_carrier=carrier)
            return jnp.mean((out.image - target) ** 2) + 0.1 * jnp.mean(out.depth) + 0.1 * jnp.mean(out.alpha)

        carrier = jnp.zeros((2, 2))
        grads, cgrad = jax.grad(loss_fn, argnums=(0, 1))(m.params, carrier)
        for name in ("xyz", "f_dc", "opacity", "scaling", "rotation"):
            g = np.asarray(getattr(grads, name))
            assert np.isfinite(g).all(), name
            assert np.abs(g).sum() > 0, name
        # screen-space densification gradient flows through the carrier
        assert np.isfinite(np.asarray(cgrad)).all()
        assert np.abs(np.asarray(cgrad)).sum() > 0

    @pytest.mark.slow
    def test_numerical_gradient_xyz(self):
        # float64 so the finite difference is trustworthy (verified to agree
        # to ~1e-9 relative at eps=1e-4)
        with jax.enable_x64(True):
            cam = simple_camera()
            m = make_model(
                np.array([[0.1, 0.05, 5.0]]), np.array([[0.8, 0.4, 0.2]]), [0.7], np.full((1, 3), 0.3)
            )

            def loss_fn(x0):
                mm = m.replace(
                    params=m.params.replace(
                        xyz=m.params.xyz.astype(jnp.float64).at[0, 0].set(x0)
                    )
                )
                out = render_dense(cam, mm, jnp.zeros(3))
                return jnp.sum(out.image**2)

            g = float(jax.grad(loss_fn)(jnp.float64(0.1)))
            eps = 1e-4
            fd = (float(loss_fn(jnp.float64(0.1 + eps))) - float(loss_fn(jnp.float64(0.1 - eps)))) / (
                2 * eps
            )
            np.testing.assert_allclose(g, fd, rtol=1e-5)
