"""Core math layer tests: SH, transforms, camera matrices, shifted camera."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from binocular3dgs_tpu.core import sh, transforms
from binocular3dgs_tpu.core.camera import make_camera, shift_camera


def random_rotation(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


class TestSH:
    def test_degree0_is_constant(self):
        coeffs = jnp.ones((5, 3, 1)) * 2.0
        dirs = jnp.array([[0.0, 0.0, 1.0]] * 5)
        out = sh.eval_sh(0, coeffs, dirs)
        np.testing.assert_allclose(out, 2.0 * sh.C0, rtol=1e-6)

    def test_degree1_linear_terms(self):
        # coefficient layout: [dc, Y1-1(y), Y10(z), Y11(x)]
        coeffs = jnp.zeros((1, 3, 4)).at[0, :, 3].set(1.0)
        d = np.array([0.3, -0.5, 0.8])
        d = d / np.linalg.norm(d)
        out = sh.eval_sh(1, coeffs, jnp.asarray(d[None]))
        np.testing.assert_allclose(out[0], -sh.C1 * d[0], rtol=1e-5)

    def test_rgb_sh_roundtrip(self):
        rgb = jnp.array([0.1, 0.5, 0.9])
        np.testing.assert_allclose(sh.sh_to_rgb(sh.rgb_to_sh(rgb)), rgb, rtol=1e-6)

    @pytest.mark.parametrize("deg", [0, 1, 2, 3, 4])
    def test_rotational_average(self, deg):
        # Mean of SH over uniformly sampled directions approx = C0 * dc coeff
        # (all higher bands integrate to ~0).
        rng = np.random.default_rng(0)
        K = (deg + 1) ** 2
        coeffs = jnp.asarray(rng.normal(size=(1, 1, K)))
        dirs = rng.normal(size=(200000, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        vals = sh.eval_sh(deg, jnp.broadcast_to(coeffs, (200000, 1, K)), jnp.asarray(dirs))
        assert abs(float(vals.mean()) - sh.C0 * float(coeffs[0, 0, 0])) < 2e-2


class TestTransforms:
    def test_quat_to_rotmat_identity(self):
        R = transforms.quat_to_rotmat(jnp.array([1.0, 0.0, 0.0, 0.0]))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-6)

    def test_quat_to_rotmat_orthonormal(self):
        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.normal(size=(10, 4)))
        R = transforms.quat_to_rotmat(q)
        eye = jnp.einsum("bij,bkj->bik", R, R)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (10, 3, 3)), atol=1e-4)
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), np.ones(10), atol=1e-4)

    def test_unnormalized_quat_is_normalized(self):
        q = jnp.array([2.0, 0.0, 0.0, 0.0])
        np.testing.assert_allclose(transforms.quat_to_rotmat(q), np.eye(3), atol=1e-6)

    def test_covariance_psd_and_eigvals(self):
        rng = np.random.default_rng(2)
        s = jnp.asarray(np.abs(rng.normal(size=(4, 3))) + 0.1)
        q = jnp.asarray(rng.normal(size=(4, 4)))
        cov = transforms.covariance_from_scaling_rotation(s, 1.0, q)
        # symmetric
        np.testing.assert_allclose(cov, np.swapaxes(np.asarray(cov), -1, -2), atol=1e-5)
        # eigenvalues = squared scales
        ev = np.sort(np.linalg.eigvalsh(np.asarray(cov)), axis=-1)
        np.testing.assert_allclose(ev, np.sort(np.asarray(s) ** 2, axis=-1), rtol=1e-4)

    def test_strip_symmetric_layout(self):
        m = jnp.arange(9.0).reshape(1, 3, 3)
        out = transforms.strip_symmetric(m)
        np.testing.assert_allclose(out[0], [0.0, 1.0, 2.0, 4.0, 5.0, 8.0])

    def test_projection_matrix_corners(self):
        fovx, fovy = 0.8, 0.6
        znear, zfar = 0.01, 100.0
        P = transforms.projection_matrix(znear, zfar, fovx, fovy)
        # a point at (tan(fovx/2)*z, tan(fovy/2)*z, z) maps to ndc (1, 1)
        z = 5.0
        p = np.array([math.tan(fovx / 2) * z, math.tan(fovy / 2) * z, z, 1.0])
        clip = P @ p
        ndc = clip[:3] / clip[3]
        np.testing.assert_allclose(ndc[:2], [1.0, 1.0], rtol=1e-5)
        # znear maps to z_ndc ~ 0, zfar to 1
        near_ndc = P @ np.array([0, 0, znear, 1.0])
        far_ndc = P @ np.array([0, 0, zfar, 1.0])
        assert abs(near_ndc[2] / near_ndc[3]) < 1e-5
        np.testing.assert_allclose(far_ndc[2] / far_ndc[3], 1.0, rtol=1e-6)

    def test_expon_lr_schedule(self):
        fn = transforms.expon_lr_schedule(1.6e-4, 1.6e-6, lr_delay_mult=0.01, max_steps=30_000)
        np.testing.assert_allclose(float(fn(0)), 1.6e-4, rtol=1e-6)
        np.testing.assert_allclose(float(fn(30_000)), 1.6e-6, rtol=1e-6)
        np.testing.assert_allclose(float(fn(15_000)), math.sqrt(1.6e-4 * 1.6e-6), rtol=1e-5)
        assert float(fn(-1)) == 0.0

    def test_inverse_sigmoid(self):
        x = jnp.array([0.1, 0.5, 0.9])
        np.testing.assert_allclose(jax.nn.sigmoid(transforms.inverse_sigmoid(x)), x, rtol=1e-6)


class TestCamera:
    def _make(self, seed=0, w=64, h=48):
        rng = np.random.default_rng(seed)
        R = random_rotation(rng)  # camera-to-world rotation (data-layer convention)
        T = rng.normal(size=3)
        fovx, fovy = 0.9, 0.7
        return make_camera(R, T, fovx, fovy, w, h), (R, T)

    def test_world_view_roundtrip(self):
        cam, (R, T) = self._make()
        # world_view is the transposed W2C: row-vector convention
        M = np.asarray(cam.world_view).T
        np.testing.assert_allclose(M[:3, :3], R.T, atol=1e-5)
        np.testing.assert_allclose(M[:3, 3], T, atol=1e-5)

    def test_cam_center(self):
        cam, (R, T) = self._make()
        # center = -R_w2c^T t ; R_w2c = R.T
        expected = -R @ T
        np.testing.assert_allclose(cam.cam_center, expected, atol=1e-5)

    def test_full_proj_consistency(self):
        cam, _ = self._make()
        np.testing.assert_allclose(
            cam.full_proj, np.asarray(cam.world_view) @ np.asarray(cam.proj), atol=1e-5
        )

    def test_focal(self):
        cam, _ = self._make()
        np.testing.assert_allclose(float(cam.focal_x), transforms.fov2focal(0.9, 64), rtol=1e-6)
        np.testing.assert_allclose(float(cam.focal_y), transforms.fov2focal(0.7, 48), rtol=1e-6)

    def test_shift_camera_moves_center_along_x(self):
        cam, (R, T) = self._make()
        d = 0.25
        shifted = shift_camera(cam, d)
        delta = np.asarray(shifted.cam_center) - np.asarray(cam.cam_center)
        # camera x-axis in world space = first row of W2C rotation transposed
        M = np.asarray(cam.world_view).T
        x_axis = M[:3, :3].T @ np.array([1.0, 0.0, 0.0])
        np.testing.assert_allclose(delta, d * x_axis, atol=1e-5)
        # orientation unchanged
        Ms = np.asarray(shifted.world_view).T
        np.testing.assert_allclose(Ms[:3, :3], M[:3, :3], atol=1e-6)

    def test_shift_camera_jit(self):
        cam, _ = self._make()
        out = jax.jit(shift_camera)(cam, jnp.float32(0.1))
        ref = shift_camera(cam, 0.1)
        np.testing.assert_allclose(out.full_proj, ref.full_proj, atol=1e-6)

    def test_shift_zero_is_identity(self):
        cam, _ = self._make()
        shifted = shift_camera(cam, 0.0)
        np.testing.assert_allclose(shifted.world_view, cam.world_view, atol=1e-6)
        np.testing.assert_allclose(shifted.full_proj, cam.full_proj, atol=1e-6)
