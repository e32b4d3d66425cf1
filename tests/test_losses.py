"""Loss/metric/warp tests against independent numpy/scipy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.ndimage import convolve

from binocular3dgs_tpu.ops.losses import l1_loss, psnr, smooth_loss, ssim
from binocular3dgs_tpu.ops.warp import inverse_warp_image, warp_mask


def ssim_oracle(img1, img2, size=11, sigma=1.5):
    """scipy-based SSIM identical to the reference torch implementation:
    per-channel 2D gaussian conv with zero padding. imgs: (C, H, W)."""
    xs = np.arange(size) - size // 2
    g = np.exp(-(xs**2) / (2 * sigma**2))
    g = g / g.sum()
    win = np.outer(g, g)

    def blur(x):
        return np.stack(
            [convolve(x[c], win, mode="constant", cval=0.0) for c in range(x.shape[0])],
            axis=0,
        )

    mu1, mu2 = blur(img1), blur(img2)
    s1 = blur(img1 * img1) - mu1 * mu1
    s2 = blur(img2 * img2) - mu2 * mu2
    s12 = blur(img1 * img2) - mu1 * mu2
    c1, c2 = 0.01**2, 0.03**2
    m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / ((mu1**2 + mu2**2 + c1) * (s1 + s2 + c2))
    return m.mean()


class TestL1:
    def test_plain(self):
        rng = np.random.default_rng(0)
        a, b = rng.random((8, 8, 3)), rng.random((8, 8, 3))
        np.testing.assert_allclose(float(l1_loss(jnp.asarray(a), jnp.asarray(b))), np.abs(a - b).mean(), rtol=1e-6)

    def test_masked_unnormalized(self):
        # the reference takes the mean over ALL pixels, not just masked ones
        rng = np.random.default_rng(1)
        a, b = rng.random((4, 4, 3)), rng.random((4, 4, 3))
        mask = np.zeros((4, 4, 1))
        mask[:2] = 1.0
        expected = np.abs(a * mask - b * mask).mean()
        got = float(l1_loss(jnp.asarray(a), jnp.asarray(b), mask=jnp.asarray(mask)))
        np.testing.assert_allclose(got, expected, rtol=1e-6)


class TestSSIM:
    def test_identical_images(self):
        rng = np.random.default_rng(2)
        img = rng.random((3, 32, 40)).astype(np.float32)
        assert float(ssim(jnp.asarray(img), jnp.asarray(img))) > 0.9999

    def test_matches_scipy_oracle(self):
        rng = np.random.default_rng(3)
        a = rng.random((3, 24, 30)).astype(np.float32)
        b = np.clip(a + 0.1 * rng.normal(size=a.shape), 0, 1).astype(np.float32)
        got = float(ssim(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(got, ssim_oracle(a, b), rtol=1e-4)

    def test_batch_no_average(self):
        rng = np.random.default_rng(4)
        a = rng.random((2, 3, 16, 16)).astype(np.float32)
        b = rng.random((2, 3, 16, 16)).astype(np.float32)
        per = ssim(jnp.asarray(a), jnp.asarray(b), size_average=False)
        assert per.shape == (2,)
        np.testing.assert_allclose(float(per[0]), ssim_oracle(a[0], b[0]), rtol=1e-4)

    def test_differentiable(self):
        rng = np.random.default_rng(5)
        a = jnp.asarray(rng.random((3, 16, 16)).astype(np.float32))
        b = jnp.asarray(rng.random((3, 16, 16)).astype(np.float32))
        g = jax.grad(lambda x: 1.0 - ssim(x, b))(a)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0


class TestSmoothLoss:
    def test_matches_manual(self):
        rng = np.random.default_rng(6)
        d = rng.random((12, 14)).astype(np.float32)
        img = rng.random((3, 12, 14)).astype(np.float32)
        got = float(smooth_loss(jnp.asarray(d), jnp.asarray(img)))
        # manual oracle: VALID central differences
        ex_im = 0.5 * (img[:, 1:-1, 2:] - img[:, 1:-1, :-2]).sum(0)
        ey_im = 0.5 * (img[:, 2:, 1:-1] - img[:, :-2, 1:-1]).sum(0)
        ex_d = 0.5 * (d[1:-1, 2:] - d[1:-1, :-2])
        ey_d = 0.5 * (d[2:, 1:-1] - d[:-2, 1:-1])
        expected = (np.abs(np.exp(-0.33 * np.abs(ex_im)) * ex_d)).mean() + (
            np.abs(np.exp(-0.33 * np.abs(ey_im)) * ey_d)
        ).mean()
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_constant_disparity_is_zero(self):
        img = jnp.asarray(np.random.default_rng(7).random((3, 10, 10)), dtype=jnp.float32)
        assert float(smooth_loss(jnp.full((10, 10), 3.2), img)) < 1e-7

    def test_edges_downweight(self):
        # a strong image edge at the disparity discontinuity reduces the loss
        d = np.zeros((10, 10), np.float32)
        d[:, 5:] = 1.0
        flat = np.full((3, 10, 10), 0.5, np.float32)
        edgy = flat.copy()
        edgy[:, :, 5:] = 1.0
        l_flat = float(smooth_loss(jnp.asarray(d), jnp.asarray(flat)))
        l_edgy = float(smooth_loss(jnp.asarray(d), jnp.asarray(edgy)))
        assert l_edgy < l_flat


class TestPSNR:
    def test_known_value(self):
        a = np.zeros((8, 8, 3), np.float32)
        b = np.full((8, 8, 3), 0.1, np.float32)
        np.testing.assert_allclose(float(psnr(jnp.asarray(a), jnp.asarray(b))), 20.0, rtol=1e-5)

    def test_masked(self):
        rng = np.random.default_rng(8)
        a, b = rng.random((8, 8, 3)).astype(np.float32), rng.random((8, 8, 3)).astype(np.float32)
        mask = np.zeros((8, 8, 1), np.float32)
        mask[:4] = 1.0
        mse = ((a - b)[:4] ** 2).mean()
        expected = 20 * np.log10(1.0 / np.sqrt(mse))
        got = float(psnr(jnp.asarray(a), jnp.asarray(b), mask=jnp.asarray(mask)))
        np.testing.assert_allclose(got, expected, rtol=1e-5)


def warp_oracle(image, disparity):
    """Literal python-loop reimplementation of the reference warp semantics.
    image: (C, H, W)."""
    C, H, W = image.shape
    out = np.zeros_like(image)
    for r in range(H):
        for c in range(W):
            d = disparity[r, c]
            x0 = int(np.floor(d))
            x1 = x0 + 1
            c0, c1 = c + x0, c + x1
            if c0 < 0 or c0 >= W or c1 < 0 or c1 >= W:
                continue
            out[:, r, c] = (x1 - d) * image[:, r, c0] + (d - x0) * image[:, r, c1]
    return out


class TestWarp:
    def test_matches_oracle(self):
        rng = np.random.default_rng(9)
        img = rng.random((3, 10, 12)).astype(np.float32)
        disp = (rng.random((10, 12)).astype(np.float32) - 0.5) * 6
        got = np.asarray(inverse_warp_image(jnp.asarray(img), jnp.asarray(disp)))
        np.testing.assert_allclose(got, warp_oracle(img, disp), atol=1e-6)

    def test_zero_disparity_identity(self):
        rng = np.random.default_rng(10)
        img = rng.random((3, 6, 8)).astype(np.float32)
        got = np.asarray(inverse_warp_image(jnp.asarray(img), jnp.zeros((6, 8))))
        # column W-1 invalid because x1 = c+1 goes OOB (reference behavior)
        np.testing.assert_allclose(got[..., :-1], img[..., :-1], atol=1e-6)
        np.testing.assert_allclose(got[..., -1], 0.0)

    def test_integer_shift(self):
        img = np.zeros((1, 4, 8), np.float32)
        img[..., 5] = 1.0
        got = np.asarray(inverse_warp_image(jnp.asarray(img), jnp.full((4, 8), 2.0)))
        np.testing.assert_allclose(got[..., 3], 1.0)

    def test_mask(self):
        m = np.asarray(warp_mask(jnp.full((4, 8), -3.0), 4, 8))
        # d = -3: c0 = c-3 valid for c >= 3; c1 = c-2 valid for c >= 2 => c >= 3
        assert (m[:, :3] == 0).all() and (m[:, 3:] == 1).all()

    def test_disparity_gradient(self):
        rng = np.random.default_rng(11)
        img = jnp.asarray(rng.random((3, 6, 8)).astype(np.float32))
        disp = jnp.full((6, 8), 1.3)

        def f(d):
            return jnp.sum(inverse_warp_image(img, d))

        g = np.asarray(jax.grad(f)(disp))
        assert np.isfinite(g).all()
        # interior: d/dd [(x1-d) I0 + (d-x0) I1] = I1 - I0
        np.testing.assert_allclose(g[0, 1], np.asarray(img[:, 0, 3] - img[:, 0, 2]).sum(), atol=1e-5)

    def test_pallas_matches_xla(self):
        """The pallas one-hot-contraction warp (interpret mode on CPU) must
        match the XLA gather path: values + image/disparity cotangents."""
        rng = np.random.default_rng(12)
        img = jnp.asarray(rng.random((3, 10, 24)).astype(np.float32))
        disp = jnp.asarray((rng.random((10, 24)).astype(np.float32) - 0.5) * 8)
        ct = jnp.asarray(rng.random((3, 10, 24)).astype(np.float32))

        def run(backend):
            out, vjp = jax.vjp(
                lambda i, d: inverse_warp_image(i, d, backend=backend), img, disp
            )
            d_img, d_disp = vjp(ct)
            return out, d_img, d_disp

        out_x, dimg_x, ddisp_x = run("xla")
        out_p, dimg_p, ddisp_p = run("pallas")
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), atol=1e-5)
        np.testing.assert_allclose(np.asarray(dimg_p), np.asarray(dimg_x), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ddisp_p), np.asarray(ddisp_x), atol=1e-5)
