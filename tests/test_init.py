"""Dense-init subsystem tests: DLT vs OpenCV, grid_sample vs torch,
correlation vs loop oracle, Farneback matcher, end-to-end triangulation."""

import numpy as np
import pytest

from binocular3dgs_tpu.init import correlation, geometry
from binocular3dgs_tpu.init.matchers import FarnebackMatcher
from binocular3dgs_tpu.init.pipeline import (
    TriangulateConfig,
    select_train_indices,
    triangulate_pairs,
)


def make_two_cameras():
    K = np.array([[100.0, 0, 32.0], [0, 100.0, 24.0], [0, 0, 1]])
    c2w0 = np.eye(4)
    c2w1 = np.eye(4)
    c2w1[:3, 3] = [0.5, 0.1, 0.0]
    return K, c2w0, c2w1


class TestTriangulation:
    def test_matches_cv2(self):
        import cv2

        rng = np.random.default_rng(0)
        K, c2w0, c2w1 = make_two_cameras()
        pts = np.stack(
            [rng.uniform(-1, 1, 50), rng.uniform(-1, 1, 50), rng.uniform(4, 8, 50)], 1
        )
        K34 = np.concatenate([K, np.zeros((3, 1))], 1)
        P0 = K34 @ np.linalg.inv(c2w0)
        P1 = K34 @ np.linalg.inv(c2w1)
        uv0, _ = geometry.project_points(pts, K, np.linalg.inv(c2w0))
        uv1, _ = geometry.project_points(pts, K, np.linalg.inv(c2w1))
        ours = geometry.triangulate_points_dlt(P0, P1, uv0, uv1)
        cv = cv2.triangulatePoints(
            P0.astype(np.float64), P1.astype(np.float64),
            uv0.T.astype(np.float64), uv1.T.astype(np.float64),
        )
        cv = (cv / cv[3])[:3].T
        np.testing.assert_allclose(ours, cv, atol=1e-6)
        np.testing.assert_allclose(ours, pts, atol=1e-6)

    def test_noisy_matches_filtered(self):
        rng = np.random.default_rng(1)
        K, c2w0, c2w1 = make_two_cameras()
        pts = np.stack([rng.uniform(-1, 1, 30), rng.uniform(-1, 1, 30), rng.uniform(4, 8, 30)], 1)
        uv0, _ = geometry.project_points(pts, K, np.linalg.inv(c2w0))
        uv1, _ = geometry.project_points(pts, K, np.linalg.inv(c2w1))
        # corrupt half the matches
        uv1_bad = uv1.copy()
        uv1_bad[:15] += rng.uniform(10, 30, (15, 2))

        class FakeMatcher:
            # direction-aware: (ref=0, src=1) then (ref=1, src=0)
            calls = 0

            def get_matches_and_confidence(self, a, b):
                FakeMatcher.calls += 1
                if FakeMatcher.calls == 1:
                    s, t = uv0, uv1_bad
                else:
                    s, t = uv1_bad, uv0
                return {
                    "kp_source": s.astype(np.float32),
                    "kp_target": t.astype(np.float32),
                    "confidence_value": np.ones(30, np.float32),
                }

        images = [np.full((48, 64, 3), 128, np.uint8)] * 2
        cfg = TriangulateConfig(dataset_name="LLFF", growth_iterations=0)
        points, colors = triangulate_pairs(
            images, K, [c2w0, c2w1], [0, 1], FakeMatcher(), cfg
        )
        # corrupted matches violate the epipolar geometry -> reprojection error
        # kills them; clean ones triangulate to the true points
        assert 10 <= len(points) <= 40
        d = np.linalg.norm(points[:, None, :] - pts[None, 15:], axis=-1).min(axis=1)
        assert np.median(d) < 0.05

    def test_backproject_roundtrip(self):
        K, c2w0, _ = make_two_cameras()
        depth = np.full((48, 64), 5.0)
        pts = geometry.backproject_depth(depth, K, c2w0)
        # note the reference's (W-1, H-1) NDC normalization: reprojecting must
        # land close to the pixel grid
        uv, z = geometry.project_points(pts, K, np.linalg.inv(c2w0))
        np.testing.assert_allclose(z, 5.0, atol=1e-9)


class TestGridSample:
    def test_matches_torch(self):
        import torch
        import torch.nn.functional as F

        rng = np.random.default_rng(2)
        img = rng.random((20, 30, 3)).astype(np.float32)
        grid = (rng.random((40, 2)).astype(np.float32) * 2.4 - 1.2)  # incl. OOB
        ours = geometry.grid_sample_bilinear(img, grid)
        timg = torch.tensor(img).permute(2, 0, 1)[None]
        tgrid = torch.tensor(grid).reshape(1, -1, 1, 2)
        ref = F.grid_sample(timg, tgrid, align_corners=False, mode="bilinear")
        ref = ref[0, :, :, 0].T.numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_patch_ssim_identical(self):
        rng = np.random.default_rng(3)
        patches = rng.random((5, 121, 3))
        s = geometry.patch_ssim(patches, patches, 5)
        assert (s > 0.9999).all()

    def test_patch_ssim_different(self):
        rng = np.random.default_rng(4)
        a = rng.random((5, 121, 3))
        b = rng.random((5, 121, 3))
        assert geometry.patch_ssim(a, b, 5).mean() < 0.5


class TestCorrelation:
    def test_local_correlation_matches_loop(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(5)
        ref = rng.random((1, 10, 12, 4)).astype(np.float32)
        qry = rng.random((1, 10, 12, 4)).astype(np.float32)
        out = np.asarray(correlation.local_correlation(jnp.asarray(ref), jnp.asarray(qry), md=2))
        # loop oracle
        H, W, C = 10, 12, 4
        for y, x in [(0, 0), (5, 6), (9, 11)]:
            for dy in range(-2, 3):
                for dx in range(-2, 3):
                    d = (dy + 2) * 5 + (dx + 2)
                    yy, xx = y + dy, x + dx
                    expected = (
                        (ref[0, y, x] * qry[0, yy, xx]).sum() / C
                        if 0 <= yy < H and 0 <= xx < W
                        else 0.0
                    )
                    np.testing.assert_allclose(out[0, y, x, d], expected, atol=1e-6)

    def test_global_correlation(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(6)
        ref = rng.random((1, 4, 5, 3)).astype(np.float32)
        qry = rng.random((1, 4, 5, 3)).astype(np.float32)
        out = np.asarray(correlation.global_correlation(jnp.asarray(ref), jnp.asarray(qry)))
        expected = ref.reshape(20, 3) @ qry.reshape(20, 3).T
        np.testing.assert_allclose(out[0].reshape(20, 20), expected, atol=1e-5)


class TestFarneback:
    def test_recovers_translation(self):
        import scipy.ndimage as ndi

        rng = np.random.default_rng(7)
        # high-contrast random blobs (blurred noise defeats Farneback)
        blobs = ndi.gaussian_filter(rng.random((120, 160)), 4)
        img = np.stack(
            [(blobs > np.percentile(blobs, q)).astype(np.float32) for q in (40, 50, 60)], -1
        )
        base = (img * 200 + 30).astype(np.uint8)
        shift = 6
        src = np.roll(base, shift, axis=1)
        m = FarnebackMatcher(scaling=1.0, stride=4)
        pred = m.get_matches_and_confidence(base, src)
        assert len(pred["kp_source"]) > 100
        # evaluate on the most confident half (cyclic-consistent matches)
        k = len(pred["kp_source"]) // 2
        flow = pred["kp_target"][:k] - pred["kp_source"][:k]
        assert abs(np.median(flow[:, 0]) - shift) < 1.5
        assert abs(np.median(flow[:, 1])) < 1.5


class TestSelection:
    def test_llff(self):
        idx = select_train_indices(20, "LLFF", 3)
        assert len(idx) == 3 and all(i % 8 != 0 for i in idx)

    def test_dtu(self):
        assert select_train_indices(49, "DTU", 3) == [25, 22, 28]
