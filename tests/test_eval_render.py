"""Eval metrics, spiral pose generation, and LPIPS plumbing tests."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from binocular3dgs_tpu.eval.lpips import make_lpips, save_lpips_weights, load_lpips_weights
from binocular3dgs_tpu.eval.metrics import aggregate_results, evaluate_dir
from binocular3dgs_tpu.render import pose_utils


def _write_png(path, arr):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray((np.clip(arr, 0, 1) * 255).astype(np.uint8)).save(path)


class TestEvaluateDir:
    def _setup_scene(self, tmp_path, n=3):
        rng = np.random.default_rng(0)
        base = tmp_path / "scene" / "test" / "ours_1000"
        for i in range(n):
            gt = rng.random((32, 40, 3)).astype(np.float32)
            render = np.clip(gt + 0.05 * rng.normal(size=gt.shape), 0, 1).astype(np.float32)
            _write_png(str(base / "renders" / f"{i:05d}.png"), render)
            _write_png(str(base / "gt" / f"{i:05d}.png"), gt)
        return str(tmp_path / "scene")

    def test_results_json(self, tmp_path):
        scene = self._setup_scene(tmp_path)
        res = evaluate_dir(scene)
        assert "ours_1000" in res
        assert res["ours_1000"]["PSNR"] > 20
        assert 0 < res["ours_1000"]["SSIM"] <= 1
        assert res["ours_1000"]["LPIPS"] is None  # no weights provided
        assert os.path.exists(os.path.join(scene, "results.json"))
        with open(os.path.join(scene, "per_view.json")) as f:
            pv = json.load(f)
        assert len(pv["ours_1000"]["PSNR"]) == 3

    def test_aggregate(self, tmp_path):
        s1 = self._setup_scene(tmp_path / "a")
        s2 = self._setup_scene(tmp_path / "b")
        evaluate_dir(s1)
        evaluate_dir(s2)
        agg = aggregate_results([s1, s2])
        assert agg["ours_1000"]["n_scenes"] == 2
        assert agg["ours_1000"]["PSNR"] > 20


class TestLpips:
    def test_random_weights_behave_like_a_metric(self, tmp_path):
        # No pretrained weights in this environment: verify the architecture
        # plumbing with random weights — identical images give 0, different
        # images give > 0, weights roundtrip through npz.
        rng = np.random.default_rng(0)
        weights = {}
        chans = [3, 64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
        for i in range(13):
            weights[f"conv{i}.w"] = rng.normal(size=(3, 3, chans[i], chans[i + 1])).astype(
                np.float32
            ) * 0.05
            weights[f"conv{i}.b"] = np.zeros(chans[i + 1], np.float32)
        for l, c in enumerate([64, 128, 256, 512, 512]):
            weights[f"lin{l}.w"] = np.abs(rng.normal(size=c)).astype(np.float32)
        p = str(tmp_path / "w.npz")
        save_lpips_weights(p, weights)
        lpips = make_lpips(load_lpips_weights(p))
        img = jnp.asarray(rng.random((64, 64, 3)).astype(np.float32))
        img2 = jnp.asarray(rng.random((64, 64, 3)).astype(np.float32))
        assert float(lpips(img, img)) < 1e-6
        assert float(lpips(img, img2)) > 0


class TestSpiralPoses:
    def _ring_poses(self, n=12, r=4.0):
        poses = []
        for th in np.linspace(0, 0.5, n):
            pos = np.array([r * np.sin(th), 0.1 * th, -r * np.cos(th)])
            z = pose_utils.normalize(-pos)
            up = np.array([0.0, 1.0, 0.0])
            poses.append(pose_utils.viewmatrix(z, up, pos))
        return np.stack(poses)

    def test_recenter_roundtrip(self):
        poses = self._ring_poses()
        rec = pose_utils.recenter_poses(poses)
        back = pose_utils.backcenter_poses(rec, poses)
        np.testing.assert_allclose(back, poses, atol=1e-6)

    def test_spiral_path_frames(self):
        poses = self._ring_poses()
        bounds = np.array([[2.0, 20.0]] * len(poses))
        path = pose_utils.generate_spiral_path(poses, bounds, n_frames=60)
        assert path.shape == (60, 3, 4)
        # rotations orthonormal
        RtR = np.einsum("nij,nik->njk", path[:, :3, :3], path[:, :3, :3])
        np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), (60, 3, 3)), atol=1e-6)
        # positions stay within the camera cloud scale
        assert np.abs(path[:, :3, 3]).max() < 10 * np.abs(poses[:, :3, 3]).max()

    def test_dtu_spiral(self):
        poses = self._ring_poses()
        path = pose_utils.generate_spiral_path_dtu(poses, n_frames=30)
        assert path.shape == (30, 3, 4)
        assert np.isfinite(path).all()

    def test_focus_point_on_axis(self):
        poses = self._ring_poses()
        pt = pose_utils.focus_pt_fn(poses)
        # all cameras look at origin-ish
        assert np.linalg.norm(pt) < 1.0
