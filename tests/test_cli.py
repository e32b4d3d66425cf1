"""CLI end-to-end: train -> render -> metrics on a tiny synthetic COLMAP scene."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_colmap_scene(root, n_views=9, w=64, h=48):
    from PIL import Image

    from binocular3dgs_tpu.data import colmap

    os.makedirs(f"{root}/sparse/0", exist_ok=True)
    os.makedirs(f"{root}/images", exist_ok=True)
    rng = np.random.default_rng(0)
    cams = {1: colmap.ColmapCamera(1, "PINHOLE", w, h, np.array([60.0, 60.0, w / 2, h / 2]))}
    images = {}
    for i in range(1, n_views + 1):
        ang = (i - n_views / 2) * 0.05
        # simple ring of cameras looking at the cluster at z=5 (world origin shifted)
        q = np.array([np.cos(ang / 2), 0, np.sin(ang / 2), 0.0])
        t = np.array([0.1 * i, 0.0, 0.2 * i])
        images[i] = colmap.ColmapImage(
            i, q, t, 1, f"im_{i:02d}.png", np.zeros((0, 2)), np.zeros(0, dtype=np.int64)
        )
        Image.fromarray(rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)).save(
            f"{root}/images/im_{i:02d}.png"
        )
    pts = rng.normal(size=(150, 3)) * 0.5 + [0, 0, 5]
    colmap.write_cameras_binary(f"{root}/sparse/0/cameras.bin", cams)
    colmap.write_images_binary(f"{root}/sparse/0/images.bin", images)
    colmap.write_points3d_binary(
        f"{root}/sparse/0/points3D.bin", pts, rng.integers(0, 255, (150, 3)), np.zeros((150, 1))
    )


def run_cli(args, timeout=900):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    # Kill the container's TPU-tunnel hook for CPU-only subprocesses: with
    # PALLAS_AXON_POOL_IPS set, sitecustomize registers the remote-TPU PJRT
    # plugin at interpreter start, which can block on the single-chip grant
    # held by the parent (pytest) — this, not compile cost, is what made the
    # train subprocess exceed its 900 s timeout in rounds 2/3. A pure-CPU
    # run of the same command takes ~25 s.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return subprocess.run(
        [sys.executable, "-m", "binocular3dgs_tpu.cli"] + args,
        cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout,
    )


@pytest.mark.slow
class TestCliPipeline:
    def test_train_render_metrics(self, tmp_path):
        scene = str(tmp_path / "scene")
        out = str(tmp_path / "out")
        build_colmap_scene(scene)

        r = run_cli(
            [
                "train", "-s", scene, "-m", out, "--eval", "-r", "1",
                "--iterations", "30", "--densify_from_iter", "10000",
                "--shift_cam_start", "10", "--test_iterations", "30",
                "--save_iterations", "30", "--backend", "xla", "-q",
                "--max_pairs_per_tile", "256", "--raster_chunk", "8",
            ]
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert os.path.exists(f"{out}/point_cloud/iteration_30/point_cloud.ply")
        assert os.path.exists(f"{out}/cfg_args.json")
        assert os.path.exists(f"{out}/cameras.json")

        r = run_cli(["render", "-m", out, "-s", scene, "--eval", "-r", "1", "--skip_train"])
        assert r.returncode == 0, r.stderr[-2000:]
        renders = f"{out}/test/ours_30/renders"
        assert len(os.listdir(renders)) == 2  # 9 views -> test = idx 0, 8

        r = run_cli(["metrics", "-m", out])
        assert r.returncode == 0, r.stderr[-2000:]
        with open(f"{out}/results.json") as f:
            res = json.load(f)
        assert "ours_30" in res and res["ours_30"]["PSNR"] is not None

        r = run_cli(["aggregate", "-m", out])
        assert r.returncode == 0, r.stderr[-2000:]
        assert "ours_30" in r.stdout
