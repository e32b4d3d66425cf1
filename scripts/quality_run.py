"""End-to-end quality protocol run on a synthetic golden scene.

Builds a known ~1.2k-gaussian cloud, golden-renders 9 views at 256x256 with
the dense oracle renderer, writes a COLMAP scene to disk, then runs the FULL
LLFF few-shot protocol through the real CLIs (train 3-view with densify +
binocular + opacity decay on the pallas backend, render, metrics) and
records held-out PSNR/SSIM in QUALITY_r05.json at the repo root.

Reproduce with ONE command (takes ~5-10 min on the tunnel TPU):

    python scripts/quality_run.py

Protocol scaling vs the reference LLFF recipe (train.py:35-202,
script/run_llff.py:10-11): iterations 30k -> 3k, shift_cam_start 20k -> 2k,
densify from 500 every 100 until end (opacity-decay mode), 3 train views,
every-8th-view holdout — all through the same flags the reference exposes.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCENE = os.path.join(REPO, "quality_r05", "scene")
OUT = os.path.join(REPO, "quality_r05", "out")
ITERS = 3000

# this process renders goldens on CPU; the train/render subprocesses must get
# the TPU tunnel back, so stash the axon hook before dropping it locally
_AXON = os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402


def build_scene():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from PIL import Image

    from binocular3dgs_tpu.config import Config
    from binocular3dgs_tpu.core.sh import rgb_to_sh
    from binocular3dgs_tpu.data import colmap
    from binocular3dgs_tpu.data.dataset import Scene
    from binocular3dgs_tpu.models.gaussians import GaussianModel, GaussianParams
    from binocular3dgs_tpu.ops.rasterize_reference import render_dense

    w, h, n_views = 256, 256, 9
    rng = np.random.default_rng(7)

    os.makedirs(f"{SCENE}/sparse/0", exist_ok=True)
    os.makedirs(f"{SCENE}/images", exist_ok=True)

    # cameras: forward-facing LLFF-style arc looking at the cloud at z ~ 4
    focal = 290.0
    cams = {1: colmap.ColmapCamera(1, "PINHOLE", w, h, np.array([focal, focal, w / 2, h / 2]))}
    images = {}
    for i in range(1, n_views + 1):
        u = (i - (n_views + 1) / 2) / n_views  # -0.44 .. 0.44
        ang = u * 0.35
        q = np.array([np.cos(ang / 2), 0.0, np.sin(ang / 2), 0.0])  # yaw about y
        # world->cam translation: camera sits at x = 1.2u, y = 0.3u, z = 0
        Rw2c = colmap.qvec2rotmat(q)
        cpos = np.array([1.2 * u, 0.3 * abs(u), 0.0])
        t = -Rw2c @ cpos
        images[i] = colmap.ColmapImage(
            i, q, t, 1, f"im_{i:02d}.png", np.zeros((0, 2)), np.zeros(0, dtype=np.int64)
        )
        Image.fromarray(np.zeros((h, w, 3), dtype=np.uint8)).save(
            f"{SCENE}/images/im_{i:02d}.png"
        )

    # the golden cloud: smooth blobs filling the frustum around z ~ 4
    N = 1200
    xyz = np.stack(
        [
            rng.uniform(-1.6, 1.6, N),
            rng.uniform(-1.2, 1.2, N),
            rng.uniform(3.0, 5.2, N),
        ],
        axis=1,
    ).astype(np.float32)
    colors = rng.uniform(0.05, 0.95, (N, 3)).astype(np.float32)
    params = GaussianParams(
        xyz=jnp.asarray(xyz),
        f_dc=jnp.asarray(rgb_to_sh(colors)[:, None, :]),
        f_rest=jnp.zeros((N, 3, 3), jnp.float32),
        opacity=jnp.asarray(rng.uniform(0.5, 3.0, (N, 1)).astype(np.float32)),
        scaling=jnp.asarray(
            np.log(rng.uniform(0.04, 0.11, (N, 3))).astype(np.float32)
        ),
        rotation=jnp.asarray(
            np.concatenate([np.ones((N, 1)), np.zeros((N, 3))], 1).astype(np.float32)
        ),
    )
    model_true = GaussianModel(
        params=params, active=jnp.ones(N, dtype=bool), max_sh_degree=1, active_sh_degree=0
    )

    # init point cloud: noisy subsample of the true means (the SfM stand-in)
    sel = rng.choice(N, 500, replace=False)
    pts = xyz[sel] + rng.normal(0, 0.02, (500, 3)).astype(np.float32)
    colmap.write_cameras_binary(f"{SCENE}/sparse/0/cameras.bin", cams)
    colmap.write_images_binary(f"{SCENE}/sparse/0/images.bin", images)
    colmap.write_points3d_binary(
        f"{SCENE}/sparse/0/points3D.bin",
        pts,
        (colors[sel] * 255).astype(np.uint8),
        np.zeros((500, 1)),
    )

    # golden-render through the SAME camera objects the trainer will see
    cfg = Config()
    cfg.model.source_path = SCENE
    cfg.model.eval = True
    cfg.train.dataset_name = "LLFF"
    cfg.train.n_views = 7  # render goldens for ALL 9 views (7 train + 2 test)
    scene = Scene.load(cfg, shuffle=False)
    bg = jnp.zeros(3)
    views = list(scene.train_views) + list(scene.test_views)
    for v in views:
        out = render_dense(v.camera, model_true, bg)
        img = np.asarray(out.image).transpose(1, 2, 0)  # planar -> (H, W, 3)
        fname = str(v.image_name)
        if not fname.endswith(".png"):
            fname += ".png"
        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(SCENE, "images", fname)
        )
    print(f"golden scene written: {SCENE} ({len(views)} views rendered)")


def run(args, env=None, timeout=7200, log=None):
    print("+", " ".join(args), flush=True)
    t0 = time.time()
    logf = open(log, "w") if log else subprocess.PIPE
    r = subprocess.run(
        args, cwd=REPO, env=env, stdout=logf, stderr=subprocess.STDOUT,
        text=True, timeout=timeout,
    )
    if log:
        logf.close()
    dt = time.time() - t0
    if r.returncode != 0:
        if log:
            print(open(log).read()[-4000:])
        elif r.stdout:
            print(r.stdout[-4000:])
        raise SystemExit(f"command failed rc={r.returncode}")
    print(f"  ok ({dt:.0f}s)")
    return r


def main():
    build_scene()

    tpu_env = {
        k: v for k, v in os.environ.items() if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    if _AXON is not None:  # restore the TPU tunnel for the heavy subprocesses
        tpu_env["PALLAS_AXON_POOL_IPS"] = _AXON
    py = sys.executable
    run(
        [
            py, "-m", "binocular3dgs_tpu.cli", "train",
            "-s", SCENE, "-m", OUT, "--eval", "-r", "1",
            "--iterations", str(ITERS),
            "--position_lr_max_steps", str(ITERS),
            "--shift_cam_start", str(ITERS * 2 // 3),
            "--test_iterations", str(ITERS),
            "--save_iterations", str(ITERS),
            "--dataset_name", "LLFF", "--n_views", "3",
        ],
        env=tpu_env,
        log=os.path.join(REPO, "quality_r05", "train.log"),
    )
    run([py, "-m", "binocular3dgs_tpu.cli", "render", "-m", OUT], env=tpu_env)
    run([py, "-m", "binocular3dgs_tpu.cli", "metrics", "-m", OUT], env=tpu_env)

    with open(os.path.join(OUT, "results.json")) as f:
        res = json.load(f)
    method, entry = sorted(res.items())[-1]
    record = {
        "protocol": "LLFF 3-view, 9x256x256 synthetic golden cloud (1.2k gaussians)",
        "iterations": ITERS,
        "shift_cam_start": ITERS * 2 // 3,
        "backend": "pallas (tpu)",
        "method": method,
        "psnr": entry.get("PSNR"),
        "ssim": entry.get("SSIM"),
        "lpips": entry.get("LPIPS"),
        "command": "python scripts/quality_run.py",
        "reference_parity_target": "train.py:35-202 + metrics.py:37-122 (scaled)",
    }
    with open(os.path.join(REPO, "QUALITY_r05.json"), "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
