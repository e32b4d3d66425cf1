"""Real-checkpoint dense-init runbook: the exact chain to run the moment a
PDCNet+ megadepth checkpoint is available (none ships in this container).

Chain (reference script/run_llff.py:22-51 per-scene sequence):
  1. convert  PDCNet_plus_megadepth.pth[.tar] -> npz   (init/pdcnet/convert.py)
  2. triangulate LLFF scene at --resolution 8 with the PDCNet matcher
     (reference submodules/dense_matcher/triangulate.py:138-238)
  3. train --iterations 1000 from the dense-init PLY
  4. train --iterations 1000 from the SfM sparse points (baseline)
  5. assert dense-init test PSNR > SfM-init test PSNR

Usage:
  python scripts/pdcnet_runbook.py \
      --checkpoint /path/to/PDCNet_plus_megadepth.pth.tar \
      --scene /path/to/nerf_llff_data/fern \
      [--workdir /tmp/pdcnet_runbook] [--iterations 1000]

Exit code 0 = chain ran and the dense init beat the SfM baseline.
The pipeline pieces this exercises are unit-tested without the checkpoint
(tests/test_init.py TestTriangulateSceneChain pins a fake matcher through
the same DLT + filter + PLY chain; tests/test_pdcnet_parity.py proves the
network against the reference torch code with random weights).
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(argv, cwd=REPO):
    """Run a CLI with the repo importable. The train reader discovers the
    dense-init PLY at `<cwd>/keypoints_to_3d/<dataset>/<scene>_keypoints_to_3d.ply`
    (data/readers.py:127-147, mirroring the reference dataset_readers.py:158-164),
    so the dense-init run executes from the workdir and the SfM baseline from
    a directory without one."""
    env = os.environ.copy()
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    print("+", " ".join(argv), flush=True)
    subprocess.run(argv, check=True, cwd=cwd, env=env)


def train_and_psnr(scene, model_dir, iterations, cwd):
    sh(
        [
            sys.executable, "-m", "binocular3dgs_tpu.cli", "train",
            "-s", scene, "-m", model_dir,
            "--iterations", str(iterations),
            "--eval", "--dataset_name", "LLFF", "--n_views", "3",
            "--resolution", "8",
            "--test_iterations", str(iterations),
            "--save_iterations", str(iterations),
        ],
        cwd=cwd,
    )
    sh([sys.executable, "-m", "binocular3dgs_tpu.cli", "render",
        "-m", model_dir, "--skip_train"], cwd=cwd)
    sh([sys.executable, "-m", "binocular3dgs_tpu.cli", "metrics",
        "-m", model_dir], cwd=cwd)
    with open(os.path.join(model_dir, "results.json")) as f:
        results = json.load(f)
    method = sorted(results)[-1]
    return float(results[method]["PSNR"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True,
                    help="PDCNet_plus_megadepth.pth[.tar] torch checkpoint")
    ap.add_argument("--scene", required=True, help="LLFF scene dir (e.g. fern)")
    ap.add_argument("--workdir", default="/tmp/pdcnet_runbook")
    ap.add_argument("--iterations", type=int, default=1000)
    args = ap.parse_args()

    if not os.path.exists(args.checkpoint):
        print(
            f"checkpoint not found: {args.checkpoint}\n"
            "Download PDCNet_plus_megadepth.pth.tar (reference README.md:46-48) "
            "and re-run; every other piece of this chain is CI-tested without it."
        )
        return 2

    args.workdir = os.path.abspath(args.workdir)
    os.makedirs(args.workdir, exist_ok=True)
    npz = os.path.join(args.workdir, "pdcnet_plus_megadepth.npz")

    # 1. convert
    sh([sys.executable, "-m", "binocular3dgs_tpu.init.pdcnet.convert",
        args.checkpoint, npz])

    # 2. triangulate (LLFF protocol: 3 views, resolution 8, SSIM growth)
    ply_dir = os.path.join(args.workdir, "keypoints_to_3d/LLFF")
    sh([
        sys.executable, "-m", "binocular3dgs_tpu.cli", "triangulate",
        "-s", args.scene, "--output_path", ply_dir,
        "--matcher", "pdcnet", "--pdcnet_weights", npz,
        "--dataset_name", "LLFF", "--n_views", "3", "--resolution", "8",
    ])
    scene_name = os.path.basename(os.path.normpath(args.scene))
    ply = os.path.join(ply_dir, f"{scene_name}_keypoints_to_3d.ply")
    assert os.path.exists(ply), ply

    # 3+4. train dense-init (cwd sees keypoints_to_3d/) vs SfM-init (cwd
    # without it -> reader falls back to sparse/0 points)
    sfm_cwd = os.path.join(args.workdir, "sfm_cwd")
    os.makedirs(sfm_cwd, exist_ok=True)
    psnr_dense = train_and_psnr(
        os.path.abspath(args.scene), os.path.join(args.workdir, "dense"),
        args.iterations, cwd=args.workdir,
    )
    psnr_sfm = train_and_psnr(
        os.path.abspath(args.scene), os.path.join(args.workdir, "sfm"),
        args.iterations, cwd=sfm_cwd,
    )

    print(f"dense-init PSNR {psnr_dense:.3f} vs SfM-init PSNR {psnr_sfm:.3f}")
    if psnr_dense <= psnr_sfm:
        print("FAIL: dense init did not beat the SfM baseline")
        return 1
    print("OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
