"""Multi-host (multi-process) execution dryrun — the DCN analog of the
single-host CPU-mesh dryrun.

The reference has no multi-host story at all (SURVEY.md §2.4 — its only
multi-GPU construct is a scene-per-GPU job dispatcher); the TPU-native
design must scale one scene's training across hosts. The sharded train step
(parallel/sharding.py) is already written against a device mesh — multi-host
execution is the SAME program run under `jax.distributed.initialize`, where
the mesh spans every process's devices and the rasterizer's band all-gather
+ gradient psum ride DCN between hosts instead of ICI.

`run_worker` is one process of the pod: it initializes the distributed
runtime, builds the global mesh over all processes' devices, runs N steps of
the band-sharded binocular train step on a deterministic toy scene, and
prints the final loss. `dryrun_multihost` (the driver entry) launches two
such processes on localhost with 4 virtual CPU devices each — an 8-device
2-host pod — and asserts the loss matches the single-process 8-device run
bit-for-bit (the math is identical; only the collective transport differs).

Real TPU pods use the same code path: `jax.distributed.initialize()` picks
up the TPU pod environment automatically and `make_mesh(None)` spans the
slice.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys


def run_worker(
    coordinator: str,
    num_processes: int,
    process_id: int,
    local_devices: int = 4,
    steps: int = 2,
) -> float:
    """One pod process: global mesh over all processes, sharded train step."""
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={local_devices}"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)

    import jax

    jax.config.update("jax_platforms", "cpu")
    if num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    import jax.numpy as jnp
    import numpy as np

    from ..config import Config, RasterConfig
    from ..core.camera import make_camera
    from ..data.ply import PointCloud
    from ..models.gaussians import create_from_pcd
    from ..train.state import init_train_state
    from .sharding import make_mesh, make_sharded_train_step

    n_global = num_processes * local_devices
    assert len(jax.devices()) == n_global, (len(jax.devices()), n_global)

    rng = np.random.default_rng(0)
    n = 256
    pts = rng.normal(size=(n, 3)) * 0.5 + [0, 0, 5.0]
    pcd = PointCloud(points=pts, colors=rng.random((n, 3)))
    model = create_from_pcd(pcd, spatial_lr_scale=1.0, max_sh_degree=1, capacity=256)
    width, height = 64, 16 * max(n_global, 3)
    cam = make_camera(np.eye(3), np.zeros(3), 0.9, 0.7, width, height)

    cfg = Config()
    cfg.raster = RasterConfig(backend="pallas", pallas_chunk=8, max_pairs_per_tile=256)
    mesh = make_mesh(None)  # all global devices
    step = make_sharded_train_step(
        cfg, mesh, width, height, spatial_lr_scale=1.0, binocular=True
    )
    state = init_train_state(model)
    gt = jnp.zeros((3, height, width), jnp.float32)
    aw = jnp.zeros((height, width), jnp.float32)
    bg = jnp.zeros(3)
    loss = 0.0
    for i in range(steps):
        state, metrics = step(state, cam, gt, aw, jnp.int32(1 + i), jax.random.PRNGKey(i), bg)
        loss = float(metrics.loss)
    return loss


def dryrun_multihost(num_processes: int = 2, local_devices: int = 4, timeout: int = 900):
    """Launch a localhost 'pod' of num_processes CPU workers and assert loss
    parity with the equivalent single-process mesh."""
    import socket

    with socket.socket() as s:  # free port for the coordination service
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coordinator = f"localhost:{port}"

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # CPU-only children: no TPU grant
    procs = [
        subprocess.Popen(
            [
                sys.executable, "-m", "binocular3dgs_tpu.parallel.multihost",
                "--coordinator", coordinator,
                "--num-processes", str(num_processes),
                "--process-id", str(i),
                "--local-devices", str(local_devices),
            ],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for i in range(num_processes)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)
    losses = [float(o.strip().splitlines()[-1].split("loss=")[1]) for o in outs]
    assert all(abs(l - losses[0]) < 1e-12 for l in losses), losses

    # single-process reference on the same global device count, in a clean
    # subprocess (this interpreter may already have a device backend)
    r = subprocess.run(
        [
            sys.executable, "-m", "binocular3dgs_tpu.parallel.multihost",
            "--coordinator", "none", "--num-processes", "1", "--process-id", "0",
            "--local-devices", str(num_processes * local_devices),
        ],
        capture_output=True, text=True, timeout=timeout, env=env,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    ref_loss = float(r.stdout.strip().splitlines()[-1].split("loss=")[1])
    assert abs(ref_loss - losses[0]) < 1e-6, (ref_loss, losses[0])
    print(
        f"dryrun_multihost: {num_processes} processes x {local_devices} devices "
        f"loss={losses[0]:.6f} == single-process {ref_loss:.6f}"
    )
    return losses[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--local-devices", type=int, default=4)
    args = ap.parse_args()
    loss = run_worker(
        args.coordinator, args.num_processes, args.process_id, args.local_devices
    )
    print(f"loss={loss}")


if __name__ == "__main__":
    main()
