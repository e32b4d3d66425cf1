"""REAL-CHIP value parity: render one view of the quality golden cloud on
the TPU with the pallas backend vs the xla backend vs the CPU dense oracle.
All previous parity tests ran the pallas kernels in interpret mode on CPU —
this is the first image-value check of the compiled Mosaic kernels."""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def build_model_and_cam():
    import jax.numpy as jnp

    from binocular3dgs_tpu.core.camera import make_camera
    from binocular3dgs_tpu.models.gaussians import GaussianModel, GaussianParams
    from binocular3dgs_tpu.core.sh import rgb_to_sh

    rng = np.random.default_rng(7)
    N = 1200
    xyz = np.stack(
        [rng.uniform(-1.6, 1.6, N), rng.uniform(-1.2, 1.2, N), rng.uniform(3.0, 5.2, N)],
        axis=1,
    ).astype(np.float32)
    colors = rng.uniform(0.05, 0.95, (N, 3)).astype(np.float32)
    params = GaussianParams(
        xyz=jnp.asarray(xyz),
        f_dc=jnp.asarray(rgb_to_sh(colors)[:, None, :]),
        f_rest=jnp.zeros((N, 3, 3), jnp.float32),
        opacity=jnp.asarray(rng.uniform(0.5, 3.0, (N, 1)).astype(np.float32)),
        scaling=jnp.asarray(np.log(rng.uniform(0.04, 0.11, (N, 3))).astype(np.float32)),
        rotation=jnp.asarray(
            np.concatenate([np.ones((N, 1)), np.zeros((N, 3))], 1).astype(np.float32)
        ),
    )
    model = GaussianModel(
        params=params, active=jnp.ones(N, dtype=bool), max_sh_degree=1, active_sh_degree=0
    )
    cam = make_camera(np.eye(3), np.zeros(3), 0.82, 0.82, 256, 256)
    return model, cam


def render(backend):
    import jax
    import jax.numpy as jnp

    from binocular3dgs_tpu.config import RasterConfig
    from binocular3dgs_tpu.ops.rasterize import render_tiled

    model, cam = build_model_and_cam()
    raster = RasterConfig(backend=backend)
    if backend == "xla":
        raster.max_pairs_per_tile = 512
        raster.chunk = 32
    out = render_tiled(cam, model, jnp.zeros(3), raster=raster)
    g = jax.grad(
        lambda p: jnp.sum(
            render_tiled(cam, model.replace(params=p), jnp.zeros(3), raster=raster).image ** 2
        )
    )(model.params)
    return np.asarray(out.image), np.asarray(out.depth), np.asarray(g.xyz), np.asarray(g.opacity)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "pallas"
    img, dep, gxyz, gop = render(which)
    np.savez(f"/tmp/chip_parity_{which}.npz", img=img, dep=dep, gxyz=gxyz, gop=gop)
    print(which, "img mean", float(img.mean()), "depth mean", float(dep.mean()),
          "gxyz norm", float(np.linalg.norm(gxyz)), "gop norm", float(np.linalg.norm(gop)))


if __name__ == "__main__":
    main()
