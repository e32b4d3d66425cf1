"""End-to-end Trainer test on a synthetic multi-view scene (in-memory)."""

import jax
import jax.numpy as jnp
import numpy as np

from binocular3dgs_tpu.config import Config
from binocular3dgs_tpu.core.camera import make_camera
from binocular3dgs_tpu.data.dataset import Scene, View
from binocular3dgs_tpu.data.ply import PointCloud
from binocular3dgs_tpu.data.readers import SceneInfo
from binocular3dgs_tpu.models.gaussians import create_from_pcd
from binocular3dgs_tpu.ops.rasterize_reference import render_dense
from binocular3dgs_tpu.train.loop import Trainer


def lookat_camera(eye, target, w=40, h=30):
    eye, target = np.asarray(eye, float), np.asarray(target, float)
    fwd = target - eye
    fwd /= np.linalg.norm(fwd)
    up = np.array([0.0, -1.0, 0.0])
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    up2 = np.cross(fwd, right)
    R = np.stack([right, up2, fwd], axis=1)  # camera-to-world rotation
    T = -R.T @ eye
    return make_camera(R, T, 0.9, 0.7, w, h)


def build_synthetic_scene(n_views=3, n_pts=80, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n_pts, 3)) * 0.4
    cols = rng.random((n_pts, 3))
    pcd = PointCloud(points=pts, colors=cols)
    gt_model = create_from_pcd(pcd, 1.0, max_sh_degree=1)
    views = []
    for i in range(n_views):
        ang = (i - 1) * 0.25
        eye = [3.5 * np.sin(ang), 0.2, -3.5 * np.cos(ang)]
        cam = lookat_camera(eye, [0, 0, 0])
        img = np.asarray(render_dense(cam, gt_model, jnp.zeros(3)).image)
        views.append(View(camera=cam, image=img, alpha_mask=None, image_name=f"v{i}", colmap_id=i, uid=i))
    # noisy init point cloud
    init_pcd = PointCloud(
        points=pts + rng.normal(size=pts.shape) * 0.05, colors=np.clip(cols + 0.1, 0, 1)
    )
    info = SceneInfo(init_pcd, [], [], {"radius": 3.5, "translate": np.zeros(3)}, None)
    scene = Scene(train_views=views, test_views=[views[0]], cameras_extent=3.5, scene_info=info)
    return scene


class TestTrainerE2E:
    def test_short_training_improves_psnr(self):
        scene = build_synthetic_scene()
        cfg = Config()
        cfg.opt.iterations = 120
        cfg.opt.densify_from_iter = 40
        cfg.opt.densification_interval = 40
        cfg.train.shift_cam_start = 60  # exercise the binocular branch
        cfg.train.test_iterations = ()
        cfg.train.save_iterations = ()
        trainer = Trainer(cfg, scene, render_fn=render_dense)
        before = trainer.report(0)
        trainer.train(120)
        after = trainer.report(120)
        assert after["test"]["psnr"] > before["test"]["psnr"] + 1.0
        # densification ran and points may have changed; count stays sane
        n = int(trainer.state.model.count())
        assert 10 <= n <= trainer.state.model.capacity

    def test_capacity_growth(self):
        scene = build_synthetic_scene(n_pts=30)
        cfg = Config()
        cfg.capacity.initial_margin = 1.05  # tiny headroom to force growth
        cfg.opt.densify_from_iter = 5
        cfg.opt.densification_interval = 10
        cfg.opt.densify_grad_threshold = 1e-12  # densify everything
        cfg.train.binocular_consistency = False
        cfg.train.test_iterations = ()
        cfg.train.save_iterations = ()
        trainer = Trainer(cfg, scene, render_fn=render_dense)
        cap0 = trainer.state.model.capacity
        trainer.train(25)
        assert trainer.state.model.capacity > cap0
        # state arrays all resized consistently
        st = trainer.state
        cap = st.model.capacity
        assert st.adam_m.xyz.shape[0] == cap
        assert st.grad_accum.shape[0] == cap
        assert int(st.model.count()) <= cap
