"""End-to-end Trainer test on a synthetic multi-view scene (in-memory)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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
        # View.image keeps the host (H, W, 3) convention; render_dense is planar
        img = np.asarray(render_dense(cam, gt_model, jnp.zeros(3)).image).transpose(1, 2, 0)
        views.append(View(camera=cam, image=img, alpha_mask=None, image_name=f"v{i}", colmap_id=i, uid=i))
    # noisy init point cloud
    init_pcd = PointCloud(
        points=pts + rng.normal(size=pts.shape) * 0.05, colors=np.clip(cols + 0.1, 0, 1)
    )
    info = SceneInfo(init_pcd, [], [], {"radius": 3.5, "translate": np.zeros(3)}, None)
    scene = Scene(train_views=views, test_views=[views[0]], cameras_extent=3.5, scene_info=info)
    return scene


class TestTrainerE2E:
    @pytest.mark.slow
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

    @pytest.mark.slow
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


def build_blender_scene(root, n_train=100, n_test=4, w=64, h=48):
    """Synthetic NeRF-synthetic scene: transforms_{train,test}.json + RGBA
    PNGs whose alpha marks a centered foreground blob."""
    import json as _json

    from PIL import Image

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)

    def make_split(name, n, offset=0.0):
        frames = []
        for i in range(n):
            ang = (i - n / 2) * 0.06 + offset
            # camera on a ring looking at the origin (OpenGL convention)
            pos = np.array([2.5 * np.sin(ang), 0.3, 2.5 * np.cos(ang)])
            z_axis = pos / np.linalg.norm(pos)  # OpenGL -z forward
            x_axis = np.cross([0, 1, 0], z_axis)
            x_axis = x_axis / np.linalg.norm(x_axis)
            y_axis = np.cross(z_axis, x_axis)
            c2w = np.eye(4)
            c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x_axis, y_axis, z_axis, pos
            rgba = np.zeros((h, w, 4), np.uint8)
            rgba[..., :3] = rng.integers(0, 255, (h, w, 3))
            yy, xx = np.mgrid[0:h, 0:w]
            blob = ((yy - h / 2) ** 2 + (xx - w / 2) ** 2) < (h / 3) ** 2
            rgba[..., 3] = (blob * 255).astype(np.uint8)
            fname = f"{name}_{i:02d}"
            Image.fromarray(rgba).save(os.path.join(root, fname + ".png"))
            frames.append({"file_path": fname, "transform_matrix": c2w.tolist()})
        with open(os.path.join(root, f"transforms_{name}.json"), "w") as f:
            _json.dump({"camera_angle_x": 0.9, "frames": frames}, f)

    make_split("train", n_train)
    make_split("test", n_test, offset=0.02)


class TestBlenderE2E:
    @pytest.mark.slow
    def test_blender_protocol_short_run(self, tmp_path):
        """The Blender protocol end to end (reference script/run_blender.py:
        20-43: 8 fixed train views, white background, alpha loss, binocular
        from shift_cam_start): a short run trains, reports, and renders with
        finite outputs and the alpha loss active (VERDICT r1 next-round #10)."""
        from binocular3dgs_tpu.config import Config, RasterConfig
        from binocular3dgs_tpu.data.dataset import Scene
        from binocular3dgs_tpu.train.loop import Trainer, alpha_weight_for_view

        scene_dir = str(tmp_path / "lego")
        build_blender_scene(scene_dir)

        cfg = Config()
        cfg.model.source_path = scene_dir
        cfg.model.white_background = True
        cfg.model.eval = True
        cfg.model.resolution = 1
        cfg.train.dataset_name = "Blender"
        cfg.train.n_views = 8
        cfg.train.shift_cam_start = 5  # binocular branch exercised
        cfg.train.test_iterations = (15,)
        cfg.train.save_iterations = ()
        cfg.opt.densify_from_iter = 4
        cfg.opt.densification_interval = 8
        cfg.raster = RasterConfig(backend="xla", max_pairs_per_tile=128, chunk=8,
                                  pairs_per_gaussian=8)

        # pre-seed a small init PLY so the reader skips its 100k random init
        from binocular3dgs_tpu.data.ply import store_point_cloud

        rng = np.random.default_rng(1)
        store_point_cloud(
            os.path.join(scene_dir, "points3d.ply"),
            rng.random((200, 3)) * 1.2 - 0.6,
            rng.integers(0, 255, (200, 3)),
        )
        scene = Scene.load(cfg)
        assert len(scene.train_views) == 8  # BLENDER_TRAIN_INDICES
        assert scene.train_views[0].alpha_mask is not None
        aw = alpha_weight_for_view(cfg, scene.train_views[0])
        assert aw.max() == 1.0 and aw.min() == 0.0  # background weighted

        trainer = Trainer(cfg, scene)
        assert trainer.use_alpha_weight
        assert float(jnp.max(trainer.bg)) == 1.0  # white background
        trainer.train(iterations=15)
        out = trainer.render_view(scene.test_views[0])
        assert np.isfinite(np.asarray(out.image)).all()
        assert float(out.alpha.max()) <= 1.0 + 1e-5
        report = trainer.report(15)
        assert np.isfinite(report["test"]["psnr"])


class TestRasterConfigThreading:
    @pytest.mark.slow
    def test_default_render_fn_uses_cfg_raster(self, monkeypatch):
        """Trainer's default render_fn must thread cfg.raster: a Trainer
        built with backend="xla" never enters the Pallas path (regression:
        round 2 dropped cfg.raster, so --backend/--pairs_per_gaussian/... CLI
        flags were silently ignored and CI crashed in the Pallas path)."""
        from binocular3dgs_tpu.ops import blend_pallas

        def boom(*a, **k):
            raise AssertionError("pallas blend entered despite backend='xla'")

        monkeypatch.setattr(blend_pallas, "blend_forward_pallas", boom)

        scene = build_synthetic_scene(n_views=2, n_pts=40)
        cfg = Config()
        cfg.raster.backend = "xla"
        cfg.raster.max_pairs_per_tile = 256
        cfg.raster.chunk = 16
        cfg.raster.pairs_per_gaussian = 16
        cfg.train.binocular_consistency = False
        cfg.train.test_iterations = ()
        cfg.train.save_iterations = ()
        trainer = Trainer(cfg, scene)  # default render_fn — the broken path
        trainer.train(2)
        assert np.isfinite(np.asarray(trainer.state.model.params.xyz)).all()


class TestPairCapacityGrowth:
    @pytest.mark.slow
    def test_overflow_triggers_growth(self):
        """When the wanted pair count exceeds the static pair capacity, the
        Trainer must grow pairs_per_gaussian and re-jit instead of silently
        rendering (and backpropagating) without the deepest splats."""
        scene = build_synthetic_scene(n_views=2, n_pts=60)
        cfg = Config()
        cfg.raster.backend = "xla"
        cfg.raster.pairs_per_gaussian = 1  # force overflow immediately
        cfg.raster.max_pairs_per_tile = 64
        cfg.raster.chunk = 16
        cfg.train.binocular_consistency = False
        cfg.train.test_iterations = ()
        cfg.train.save_iterations = ()
        trainer = Trainer(cfg, scene)
        assert trainer.raster.pairs_per_gaussian == 1
        trainer.train(3)
        assert trainer.raster.pairs_per_gaussian > 1, "pair capacity never grew"
        # growth is copy-on-grow: the shared Config must NOT be mutated
        assert cfg.raster.pairs_per_gaussian == 1
        # renders report the pressure fields
        out = trainer.render_view(scene.test_views[0])
        assert int(out.pair_capacity) == (
            trainer.raster.pairs_per_gaussian * trainer.state.model.capacity
        )
        assert int(out.num_pairs) > 0
        # a second Trainer sharing the same Config starts at the original
        # capacity — no leak through the shared object
        trainer2 = Trainer(cfg, scene)
        assert trainer2.raster.pairs_per_gaussian == 1

    @pytest.mark.slow
    def test_growth_is_bounded_and_capacity_respected(self):
        """Growth stops at max_pairs_per_gaussian (no unbounded re-jit loop)."""
        scene = build_synthetic_scene(n_views=2, n_pts=60)
        cfg = Config()
        cfg.raster.backend = "xla"
        cfg.raster.pairs_per_gaussian = 1
        cfg.raster.max_pairs_per_gaussian = 2
        cfg.raster.max_pairs_per_tile = 64
        cfg.raster.chunk = 16
        cfg.train.binocular_consistency = False
        cfg.train.test_iterations = ()
        cfg.train.save_iterations = ()
        trainer = Trainer(cfg, scene)
        trainer.train(4)
        assert trainer.raster.pairs_per_gaussian == 2


class TestFusedSpans:
    def test_span_boundaries(self):
        """Fused chunks must end exactly at densify/report/save triggers and
        start fresh at SH bumps and the binocular flip."""
        from binocular3dgs_tpu.config import Config

        cfg = Config()
        cfg.opt.densification_interval = 100
        cfg.opt.densify_from_iter = 500
        cfg.train.shift_cam_start = 20_000
        cfg.train.test_iterations = (30_000,)
        cfg.train.save_iterations = (30_000,)
        cfg.train.fused_steps = 0  # auto = densification_interval

        t = Trainer.__new__(Trainer)  # span logic only needs cfg
        t.cfg = cfg

        span = Trainer._fused_span
        # before densify range: capped by the interval / sh bump only
        assert span(t, 1, 30_000, 20_001) == 100
        # chunk may END at a densify trigger
        assert span(t, 501, 30_000, 20_001) == 100  # 501..600, densify at 600
        assert span(t, 601, 30_000, 20_001) == 100
        # sh bump at 1000 starts its own chunk: 901..999
        assert span(t, 901, 30_000, 20_001) == 99
        assert span(t, 1000, 30_000, 20_001) == 1  # densify at 1000 ends it
        # binocular flips ON at 20_001, but the SH bump at 20_000 caps first
        assert span(t, 19_950, 30_000, 20_001) == 50
        assert span(t, 20_000, 30_000, 20_001) == 1  # densify at 20_000
        # final stretch: SH bump at 30_000 caps to 99, then the last chunk
        # ends at the report/save iteration
        assert span(t, 29_901, 30_000, 20_001) == 99
        assert span(t, 29_950, 30_000, 20_001) == 50
        assert span(t, 29_999, 30_000, 20_001) == 1
