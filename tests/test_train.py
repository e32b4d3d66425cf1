"""Training core tests: Adam parity vs torch, densify invariants, opacity
decay, end-to-end loss decrease on a synthetic scene."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from binocular3dgs_tpu.config import Config
from binocular3dgs_tpu.core.camera import make_camera
from binocular3dgs_tpu.data.ply import PointCloud
from binocular3dgs_tpu.models import densify as densify_mod
from binocular3dgs_tpu.models.gaussians import GaussianParams, create_from_pcd
from binocular3dgs_tpu.ops.rasterize_reference import render_dense
from binocular3dgs_tpu.train.state import (
    adam_update,
    group_lrs,
    init_train_state,
    xyz_lr_fn,
    zeros_like_params,
)
from binocular3dgs_tpu.train.step import make_train_step


def toy_model(n=20, seed=0, cap=None):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)) * 0.5 + [0, 0, 5.0]
    pcd = PointCloud(points=pts, colors=rng.random((n, 3)))
    return create_from_pcd(pcd, spatial_lr_scale=1.0, max_sh_degree=1, capacity=cap)


class TestAdam:
    def test_matches_torch_adam(self):
        import torch

        rng = np.random.default_rng(0)
        n = 16
        vals = {
            "xyz": rng.normal(size=(n, 3)),
            "f_dc": rng.normal(size=(n, 1, 3)),
            "f_rest": rng.normal(size=(n, 3, 3)),
            "opacity": rng.normal(size=(n, 1)),
            "scaling": rng.normal(size=(n, 3)),
            "rotation": rng.normal(size=(n, 4)),
        }
        grads = {k: rng.normal(size=v.shape) for k, v in vals.items()}
        lrs = {
            "xyz": 1.6e-4, "f_dc": 2.5e-3, "f_rest": 2.5e-3 / 20,
            "opacity": 0.05, "scaling": 5e-3, "rotation": 1e-3,
        }

        # torch oracle (same structure as reference training_setup)
        tparams = {k: torch.nn.Parameter(torch.tensor(v, dtype=torch.float64)) for k, v in vals.items()}
        opt = torch.optim.Adam(
            [{"params": [tparams[k]], "lr": lrs[k], "name": k} for k in vals], lr=0.0, eps=1e-15
        )
        for _ in range(3):
            opt.zero_grad()
            for k in vals:
                tparams[k].grad = torch.tensor(grads[k], dtype=torch.float64)
            opt.step()

        params = GaussianParams(**{k: jnp.asarray(v, jnp.float32) for k, v in vals.items()})
        g = GaussianParams(**{k: jnp.asarray(v, jnp.float32) for k, v in grads.items()})
        m = zeros_like_params(params)
        v = zeros_like_params(params)
        t = jnp.zeros((), jnp.int32)
        lrs_tree = GaussianParams(**lrs)
        active = jnp.ones(n, bool)
        for _ in range(3):
            params, m, v, t = adam_update(params, g, m, v, t, lrs_tree, active)

        for k in vals:
            np.testing.assert_allclose(
                np.asarray(getattr(params, k)),
                tparams[k].detach().numpy(),
                rtol=2e-4, atol=1e-6, err_msg=k,
            )

    def test_inactive_rows_frozen(self):
        m0 = toy_model(4, cap=8)
        params = m0.params
        g = jax.tree.map(jnp.ones_like, params)
        mm = zeros_like_params(params)
        vv = zeros_like_params(params)
        lrs = group_lrs(Config().opt, 0.01)
        new_p, _, _, _ = adam_update(params, g, mm, vv, jnp.zeros((), jnp.int32), lrs, m0.active)
        np.testing.assert_array_equal(np.asarray(new_p.xyz)[4:], np.asarray(params.xyz)[4:])
        assert not np.allclose(np.asarray(new_p.xyz)[:4], np.asarray(params.xyz)[:4])


class TestDensify:
    def _state(self, n=10, cap=32):
        m = toy_model(n, cap=cap)
        return init_train_state(m)

    def test_noop_when_no_grads(self):
        st = self._state()
        res = densify_mod.densify_and_prune(st, 2e-4, 0.005, 1.0, 0.01, jax.random.PRNGKey(0))
        assert int(res.n_before) == 10
        assert int(res.n_after) == 10
        # parameters preserved (reordering allowed but with no-op it's in order)
        np.testing.assert_allclose(
            np.asarray(res.state.model.params.xyz)[:10], np.asarray(st.model.params.xyz)[:10], atol=1e-6
        )

    def test_clone_small_high_grad(self):
        st = self._state()
        # small scales (<= percent_dense * extent): force tiny
        p = st.model.params.replace(scaling=jnp.full_like(st.model.params.scaling, -10.0))
        st = st.replace(
            model=st.model.replace(params=p),
            grad_accum=st.grad_accum.at[:10].set(1.0),
            denom=st.denom.at[:10].set(1.0),
        )
        res = densify_mod.densify_and_prune(st, 2e-4, 0.005, 1.0, 0.01, jax.random.PRNGKey(0))
        assert int(res.n_after) == 20  # every active point cloned
        xyz = np.asarray(res.state.model.params.xyz)
        np.testing.assert_allclose(xyz[:10], xyz[10:20], atol=1e-6)  # clones identical

    def test_split_large_high_grad(self):
        st = self._state()
        # large scales: > percent_dense * extent = 0.01
        p = st.model.params.replace(scaling=jnp.full_like(st.model.params.scaling, np.log(0.5)))
        st = st.replace(
            model=st.model.replace(params=p),
            grad_accum=st.grad_accum.at[:10].set(1.0),
            denom=st.denom.at[:10].set(1.0),
        )
        res = densify_mod.densify_and_prune(st, 2e-4, 0.005, 1.0, 0.01, jax.random.PRNGKey(0))
        # parents removed, 2 children each
        assert int(res.n_after) == 20
        s = np.asarray(res.state.model.params.scaling)[:20]
        np.testing.assert_allclose(s, np.log(0.5 / 1.6), atol=1e-5)
        # children scattered around parents: mean position near parents' cloud
        assert np.isfinite(np.asarray(res.state.model.params.xyz)[:20]).all()

    def test_prune_low_opacity(self):
        st = self._state()
        p = st.model.params.replace(
            opacity=st.model.params.opacity.at[:5, 0].set(-10.0)  # sigmoid ~ 4.5e-5 < 0.005
        )
        st = st.replace(model=st.model.replace(params=p))
        res = densify_mod.densify_and_prune(st, 2e-4, 0.005, 1.0, 0.01, jax.random.PRNGKey(0))
        assert int(res.n_after) == 5

    def test_moments_preserved_for_survivors_zeroed_for_new(self):
        st = self._state()
        st = st.replace(
            adam_m=jax.tree.map(lambda a: a + 2.0, st.adam_m),
            grad_accum=st.grad_accum.at[0].set(1.0),
            denom=st.denom.at[0].set(1.0),
        )
        # point 0: small scale -> clone
        p = st.model.params.replace(scaling=st.model.params.scaling.at[0].set(-10.0))
        st = st.replace(model=st.model.replace(params=p))
        res = densify_mod.densify_and_prune(st, 2e-4, 0.005, 1.0, 0.01, jax.random.PRNGKey(0))
        assert int(res.n_after) == 11
        m_xyz = np.asarray(res.state.adam_m.xyz)
        np.testing.assert_allclose(m_xyz[:10], 2.0)  # survivors keep moments
        np.testing.assert_allclose(m_xyz[10], 0.0)  # the clone starts fresh
        # accumulators reset
        assert float(jnp.sum(res.state.grad_accum)) == 0.0
        assert float(jnp.sum(res.state.denom)) == 0.0

    def test_overflow_truncates_and_reports(self):
        st = self._state(n=10, cap=16)
        p = st.model.params.replace(scaling=jnp.full_like(st.model.params.scaling, -10.0))
        st = st.replace(
            model=st.model.replace(params=p),
            grad_accum=st.grad_accum.at[:10].set(1.0),
            denom=st.denom.at[:10].set(1.0),
        )
        res = densify_mod.densify_and_prune(st, 2e-4, 0.005, 1.0, 0.01, jax.random.PRNGKey(0))
        assert int(res.n_wanted) == 20
        assert int(res.n_after) == 16  # truncated at capacity
        assert int(res.state.model.count()) == 16

    def test_opacity_decay(self):
        st = self._state()
        before = np.asarray(jax.nn.sigmoid(st.model.params.opacity))[:10]
        st2 = densify_mod.opacity_decay(st, 0.995)
        after = np.asarray(jax.nn.sigmoid(st2.model.params.opacity))[:10]
        np.testing.assert_allclose(after, before * 0.995, rtol=1e-5)

    def test_reset_opacity(self):
        """reference scene/gaussian_model.py:210-213: opacity clamped to
        <= 0.01 and opacity Adam moments zeroed, other groups untouched."""
        st = self._state()
        p = st.model.params.replace(opacity=st.model.params.opacity.at[:10, 0].set(3.0))
        st = st.replace(
            model=st.model.replace(params=p),
            adam_m=jax.tree.map(lambda a: a + 2.0, st.adam_m),
            adam_v=jax.tree.map(lambda a: a + 3.0, st.adam_v),
        )
        st2 = densify_mod.reset_opacity(st)
        act = np.asarray(jax.nn.sigmoid(st2.model.params.opacity))[:10, 0]
        np.testing.assert_allclose(act, 0.01, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(st2.adam_m.opacity), 0.0)
        np.testing.assert_allclose(np.asarray(st2.adam_v.opacity), 0.0)
        np.testing.assert_allclose(np.asarray(st2.adam_m.xyz), 2.0)
        # a point already below 0.01 stays where it was (min, not set)
        p3 = st.model.params.replace(opacity=st.model.params.opacity.at[0, 0].set(-10.0))
        st3 = densify_mod.reset_opacity(st.replace(model=st.model.replace(params=p3)))
        assert float(jax.nn.sigmoid(st3.model.params.opacity[0, 0])) < 0.001

    def test_size_threshold_prunes_big_points(self):
        """reference scene/gaussian_model.py:397-404: with max_screen_size set,
        view-space-big (max_radii2d) and world-space-big (0.1*extent) points
        are pruned; with None (the binocular protocol) they survive."""
        st = self._state()
        # all small, then: point 0 huge screen radius; point 1 huge world
        # scale (> 0.1 * extent = 0.1)
        scaling = jnp.full_like(st.model.params.scaling, -5.0)
        p = st.model.params.replace(scaling=scaling.at[1].set(np.log(0.5)))
        st = st.replace(
            model=st.model.replace(params=p),
            max_radii2d=st.max_radii2d.at[0].set(100.0),
        )
        res_off = densify_mod.densify_and_prune(
            st, 2e-4, 0.005, 1.0, 0.01, jax.random.PRNGKey(0), max_screen_size=None
        )
        assert int(res_off.n_after) == 10
        res_on = densify_mod.densify_and_prune(
            st, 2e-4, 0.005, 1.0, 0.01, jax.random.PRNGKey(0), max_screen_size=20.0
        )
        assert int(res_on.n_after) == 8


class TestTrainStep:
    def _setup(self, binocular=False):
        cfg = Config()
        cfg.opt.densify_from_iter = 10_000  # no opacity decay during this test
        model = toy_model(50, cap=64)
        state = init_train_state(model)
        cam = make_camera(np.eye(3), np.zeros(3), 0.9, 0.7, 48, 36)
        # target: render of a perturbed model (so there's signal)
        rng = np.random.default_rng(1)
        target_model = model.replace(
            params=model.params.replace(
                xyz=model.params.xyz + jnp.asarray(rng.normal(size=(64, 3)) * 0.05)
            )
        )
        gt = render_dense(cam, target_model, jnp.zeros(3)).image
        step = make_train_step(
            render_dense, cfg, spatial_lr_scale=1.0, binocular=binocular, use_alpha_weight=False
        )
        return cfg, state, cam, gt, step

    @pytest.mark.slow
    def test_loss_decreases(self):
        cfg, state, cam, gt, step = self._setup()
        key = jax.random.PRNGKey(0)
        aw = jnp.zeros((36, 48))
        losses = []
        for i in range(1, 31):
            key, sub = jax.random.split(key)
            state, metrics = step(state, cam, gt, aw, jnp.int32(i), sub, jnp.zeros(3))
            losses.append(float(metrics.loss))
        assert losses[-1] < losses[0] * 0.9, losses[::10]

    def test_densify_stats_accumulate(self):
        cfg, state, cam, gt, step = self._setup()
        aw = jnp.zeros((36, 48))
        state2, _ = step(state, cam, gt, aw, jnp.int32(1), jax.random.PRNGKey(0), jnp.zeros(3))
        assert float(jnp.sum(state2.denom)) > 0
        assert float(jnp.sum(state2.grad_accum)) > 0
        assert float(jnp.max(state2.max_radii2d)) > 0
        assert int(state2.adam_step) == 1

    def test_binocular_step_runs(self):
        cfg, state, cam, gt, step_mono = self._setup()
        step = make_train_step(
            render_dense, cfg, spatial_lr_scale=1.0, binocular=True, use_alpha_weight=False
        )
        aw = jnp.zeros((36, 48))
        state2, metrics = step(state, cam, gt, aw, jnp.int32(1), jax.random.PRNGKey(0), jnp.zeros(3))
        assert np.isfinite(float(metrics.loss))
        assert float(metrics.disparity_loss) > 0

    def test_opacity_decay_in_step(self):
        cfg = Config()  # default: opacity_decay on, densify_from_iter=500
        model = toy_model(20, cap=32)
        state = init_train_state(model)
        cam = make_camera(np.eye(3), np.zeros(3), 0.9, 0.7, 32, 24)
        gt = jnp.zeros((3, 24, 32))
        step = make_train_step(render_dense, cfg, 1.0, binocular=False, use_alpha_weight=False)
        aw = jnp.zeros((24, 32))
        op_before = np.asarray(jax.nn.sigmoid(state.model.params.opacity[:20]))
        # iteration 501 > densify_from_iter -> decay applies (then Adam steps)
        state2, _ = step(state, cam, gt, aw, jnp.int32(501), jax.random.PRNGKey(0), jnp.zeros(3))
        op_after = np.asarray(jax.nn.sigmoid(state2.model.params.opacity[:20]))
        # hard to isolate decay from the update, but opacity must strictly drop
        # (gradient pushes it down against a black target too)
        assert (op_after < op_before).all()


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        from binocular3dgs_tpu.train.loop import load_checkpoint, save_checkpoint

        st = init_train_state(toy_model(10, cap=16))
        st = st.replace(adam_step=jnp.int32(42), grad_accum=st.grad_accum.at[3].set(1.5))
        p = str(tmp_path / "chk.npz")
        save_checkpoint(st, 1234, p)
        st2, it = load_checkpoint(p)
        assert it == 1234
        assert int(st2.adam_step) == 42
        np.testing.assert_allclose(np.asarray(st2.model.params.xyz), np.asarray(st.model.params.xyz))
        np.testing.assert_allclose(np.asarray(st2.grad_accum), np.asarray(st.grad_accum))
        assert st2.model.max_sh_degree == st.model.max_sh_degree
