"""Host-side training driver.

Behavioral parity target: reference `train.py:35-202` (`training(...)`):
per-iteration camera sampling via seeded python RNG, SH degree bump every
1000 iterations, densification every `densification_interval` after
`densify_from_iter`, PLY snapshots at save_iterations, npz checkpoints at
checkpoint_iterations, PSNR/L1 report at test_iterations.

TPU-specific: fixed-capacity buffers grow (next power of two) when
densification fills past the configured trigger; jit caches are keyed by
capacity so growth costs one recompile. Host-loop elimination
(TrainConfig.fused_steps) runs up to densification_interval iterations per
device dispatch as one jit'd fori_loop with on-device view sampling —
chunks never straddle protocol boundaries, so the math per iteration is
identical to the per-step path (only the view-sampling RNG stream differs
from the reference's host random.choice).
"""

from __future__ import annotations

import os
import random
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.dataset import Scene, View
from ..models import densify as densify_mod
from ..models.gaussians import GaussianModel, create_from_pcd, grow_capacity, next_pow2, save_ply
from ..ops.losses import l1_loss, psnr
from .state import TrainState, init_train_state
from .step import make_train_step


def dtu_background_mask(gt_image: np.ndarray, is_scan110: bool) -> np.ndarray:
    """Dark-region background mask with 50-row vertical smear
    (reference `train.py:111-121`, from DNGaussian). gt: (H, W, 3)."""
    thr = (15.0 if is_scan110 else 30.0) / 255.0
    mask = (gt_image.max(axis=-1) < thr).astype(np.float32)  # (H, W)
    orig = mask.copy()
    for i in range(1, 50):
        mask[i:] *= orig[:-i]
    return mask


def alpha_weight_for_view(cfg: Config, view: View) -> np.ndarray:
    """Per-pixel weight for the alpha loss (reference `train.py:139-143`)."""
    H, W = view.camera.height, view.camera.width
    if view.alpha_mask is not None:
        return (1.0 - view.alpha_mask[..., 0]).astype(np.float32)
    if cfg.train.dataset_name == "DTU" and view.image is not None:
        return dtu_background_mask(view.image, "scan110" in cfg.model.source_path)
    return np.zeros((H, W), np.float32)


@dataclass
class TrainerLogEntry:
    iteration: int
    loss: float
    disparity_loss: float
    points: int
    iters_per_sec: float


def _stack_cameras(views: list[View]):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *[v.camera for v in views])


def _index_camera(cams_stacked, idx: int):
    return jax.tree.map(lambda x: x[idx], cams_stacked)


class Trainer:
    """Drives training for one scene."""

    def __init__(self, cfg: Config, scene: Scene, render_fn=None, model: GaussianModel | None = None):
        self.cfg = cfg
        self.scene = scene
        # Trainer-owned copy of the raster config: pair-capacity growth
        # mutates THIS object, never the (possibly shared) cfg.raster — two
        # Trainers sharing a Config must not leak grown capacities into each
        # other (or into a render CLI re-using the same Config).
        import dataclasses as _dc

        self.raster = _dc.replace(cfg.raster)
        if render_fn is None:
            from ..ops.rasterize import render_tiled

            trainer = self

            # thread the trainer's raster copy so CLI flags (--backend,
            # --max_pairs_per_tile, --pairs_per_gaussian, --raster_chunk)
            # reach the kernel and growth re-traces at the new capacity
            def render_fn(camera, model, bg, **kwargs):
                kwargs.setdefault("raster", trainer.raster)
                return render_tiled(camera, model, bg, **kwargs)

        self.render_fn = render_fn

        if model is None:
            model = create_from_pcd(
                scene.scene_info.point_cloud,
                spatial_lr_scale=scene.cameras_extent,
                max_sh_degree=cfg.model.sh_degree,
                capacity_margin=cfg.capacity.initial_margin,
            )
        self.state = init_train_state(model)

        self.views = scene.train_views
        assert len(self.views) > 0
        # host images are (H, W, 3); device tensors are channels-first
        # (3, H, W) — see ops/losses.py docstring for the TPU layout rationale
        self.gt_images = jnp.stack(
            [jnp.asarray(v.image).transpose(2, 0, 1) for v in self.views]
        )
        self.alpha_weights = jnp.stack(
            [jnp.asarray(alpha_weight_for_view(cfg, v)) for v in self.views]
        )
        self.use_alpha_weight = bool(np.any(np.asarray(self.alpha_weights) > 0))
        self.cams = _stack_cameras(self.views)

        bg = [1.0, 1.0, 1.0] if cfg.model.white_background else [0.0, 0.0, 0.0]
        self.bg = jnp.asarray(bg, dtype=jnp.float32)

        self.rng = random.Random(cfg.train.seed)
        self.key = jax.random.PRNGKey(cfg.train.seed)
        self._step_cache: dict = {}
        self.log: list[TrainerLogEntry] = []

    # -- jit-cache helpers ---------------------------------------------------
    def _get_step_fn(self, binocular: bool):
        key = (binocular, self.state.model.capacity, self.state.model.active_sh_degree)
        if key not in self._step_cache:
            self._step_cache[key] = make_train_step(
                self.render_fn,
                self.cfg,
                self.state.model.spatial_lr_scale,
                binocular=binocular,
                use_alpha_weight=self.use_alpha_weight,
            )
        return self._step_cache[key]

    def _get_fused_fn(self, binocular: bool, n_steps: int):
        """n_steps train iterations as ONE device dispatch: a jit'd fori_loop
        with on-device view sampling. Amortizes per-dispatch overhead (the
        reference pays a full host round trip per iteration)."""
        key = ("fused", binocular, self.state.model.capacity,
               self.state.model.active_sh_degree, n_steps)
        if key not in self._step_cache:
            step_fn = self._get_step_fn(binocular)
            n_views = len(self.views)

            @jax.jit
            def fused(state, cams, gts, aws, start_iter, key, bg):
                def body(i, carry):
                    st, k, prev = carry
                    k, k_view, k_step = jax.random.split(k, 3)
                    vidx = jax.random.randint(k_view, (), 0, n_views)
                    camera = jax.tree.map(lambda x: x[vidx], cams)
                    st, metrics = step_fn(
                        st, camera, gts[vidx], aws[vidx], start_iter + i, k_step, bg
                    )
                    # pair pressure: worst case over the whole fused span, so
                    # an overflow inside the chunk is visible to the host
                    metrics = metrics._replace(
                        num_pairs=jnp.maximum(metrics.num_pairs, prev.num_pairs),
                        max_tile_pairs=jnp.maximum(
                            metrics.max_tile_pairs, prev.max_tile_pairs
                        ),
                    )
                    return (st, k, metrics)

                from .step import StepMetrics

                zero_m = StepMetrics(
                    loss=jnp.zeros(()), l1=jnp.zeros(()),
                    disparity_loss=jnp.zeros(()), alpha_loss=jnp.zeros(()),
                    n_visible=jnp.zeros((), jnp.int32),
                    num_pairs=jnp.zeros((), jnp.int32),
                    max_tile_pairs=jnp.zeros((), jnp.int32),
                    pair_capacity=jnp.zeros((), jnp.int32),
                )
                st, _, metrics = jax.lax.fori_loop(
                    0, n_steps, body, (state, key, zero_m)
                )
                return st, metrics

            self._step_cache[key] = fused
        return self._step_cache[key]

    def _fused_span(self, it: int, iterations: int, binocular_from: int) -> int:
        """Longest fused chunk starting at `it` that crosses no protocol
        boundary (SH bump starts a chunk; densify/report/save/checkpoint may
        only END a chunk; the binocular flip starts one)."""
        cfg, opt = self.cfg, self.cfg.opt
        cap = cfg.train.fused_steps if cfg.train.fused_steps > 0 else opt.densification_interval
        n = min(cap, iterations - it + 1)
        # SH bump happens at the START of iteration j for j % 1000 == 0
        next_bump = (it // 1000 + 1) * 1000
        n = min(n, next_bump - it)
        # binocular flips ON at iteration shift_cam_start + 1
        if cfg.train.binocular_consistency and it <= cfg.train.shift_cam_start:
            n = min(n, binocular_from - it)
        # densification runs AFTER iteration j (j % interval == 0, in range)
        densify_until = iterations if cfg.train.opacity_decay else opt.densify_until_iter
        interval = opt.densification_interval
        j = (it // interval + (0 if it % interval == 0 else 1)) * interval
        while j <= opt.densify_from_iter:  # skip triggers before the range
            j += interval
        if it <= j < densify_until:
            n = min(n, j - it + 1)
        # host-side events after iteration j
        for marks in (cfg.train.test_iterations, cfg.train.save_iterations,
                      cfg.train.checkpoint_iterations):
            for m in marks:
                if m >= it:
                    n = min(n, m - it + 1)
        return max(n, 1)

    # -- main loop -----------------------------------------------------------
    def train(self, iterations: int | None = None, progress=None, first_iteration: int = 1):
        cfg = self.cfg
        opt = cfg.opt
        iterations = iterations or opt.iterations
        t0 = time.time()
        last_log_t, last_log_it = t0, first_iteration - 1

        binocular_from = cfg.train.shift_cam_start + 1
        iteration = first_iteration
        while iteration <= iterations:
            if iteration % 1000 == 0:
                self.state = self.state.replace(model=self.state.model.one_up_sh_degree())

            binocular = (
                cfg.train.binocular_consistency and iteration > cfg.train.shift_cam_start
            )
            self.key, sub = jax.random.split(self.key)
            n = self._fused_span(iteration, iterations, binocular_from)
            if n > 1:
                fused = self._get_fused_fn(binocular, n)
                self.state, metrics = fused(
                    self.state, self.cams, self.gt_images, self.alpha_weights,
                    jnp.int32(iteration), sub, self.bg,
                )
            else:
                view_idx = self.rng.randrange(len(self.views))
                camera = _index_camera(self.cams, view_idx)
                step_fn = self._get_step_fn(binocular)
                self.state, metrics = step_fn(
                    self.state,
                    camera,
                    self.gt_images[view_idx],
                    self.alpha_weights[view_idx],
                    jnp.int32(iteration),
                    sub,
                    self.bg,
                )
            last_it = iteration + n - 1
            self._maybe_grow_pair_capacity(metrics, last_it)

            densify_until = (
                iterations if cfg.train.opacity_decay else opt.densify_until_iter
            )
            if (
                last_it < densify_until
                and last_it > opt.densify_from_iter
                and last_it % opt.densification_interval == 0
            ):
                self._densify(last_it)

            # --detect_anomaly analog (reference train.py:272,297): with the
            # debug pipeline flag, a non-finite loss dumps a state snapshot
            # and aborts instead of silently training on garbage
            if cfg.pipeline.debug and not np.isfinite(float(metrics.loss)):
                path = os.path.join(cfg.model.model_path or ".", f"anomaly_{last_it}.npz")
                save_checkpoint(self.state, last_it, path)
                raise FloatingPointError(
                    f"non-finite loss {float(metrics.loss)} at iteration {last_it}; "
                    f"state dumped to {path}"
                )

            if progress is not None and (n > 1 or last_it % 10 == 0):
                now = time.time()
                ips = (last_it - last_log_it) / max(now - last_log_t, 1e-9)
                last_log_t, last_log_it = now, last_it
                entry = TrainerLogEntry(
                    iteration=last_it,
                    loss=float(metrics.loss),
                    disparity_loss=float(metrics.disparity_loss),
                    points=int(self.state.model.count()),
                    iters_per_sec=ips,
                )
                self.log.append(entry)
                progress(entry)

            if last_it in cfg.train.test_iterations:
                self.report(last_it)
            if last_it in cfg.train.save_iterations:
                self.save(last_it)
            if last_it in cfg.train.checkpoint_iterations:
                self.save_checkpoint(last_it)
            iteration = last_it + 1

        return self.state

    def _maybe_grow_pair_capacity(self, metrics, iteration: int):
        """Self-healing pair-list growth: when densification pushes the wanted
        (tile, gaussian) pair count near the static capacity, the deepest
        splats silently vanish from renders AND gradients — so double
        pairs_per_gaussian (and max_pairs_per_tile when a single tile
        saturates) and drop the jit cache to re-trace at the new capacity.
        Mirrors the gaussian-capacity growth below."""
        wanted = int(getattr(metrics, "num_pairs", 0))
        cap = int(getattr(metrics, "pair_capacity", 0))
        if wanted == 0 or cap == 0:  # render_fn does not report pressure
            return
        import dataclasses as _dc

        raster = self.raster
        trigger = self.cfg.capacity.growth_trigger
        updates = {}
        if (
            wanted > cap * trigger
            and raster.pairs_per_gaussian < raster.max_pairs_per_gaussian
        ):
            updates["pairs_per_gaussian"] = min(
                raster.pairs_per_gaussian * 2, raster.max_pairs_per_gaussian
            )
        # max_pairs_per_tile only truncates on the XLA backend (the pallas
        # kernels walk full segments); growing it there would re-jit forever
        backend = raster.backend
        if backend == "auto":
            backend = "pallas" if jax.default_backend() == "tpu" else "xla"
        max_tile = int(getattr(metrics, "max_tile_pairs", 0))
        if backend == "xla" and max_tile > raster.max_pairs_per_tile * trigger:
            updates["max_pairs_per_tile"] = raster.max_pairs_per_tile * 2
        if updates:
            # copy-on-grow: the Trainer's raster copy is replaced, the shared
            # cfg.raster is untouched
            self.raster = _dc.replace(raster, **updates)
            print(
                f"[ITER {iteration}] pair capacity grown: "
                f"pairs_per_gaussian={self.raster.pairs_per_gaussian} "
                f"max_pairs_per_tile={self.raster.max_pairs_per_tile} "
                f"(wanted {wanted} pairs, max tile {max_tile})"
            )
            self._step_cache.clear()

    def _densify(self, iteration: int):
        cfg = self.cfg
        self.key, sub = jax.random.split(self.key)
        # reference train.py:183-186: size_threshold = 20 past the opacity
        # reset interval, then *forced* None for the binocular protocol
        size_threshold = 20 if iteration > cfg.opt.opacity_reset_interval else None
        size_threshold = None
        result = densify_mod.densify_and_prune(
            self.state,
            grad_threshold=cfg.opt.densify_grad_threshold,
            min_opacity=0.005,
            extent=self.scene.cameras_extent,
            percent_dense=cfg.opt.percent_dense,
            key=sub,
            max_screen_size=size_threshold,
        )
        n_after = int(result.n_after)
        n_wanted = int(result.n_wanted)
        self.state = result.state
        cap = self.state.model.capacity
        if (
            n_wanted > cap * self.cfg.capacity.growth_trigger
            and cap < self.cfg.capacity.max_capacity
        ):
            new_cap = min(next_pow2(cap * 2), self.cfg.capacity.max_capacity)
            self.state = self.state.replace(
                model=grow_capacity(self.state.model, new_cap),
                adam_m=_pad_params(self.state.adam_m, new_cap),
                adam_v=_pad_params(self.state.adam_v, new_cap),
                grad_accum=_pad1(self.state.grad_accum, new_cap),
                denom=_pad1(self.state.denom, new_cap),
                max_radii2d=_pad1(self.state.max_radii2d, new_cap),
            )

    # -- reporting / persistence --------------------------------------------
    def render_view(self, view: View):
        camera = view.camera
        out = self.render_fn(camera, self.state.model, self.bg, mean2d_carrier=None)
        return out

    def report(self, iteration: int):
        """reference `training_report` (`train.py:226-261`)."""
        results = {}
        for name, views in (
            ("test", self.scene.test_views),
            ("train", [self.views[i % len(self.views)] for i in range(5, 30, 5)]),
        ):
            if not views:
                continue
            l1s, psnrs = [], []
            for v in views:
                out = self.render_view(v)
                img = jnp.clip(out.image, 0.0, 1.0)
                gt = jnp.clip(jnp.asarray(v.image).transpose(2, 0, 1), 0.0, 1.0)
                l1s.append(float(l1_loss(img, gt)))
                psnrs.append(float(psnr(img, gt)))
            results[name] = {"l1": float(np.mean(l1s)), "psnr": float(np.mean(psnrs))}
            print(f"\n[ITER {iteration}] Evaluating {name}: L1 {np.mean(l1s)} PSNR {np.mean(psnrs)}")
        return results

    def save(self, iteration: int):
        if not self.cfg.model.model_path:
            return
        path = os.path.join(
            self.cfg.model.model_path, f"point_cloud/iteration_{iteration}/point_cloud.ply"
        )
        save_ply(self.state.model, path)

    def save_checkpoint(self, iteration: int):
        if not self.cfg.model.model_path:
            return
        save_checkpoint(
            self.state, iteration, os.path.join(self.cfg.model.model_path, f"chkpnt{iteration}.npz")
        )


def _pad_params(params, new_cap):
    def pad(a):
        extra = new_cap - a.shape[0]
        return jnp.concatenate([a, jnp.zeros((extra,) + a.shape[1:], a.dtype)], axis=0)

    return jax.tree.map(pad, params)


def _pad1(a, new_cap):
    return jnp.concatenate([a, jnp.zeros(new_cap - a.shape[0], a.dtype)])


def save_checkpoint(state: TrainState, iteration: int, path: str) -> None:
    """Full training checkpoint (reference capture(), `scene/gaussian_model.py:61-75`)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    arrays = {}
    for prefix, tree in (
        ("params", state.model.params),
        ("adam_m", state.adam_m),
        ("adam_v", state.adam_v),
    ):
        for f in ("xyz", "f_dc", "f_rest", "opacity", "scaling", "rotation"):
            arrays[f"{prefix}.{f}"] = np.asarray(getattr(tree, f))
    arrays["active"] = np.asarray(state.model.active)
    arrays["adam_step"] = np.asarray(state.adam_step)
    arrays["grad_accum"] = np.asarray(state.grad_accum)
    arrays["denom"] = np.asarray(state.denom)
    arrays["max_radii2d"] = np.asarray(state.max_radii2d)
    arrays["meta"] = np.asarray(
        [iteration, state.model.active_sh_degree, state.model.max_sh_degree]
    )
    arrays["spatial_lr_scale"] = np.asarray(state.model.spatial_lr_scale)
    np.savez(path, **arrays)


def find_latest_checkpoint(model_path: str) -> str | None:
    """Resume-from-latest discovery (the reference has none — its only
    resilience is the dispatcher retry loop, SURVEY §5): newest chkpnt<N>.npz
    in the model dir, or None."""
    import re

    if not model_path or not os.path.isdir(model_path):
        return None
    best, best_it = None, -1
    for f in os.listdir(model_path):
        m = re.fullmatch(r"chkpnt(\d+)\.npz", f)
        if m and int(m.group(1)) > best_it:
            best_it = int(m.group(1))
            best = os.path.join(model_path, f)
    return best


def load_checkpoint(path: str):
    """Returns (TrainState, iteration)."""
    from ..models.gaussians import GaussianParams

    z = np.load(path)

    def tree(prefix):
        return GaussianParams(
            **{
                f: jnp.asarray(z[f"{prefix}.{f}"])
                for f in ("xyz", "f_dc", "f_rest", "opacity", "scaling", "rotation")
            }
        )

    iteration, active_sh, max_sh = (int(x) for x in z["meta"])
    model = GaussianModel(
        params=tree("params"),
        active=jnp.asarray(z["active"]),
        max_sh_degree=max_sh,
        active_sh_degree=active_sh,
        spatial_lr_scale=float(z["spatial_lr_scale"]),
    )
    state = TrainState(
        model=model,
        adam_m=tree("adam_m"),
        adam_v=tree("adam_v"),
        adam_step=jnp.asarray(z["adam_step"]),
        grad_accum=jnp.asarray(z["grad_accum"]),
        denom=jnp.asarray(z["denom"]),
        max_radii2d=jnp.asarray(z["max_radii2d"]),
    )
    return state, iteration
