"""The jit'd training step.

Behavioral parity target: reference `train.py:65-202` hot loop —
  * loss = (1-λ)·L1 + λ·(1-SSIM)  (λ = 0.2)
  * binocular branch (iteration > shift_cam_start): random camera x-shift
    d ~ U(0, cam_trans_dist)·±1, second render, disparity = fx·(-d)/(depth+1e-5),
    inverse-warp the shifted render, L1(warped, gt; warp_mask) +
    0.05·smooth(disparity·mask, gt)
  * alpha loss: mean(|alpha| · alpha_weight) where alpha_weight is
    (1 - gt_alpha_mask) for Blender or the precomputed DTU dark-region mask
    (reference `train.py:111-143`); zeros otherwise
  * opacity decay ×factor each iteration after densify_from_iter
  * per-group Adam with scheduled xyz LR, applied after stats accumulation
  * densification stats: ||means2D.grad[:2]|| accumulated for visible points

One compiled function per (binocular on/off) variant; the host loop flips at
shift_cam_start. Camera/view selection happens on-host (python RNG, matching
the reference's random.choice) and indexes into stacked device arrays.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..config import Config
from ..core.camera import Camera, shift_camera
from ..models.gaussians import GaussianModel
from ..ops.losses import l1_loss, smooth_loss, ssim
from ..ops.warp import inverse_warp_image, warp_mask
from .state import TrainState, adam_update, group_lrs

# render_fn(camera, model, bg, mean2d_carrier) -> RenderOutput-like
RenderFn = Callable[..., Any]


class StepMetrics(NamedTuple):
    loss: jnp.ndarray
    l1: jnp.ndarray
    disparity_loss: jnp.ndarray
    alpha_loss: jnp.ndarray
    n_visible: jnp.ndarray
    # wanted (pre-truncation) pair-list sizes, max over the step's renders,
    # plus the static capacity the render was traced with; 0 when the
    # render_fn does not report them (dense oracle)
    num_pairs: jnp.ndarray
    max_tile_pairs: jnp.ndarray
    pair_capacity: jnp.ndarray


def compute_losses(
    render_fn: RenderFn,
    model: GaussianModel,
    camera: Camera,
    gt_image: jnp.ndarray,
    alpha_weight: jnp.ndarray | None,
    bg: jnp.ndarray,
    carrier: jnp.ndarray,
    key: jax.Array,
    lambda_dssim: float,
    binocular: bool,
    cam_trans_dist: float,
):
    out = render_fn(camera, model, bg, mean2d_carrier=carrier)

    def _pressure(o, prev=None):
        zero = jnp.zeros((), jnp.int32)
        np_ = getattr(o, "num_pairs", None)
        mtp = getattr(o, "max_tile_pairs", None)
        cap = getattr(o, "pair_capacity", None)
        np_ = zero if np_ is None else np_
        mtp = zero if mtp is None else mtp
        cap = zero if cap is None else cap
        if prev is not None:
            np_, mtp = jnp.maximum(np_, prev[0]), jnp.maximum(mtp, prev[1])
        return np_, mtp, cap

    pair_pressure = _pressure(out)

    Ll1 = l1_loss(out.image, gt_image)
    loss = (1.0 - lambda_dssim) * Ll1 + lambda_dssim * (1.0 - ssim(out.image, gt_image))

    disparity_loss = jnp.zeros(())
    if binocular:
        k1, k2 = jax.random.split(key)
        d = jax.random.uniform(k1, ()) * cam_trans_dist
        sign = jnp.where(jax.random.bernoulli(k2), 1.0, -1.0)
        trans = d * sign
        shifted_cam = shift_camera(camera, trans)
        out_s = render_fn(shifted_cam, model, bg, mean2d_carrier=None)
        pair_pressure = _pressure(out_s, pair_pressure)
        disparity = camera.focal_x * (-trans) / (out.depth + 1e-5)
        warped = inverse_warp_image(out_s.image, disparity)
        mask = warp_mask(disparity, camera.height, camera.width)  # (H, W)
        disparity_loss = l1_loss(warped, gt_image, mask=mask) + 0.05 * smooth_loss(
            disparity * mask, gt_image
        )

    alpha_l = jnp.zeros(())
    if alpha_weight is not None:
        alpha_l = jnp.mean(jnp.abs(out.alpha) * alpha_weight)

    total = loss + disparity_loss + alpha_l
    aux = {
        "l1": Ll1,
        "loss": loss,
        "disparity_loss": disparity_loss,
        "alpha_loss": alpha_l,
        "radii": out.radii,
        "num_pairs": jax.lax.stop_gradient(pair_pressure[0]),
        "max_tile_pairs": jax.lax.stop_gradient(pair_pressure[1]),
        "pair_capacity": jax.lax.stop_gradient(pair_pressure[2]),
    }
    return total, aux


def make_train_step(
    render_fn: RenderFn,
    cfg: Config,
    spatial_lr_scale: float,
    binocular: bool,
    use_alpha_weight: bool,
    opt_state_sharding=None,
):
    """Build a jit'd train step. Static: config values, binocular flag.

    `opt_state_sharding`: optional callable applied (per-leaf) to the updated
    Adam moments — pass a `with_sharding_constraint` to partition the
    optimizer state along the gaussian axis (SURVEY.md §2.4, last row): the
    moment update then computes sharded and the state STAYS sharded across
    steps (jit propagates output shardings), while the parameter update's
    all-gather is inserted by XLA. Bit-exact vs replicated (elementwise math
    + exact collectives) — asserted by tests/test_parallel.py."""
    from ..train.state import xyz_lr_fn

    opt = cfg.opt
    xyz_lr = xyz_lr_fn(opt, spatial_lr_scale)

    @jax.jit
    def train_step(
        state: TrainState,
        camera: Camera,
        gt_image: jnp.ndarray,
        alpha_weight: jnp.ndarray,
        iteration: jnp.ndarray,
        key: jax.Array,
        bg: jnp.ndarray,
    ):
        model = state.model
        carrier = jnp.zeros((model.capacity, 2), jnp.float32)

        def loss_fn(params, carrier):
            m = model.replace(params=params)
            return compute_losses(
                render_fn,
                m,
                camera,
                gt_image,
                alpha_weight if use_alpha_weight else None,
                bg,
                carrier,
                key,
                opt.lambda_dssim,
                binocular,
                cfg.train.cam_trans_dist,
            )

        (total, aux), (grads, carrier_grad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(model.params, carrier)

        radii = aux["radii"]
        visible = radii > 0

        # opacity decay (reference train.py:171-173), before the Adam step,
        # on the pre-update parameters; grads stay those of the pre-decay value
        params = model.params
        if cfg.train.opacity_decay:
            from ..core.transforms import inverse_sigmoid

            decay_on = iteration > opt.densify_from_iter
            opa = jax.nn.sigmoid(params.opacity) * cfg.train.opacity_decay_factor
            decayed = jnp.where(model.active[:, None], inverse_sigmoid(opa), params.opacity)
            params = params.replace(
                opacity=jnp.where(decay_on, decayed, params.opacity)
            )

        # densification statistics (reference train.py:176-179); with
        # opacity_decay the reference extends densify_until_iter to the full
        # run (train.py:171-172)
        densify_until = opt.iterations if cfg.train.opacity_decay else opt.densify_until_iter
        stats_on = (iteration < densify_until) & visible
        gnorm = jnp.linalg.norm(carrier_grad, axis=-1)
        new_max_radii = jnp.where(
            stats_on, jnp.maximum(state.max_radii2d, radii), state.max_radii2d
        )
        new_grad_accum = jnp.where(stats_on, state.grad_accum + gnorm, state.grad_accum)
        new_denom = jnp.where(stats_on, state.denom + 1.0, state.denom)

        new_params, new_m, new_v, new_t = adam_update(
            params,
            grads,
            state.adam_m,
            state.adam_v,
            state.adam_step,
            group_lrs(opt, xyz_lr(iteration)),
            model.active,
        )

        if opt_state_sharding is not None:
            new_m = jax.tree.map(opt_state_sharding, new_m)
            new_v = jax.tree.map(opt_state_sharding, new_v)

        new_state = state.replace(
            model=model.replace(params=new_params),
            adam_m=new_m,
            adam_v=new_v,
            adam_step=new_t,
            grad_accum=new_grad_accum,
            denom=new_denom,
            max_radii2d=new_max_radii,
        )
        metrics = StepMetrics(
            loss=aux["loss"],
            l1=aux["l1"],
            disparity_loss=aux["disparity_loss"],
            alpha_loss=aux["alpha_loss"],
            n_visible=jnp.sum(visible.astype(jnp.int32)),
            num_pairs=aux["num_pairs"],
            max_tile_pairs=aux["max_tile_pairs"],
            pair_capacity=aux["pair_capacity"],
        )
        return new_state, metrics

    return train_step
