"""Training state: model + per-parameter Adam moments + densification stats.

Behavioral parity target: reference `scene/gaussian_model.py:61-93` (capture
tuple), `:149-175` (per-group Adam with eps=1e-15 and the xyz expon LR
schedule). The torch version relies on per-tensor optimizer state dicts that
get surgically resized at densification; here moments are fixed-capacity
arrays mirroring the parameter buffers, and densification re-scatters them
(zeros for new points, preserved for survivors) in one functional update.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..config import OptimizationConfig
from ..core.transforms import expon_lr_schedule
from ..models.gaussians import GaussianModel, GaussianParams

ADAM_B1 = 0.9
ADAM_B2 = 0.999
ADAM_EPS = 1e-15


@struct.dataclass
class TrainState:
    model: GaussianModel
    adam_m: GaussianParams
    adam_v: GaussianParams
    adam_step: jnp.ndarray  # () int32 — global step count (shared across groups)
    grad_accum: jnp.ndarray  # (N,) accumulated screen-space grad norms
    denom: jnp.ndarray  # (N,) accumulation counts
    max_radii2d: jnp.ndarray  # (N,) max observed screen radius


def zeros_like_params(params: GaussianParams) -> GaussianParams:
    return jax.tree.map(jnp.zeros_like, params)


def init_train_state(model: GaussianModel) -> TrainState:
    cap = model.capacity
    return TrainState(
        model=model,
        adam_m=zeros_like_params(model.params),
        adam_v=zeros_like_params(model.params),
        adam_step=jnp.zeros((), jnp.int32),
        grad_accum=jnp.zeros(cap, jnp.float32),
        denom=jnp.zeros(cap, jnp.float32),
        max_radii2d=jnp.zeros(cap, jnp.float32),
    )


def xyz_lr_fn(opt: OptimizationConfig, spatial_lr_scale: float):
    """reference `scene/gaussian_model.py:164-167`."""
    return expon_lr_schedule(
        lr_init=opt.position_lr_init * spatial_lr_scale,
        lr_final=opt.position_lr_final * spatial_lr_scale,
        lr_delay_mult=opt.position_lr_delay_mult,
        max_steps=opt.position_lr_max_steps,
    )


def group_lrs(opt: OptimizationConfig, xyz_lr) -> GaussianParams:
    """Per-group learning rates packed in a GaussianParams-shaped pytree
    (reference `scene/gaussian_model.py:154-161`)."""
    return GaussianParams(
        xyz=xyz_lr,
        f_dc=opt.feature_lr,
        f_rest=opt.feature_lr / 20.0,
        opacity=opt.opacity_lr,
        scaling=opt.scaling_lr,
        rotation=opt.rotation_lr,
    )


def adam_update(
    params: GaussianParams,
    grads: GaussianParams,
    m: GaussianParams,
    v: GaussianParams,
    step: jnp.ndarray,
    lrs: GaussianParams,
    active: jnp.ndarray,
):
    """One Adam step (torch semantics: bias-corrected, eps outside sqrt's
    bias correction), masked to active rows so padded rows stay at their
    sentinel values.

    Returns (new_params, new_m, new_v, new_step).
    """
    t = step + 1
    b1t = 1.0 - ADAM_B1 ** t.astype(jnp.float32)
    b2t = 1.0 - ADAM_B2 ** t.astype(jnp.float32)

    def upd(p, g, mi, vi, lr):
        mask = active.reshape((-1,) + (1,) * (p.ndim - 1)).astype(p.dtype)
        g = g * mask
        m_new = ADAM_B1 * mi + (1.0 - ADAM_B1) * g
        v_new = ADAM_B2 * vi + (1.0 - ADAM_B2) * (g * g)
        m_hat = m_new / b1t
        v_hat = v_new / b2t
        p_new = p - lr * m_hat / (jnp.sqrt(v_hat) + ADAM_EPS)
        return jnp.where(mask > 0, p_new, p), m_new, v_new

    fields = ("xyz", "f_dc", "f_rest", "opacity", "scaling", "rotation")
    outs = {}
    for f in fields:
        outs[f] = upd(getattr(params, f), getattr(grads, f), getattr(m, f), getattr(v, f), getattr(lrs, f))
    new_params = GaussianParams(**{f: outs[f][0] for f in fields})
    new_m = GaussianParams(**{f: outs[f][1] for f in fields})
    new_v = GaussianParams(**{f: outs[f][2] for f in fields})
    return new_params, new_m, new_v, t
