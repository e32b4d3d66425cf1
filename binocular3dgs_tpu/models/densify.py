"""Functional densification: clone / split / prune on fixed-capacity buffers.

Behavioral parity target: reference `scene/gaussian_model.py:307-411`:

  * grads = accumulated screen-space grad norm / count, NaN -> 0
  * clone: grad >= thr and max scale <= percent_dense * extent -> duplicate
  * split: grad >= thr and max scale > percent_dense * extent -> two children
    sampled from N(0, scale) rotated into world, scale /= 1.6; parent removed
  * prune: post-densify opacity < min_opacity (size pruning disabled in the
    binocular protocol: size_threshold is forced None at `train.py:185`)
  * optimizer moments: survivors keep theirs, new points start at zero,
    densification accumulators reset to zero (`:349-351`)
  * opacity decay: opacity <- sigmoid^-1(sigmoid(opacity) * factor) (`:307`)

The torch version reallocates tensors; here the next generation is compacted
into the same fixed capacity with one masked scatter (originals first, then
clones, then split children — overflow drops from the tail, reported via the
returned count so the host can grow capacity and retry).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.transforms import inverse_sigmoid, quat_to_rotmat
from ..models.gaussians import GaussianParams
from ..train.state import TrainState, zeros_like_params


class DensifyResult(NamedTuple):
    state: TrainState
    n_before: jnp.ndarray
    n_after: jnp.ndarray  # survivors actually written (post-truncation)
    n_wanted: jnp.ndarray  # survivors the rule wanted (pre-truncation)


def opacity_decay(state: TrainState, factor: float) -> TrainState:
    """reference `scene/gaussian_model.py:307-309` (applied every iteration
    after densify_from_iter when --opacity_decay)."""
    p = state.model.params
    opa = jax.nn.sigmoid(p.opacity) * factor
    new_opacity = jnp.where(
        state.model.active[:, None], inverse_sigmoid(opa), p.opacity
    )
    return state.replace(
        model=state.model.replace(params=p.replace(opacity=new_opacity))
    )


def reset_opacity(state: TrainState) -> TrainState:
    """opacity <- sigmoid^-1(min(sigmoid(opacity), 0.01)), Adam moments of the
    opacity group zeroed (reference `scene/gaussian_model.py:210-213` via
    `replace_tensor_to_optimizer` `:257-263`). Part of GaussianModel's API
    surface; the binocular protocol never calls it (`train.py:188-193` is
    commented out), matching `densify_and_prune(max_screen_size=None)`."""
    p = state.model.params
    new_op = inverse_sigmoid(jnp.minimum(jax.nn.sigmoid(p.opacity), 0.01))
    new_op = jnp.where(state.model.active[:, None], new_op, p.opacity)
    return state.replace(
        model=state.model.replace(params=p.replace(opacity=new_op)),
        adam_m=state.adam_m.replace(opacity=jnp.zeros_like(state.adam_m.opacity)),
        adam_v=state.adam_v.replace(opacity=jnp.zeros_like(state.adam_v.opacity)),
    )


def _scatter_compact(
    candidates: list[GaussianParams],
    cand_m: list[GaussianParams],
    cand_v: list[GaussianParams],
    masks: list[jnp.ndarray],
    capacity: int,
    template: GaussianParams,
):
    """Compact candidate rows (each list entry is a (cap, ...) block) into a
    single capacity-sized buffer, in list order. Overflow rows are dropped."""
    mask_cat = jnp.concatenate(masks)  # (k*cap,)
    pos = jnp.cumsum(mask_cat.astype(jnp.int32)) - 1  # inclusive -> exclusive
    target = jnp.where(mask_cat & (pos < capacity), pos, capacity)  # capacity = drop slot

    def scatter(blocks, fill_template):
        out = {}
        for f in ("xyz", "f_dc", "f_rest", "opacity", "scaling", "rotation"):
            cat = jnp.concatenate([getattr(b, f) for b in blocks], axis=0)
            base = jnp.zeros((capacity + 1,) + cat.shape[1:], cat.dtype)
            if f == "scaling":
                base = base.at[:].set(-20.0)
            if f == "rotation":
                base = base.at[:, 0].set(1.0)
            out[f] = base.at[target].set(cat)[:capacity]
        return GaussianParams(**out)

    new_params = scatter(candidates, template)
    new_m = scatter(cand_m, None)
    new_v = scatter(cand_v, None)
    # new_m/new_v sentinel fills are harmless garbage for inactive rows; zero them
    n_after = jnp.minimum(jnp.sum(mask_cat.astype(jnp.int32)), capacity)
    active = jnp.arange(capacity) < n_after
    new_m = jax.tree.map(lambda a: jnp.where(active.reshape((-1,) + (1,) * (a.ndim - 1)), a, 0.0), new_m)
    new_v = jax.tree.map(lambda a: jnp.where(active.reshape((-1,) + (1,) * (a.ndim - 1)), a, 0.0), new_v)
    return new_params, new_m, new_v, active, n_after


def densify_and_prune(
    state: TrainState,
    grad_threshold: float,
    min_opacity: float,
    extent: float,
    percent_dense: float,
    key: jax.Array,
    max_screen_size: float | None = None,
) -> DensifyResult:
    """`max_screen_size` enables size pruning (reference
    `scene/gaussian_model.py:397-404`: `max_radii2D > max_screen_size` OR
    world-space `max scale > 0.1 * extent`). The binocular protocol forces it
    None (`train.py:185-186`). Note the reference's own call path zeroes
    `max_radii2D` in `densification_postfix` (`:350-352`) before the prune, so
    its view-space branch can never fire; we implement the upstream-3DGS
    intent and test it against the *pre-densify* `state.max_radii2d` (split
    children, being new points, are exempt from the view-space check)."""
    model = state.model
    p = model.params
    cap = model.capacity
    active = model.active

    denom_safe = jnp.maximum(state.denom, 1.0)
    grads = jnp.where(state.denom > 0, state.grad_accum / denom_safe, 0.0)
    grads = jnp.nan_to_num(grads, nan=0.0)

    scaling = jnp.exp(p.scaling)
    max_scale = jnp.max(scaling, axis=-1)
    opacity_act = jax.nn.sigmoid(p.opacity[:, 0])

    hot = active & (grads >= grad_threshold)
    clone_mask = hot & (max_scale <= percent_dense * extent)
    split_mask = hot & (max_scale > percent_dense * extent)
    alive = opacity_act >= min_opacity
    child_alive = alive  # children inherit the parent's opacity
    if max_screen_size is not None:
        big_vs = state.max_radii2d > max_screen_size
        big_ws = max_scale > 0.1 * extent
        alive = alive & ~big_vs & ~big_ws
        child_big_ws = (max_scale / 1.6) > 0.1 * extent
        child_alive = child_alive & ~child_big_ws

    keep_orig = active & ~split_mask & alive
    keep_clone = clone_mask & alive  # clone copies share the parent's opacity
    keep_split = split_mask & child_alive

    # split children: xyz = parent + R @ N(0, scale), scale /= 0.8 * 2
    R = quat_to_rotmat(p.rotation)  # (cap, 3, 3)
    k1, k2 = jax.random.split(key)
    n1 = jax.random.normal(k1, (cap, 3)) * scaling
    n2 = jax.random.normal(k2, (cap, 3)) * scaling
    child_scaling = jnp.log(jnp.maximum(scaling / 1.6, 1e-30))

    def child(noise):
        return p.replace(
            xyz=p.xyz + jnp.einsum("nij,nj->ni", R, noise),
            scaling=child_scaling,
        )

    zero_m = zeros_like_params(p)
    new_params, new_m, new_v, new_active, n_after = _scatter_compact(
        candidates=[p, p, child(n1), child(n2)],
        cand_m=[state.adam_m, zero_m, zero_m, zero_m],
        cand_v=[state.adam_v, zero_m, zero_m, zero_m],
        masks=[keep_orig, keep_clone, keep_split, keep_split],
        capacity=cap,
        template=p,
    )

    n_before = jnp.sum(active.astype(jnp.int32))
    n_wanted = (
        jnp.sum(keep_orig.astype(jnp.int32))
        + jnp.sum(keep_clone.astype(jnp.int32))
        + 2 * jnp.sum(keep_split.astype(jnp.int32))
    )

    new_state = state.replace(
        model=model.replace(params=new_params, active=new_active),
        adam_m=new_m,
        adam_v=new_v,
        grad_accum=jnp.zeros(cap, jnp.float32),
        denom=jnp.zeros(cap, jnp.float32),
        max_radii2d=jnp.zeros(cap, jnp.float32),
    )
    return DensifyResult(new_state, n_before, n_after, n_wanted)
