"""LPIPS perceptual metric in JAX — vgg / alex / squeeze backbones.

Behavioral parity target: reference `lpipsPyTorch/` (LPIPS v0.1: backbone
conv features captured after the reference's target layers, imagenet
z-score, unit-normalize along channels, 1x1 linear heads, spatial mean, sum
over layers — `modules/{lpips,networks,utils}.py`; metrics.py uses
net_type='vgg' at `metrics.py:105`). The reference downloads torchvision
backbone weights + richzhang linear heads at runtime; this environment has
no network egress and no torchvision, so weights must be supplied
explicitly:

    lpips_fn = make_lpips(load_lpips_weights("/path/to/weights.npz"), "vgg")

`convert_backbone_weights` turns (torchvision-layout state_dict, richzhang
lin state_dict) torch checkpoints into the npz layout for any of the three
backbones. When no weights are available the eval CLI reports LPIPS as null
rather than failing the whole evaluation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# imagenet shift/scale used by LPIPS (reference lpipsPyTorch/modules/networks.py:39-43)
SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# Layer programs mirroring torchvision `features` sequentials, with "cap"
# markers at the reference target layers (networks.py:61-88: captures are
# the 1-based enumerate positions, i.e. the outputs of those modules).
# ops: ("conv", stride, pad) ("relu",) ("pool", k, stride, ceil_mode)
# ("fire",) ("cap",)
_C = ("conv", 1, 1)
_R = ("relu",)
_P2 = ("pool", 2, 2, False)

NET_SPECS = {
    # torchvision vgg16.features; targets [4,9,16,23,30] (networks.py:84-88)
    "vgg": [
        _C, _R, _C, _R, ("cap",), _P2,
        _C, _R, _C, _R, ("cap",), _P2,
        _C, _R, _C, _R, _C, _R, ("cap",), _P2,
        _C, _R, _C, _R, _C, _R, ("cap",), _P2,
        _C, _R, _C, _R, _C, _R, ("cap",),
    ],
    # torchvision alexnet.features; targets [2,5,8,10,12] (networks.py:73-78)
    "alex": [
        ("conv", 4, 2), _R, ("cap",), ("pool", 3, 2, False),
        ("conv", 1, 2), _R, ("cap",), ("pool", 3, 2, False),
        _C, _R, ("cap",),
        _C, _R, ("cap",),
        _C, _R, ("cap",),
    ],
    # torchvision squeezenet1_1.features; targets [2,5,8,10,11,12,13]
    # (networks.py:61-68)
    "squeeze": [
        ("conv", 2, 0), _R, ("cap",), ("pool", 3, 2, True),
        ("fire",), ("fire",), ("cap",), ("pool", 3, 2, True),
        ("fire",), ("fire",), ("cap",), ("pool", 3, 2, True),
        ("fire",), ("cap",), ("fire",), ("cap",),
        ("fire",), ("cap",), ("fire",), ("cap",),
    ],
}

N_CHANNELS = {
    "vgg": [64, 128, 256, 512, 512],
    "alex": [64, 192, 384, 256, 256],
    "squeeze": [64, 128, 256, 384, 384, 512, 512],
}

# torchvision `features.<i>` indices of the plain convs / Fire modules
_CONV_IDX = {
    "vgg": [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28],
    "alex": [0, 3, 6, 8, 10],
    "squeeze": [0],
}
_FIRE_IDX = {"squeeze": [3, 4, 6, 7, 9, 10, 11, 12]}


def convert_backbone_weights(net_type: str, backbone_state: dict, lin_state: dict):
    """torchvision-layout `features.*` + richzhang linear-head state dicts
    (numpy or torch tensors) -> flat npz-able dict.

    Accepts the raw richzhang download layout (`lin{l}.model.1.weight`, what
    `lpipsPyTorch/modules/utils.py:13-20` downloads) AND the renamed layout
    the reference produces from it (`{l}.1.weight`, after stripping 'lin'
    and 'model.')."""

    def arr(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    def conv(out, name, w, b):
        out[f"{name}.w"] = np.transpose(arr(w), (2, 3, 1, 0))  # OIHW -> HWIO
        out[f"{name}.b"] = arr(b)

    out = {"net_type": np.asarray(net_type)}
    for i, idx in enumerate(_CONV_IDX[net_type]):
        conv(out, f"conv{i}",
             backbone_state[f"features.{idx}.weight"],
             backbone_state[f"features.{idx}.bias"])
    for j, idx in enumerate(_FIRE_IDX.get(net_type, [])):
        for sub in ("squeeze", "expand1x1", "expand3x3"):
            conv(out, f"fire{j}.{sub}",
                 backbone_state[f"features.{idx}.{sub}.weight"],
                 backbone_state[f"features.{idx}.{sub}.bias"])
    for l in range(len(N_CHANNELS[net_type])):
        for key in (f"lin{l}.model.1.weight", f"{l}.1.weight"):
            if key in lin_state:
                w = arr(lin_state[key])  # (1, C, 1, 1)
                break
        else:
            raise KeyError(f"linear head {l} not found in lin_state")
        out[f"lin{l}.w"] = w[0, :, 0, 0]
    return out


def convert_torch_weights(vgg_state: dict, lin_state: dict) -> dict[str, np.ndarray]:
    """Backward-compatible vgg16 converter (see convert_backbone_weights)."""
    return convert_backbone_weights("vgg", vgg_state, lin_state)


def save_lpips_weights(path: str, weights: dict[str, np.ndarray]) -> None:
    np.savez(path, **weights)


def load_lpips_weights(path: str) -> dict[str, np.ndarray]:
    z = np.load(path)
    return {k: z[k] for k in z.files}


def _conv(x, weights, name, stride, pad):
    w = jnp.asarray(weights[f"{name}.w"])
    b = jnp.asarray(weights[f"{name}.b"])
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b


def _max_pool(x, k, s, ceil_mode):
    """torch MaxPool2d(k, s) with optional ceil_mode (implicit -inf pad on
    the bottom/right so the last partial window is kept)."""
    if ceil_mode:
        H, W = x.shape[1], x.shape[2]
        out_h = -(-(H - k) // s) + 1
        out_w = -(-(W - k) // s) + 1
        pads = (
            (0, 0),
            (0, max((out_h - 1) * s + k - H, 0)),
            (0, max((out_w - 1) * s + k - W, 0)),
            (0, 0),
        )
    else:
        pads = ((0, 0), (0, 0), (0, 0), (0, 0))
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1), pads
    )


def _fire(x, weights, name):
    """torchvision squeezenet Fire: 1x1 squeeze -> relu -> parallel 1x1 and
    3x3(p=1) expands -> relu -> channel concat."""
    s = jax.nn.relu(_conv(x, weights, f"{name}.squeeze", 1, 0))
    e1 = jax.nn.relu(_conv(s, weights, f"{name}.expand1x1", 1, 0))
    e3 = jax.nn.relu(_conv(s, weights, f"{name}.expand3x3", 1, 1))
    return jnp.concatenate([e1, e3], axis=-1)


def _features(net_type, weights, x):
    """x: (B, H, W, 3) in [0,1] -> captured feature maps. The reference
    feeds [0,1] images straight into z_score — no [-1,1] rescale
    (lpipsPyTorch/modules/networks.py:50-53, called from metrics.py with
    [0,1] tensors)."""
    x = (x - SHIFT) / SCALE
    feats = []
    ci = fi = 0
    for op in NET_SPECS[net_type]:
        kind = op[0]
        if kind == "conv":
            x = _conv(x, weights, f"conv{ci}", op[1], op[2])
            ci += 1
        elif kind == "relu":
            x = jax.nn.relu(x)
        elif kind == "pool":
            x = _max_pool(x, op[1], op[2], op[3])
        elif kind == "fire":
            x = _fire(x, weights, f"fire{fi}")
            fi += 1
        else:  # cap
            feats.append(x)
    return feats


def make_lpips(weights: dict[str, np.ndarray], net_type: str | None = None):
    """Returns lpips(img1, img2) on (H, W, 3) [0,1] images. net_type defaults
    to the tag stored by the converter, else 'vgg' (the metrics.py path)."""
    if net_type is None:
        net_type = str(weights.get("net_type", "vgg"))
    if net_type not in NET_SPECS:
        raise ValueError(f"unknown LPIPS backbone {net_type!r}")

    @jax.jit
    def lpips(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
        x = img1[None] if img1.ndim == 3 else img1
        y = img2[None] if img2.ndim == 3 else img2
        fx = _features(net_type, weights, x)
        fy = _features(net_type, weights, y)
        total = 0.0
        for l, (a, b) in enumerate(zip(fx, fy)):
            # reference normalize_activation: x / (sqrt(sum x^2) + eps)
            a = a / (jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True)) + 1e-10)
            b = b / (jnp.sqrt(jnp.sum(b * b, axis=-1, keepdims=True)) + 1e-10)
            d = (a - b) ** 2
            lin = jnp.asarray(weights[f"lin{l}.w"])
            total = total + jnp.mean(jnp.sum(d * lin, axis=-1), axis=(1, 2))
        return total[0]

    return lpips
