"""VGG-16 feature pyramid (reference models/feature_backbones/VGG_features.py:6-54).

The reference splits torchvision's VGG-16 `features` stack into 5 blocks:

  level_0: conv(3->64),  relu                      -> 64 ch  @ full res
  level_1: conv(64->64), relu, maxpool             -> 64 ch  @ 1/2
  level_2: conv(64->128), relu, conv(128->128), relu, maxpool   -> 128 @ 1/4
  level_3: conv x3 (->256), relus, maxpool         -> 256 ch @ 1/8
  level_4: conv x3 (->512), relus, maxpool         -> 512 ch @ 1/16

Param names follow the torch state_dict: f"{root}.level_{i}.{j}.weight".
"""

from __future__ import annotations

from .layers import conv2d, maxpool2x2, relu

# conv indices inside each level's nn.Sequential
_LEVEL_CONVS = {0: (0,), 1: (0,), 2: (0, 2), 3: (0, 2, 4), 4: (0, 2, 4)}
_LEVEL_POOL = {0: False, 1: True, 2: True, 3: True, 4: True}


def _level(x, params, root, i):
    for j in _LEVEL_CONVS[i]:
        x = relu(conv2d(x, params, f"{root}.level_{i}.{j}", stride=1, padding=1))
    if _LEVEL_POOL[i]:
        x = maxpool2x2(x)
    return x


def vgg_pyramid(x, params, root="pyramid", eigth_resolution=False):
    """x: (B, H, W, 3) imagenet-normalized. Returns the reference's output
    list: [full(64), quarter(128), eighth(256)] when eigth_resolution, else
    all 5 levels (reference VGG_features.py:35-54)."""
    outputs = []
    if eigth_resolution:
        x_full = _level(x, params, root, 0)
        outputs.append(x_full)
        x_half = _level(x_full, params, root, 1)
        x_quarter = _level(x_half, params, root, 2)
        outputs.append(x_quarter)
        x_eighth = _level(x_quarter, params, root, 3)
        outputs.append(x_eighth)
    else:
        for i in range(5):
            x = _level(x, params, root, i)
            outputs.append(x)
    return outputs
