"""Dense matchers for the initialization pipeline.

The reference uses a pre-trained PDCNet+ network
(`submodules/dense_matcher/model_selection.py:49`, ~17k LoC inference stack)
whose megadepth checkpoint must be downloaded; this zero-egress environment
has no pretrained weights, so the pipeline ships with:

  * `FarnebackMatcher` — a classical dense-flow matcher (OpenCV Farneback
    pyramidal flow) with forward-backward cyclic-consistency confidence,
    mirroring PDCNet's match extraction contract
    (`models/PDCNet/base_pdcnet.py:518-570`): quarter-resolution keypoints
    sorted by confidence.
  * `PDCNetPlusMatcher` — the PDCNet+ JAX port entry point; requires a
    converted checkpoint (weights_path). The network itself lands in a later
    round; constructing it without weights raises with guidance.

Both return the reference dict: {kp_source, kp_target, confidence_value}.
"""

from __future__ import annotations

import numpy as np


class FarnebackMatcher:
    """Classical pyramidal dense flow + cyclic-consistency confidence."""

    def __init__(self, scaling: float = 0.25, cyclic_thresh: float = 1.5, stride: int = 2):
        self.scaling = scaling
        self.cyclic_thresh = cyclic_thresh
        self.stride = stride

    def _flow(self, a_gray, b_gray):
        import cv2

        return cv2.calcOpticalFlowFarneback(
            a_gray, b_gray, None,
            pyr_scale=0.5, levels=5, winsize=21, iterations=5,
            poly_n=7, poly_sigma=1.5, flags=0,
        )

    def get_matches_and_confidence(self, ref_image: np.ndarray, src_image: np.ndarray) -> dict:
        """ref/src: (H, W, 3) uint8 or float [0,255]. Returns matches at the
        (possibly downscaled) working resolution mapped back to full res."""
        import cv2

        H, W = ref_image.shape[:2]
        s = self.scaling
        size = (max(8, int(W * s)), max(8, int(H * s)))
        ref_s = cv2.resize(np.asarray(ref_image, np.uint8), size)
        src_s = cv2.resize(np.asarray(src_image, np.uint8), size)
        ref_g = cv2.cvtColor(ref_s, cv2.COLOR_RGB2GRAY)
        src_g = cv2.cvtColor(src_s, cv2.COLOR_RGB2GRAY)

        fwd = self._flow(ref_g, src_g)  # ref -> src
        bwd = self._flow(src_g, ref_g)

        h, w = ref_g.shape
        ys, xs = np.mgrid[0:h:self.stride, 0:w:self.stride]
        xs = xs.reshape(-1).astype(np.float32)
        ys = ys.reshape(-1).astype(np.float32)
        fx = fwd[ys.astype(int), xs.astype(int), 0]
        fy = fwd[ys.astype(int), xs.astype(int), 1]
        tx, ty = xs + fx, ys + fy
        inb = (tx >= 0) & (tx < w - 1) & (ty >= 0) & (ty < h - 1)

        # cyclic error: follow bwd flow from the target position back
        txi = np.clip(tx, 0, w - 1.001)
        tyi = np.clip(ty, 0, h - 1.001)
        x0, y0 = txi.astype(int), tyi.astype(int)
        wx, wy = txi - x0, tyi - y0

        def bilerp(f, ch):
            v00 = f[y0, x0, ch]
            v01 = f[y0, np.minimum(x0 + 1, w - 1), ch]
            v10 = f[np.minimum(y0 + 1, h - 1), x0, ch]
            v11 = f[np.minimum(y0 + 1, h - 1), np.minimum(x0 + 1, w - 1), ch]
            return (
                v00 * (1 - wx) * (1 - wy)
                + v01 * wx * (1 - wy)
                + v10 * (1 - wx) * wy
                + v11 * wx * wy
            )

        bx = bilerp(bwd, 0)
        by = bilerp(bwd, 1)
        err = np.sqrt((tx + bx - xs) ** 2 + (ty + by - ys) ** 2)
        good = inb & (err < self.cyclic_thresh)

        conf = 1.0 / (1.0 + err[good])
        scale_back = np.array([W / w, H / h])
        kp_src = np.stack([xs[good], ys[good]], 1) * scale_back
        kp_tgt = np.stack([tx[good], ty[good]], 1) * scale_back
        order = np.argsort(-conf)
        return {
            "kp_source": kp_src[order].astype(np.float32),
            "kp_target": kp_tgt[order].astype(np.float32),
            "confidence_value": conf[order].astype(np.float32),
        }


class PDCNetPlusMatcher:
    """PDCNet+ (JAX port, see pdcnet/) — needs a converted megadepth
    checkpoint (.pth via torch, or .npz via pdcnet.convert)."""

    def __init__(self, weights_path: str | None = None, **inference_parameters):
        if weights_path is None:
            raise ValueError(
                "PDCNet+ inference requires a checkpoint (reference "
                "pre_trained_models/PDCNet_plus_megadepth.pth or a converted "
                ".npz); use FarnebackMatcher for a weight-free classical "
                "fallback."
            )
        from .pdcnet import PDCNetPlus

        self.net = PDCNetPlus(weights_path, inference_parameters or None)

    def get_matches_and_confidence(self, ref_image, src_image) -> dict:
        return self.net.get_matches_and_confidence(ref_image, src_image)


def select_matcher(name: str = "farneback", **kwargs):
    """reference `model_selection.select_model` analog."""
    if name in ("farneback", "classical"):
        return FarnebackMatcher(**kwargs)
    if name in ("PDCNet_plus", "pdcnet_plus", "pdcnet"):
        return PDCNetPlusMatcher(**kwargs)
    raise ValueError(f"unknown matcher: {name}")
