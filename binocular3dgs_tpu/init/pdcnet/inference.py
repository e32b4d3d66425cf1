"""PDCNet+ inference engine: pre-processing, direct / 2-stage homography
estimation, cyclic consistency, and match extraction.

Ports (behavior, not code) of:
  * pre_process_image_pair_glunet (reference models/base_matching_net.py:75-147)
  * estimate_flow_and_confidence_map + '_direct' + '_with_homo'
    (reference models/PDCNet/base_pdcnet.py:144-309, 640-757)
  * estimate_mask / matches_from_flow / homography estimation
    (reference models/inference_utils.py:16-325)
  * get_matches_and_confidence (reference models/PDCNet/base_pdcnet.py:518-570)

The network forward runs jitted in JAX (TPU/CPU); RANSAC homography and image
warps for the 2-stage alignment stay on host via OpenCV, exactly like the
reference (cv2.findHomography/warpPerspective at base_pdcnet.py:272-276).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .convert import load_checkpoint
from .layers import (
    convert_flow_to_mapping,
    convert_mapping_to_flow,
    resize_area,
    resize_bilinear,
    warp,
)
from .model import pdcnet_forward
from .uncertainty import average_variance_of_mixture, p_r_of_mixture

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

DEFAULT_INFERENCE_PARAMETERS = {
    # reference base_pdcnet.py:45-53 defaults, overridden by triangulate.py:20-28
    "R": 1.0,
    "ransac_thresh": 1.0,
    "multi_stage_type": "h",
    "mask_type": "proba_interval_1_above_10",
    "homography_visibility_mask": True,
    "compute_cyclic_consistency_error": True,
    # multiscale ('ms') knobs, reference base_pdcnet.py:45-53
    "list_resizing_ratios": [0.5, 0.6, 0.88, 1, 1.33, 1.66, 2],
    "min_inlier_threshold_for_multi_scale": 0.2,
    "min_nbr_points_for_multi_scale": 70,
}


# ---------------------------------------------------------------------------
# host-side helpers
# ---------------------------------------------------------------------------


def estimate_mask(mask_type: str, uncertainty_est: dict, R: float = 1.0) -> np.ndarray:
    """reference inference_utils.py:16-119 (the variants used by the pipeline)."""
    if "cyclic_consistency_error_below" in mask_type:
        thresh = float(mask_type.split("below_", 1)[-1])
        return uncertainty_est["cyclic_consistency_error"][..., 0] <= thresh
    if "variance_below" in mask_type:
        thresh = float(mask_type.split("variance_below_", 1)[-1])
        return uncertainty_est["variance"][..., 0] <= thresh
    if "proba_interval" in mask_type:
        min_confidence = float(mask_type.split("above_", 1)[-1])
        r = float(mask_type.split("interval_", 1)[1].split("_above_", 1)[0])
        if "p_r" in uncertainty_est and r == R:
            p_r = uncertainty_est["p_r"]
        else:
            p_r = np.asarray(
                p_r_of_mixture(
                    jnp.asarray(uncertainty_est["weight_map"]),
                    jnp.asarray(uncertainty_est["log_var_map"]),
                    R=r,
                )
            )
        return p_r[..., 0] >= min_confidence / 100.0
    raise ValueError(f"unknown mask type {mask_type}")


def matches_from_flow(flow: np.ndarray, mask: np.ndarray, scaling=1.0):
    """reference inference_utils.py:122-163. flow: (b, h, w, 2), mask (b, h, w).
    Returns (source_pts Nx2, target_pts Nx2)."""
    b, h, w, _ = flow.shape
    gx, gy = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
    grid = np.stack([gx, gy], axis=-1)[None].repeat(b, axis=0)
    mapping = flow + grid
    pts_target = grid[mask]
    pts_source = mapping[mask]
    scaling = np.asarray(scaling, np.float32)
    return pts_source * scaling, pts_target * scaling


def homography_is_accepted(H: np.ndarray) -> bool:
    """reference inference_utils.py:199-229."""
    H = H / H[2, 2]
    det = H[0, 0] * H[1, 1] - H[0, 1] * H[1, 0]
    if det < 0:
        return False
    n1 = math.sqrt(H[0, 0] ** 2 + H[1, 0] ** 2)
    n2 = math.sqrt(H[0, 1] ** 2 + H[1, 1] ** 2)
    return 0.001 <= n1 <= 100 and 0.001 <= n2 <= 100


def from_homography_to_pixel_wise_mapping(shape, H):
    """reference inference_utils.py:166-197: dense map of shape `shape`
    sending each pixel through H."""
    h, w = shape[:2]
    X, Y = np.meshgrid(np.arange(w, dtype=np.float64), np.arange(h, dtype=np.float64))
    xyh = np.stack([X.ravel(), Y.ravel(), np.ones(h * w)], axis=0)
    warped = H @ xyh
    mx = (warped[0] / (warped[2] + 1e-8)).reshape(h, w)
    my = (warped[1] / (warped[2] + 1e-8)).reshape(h, w)
    return np.stack([mx, my], axis=-1).astype(np.float32)


def estimate_homography_and_inliers(flow, mask, scaling=1.0, min_nbr_points=0,
                                    ransac_thresh=1.0):
    """reference inference_utils.py:294-325: RANSAC homography from confident
    matches, returning (H, inlier count) — (None, 0) if rejected."""
    import cv2

    mkpts_src, mkpts_tgt = matches_from_flow(flow, mask, scaling=scaling)
    if len(mkpts_tgt) <= min_nbr_points:
        return None, 0
    try:
        H, inliers = cv2.findHomography(
            mkpts_src, mkpts_tgt, cv2.RANSAC, ransac_thresh, maxIters=3000
        )
    except cv2.error:
        return None, 0
    if H is None or not homography_is_accepted(H):
        return None, 0
    return H, int(inliers.sum())


def pad_to_size(im: np.ndarray, size) -> np.ndarray:
    """Bottom/right zero-pad to (h, w) (reference base_pdcnet.py:19-34)."""
    pad_y = max(size[0] - im.shape[0], 0)
    pad_x = max(size[1] - im.shape[1], 0)
    return np.pad(im, ((0, pad_y), (0, pad_x), (0, 0)), mode="constant")


def estimate_homography_and_correspondence_map(flow, mask, original_shape,
                                               mapping_output_shape, scaling,
                                               ransac_thresh=1.0, min_nbr_points=200):
    """reference inference_utils.py:229-297. Returns (H at image scale,
    mapping (1, h, w, 2) at mapping_output_shape) or (None, None)."""
    import cv2

    mkpts_src, mkpts_tgt = matches_from_flow(flow, mask, scaling=scaling)
    if len(mkpts_tgt) <= min_nbr_points:
        return None, None
    try:
        H, _ = cv2.findHomography(mkpts_src, mkpts_tgt, cv2.RANSAC, ransac_thresh, maxIters=3000)
    except cv2.error:
        return None, None
    if H is None or not homography_is_accepted(H):
        return None, None
    mapping = from_homography_to_pixel_wise_mapping(original_shape, np.linalg.inv(H))
    if mapping_output_shape is not None and tuple(mapping_output_shape) != tuple(original_shape):
        oh, ow = original_shape
        nh, nw = mapping_output_shape
        m = resize_bilinear(jnp.asarray(mapping)[None], (nh, nw), align_corners=False)
        # coordinate rescale (reference normalize -> resize -> unnormalize)
        m = m * jnp.asarray([(nw - 1) / (ow - 1), (nh - 1) / (oh - 1)], jnp.float32)
        mapping = np.asarray(m)[0]
    return H, mapping[None]


# ---------------------------------------------------------------------------
# jitted network wrapper
# ---------------------------------------------------------------------------


def _preprocess_shapes(h, w):
    ph = 256 if h < 256 else int(h // 8) * 8
    pw = 256 if w < 256 else int(w // 8) * 8
    return ph, pw


@partial(jax.jit, static_argnames=("out_h", "out_w", "global_iters", "local_iters"))
def _forward_jit(source, target, params, out_h, out_w, global_iters, local_iters):
    """source/target: (1, H, W, 3) float32 in [0, 255], already resized to the
    /8-divisible working resolution. Returns flow (1, h, w, 2) at
    (out_h, out_w) in working-resolution pixel units, plus log_var/weight."""
    mean = jnp.asarray(_IMAGENET_MEAN)
    std = jnp.asarray(_IMAGENET_STD)

    def norm(x):
        return (x / 255.0 - mean) / std

    src_256 = resize_area(source, (256, 256))
    tgt_256 = resize_area(target, (256, 256))
    _, output = pdcnet_forward(
        norm(target), norm(source), norm(tgt_256), norm(src_256), params,
        global_iters=global_iters, local_iters=local_iters,
    )
    flow = output["flow_estimates"][-1]
    log_var, weight = output["uncertainty_estimates"][-1]
    flow = resize_bilinear(flow, (out_h, out_w), align_corners=False)
    log_var = resize_bilinear(log_var, (out_h, out_w), align_corners=False)
    weight = resize_bilinear(weight, (out_h, out_w), align_corners=False)
    return flow, log_var, weight


class PDCNetPlus:
    """PDCNet+ matcher (reference `select_model('PDCNet_plus', 'megadepth')`,
    model_selection.py:144-254). Weights come from the converted checkpoint
    (convert.py); images are numpy (H, W, 3) uint8/float in [0, 255]."""

    def __init__(self, weights, inference_parameters=None,
                 global_optim_iter=3, local_optim_iter=7):
        if isinstance(weights, str):
            weights = load_checkpoint(weights)
        self.params = {k: jnp.asarray(v) for k, v in weights.items()}
        self.inference_parameters = dict(DEFAULT_INFERENCE_PARAMETERS)
        if inference_parameters:
            self.inference_parameters.update(inference_parameters)
        self.global_iters = int(global_optim_iter)
        self.local_iters = int(local_optim_iter)

    # -- direct single-pass estimation (reference base_pdcnet.py:645-700) --
    def _direct(self, source, target, output_shape):
        h, w = target.shape[:2]
        ph, pw = _preprocess_shapes(h, w)
        src = resize_area(jnp.asarray(source, jnp.float32)[None], (ph, pw))
        tgt = resize_area(jnp.asarray(target, jnp.float32)[None], (ph, pw))
        if output_shape is None:
            output_shape = (h, w)
        ratio_x = float(w) / float(pw) * float(output_shape[1]) / float(w)
        ratio_y = float(h) / float(ph) * float(output_shape[0]) / float(h)
        flow, log_var, weight = _forward_jit(
            src, tgt, self.params, int(output_shape[0]), int(output_shape[1]),
            self.global_iters, self.local_iters,
        )
        flow = flow * jnp.asarray([ratio_x, ratio_y], jnp.float32)
        p_r = p_r_of_mixture(weight, log_var, R=self.inference_parameters["R"])
        variance = average_variance_of_mixture(weight, log_var)
        uncertainty = {
            "log_var_map": np.asarray(log_var),
            "weight_map": np.asarray(weight),
            "p_r": np.asarray(p_r),
            "variance": np.asarray(variance),
            "inference_parameters": self.inference_parameters,
        }
        return np.asarray(flow), uncertainty

    # -- 2-stage homography alignment (reference base_pdcnet.py:215-309) --
    def _with_homo(self, source, target, output_shape, scaling=0.25):
        import cv2

        h, w = target.shape[:2]
        if output_shape is None:
            output_shape = (h, w)
        inter_shape = (int(h * scaling), int(w * scaling))
        flow_est, uncertainty = self._direct(source, target, inter_shape)

        mask_pre = estimate_mask(
            self.inference_parameters["mask_type"], uncertainty,
            R=self.inference_parameters["R"],
        )
        H, mapping_h = estimate_homography_and_correspondence_map(
            flow_est, mask_pre, original_shape=(h, w), mapping_output_shape=output_shape,
            scaling=np.float32([w, h]) / np.float32([inter_shape[1], inter_shape[0]]),
            ransac_thresh=self.inference_parameters["ransac_thresh"], min_nbr_points=200,
        )
        if mapping_h is None:
            if tuple(inter_shape) != tuple(output_shape):
                flow_est, uncertainty = self._direct(source, target, output_shape)
            return flow_est, uncertainty

        flow_first = self._resize_and_rescale_flow(flow_est, output_shape)
        src_np = np.asarray(source, np.float32)
        src_warped = cv2.warpPerspective(src_np, H, (w, h))
        flow_second, uncertainty = self._direct(src_warped, target, output_shape)

        mapping_final = warp(jnp.asarray(mapping_h), jnp.asarray(flow_second))
        flow_composed = np.asarray(convert_mapping_to_flow(mapping_final))

        ones = jnp.ones((1,) + tuple(output_shape) + (1,), jnp.float32)
        mask = np.asarray(warp(ones, jnp.asarray(flow_second)))[..., 0] >= 0.98
        warping_mask = np.asarray(
            _sample_by_mapping(ones, jnp.asarray(mapping_h))
        )[..., 0] >= 0.98
        if self.inference_parameters["homography_visibility_mask"]:
            mask = mask & warping_mask
        uncertainty["warping_mask"] = mask

        keep = (mask & warping_mask)[..., None]
        flow_out = np.where(keep, flow_composed * mask[..., None] * warping_mask[..., None],
                            flow_first)
        return flow_out.astype(np.float32), uncertainty

    # -- multiscale homography alignment (reference base_pdcnet.py:311-516) --
    def _homo_through_multiscale(self, source, target, inter_scaling, output_shape):
        """reference estimate_homo_through_multiscale (base_pdcnet.py:394-516):
        try several target/source resizing ratios, estimate a RANSAC homography
        from each candidate's confident quarter-res matches, and keep the one
        with the highest normalized inlier fraction. Returns (H at image
        scale, dense mapping (1, out_h, out_w, 2) or None, original-ratio
        first-pass flow). The reference batches all candidates through one
        network pass; per-candidate passes are numerically identical (the
        network has no cross-batch ops in eval mode)."""
        import cv2

        p = self.inference_parameters
        ratio_list = list(p["list_resizing_ratios"])
        src = np.asarray(source, np.float32)
        tgt = np.asarray(target, np.float32)
        h_t, w_t = tgt.shape[:2]
        h_s, w_s = src.shape[:2]
        inter_shape = (int(h_t * inter_scaling), int(w_t * inter_scaling))
        # first dim horizontal then vertical (reference base_pdcnet.py:412)
        scaling = np.float32([w_t, h_t]) / np.float32([inter_shape[1], inter_shape[0]])
        if 1.0 not in ratio_list:
            ratio_list.append(1.0)
        idx_orig = ratio_list.index(1.0)
        norm_orig = float(h_t * w_t / scaling[0] * scaling[1])

        candidates = []  # (H_target, H_source, normalization, source, target)
        for ratio in ratio_list:
            if ratio == 1.0:
                candidates.append((np.eye(3), np.eye(3), norm_orig, src, tgt))
            elif ratio < 1.0:
                hr, wr = int(h_t * ratio), int(w_t * ratio)
                Ht = np.diag([wr / float(w_t), hr / float(h_t), 1.0])
                tgt_r = pad_to_size(cv2.warpPerspective(tgt, Ht, (wr, hr)), (h_t, w_t))
                candidates.append(
                    (Ht, np.eye(3), float(wr * hr / scaling[0] * scaling[1]), src, tgt_r)
                )
            else:
                r = 1.0 / ratio
                hr, wr = int(h_s * r), int(w_s * r)
                Hs = np.diag([wr / float(w_s), hr / float(h_s), 1.0])
                src_r = pad_to_size(cv2.warpPerspective(src, Hs, (wr, hr)), (h_t, w_t))
                candidates.append((np.eye(3), Hs, norm_orig, src_r, tgt))

        flow_first = None
        hs, inlier_fracs = [], []
        for i, (Ht, Hs, normv, s_i, t_i) in enumerate(candidates):
            flow_i, unc_i = self._direct(s_i, t_i, inter_shape)
            if i == idx_orig:
                flow_first = flow_i
            mask_i = estimate_mask(p["mask_type"], unc_i, R=p["R"])
            H, inliers = estimate_homography_and_inliers(
                flow_i, mask_i, scaling=scaling,
                min_nbr_points=p["min_nbr_points_for_multi_scale"],
            )
            if H is not None:
                hs.append(np.linalg.inv(Ht) @ H @ Hs)
                inlier_fracs.append(float(inliers) / normv)
            else:
                hs.append(np.eye(3))
                inlier_fracs.append(0.0)

        best = int(np.argmax(inlier_fracs))
        H_final = None
        if inlier_fracs[best] * 100.0 > p["min_inlier_threshold_for_multi_scale"]:
            H_final = hs[best]
        if H_final is None or np.all(H_final == np.eye(3)):
            return None, None, flow_first

        mapping = from_homography_to_pixel_wise_mapping((h_t, w_t), np.linalg.inv(H_final))
        oh, ow = output_shape
        if (oh, ow) != (h_t, w_t):
            m = resize_bilinear(jnp.asarray(mapping)[None], (oh, ow), align_corners=False)
            # absolute pixel coords rescale with the resize (reference :510-513)
            m = m * jnp.asarray([ow / float(w_t), oh / float(h_t)], jnp.float32)
            mapping = np.asarray(m)[0]
        return H_final, mapping[None], flow_first

    def _with_multiscale(self, source, target, output_shape, inter_scaling=0.25):
        """reference estimate_flow_and_confidence_map_with_multiscale
        (base_pdcnet.py:311-392): align the source by the best multiscale
        homography, run a second direct pass, compose, and fall back to the
        first-pass flow outside the visibility masks."""
        import cv2

        h, w = target.shape[:2]
        if output_shape is None:
            output_shape = (h, w)
        H_img, mapping_h, flow_first = self._homo_through_multiscale(
            source, target, inter_scaling, output_shape
        )
        if mapping_h is None:
            return self._direct(source, target, output_shape)

        flow_first = self._resize_and_rescale_flow(flow_first, output_shape)
        src_np = np.asarray(source, np.float32)
        src_warped = cv2.warpPerspective(src_np, H_img, (w, h))
        flow_second, uncertainty = self._direct(src_warped, target, output_shape)

        mapping_final = warp(jnp.asarray(mapping_h), jnp.asarray(flow_second))
        flow_composed = np.asarray(convert_mapping_to_flow(mapping_final))

        ones = jnp.ones((1,) + tuple(output_shape) + (1,), jnp.float32)
        mask = np.asarray(warp(ones, jnp.asarray(flow_second)))[..., 0] >= 0.98
        warping_mask = np.asarray(
            _sample_by_mapping(ones, jnp.asarray(mapping_h))
        )[..., 0] >= 0.98
        if self.inference_parameters["homography_visibility_mask"]:
            mask = mask & warping_mask
        uncertainty["warping_mask"] = mask

        keep = mask & warping_mask
        flow_out = (
            flow_composed * mask[..., None] * warping_mask[..., None]
            + flow_first * (~keep)[..., None]
        )
        return flow_out.astype(np.float32), uncertainty

    @staticmethod
    def _resize_and_rescale_flow(flow, output_shape):
        """reference base_matching_net.py:181-192."""
        h, w = flow.shape[1:3]
        nh, nw = output_shape
        if (h, w) == (nh, nw):
            return np.asarray(flow)
        out = resize_bilinear(jnp.asarray(flow), (nh, nw), align_corners=False)
        out = out * jnp.asarray([float(nw) / w, float(nh) / h], jnp.float32)
        return np.asarray(out)

    def estimate_flow_and_confidence_map_(self, source, target, output_shape=None, scaling=1.0):
        mode = self.inference_parameters["multi_stage_type"].lower()
        if output_shape is None and scaling != 1.0:
            h, w = target.shape[:2]
            output_shape = (int(h * scaling), int(w * scaling))
        if mode in ("direct", "d"):
            return self._direct(source, target, output_shape)
        if mode in ("homography_from_quarter_resolution_uncertainty", "h"):
            return self._with_homo(source, target, output_shape, scaling=0.25)
        if mode in ("multiscale_homo_from_quarter_resolution_uncertainty", "ms"):
            return self._with_multiscale(source, target, output_shape, inter_scaling=0.25)
        raise NotImplementedError(f"multi_stage_type {mode}")

    def estimate_flow_and_confidence_map(self, source, target, output_shape=None, scaling=1.0):
        """Forward + (optionally) backward pass for cyclic consistency
        (reference base_pdcnet.py:144-180)."""
        flow, uncertainty = self.estimate_flow_and_confidence_map_(
            source, target, output_shape, scaling
        )
        if self.inference_parameters["compute_cyclic_consistency_error"]:
            flow_bwd, _ = self.estimate_flow_and_confidence_map_(
                target, source, output_shape, scaling
            )
            f = jnp.asarray(flow)
            cyc = f + warp(jnp.asarray(flow_bwd), f)
            err = jnp.linalg.norm(cyc, axis=-1, keepdims=True)
            uncertainty["cyclic_consistency_error"] = np.asarray(err)
            uncertainty["inv_cyclic_consistency_error"] = np.asarray(1.0 / (1.0 + err))
        return flow, uncertainty

    def get_matches_and_confidence(self, ref_image, src_image, scaling=0.25,
                                   confident_mask_type="proba_interval_1_above_10",
                                   min_number_of_pts=200):
        """reference base_pdcnet.py:518-570. ref/src: (H, W, 3) in [0, 255].
        Returns {kp_source, kp_target, confidence_value, flow, mask} where
        kp_target indexes ref_image (flow's coordinate frame) and kp_source
        indexes src_image."""
        flow, uncertainty = self.estimate_flow_and_confidence_map(
            src_image, ref_image, scaling=scaling
        )
        mask = estimate_mask(confident_mask_type, uncertainty,
                             R=self.inference_parameters["R"])
        if "warping_mask" in uncertainty:
            mask = mask & uncertainty["warping_mask"]
        mapping = np.asarray(convert_flow_to_mapping(jnp.asarray(flow)))
        mask = (
            mask
            & (mapping[..., 0] >= 0) & (mapping[..., 1] >= 0)
            & (mapping[..., 0] <= src_image.shape[1] * scaling - 1)
            & (mapping[..., 1] <= src_image.shape[0] * scaling - 1)
        )
        scaling_kp = np.float32(ref_image.shape[:2]) / np.float32(flow.shape[1:3])
        mkpts_s, mkpts_t = matches_from_flow(flow, mask, scaling=scaling_kp[::-1])
        confidence = uncertainty["p_r"][..., 0][mask]
        order = np.argsort(-confidence)
        mkpts_s, mkpts_t, confidence = mkpts_s[order], mkpts_t[order], confidence[order]
        if len(mkpts_s) < min_number_of_pts:
            mkpts_s = np.empty([0, 2], np.float32)
            mkpts_t = np.empty([0, 2], np.float32)
            confidence = np.empty([0], np.float32)
        return {
            "kp_source": mkpts_s.astype(np.float32),
            "kp_target": mkpts_t.astype(np.float32),
            "confidence_value": confidence.astype(np.float32),
            "flow": flow,
            "mask": mask,
        }


def _sample_by_mapping(x, mapping):
    """warp_with_mapping (reference pixel_wise_mapping.py:99-126): sample x at
    absolute pixel coords."""
    from .layers import grid_sample_bilinear

    H, W = x.shape[1:3]
    gx = 2.0 * mapping[..., 0] / max(W - 1, 1) - 1.0
    gy = 2.0 * mapping[..., 1] / max(H - 1, 1) - 1.0
    return grid_sample_bilinear(x, jnp.stack([gx, gy], axis=-1), align_corners=True)
