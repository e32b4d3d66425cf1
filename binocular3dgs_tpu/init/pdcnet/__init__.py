"""PDCNet+ dense matcher, re-built TPU-native in JAX.

This subpackage re-implements the reference's dense-matching network stack
(`submodules/dense_matcher/models/PDCNet/*`, `third_party/GOCor/GOCor/*`,
~17k LoC of PyTorch/CUDA/CuPy) as a functional JAX inference pipeline:

  layers.py      torch-exact conv/BN/resize/warp primitives (NHWC)
  vgg.py         VGG-16 feature pyramid (reference models/feature_backbones/
                 VGG_features.py:6-54)
  gocor.py       Global + Local GOCor unrolled optimizers (reference
                 third_party/GOCor/GOCor/{global_gocor,local_gocor}.py)
  decoders.py    mapping/flow decoders + PWC refinement (reference
                 models/modules/mod.py, matching_modules.py)
  uncertainty.py mixture-density estimators and P_R confidence (reference
                 models/PDCNet/mod_uncertainty.py)
  model.py       PDCNetModel forward (reference models/PDCNet/PDCNet.py:479-642)
  inference.py   pre-processing, direct + 2-stage homography inference,
                 cyclic consistency, match extraction (reference
                 models/PDCNet/base_pdcnet.py, models/inference_utils.py)
  convert.py     torch state_dict -> JAX params converter

Parameters are a flat dict keyed by the torch state_dict names (weights
pre-transposed to TPU-friendly layouts at conversion time), which keeps the
checkpoint converter mechanical and auditable.
"""

from .inference import PDCNetPlus  # noqa: F401
