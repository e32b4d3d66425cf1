"""binocular3dgs_tpu — TPU-native Binocular-Guided 3D Gaussian Splatting.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
hanl2010/Binocular3DGS (NeurIPS 2024): few-shot novel view synthesis via 3D
Gaussian Splatting with a binocular stereo view-consistency loss, opacity
decay, and dense matcher initialization.

Design stance (not a port):
  * functional core — one jit'd train step over a fixed-capacity, padded
    Gaussian buffer (active mask) instead of torch modules + optimizer surgery
  * the differentiable rasterizer is a tile-binned Pallas kernel pipeline with
    a custom VJP instead of a CUDA extension
  * multi-chip scaling via jax.sharding.Mesh + shard_map (pixel tiles sharded
    across devices, Gaussian gradients psum'd over ICI) instead of per-GPU job
    dispatch
"""

__version__ = "0.1.0"

# f32 matmuls must BE f32 on TPU hardware. The platform default truncates
# f32 dot/conv inputs to bf16 on the MXU, which is catastrophic for this
# workload: camera-transform matmuls lose ~0.4% of every position, the
# SSIM banded matmuls perturb the loss, and the blend kernels' log-space
# transmittance scans amplify the truncation into ~10x-wrong gradients
# (found on real v5e hardware 2026-08-21 — interpret-mode tests compute
# f32 and can NOT catch this; bench.py chip_value_parity guards it now).
# "high" = 3-pass bf16 (~f32-grade, half the cost of "highest"); the hot
# Pallas kernels use explicit bit-masked bf16 splits instead (Mosaic only
# lowers DEFAULT/HIGHEST, and XLA's excess-precision folding silently
# destroys cast-based compensation — see ops/blend_pallas.py).
import jax as _jax

_jax.config.update("jax_default_matmul_precision", "high")
