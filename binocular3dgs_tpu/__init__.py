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
