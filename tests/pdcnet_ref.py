"""Test-only harness to run the reference PDCNet+ (torch) on CPU as a
numerical oracle for the JAX port.

The reference at /root/reference needs CUDA (CuPy kernels, torchvision
weights); for CPU oracle runs we stub:
  * cupy / cupy.util / cupy.cuda — imported at module scope, only used at
    kernel launch (which we never reach)
  * torchvision.models.vgg16 — rebuilt as the standard config-D feature
    stack with random weights (we only need architecture + state_dict names)
  * torch.cuda.current_stream — touched at import of correlation.py
  * FunctionCorrelation/-Transpose — replaced by pure-torch unfold math with
    the same semantics as the CUDA kernels (verified against the JAX port)

Everything here is test fixture code; the framework itself never imports the
reference.
"""

from __future__ import annotations

import sys
import types

import numpy as np

_REF_PATH = "/root/reference/submodules/dense_matcher"

_installed = False


def _install_stubs():
    global _installed
    if _installed:
        return
    import torch
    import torch.nn as nn

    def _memoize(**kw):
        def deco(f):
            return f
        return deco

    cupy = types.ModuleType("cupy")
    cupy.memoize = _memoize
    cupy_util = types.ModuleType("cupy.util")
    cupy_util.memoize = _memoize
    cupy_cuda = types.ModuleType("cupy.cuda")
    cupy_cuda.compile_with_cache = None

    class _Dev:
        def __init__(self, *a):
            pass

    cupy_cuda.Device = _Dev
    cupy.cuda = cupy_cuda
    cupy.util = cupy_util
    sys.modules.setdefault("cupy", cupy)
    sys.modules.setdefault("cupy.util", cupy_util)
    sys.modules.setdefault("cupy.cuda", cupy_cuda)

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvm = types.ModuleType("torchvision.models")

        def vgg16(pretrained=False, **kw):
            cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                   512, 512, 512, "M", 512, 512, 512, "M"]
            layers, in_ch = [], 3
            for v in cfg:
                if v == "M":
                    layers.append(nn.MaxPool2d(2, 2))
                else:
                    layers += [nn.Conv2d(in_ch, v, 3, padding=1), nn.ReLU(inplace=True)]
                    in_ch = v
            m = nn.Module()
            m.features = nn.Sequential(*layers)
            return m

        tvm.vgg16 = vgg16
        tv.models = tvm
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tvm

    torch.cuda.current_stream = lambda *a, **k: types.SimpleNamespace(cuda_stream=0)
    torch.cuda.is_available = lambda: False

    if _REF_PATH not in sys.path:
        sys.path.insert(0, _REF_PATH)
    _installed = True


def torch_local_corr(first, second, md=4):
    """Pure-torch FunctionCorrelation (9x9 local cost volume, /C)."""
    import torch
    import torch.nn.functional as F

    B, C, H, W = first.shape
    pad = F.pad(second, (md, md, md, md))
    outs = []
    for dy in range(-md, md + 1):
        for dx in range(-md, md + 1):
            sh = pad[:, :, md + dy : md + dy + H, md + dx : md + dx + W]
            outs.append((first * sh).sum(1) / C)
    return torch.stack(outs, 1)


def torch_local_corr_transpose(v, second, md=4):
    """Pure-torch FunctionCorrelationTranspose (adjoint in the first arg)."""
    import torch
    import torch.nn.functional as F

    B, C, H, W = second.shape
    pad = F.pad(second, (md, md, md, md))
    out = torch.zeros_like(second)
    k = 0
    for dy in range(-md, md + 1):
        for dx in range(-md, md + 1):
            sh = pad[:, :, md + dy : md + dy + H, md + dx : md + dx + W]
            out = out + v[:, k : k + 1] * sh
            k += 1
    return out / C


def _patch_correlation():
    """Replace the CuPy kernels by the torch fallbacks everywhere they are
    referenced by name."""
    from models.modules.local_correlation import correlation as corr_mod
    from third_party.GOCor.GOCor import local_gocor

    corr_mod.FunctionCorrelation = lambda reference_features, query_features: torch_local_corr(
        reference_features, query_features
    )
    corr_mod.FunctionCorrelationTranspose = torch_local_corr_transpose
    local_gocor.FunctionCorrelation = torch_local_corr
    local_gocor.FunctionCorrelationTranspose = torch_local_corr_transpose


def build_reference_pdcnet(seed=0):
    """Construct the reference PDCNet_plus (reference model_selection.py:
    144-171 arguments) with seeded random weights, eval mode, CPU."""
    _install_stubs()
    import torch

    torch.manual_seed(seed)
    from models.PDCNet.PDCNet import PDCNet_vgg16

    _patch_correlation()

    global_gocor_arguments = {
        "optim_iter": 3, "steplength_reg": 0.1, "train_label_map": False,
        "apply_query_loss": True, "reg_kernel_size": 3,
        "reg_inter_dim": 16, "reg_output_dim": 16,
    }
    local_gocor_arguments = {"optim_iter": 7, "steplength_reg": 0.1}
    net = PDCNet_vgg16(
        global_corr_type="GlobalGOCor", global_gocor_arguments=global_gocor_arguments,
        normalize="leakyrelu", same_local_corr_at_all_levels=True,
        local_corr_type="LocalGOCor", local_gocor_arguments=local_gocor_arguments,
        local_decoder_type="OpticalFlowEstimatorResidualConnection",
        global_decoder_type="CMDTopResidualConnection",
        corr_for_corr_uncertainty_decoder="corr",
        give_layer_before_flow_to_uncertainty_decoder=True,
        var_2_plus=520**2, var_2_plus_256=256**2, var_1_minus_plus=1.0, var_2_minus=2.0,
        make_two_feature_copies=True,
    )
    # randomize BN running stats so eval-mode BN is non-trivial
    g = torch.Generator().manual_seed(seed + 1)
    for m in net.modules():
        if hasattr(m, "running_mean") and m.running_mean is not None:
            m.running_mean.normal_(0.0, 0.1, generator=g)
            m.running_var.uniform_(0.5, 1.5, generator=g)
    net.eval()
    return net


def jax_params_from(net):
    from binocular3dgs_tpu.init.pdcnet.convert import convert_state_dict

    return {k: np.asarray(v) for k, v in convert_state_dict(net.state_dict()).items()}
