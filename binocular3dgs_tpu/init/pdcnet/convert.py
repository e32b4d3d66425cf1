"""torch state_dict -> JAX params converter for PDCNet+.

The reference ships a torch checkpoint (`pre_trained_models/
PDCNet_plus_megadepth.pth`, loaded at reference model_selection.py:14-33).
This converter maps its state_dict to the flat {name: array} dict consumed by
the JAX modules, applying layout transforms:

  Conv2d weight      (O, I, kH, kW) -> (kH, kW, I, O)  [HWIO]
  ConvTranspose2d    (I, O, kH, kW) -> spatially flipped (kH, kW, I, O), so
                     layers.conv_transpose2d is a plain lhs-dilated conv
  everything else    unchanged (biases, BN stats, GOCor scalars/vectors)

Usable both on an in-memory state_dict (tests) and on a .pth file (CLI:
python -m binocular3dgs_tpu.init.pdcnet.convert ckpt.pth out.npz).
"""

from __future__ import annotations

import numpy as np

# torch modules that are ConvTranspose2d in the reference architecture
# (PDCNet.py: deconv4/deconv2 = BilinearConvTranspose2d(2,2,4,2,1),
#  upfeat2 = deconv(32, 2, 4, 2, 1))
_DECONV_PREFIXES = ("deconv4", "deconv2", "deconv3", "deconv1", "upfeat1", "upfeat2")


def _is_deconv(name: str) -> bool:
    head = name.split(".", 1)[0]
    return head in _DECONV_PREFIXES


def convert_state_dict(state_dict) -> dict:
    """Map a torch state_dict (tensors or numpy arrays) to JAX layout."""
    out = {}
    for name, value in state_dict.items():
        v = np.asarray(getattr(value, "detach", lambda: value)().cpu().numpy()
                       if hasattr(value, "detach") else value)
        if name.endswith("num_batches_tracked"):
            continue
        is_filter = name.endswith((".weight", "weight1", "weight2")) and v.ndim == 4
        if is_filter:
            if _is_deconv(name):
                v = v[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)  # IOHW -> flipped HWIO
            else:
                v = v.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        out[name] = np.ascontiguousarray(v, dtype=np.float32)
    return out


def load_checkpoint(path: str) -> dict:
    """Load a reference torch checkpoint (.pth[.tar]) or a converted .npz."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    # strip DataParallel prefix if present (reference model_selection.py:22-27)
    state_dict = { (k[7:] if k.startswith("module.") else k): v for k, v in state_dict.items() }
    return convert_state_dict(state_dict)


def save_npz(params: dict, path: str) -> None:
    np.savez(path, **params)


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="Convert PDCNet+ torch checkpoint to JAX npz")
    p.add_argument("checkpoint")
    p.add_argument("output")
    args = p.parse_args(argv)
    save_npz(load_checkpoint(args.checkpoint), args.output)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
