"""Migrate PyTorch reference checkpoints into this framework.

A user of the reference has ``final_model.pth`` files written by
torch.save({'gen': state_dict, 'disc': state_dict, ...})
(/root/reference/train.py:203-209). This module converts those state dicts
into our flax param pytrees so trained models carry over:

- conv weights OIHW → HWIO; transposed-conv weights IOHW → HWIO,
- instance-norm weight/bias → scale/offset,
- module-name mapping per architecture (auto-detected from the key set),
- BCDUNet's never-executed ConvLSTM parameters are dropped (the reference
  forward never calls them — SURVEY.md quirk 1).

Optimizer states are not migrated (torch Adam state ↔ optax trees differ
structurally); resuming *training* from a torch checkpoint restarts the
optimizer, which matches the reference's own scheduler-restart behavior.

Loading the .pth file itself needs torch (baked into this image); the
key-mapping works on any {name: array} dict.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import numpy as np

Arrays = Dict[str, np.ndarray]


def _conv(sd: Arrays, name: str) -> dict:
    out = {"kernel": np.asarray(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)}
    if f"{name}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{name}.bias"])
    return out


def _convT(sd: Arrays, name: str) -> dict:
    out = {"kernel": np.asarray(sd[f"{name}.weight"]).transpose(2, 3, 0, 1)}
    if f"{name}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{name}.bias"])
    return out


def _norm(sd: Arrays, name: str) -> dict:
    return {"scale": np.asarray(sd[f"{name}.weight"]),
            "offset": np.asarray(sd[f"{name}.bias"])}


def _cnr(sd: Arrays, conv_name: str, norm_name: str) -> dict:
    return {"conv": _conv(sd, conv_name), "norm": _norm(sd, norm_name)}


def unet_from_torch(sd: Arrays) -> dict:
    """Reference generators/UNet.py state dict → our UNet params."""
    p = {}
    for i in range(1, 8):
        base = f"conv{i}.layer"
        p[f"down{i}"] = {"down": _cnr(sd, f"{base}.0", f"{base}.1"),
                         "refine": _cnr(sd, f"{base}.3", f"{base}.4")}
    for ours, theirs in zip(range(1, 8), range(2, 9)):
        base = f"deconv{theirs}.layer"
        p[f"up{ours}"] = {"up": _convT(sd, f"{base}.0"),
                          "norm": _norm(sd, f"{base}.1"),
                          "refine": _cnr(sd, f"{base}.3", f"{base}.4")}
    p["head"] = {"proj": _conv(sd, "downfeature.conv")}
    return p


def unetpp_from_torch(sd: Arrays) -> dict:
    """Reference generators/UNet_plusplus.py state dict → UNetPlusPlus."""
    p = {}
    for row in range(5):
        for col in range(5 - row):
            base = f"conv{row}_{col}.layer"
            p[f"node{row}_{col}"] = {"a": _cnr(sd, f"{base}.0", f"{base}.1"),
                                     "b": _cnr(sd, f"{base}.3", f"{base}.4")}
    p["head"] = {"proj": _conv(sd, "downfeature.conv")}
    return p


def bcdunet_from_torch(sd: Arrays) -> dict:
    """Reference generators/BCDUNet.py state dict → BCDUNet (effective
    network; clstm*/dropout params are intentionally ignored)."""
    def dbl(base):
        return {"a": {"conv": _conv(sd, f"{base}.0")},
                "b": {"conv": _conv(sd, f"{base}.3")}}

    p = {}
    for i in range(1, 5):
        p[f"enc{i}"] = dbl(f"conv{i}")
    for i in range(1, 4):
        p[f"up{i}"] = _convT(sd, f"upconv{i}")
        p[f"dec{i}"] = dbl(f"conv{i}m")
    p["head"] = {"proj": _conv(sd, "conv0")}
    return p


def patchdisc_from_torch(sd: Arrays) -> dict:
    """Reference discriminators/PatchDiscriminator.py state dict."""
    return {
        "block1_conv": _conv(sd, "model.0"),
        "block2_conv": _conv(sd, "model.2"),
        "block2_norm": _norm(sd, "model.3"),
        "block3_conv": _conv(sd, "model.5"),
        "block3_norm": _norm(sd, "model.6"),
        "block4_conv": _conv(sd, "model.8"),
        "block4_norm": _norm(sd, "model.9"),
        "patch_head": _conv(sd, "model.11"),
    }


def detect_generator(sd: Arrays) -> Tuple[str, Callable[[Arrays], dict]]:
    keys = set(sd)
    if any(k.startswith("conv0_0.") for k in keys):
        return "UNet++", unetpp_from_torch
    if any(k.startswith("deconv2.") for k in keys):
        return "UNet", unet_from_torch
    if any(k.startswith("upconv3.") for k in keys):
        return "BCDUNet", bcdunet_from_torch
    raise ValueError(f"unrecognized generator state dict (keys: {sorted(keys)[:5]}...)")


def is_torch_checkpoint(path: str) -> bool:
    """Torch >=1.6 checkpoints are zip archives ('PK...'); legacy ones start
    with a pickle protocol marker. Our msgpack files start with a map tag."""
    with open(path, "rb") as f:
        magic = f.read(2)
    return magic in (b"PK", b"\x80\x02", b"\x80\x03", b"\x80\x04", b"\x80\x05")


def load_torch_checkpoint(path: str) -> dict:
    """Load a reference final_model.pth and convert to our checkpoint layout:
    {'gen': {'params': ...}, 'disc': {'params': ...}, 'step': 0} — optimizer
    states are intentionally absent (see module docstring)."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=True)
    gen_sd = {k: v.numpy() for k, v in raw["gen"].items()}
    out = {"step": 0}
    _, convert = detect_generator(gen_sd)
    out["gen"] = {"params": convert(gen_sd)}
    if "disc" in raw:
        disc_sd = {k: v.numpy() for k, v in raw["disc"].items()}
        out["disc"] = {"params": patchdisc_from_torch(disc_sd)}
    return out
