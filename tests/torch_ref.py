"""Helpers to build the PyTorch reference models (imported from the read-only
checkout at /root/reference) with deterministic weights, and to convert those
weights into our flax param pytrees for forward-pass parity goldens."""

import sys
import types

import numpy as np
import torch

# APPEND (not prepend): the reference defines top-level modules named
# train/test/util that must not shadow this repo's own CLI modules.
if "/root/reference" not in sys.path:
    sys.path.append("/root/reference")


def _stub(name: str, **attrs) -> None:
    if name in sys.modules:
        return
    import importlib.machinery
    mod = types.ModuleType(name)
    # A real ModuleSpec (and a __path__ on packages) so importlib.util.
    # find_spec / `from stub.sub import x` don't choke on the fake module.
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    if "." not in name:
        mod.__path__ = []
        mod.__spec__.submodule_search_locations = []
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod


def _install_stubs() -> None:
    """The reference imports torchvision and albumentations at module top;
    neither exists here and neither is needed for the code paths we golden
    against — stub them."""
    _stub("torchvision")
    _stub("torchvision.utils", save_image=lambda *a, **k: None)

    class _ToTensor:
        def __call__(self, pic):
            arr = np.asarray(pic, dtype=np.float32) / 255.0
            if arr.ndim == 2:
                arr = arr[:, :, None]
            return torch.tensor(arr.transpose(2, 0, 1))

    class _ToPILImage:
        def __call__(self, t):
            from PIL import Image
            arr = (np.clip(t.detach().numpy(), 0, 1) * 255).astype(np.uint8)
            if arr.ndim == 3:
                arr = arr.transpose(1, 2, 0)
            return Image.fromarray(arr)

    _stub("torchvision.transforms", ToTensor=_ToTensor, ToPILImage=_ToPILImage,
          Compose=lambda fns: fns, Normalize=lambda *a, **k: None)
    _stub("albumentations", Compose=lambda *a, **k: None,
          HorizontalFlip=lambda **k: None, Affine=lambda **k: None)
    sys.modules["torchvision"].utils = sys.modules["torchvision.utils"]
    sys.modules["torchvision"].transforms = sys.modules["torchvision.transforms"]


import contextlib


@contextlib.contextmanager
def _ref_path_first():
    """Temporarily put /root/reference at the FRONT of sys.path so its
    top-level modules (util, datasets, ...) win over same-named installed
    packages (e.g. HuggingFace `datasets`) while a reference module loads.
    Restored afterwards so this repo's own train/test CLIs stay importable."""
    sys.path.insert(0, "/root/reference")
    try:
        yield
    finally:
        sys.path.remove("/root/reference")
        sys.path.append("/root/reference")


def import_ref_util():
    """Import the reference util module (torchvision only used inside
    VGGPerceptualLoss.__init__, which we never call on CPU)."""
    _install_stubs()
    with _ref_path_first():
        import util as ref_util
    return ref_util


def import_ref_test():
    """Load the reference test.py under a collision-free module name (our
    repo root has its own test.py)."""
    import importlib.util
    _install_stubs()
    if "ref_test" in sys.modules:
        return sys.modules["ref_test"]
    spec = importlib.util.spec_from_file_location(
        "ref_test", "/root/reference/test.py")
    mod = importlib.util.module_from_spec(spec)
    with _ref_path_first():
        sys.modules["ref_test"] = mod
        spec.loader.exec_module(mod)
    return mod


def randomize_(module: torch.nn.Module, seed: int = 0) -> None:
    rng = np.random.default_rng(seed)
    with torch.no_grad():
        for _, p in sorted(module.named_parameters()):
            p.copy_(torch.tensor(
                rng.normal(scale=0.05, size=tuple(p.shape)).astype(np.float32)))


def _conv(sd, name):
    out = {"kernel": sd[f"{name}.weight"].numpy().transpose(2, 3, 1, 0)}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"].numpy()
    return out


def _convT(sd, name):
    out = {"kernel": sd[f"{name}.weight"].numpy().transpose(2, 3, 0, 1)}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"].numpy()
    return out


def _norm(sd, name):
    return {"scale": sd[f"{name}.weight"].numpy(),
            "offset": sd[f"{name}.bias"].numpy()}


def _cnr(sd, conv_name, norm_name):
    return {"conv": _conv(sd, conv_name), "norm": _norm(sd, norm_name)}


def unet_params(model) -> dict:
    sd = model.state_dict()
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


def unetpp_params(model) -> dict:
    sd = model.state_dict()
    p = {}
    for row in range(5):
        for col in range(5 - row):
            base = f"conv{row}_{col}.layer"
            p[f"node{row}_{col}"] = {"a": _cnr(sd, f"{base}.0", f"{base}.1"),
                                     "b": _cnr(sd, f"{base}.3", f"{base}.4")}
    p["head"] = {"proj": _conv(sd, "downfeature.conv")}
    return p


def bcdunet_params(model) -> dict:
    sd = model.state_dict()

    def dbl(base):
        # BCDUNet conv blocks: biased convs, non-affine norm (no norm params).
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


def patchdisc_params(model) -> dict:
    sd = model.state_dict()
    p = {
        "block1_conv": _conv(sd, "model.0"),
        "block2_conv": _conv(sd, "model.2"),
        "block2_norm": _norm(sd, "model.3"),
        "block3_conv": _conv(sd, "model.5"),
        "block3_norm": _norm(sd, "model.6"),
        "block4_conv": _conv(sd, "model.8"),
        "block4_norm": _norm(sd, "model.9"),
        "patch_head": _conv(sd, "model.11"),
    }
    return p
