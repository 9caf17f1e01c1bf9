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


from tactile_gan_tpu.utils import torch_migrate as _tm


def _sd(model):
    return {k: v.numpy() for k, v in model.state_dict().items()}


def unet_params(model) -> dict:
    return _tm.unet_from_torch(_sd(model))


def unetpp_params(model) -> dict:
    return _tm.unetpp_from_torch(_sd(model))


def bcdunet_params(model) -> dict:
    return _tm.bcdunet_from_torch(_sd(model))


def patchdisc_params(model) -> dict:
    return _tm.patchdisc_from_torch(_sd(model))
