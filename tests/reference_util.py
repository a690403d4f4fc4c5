"""Helpers for importing the PyTorch reference at /root/reference in tests.

The reference has module-level imports of packages absent here (evo, trimesh,
onnxruntime, viser) and pulls DINOv2 weights from torch.hub at model
construction (/root/reference/omnivggt/models/aggregator.py:191-202). This
module stubs those out so the reference modules import and construct offline,
letting parity tests compare our JAX implementation against the reference
semantics with random weights.

Tests that use this module must call `reference_available()` and skip when the
reference tree is not mounted.
"""

from __future__ import annotations

import os
import sys
import types

REFERENCE_PATH = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_PATH, "omnivggt"))


# absent deps + the reference's own broken imports (vggt/dust3r don't exist
# in-repo, SURVEY.md §2.4)
_STUB_TOPS = ("evo", "trimesh", "onnxruntime", "viser", "vggt", "dust3r")


class _StubLoader:
    def create_module(self, spec):
        from unittest.mock import MagicMock

        mod = MagicMock(name=spec.name)
        mod.__name__ = spec.name
        mod.__path__ = []
        mod.__spec__ = spec
        return mod

    def exec_module(self, module):
        pass


class _StubFinder:
    """Meta-path finder that fabricates MagicMock modules for the absent
    optional dependencies of the reference (evo, trimesh, onnxruntime, viser)."""

    def find_spec(self, fullname, path=None, target=None):
        if fullname.split(".")[0] in _STUB_TOPS:
            import importlib.machinery

            return importlib.machinery.ModuleSpec(
                fullname, _StubLoader(), is_package=True
            )
        return None


def _stub_module(name: str, **attrs) -> None:
    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod


def install_reference():
    """Put /root/reference on sys.path with stubs for its missing deps and its
    network fetches. Returns the `omnivggt` package."""
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)

    if not any(isinstance(f, _StubFinder) for f in sys.meta_path):
        sys.meta_path.insert(0, _StubFinder())
    _stub_module("huggingface_hub", PyTorchModelHubMixin=object)
    _install_torchvision_stub()

    # block the torch.hub DINOv2 download at Aggregator construction
    import torch

    class _EmptyPretrained:
        def state_dict(self):
            return {}

    torch.hub.load = lambda *a, **k: _EmptyPretrained()

    import omnivggt

    return omnivggt


def _install_torchvision_stub():
    """torchvision is absent; the reference only needs ToTensor/Compose (live
    path) plus class names for the training-era augmentation module."""
    if "torchvision" in sys.modules:
        return
    import numpy as np
    import torch

    class ToTensor:
        def __call__(self, img):
            arr = np.asarray(img, dtype=np.float32) / 255.0
            if arr.ndim == 2:
                arr = arr[None]
            else:
                arr = arr.transpose(2, 0, 1)
            return torch.from_numpy(arr.copy())

    class Compose:
        def __init__(self, ts):
            self.ts = ts

        def __call__(self, x):
            for t in self.ts:
                x = t(x)
            return x

    class _Noop:
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):
            return x

    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")
    transforms.ToTensor = ToTensor
    transforms.Compose = Compose
    for name in ("RandomApply", "ColorJitter", "RandomGrayscale", "GaussianBlur"):
        setattr(transforms, name, _Noop)
    tv.transforms = transforms
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms


def torch_state_dict_to_numpy(module) -> dict:
    """state_dict as {name: np.ndarray} for the checkpoint converter."""
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}
