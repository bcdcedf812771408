"""Import the PyTorch reference implementation as a parity oracle.

The reference lives read-only at /root/reference and depends on torchvision
(absent in this environment) only for host-side image preprocessing, so a
minimal stub is injected before import. Tests that need the oracle should
call :func:`load_reference` and skip when it is unavailable.
"""

from __future__ import annotations

import sys
import types
from pathlib import Path

REFERENCE_ROOT = Path("/root/reference")


def _stub_torchvision() -> None:
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")

    class _Noop:
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):
            return x

    class _Compose(_Noop):
        def __init__(self, fns, *a, **k):
            self.fns = fns

        def __call__(self, x):
            for f in self.fns:
                x = f(x)
            return x

    transforms.Compose = _Compose
    transforms.Resize = _Noop
    transforms.ToTensor = _Noop
    transforms.Normalize = _Noop
    tv.transforms = transforms
    # transformers probes torchvision via importlib.util.find_spec, which
    # raises on a spec-less stub module — give it a real-looking spec.
    import importlib.machinery

    tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", loader=None)
    transforms.__spec__ = importlib.machinery.ModuleSpec(
        "torchvision.transforms", loader=None)
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms


def _stub_wandb() -> None:
    if "wandb" in sys.modules:
        return
    import importlib.machinery

    wandb = types.ModuleType("wandb")
    wandb.init = lambda *a, **k: None
    wandb.log = lambda *a, **k: None
    wandb.finish = lambda *a, **k: None
    wandb.__spec__ = importlib.machinery.ModuleSpec("wandb", loader=None)
    sys.modules["wandb"] = wandb


def load_reference():
    """Return the reference ``src.model.core`` module, or None if unusable."""
    if not REFERENCE_ROOT.exists():
        return None
    try:
        _stub_torchvision()
        _stub_wandb()
        if str(REFERENCE_ROOT) not in sys.path:
            sys.path.insert(0, str(REFERENCE_ROOT))
        from src.model import core  # type: ignore

        return core
    except Exception:
        return None
