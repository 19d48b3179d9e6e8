"""Model registry + factory — parity with timm's create_model dispatch.

Mirrors ``timm/models/registry.py:14-73`` (``register_model``, ``list_models``)
and ``timm/models/factory.py:6-67`` (``create_model``) as a plain decorator
registry over Flax module constructors.
"""

from __future__ import annotations

import fnmatch
from typing import Callable, Dict, List

__all__ = ["register_model", "create_model", "list_models", "is_model", "model_entrypoint"]

_REGISTRY: Dict[str, Callable] = {}


def register_model(fn: Callable) -> Callable:
    """Decorator: registers ``fn`` under its __name__."""
    name = fn.__name__
    if name in _REGISTRY:
        raise ValueError(f"duplicate model entrypoint {name!r}")
    _REGISTRY[name] = fn
    return fn


def is_model(name: str) -> bool:
    return name in _REGISTRY


def model_entrypoint(name: str) -> Callable:
    if name not in _REGISTRY:
        raise KeyError(f"unknown model {name!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def list_models(filter: str = "") -> List[str]:
    names = sorted(_REGISTRY)
    if filter:
        names = [n for n in names if fnmatch.fnmatch(n, filter)]
    return names


def create_model(model_name: str, pretrained: bool = False, num_classes: int = 1000,
                 in_chans: int = 3, **kwargs):
    """Build a backbone module by name (``timm/models/factory.py:6-67`` parity).

    ``pretrained=True`` has no download path in this zero-egress build —
    refusing loudly beats returning silently random weights. Converted torch
    weights load explicitly: ``torch_state_dict_to_variables`` +
    ``merge_variables`` (see ``models/convert.py``), or the training CLI's
    ``--pre_trained`` local-file path (``train/loop.py``).
    """
    if pretrained:
        raise ValueError(
            f"create_model({model_name!r}, pretrained=True): no pretrained-"
            "weight download exists in this build. Convert a torch state_dict "
            "with scouter_tpu.models.torch_state_dict_to_variables (+ "
            "prepare_pretrained_state_dict / merge_variables), or use the "
            "training CLI's --pre_trained local checkpoint path.")
    fn = model_entrypoint(model_name)
    return fn(num_classes=num_classes, in_chans=in_chans, **kwargs)
