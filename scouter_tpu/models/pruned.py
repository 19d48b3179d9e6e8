"""Pruned-channel model support — capability of timm's ``adapt_model_from_file``
(``timm/models/helpers.py:146-196``).

The reference performs post-construction surgery on a torch module tree,
rewriting each Conv2d/BatchNorm2d/Linear to the per-layer widths listed in
``timm/models/pruned/{variant}.txt``. In Flax, input channels (and hence BN
widths and the fc in-features) are inferred from the data, so the entire
surgery reduces to a table of *conv out-channels* consulted at module
construction. Conv1d attention layers (eca) are untouched by the reference
surgery (only ``nn.Conv2d`` instances are rewritten), so their adaptive kernel
size stays derived from the UNPRUNED channel count — we preserve that quirk by
passing original widths to the attention modules.

``pruned_data/{variant}.json`` holds the out-channel table extracted from the
public timm width metadata (conv2d entries only).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

__all__ = ["load_pruned_widths", "WidthOverrides", "scope_widths", "width_of"]

# hashable form usable as a flax module field
WidthOverrides = Optional[Tuple[Tuple[str, int], ...]]

_DATA_DIR = os.path.join(os.path.dirname(__file__), "pruned_data")


def load_pruned_widths(variant: str) -> Tuple[Tuple[str, int], ...]:
    """Out-channel table for a pruned variant, as a hashable sorted tuple of
    (torch-style conv prefix, out_channels) pairs."""
    with open(os.path.join(_DATA_DIR, variant + ".json")) as f:
        table: Dict[str, int] = json.load(f)
    return tuple(sorted(table.items()))


def scope_widths(widths: WidthOverrides, prefix: str) -> WidthOverrides:
    """Sub-table for one block: keys under ``prefix.`` with the prefix stripped."""
    if not widths:
        return None
    p = prefix + "."
    sub = tuple((k[len(p):], v) for k, v in widths if k.startswith(p))
    return sub or None


def width_of(widths: WidthOverrides, key: str, default: int) -> int:
    """Lookup with fallback to the unpruned width."""
    if widths:
        for k, v in widths:
            if k == key:
                return v
    return default
