"""Slot heatmap rendering + explanation-size metrics.

Reference contract:
- per-slot attention maps min-max scaled to 0..255, reshaped sqrt(N) x sqrt(N),
  written as grayscale ``slot_{id}.png`` (``sloter/utils/slot_attention.py:68-83``
  — done *inside forward* there; here the model returns attn and rendering is a
  host-side post-process);
- 'jet' colormap overlay at alpha 0.4, composited over the RGBA original
  (``sloter/utils/vis.py:7-28``);
- attention-area ratio = sum(px) / (H*W*255) of the chosen class's slot map
  (``test.py:40-44``).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

__all__ = [
    "attention_to_maps",
    "save_slot_pngs",
    "apply_colormap_on_image",
    "attention_area_ratio",
]


def attention_to_maps(attn: np.ndarray, num_classes: int, slots_per_class: int) -> np.ndarray:
    """(S, N) or (B, S, N) final-iteration attention -> (C, h, w) uint8 maps for
    one sample (min-max scaled over the whole per-sample map set, matching
    slot_attention.py:78-79)."""
    attn = np.asarray(attn)
    if attn.ndim == 3:
        raise ValueError("pass a single sample's (S, N) attention; index the batch first")
    s, n = attn.shape
    if slots_per_class > 1:
        attn = attn.reshape(num_classes, slots_per_class, n).sum(axis=1)
    side = int(round(n**0.5))
    amin, amax = attn.min(), attn.max()
    scaled = (attn - amin) / (amax - amin + 1e-12) * 255.0
    return scaled.reshape(num_classes, side, side).astype(np.uint8)


def save_slot_pngs(maps: np.ndarray, out_dir: str, prefix: str = "slot") -> Sequence[str]:
    """Write per-class grayscale PNGs (slot_{id}.png naming, slot_attention.py:83)."""
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for idx, m in enumerate(maps):
        p = os.path.join(out_dir, f"{prefix}_{idx}.png")
        Image.fromarray(m, mode="L").save(p)
        paths.append(p)
    return paths


def apply_colormap_on_image(org_im, activation: np.ndarray, colormap_name: str = "jet"):
    """'jet' overlay at alpha 0.4 (sloter/utils/vis.py:7-28 contract).

    org_im: PIL image; activation: uint8 (H, W). Returns (heatmap, overlaid) PIL.
    """
    import matplotlib
    from PIL import Image

    color_map = matplotlib.colormaps[colormap_name]
    heat = color_map(activation)  # (H, W, 4) float in [0, 1]
    no_trans = (heat * 255).astype(np.uint8)
    heat_a = heat.copy()
    heat_a[:, :, 3] = 0.4
    heatmap = Image.fromarray((heat_a * 255).astype(np.uint8))
    base = Image.new("RGBA", org_im.size)
    base = Image.alpha_composite(base, org_im.convert("RGBA"))
    overlaid = Image.alpha_composite(base, heatmap)
    return Image.fromarray(no_trans), overlaid


def attention_area_ratio(slot_map: np.ndarray) -> float:
    """sum(px) / (H*W*255) — the explanation-size metric (test.py:40-44)."""
    m = np.asarray(slot_map, dtype=np.float64)
    h, w = m.shape[:2]
    return float(m.sum()) / float(h * w * 255)
