"""Explanation tooling: slot heatmaps, area metrics, XAI-baseline attribution."""

from .vis import (
    apply_colormap_on_image,
    attention_area_ratio,
    attention_to_maps,
    save_slot_pngs,
)

__all__ = [
    "apply_colormap_on_image",
    "attention_area_ratio",
    "attention_to_maps",
    "save_slot_pngs",
]
