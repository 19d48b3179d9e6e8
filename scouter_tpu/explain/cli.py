"""Inference + explanation rendering CLI — test.py parity.

Rebuilds the model from the config-derived checkpoint name (``test.py:59-62``),
takes image[vis batch] of the val set (``test.py:70-112``), runs one forward,
writes ``sloter/vis/slot_{id}.png`` per class, composites ``slot_mask_{id}.png``
jet overlays, and (with --cal_area_size) prints the attention-area ratio of the
label's slot (``test.py:18-44``).

Differences by design: attention maps come back as a forward output (no PNG
side effects inside the model), and all classes render in one vectorized pass.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..core.config import config_from_args, get_args_parser
from ..data import select_dataset
from .vis import (
    apply_colormap_on_image,
    attention_area_ratio,
    attention_to_maps,
    save_slot_pngs,
)

__all__ = ["main", "render_explanations"]


def render_explanations(cfg, state, model, image_u8: np.ndarray, label, vis_dir: str):
    """One-image forward + full per-class heatmap rendering."""
    import jax.numpy as jnp
    from PIL import Image

    from ..data.transforms import preprocess_batch

    os.makedirs(vis_dir, exist_ok=True)
    x = preprocess_batch(
        jnp.asarray(image_u8[None]), dataset=cfg.dataset, img_size=cfg.img_size
    )
    out = model.apply(state.variables(), x)
    logits = np.asarray(out["logits"])[0]
    pred = int(logits.argmax())
    shifted = logits - logits.max()
    log_probs = shifted - np.log(np.exp(shifted).sum())
    print(log_probs)  # test.py:24 prints the log_softmax output row
    print(pred)

    attn = np.asarray(out["attn"])[0]  # (S, N)
    maps = attention_to_maps(attn, cfg.num_classes, cfg.slots_per_class)
    save_slot_pngs(maps, vis_dir)

    raw = Image.fromarray(image_u8.squeeze() if image_u8.shape[-1] == 1 else image_u8)
    raw.save(os.path.join(vis_dir, "image.png"))
    raw_rgb = raw.convert("RGB")
    for idx in range(cfg.num_classes):
        slot_img = Image.open(os.path.join(vis_dir, f"slot_{idx}.png"))
        slot_arr = np.array(slot_img.resize(raw_rgb.size, resample=Image.BILINEAR), np.uint8)
        _, overlaid = apply_colormap_on_image(raw_rgb, slot_arr, "jet")
        overlaid.save(os.path.join(vis_dir, f"slot_mask_{idx}.png"))

    if cfg.cal_area_size and label is not None and isinstance(label, (int, np.integer)):
        # label's slot for positive, label+1 for negative (test.py:41)
        sel = int(label) if cfg.loss_status > 0 else int(label) + 1
        ratio = attention_area_ratio(maps[sel])
        print(f"attention_ratio: {ratio}")
        return ratio
    return None


def main(argv=None):
    from ..core.cache import setup_compilation_cache

    setup_compilation_cache()
    parser = argparse.ArgumentParser(
        "SCOUTER-TPU inference and explanation script", parents=[get_args_parser()]
    )
    ns = parser.parse_args(argv)
    cfg = config_from_args(ns)
    cfg = cfg.replace(use_pre=False)

    # serving path (batch-1 inference): the selection hook currently always
    # picks the jnp path — the fused kernel lost the round-3 end-to-end
    # serving measurement and is parked as opt-in (models/__init__.py)
    from ..models import auto_fused_slot
    from ..train.state import restore_inference_state

    model, state, _ = restore_inference_state(
        cfg, fused_slot=auto_fused_slot(cfg, train=False, batch_size=1),
        require=True)

    ds_val = select_dataset(cfg, train=False)
    vis_id = cfg.vis_id
    image_u8 = ds_val.images[vis_id]
    label = int(ds_val.labels[vis_id]) if cfg.dataset != "MNIST" else None

    render_explanations(cfg, state, model, image_u8, label, vis_dir="sloter_vis")


if __name__ == "__main__":
    main()
